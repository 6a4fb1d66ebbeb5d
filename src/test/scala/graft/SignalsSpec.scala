package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Analytics
import graft.operators.{Relational, Similarity, Sketches, TextAnalysis, Training}

/** Semantic invariants for the round-6 additions: edge support vs
  * triangle counts, harmonic closeness bounds, readability banding,
  * per-language perplexity terciles, radius search, grouping sets,
  * and the data-constrained epoch schedule.
  */
class SignalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("edge support sums to three times the triangle total") {
    // every triangle contributes support 1 to each of its 3 edges;
    // qTriangles counts each triangle at each of its 3 corners.
    val supSum = Analytics.qEdgeSupport(spark, TestSpark.sf)
      .agg(sum("support")).head().getLong(0)
    val triSum = Analytics.qTriangles(spark, TestSpark.sf)
      .agg(sum("triangles")).head().getLong(0)
    assert(supSum == triSum, s"sum(support)=$supSum vs sum(per-node tri)=$triSum")
  }

  test("edge support truss flag matches the support threshold") {
    val bad = Analytics.qEdgeSupport(spark, TestSpark.sf)
      .filter((col("support") >= Analytics.TrussSupport) =!= (col("in_truss4") === 1L))
      .count()
    assert(bad == 0)
  }

  test("truss peel: support only falls, survivors nest inside round-1 truss") {
    val peel = Analytics.qKtrussPeel(spark, TestSpark.sf).cache()
    assert(peel.filter(col("s2") > col("s1")).count() == 0,
      "peeling removed triangles, support cannot grow")
    assert(peel.filter(col("s1") < Analytics.TrussSupport).count() == 0)
    // round-1 survivors are exactly qEdgeSupport's in_truss4 edges
    val r1 = graft.graph.Analytics.qEdgeSupport(spark, TestSpark.sf)
      .filter(col("in_truss4") === 1L).select("e1", "e2")
    assert(peel.select("e1", "e2").except(r1).count() == 0)
    assert(r1.except(peel.select("e1", "e2")).count() == 0)
    peel.unpersist()
  }

  test("DAU/WAU: weekly actives dominate daily, stickiness is a ratio in (0,1]") {
    val df = operators.Events.qDauStickiness(spark, TestSpark.sf)
    assert(df.count() > 0)
    val bad = df.filter(col("wau") < col("dau")
      || col("stickiness") <= 0 || col("stickiness") > 1).count()
    assert(bad == 0)
    val nDays = Tables.events(spark, TestSpark.sf)
      .select(expr("ts div 86400000000000")).distinct().count()
    assert(df.count() == nDays)
  }

  test("closeness: one row per seed, harmonic bounded by reach") {
    val df = Analytics.qCloseness(spark, TestSpark.sf)
    assert(df.count() == Analytics.CloseSeeds)
    // each reached node contributes at most 1e6 micro-units (dist >= 1)
    val bad = df.filter(col("h_micro") > col("n_reached") * 1000000L
      || col("h_micro") < 0 || col("n_reached") < 0).count()
    assert(bad == 0)
  }

  test("closeness seeds reach their whole component within depth on sf0.001") {
    // high-degree seeds sit in the dense core: every seed must reach >0 nodes
    val df = Analytics.qCloseness(spark, TestSpark.sf)
    assert(df.filter(col("n_reached") === 0).count() == 0)
  }

  test("readability: syllables >= words, band matches fre thresholds") {
    val df = TextAnalysis.qReadability(spark, TestSpark.sf)
    assert(df.count() ==
      Tables.documents(spark, TestSpark.sf).count())
    assert(df.filter(col("n_syll") < col("n_words")).count() == 0)
    val bad = df.filter(
      (col("band") === "easy" && col("fre") < 60.0) ||
      (col("band") === "standard" && (col("fre") >= 60.0 || col("fre") < 30.0)) ||
      (col("band") === "hard" && col("fre") >= 30.0)).count()
    assert(bad == 0)
  }

  test("perplexity buckets: per-language tail never outscores head") {
    val df = TextAnalysis.qPerplexityBuckets(spark, TestSpark.sf)
    val byLang = df.groupBy("lang").agg(
      max(when(col("bucket") === "tail", col("avg_logp"))).as("max_tail"),
      min(when(col("bucket") === "head", col("avg_logp"))).as("min_head"))
    val bad = byLang.filter(col("max_tail").isNotNull && col("min_head").isNotNull
      && col("max_tail") > col("min_head")).count()
    assert(bad == 0)
    val badBucket = df.filter(!col("bucket").isin("head", "middle", "tail")).count()
    assert(badBucket == 0)
  }

  test("range search returns exactly the ball and nothing else") {
    val got = Similarity.qRangeSearch(spark, TestSpark.sf)
    assert(got.filter(col("score") < Similarity.RangeTheta).count() == 0)
    // cross-check cardinality against an independently-built exact scan
    val expect = Similarity.vectors(spark, TestSpark.sf)
      .crossJoin(broadcast(Similarity.vectors(spark, TestSpark.sf)
        .filter(col("vec_id") === 0).select(col("v").as("qv"), col("nrm").as("qnrm"))))
      .filter(col("vec_id") =!= 0)
      .filter(round(Similarity.dotCol(col("v"), col("qv"))
        / (col("nrm") * col("qnrm")), 6) >= Similarity.RangeTheta)
      .count()
    assert(got.count() == expect)
  }

  test("grouping sets: exactly both marginals plus the grand total") {
    val df = Relational.qGroupingSets(spark, TestSpark.sf).cache()
    val li = Tables.lineitem(spark, TestSpark.sf)
    val nFlags = li.select("l_returnflag").distinct().count()
    val nStatus = li.select("l_linestatus").distinct().count()
    assert(df.count() == nFlags + nStatus + 1)
    val total = df.filter(col("l_returnflag") === "ALL" && col("l_linestatus") === "ALL")
    assert(total.count() == 1)
    assert(total.head().getAs[Long]("n") == li.count())
    df.unpersist()
  }

  test("passage rank: one passage per doc, hits bounded by the query length") {
    val df = operators.Retrieval.qPassageRank(spark, TestSpark.sf).cache()
    assert(df.count() > 0)
    assert(df.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    val bad = df.filter(col("n_terms_hit") < 1
      || col("n_terms_hit") > operators.Retrieval.QueryTerms.size).count()
    assert(bad == 0)
    val scores = df.orderBy(col("bm25").desc, col("doc_id"))
      .select("bm25").collect().map(_.getDouble(0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    df.unpersist()
  }

  test("KMV sketch: exact when under k distinct, bounded error above") {
    val df = Sketches.qKmvDistinct(spark, TestSpark.sf)
    // below k kept minima the sketch IS the exact answer
    val bad = df.filter(col("n_kept") < Sketches.KmvK
      && col("est_users") =!= col("exact_users")).count()
    assert(bad == 0)
    // at k, the (k-1)/h_k estimator stays within 50% on any input
    // this size (theory: rel err ~ 1/sqrt(k) ≈ 12.5% at k=64)
    assert(df.filter(col("rel_err") > 0.5).count() == 0)
  }

  test("HLL registers partition; estimate within the sketch's error regime") {
    val df = Sketches.qHllDistinct(spark, TestSpark.sf).cache()
    assert(df.filter(col("n_present") + col("v_zero") =!= Sketches.HllM.toLong)
      .count() == 0)
    // 256 registers → ~6.5% typical error; 25% is a loose CI guard
    assert(df.filter(col("rel_err") > 0.25).count() == 0,
      s"HLL error above regime: ${df.collect().toSeq}")
    df.unpersist()
  }

  test("graph summary reconciles with the co-occurrence table") {
    val gs = graft.graph.Analytics.qGraphSummary(spark, TestSpark.sf).head()
    val co = graft.graph.Analytics.qCooccur(spark, TestSpark.sf)
    assert(gs.getAs[Long]("n_edges") == co.count())
    assert(gs.getAs[Long]("total_weight")
      == co.agg(sum("weight")).head().getLong(0))
    val n = gs.getAs[Long]("n_nodes")
    assert(gs.getAs[Double]("density") >= 0.0 && gs.getAs[Double]("density") <= 1.0)
    assert(gs.getAs[Long]("max_degree") <= n - 1)
  }

  test("histogram quantiles bracket the exact percentiles within two buckets") {
    val df = Sketches.qHistQuantiles(spark, TestSpark.sf)
      .join(Tables.events(spark, TestSpark.sf).groupBy("event_type")
        .agg((max("value") - min("value")).as("range")), "event_type")
    // the reported midpoint is within half a bucket of its bucket, and
    // quantile_cont's interpolation can land in the adjacent bucket →
    // worst case just under 2 bucket widths
    val bad = df.filter(col("err_p50") > col("range") * 2 / Sketches.HistBuckets
      || col("err_p90") > col("range") * 2 / Sketches.HistBuckets).count()
    assert(bad == 0)
  }

  test("media resize: stride decimation with a hard output cap") {
    val df = multimodal.Media.qMediaResize(spark, TestSpark.sf)
    val stride = multimodal.Media.ResizeStride
    val bad = df.filter(col("resized_bytes") > multimodal.Media.ResizeCap
      || col("resized_bytes") =!=
        least(ceil(col("orig_bytes") / stride.toDouble),
          lit(multimodal.Media.ResizeCap.toLong))).count()
    assert(bad == 0)
  }

  test("media manifest: items and bytes reconcile with the documents table") {
    val m = multimodal.Media.qMediaManifest(spark, TestSpark.sf)
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(m.agg(sum("n_items")).head().getLong(0) == nDocs)
    val bad = m.filter(col("n_distinct") > col("n_items")
      || col("min_bytes") > col("max_bytes")
      || col("n_exact_dups") =!= col("n_items") - col("n_distinct")).count()
    assert(bad == 0)
  }

  test("keep rate reconciles with the per-doc filter pipeline verdicts") {
    val kr = operators.Curation.qKeepRate(spark, TestSpark.sf).cache()
    val v = operators.Curation.qFilterPipeline(spark, TestSpark.sf)
    assert(kr.agg(sum("n_docs")).head().getLong(0) == v.count())
    assert(kr.agg(sum("n_keep")).head().getLong(0)
      == v.filter(col("keep")).count())
    // the fixed reason columns partition every document
    val bad = kr.filter(col("n_keep") + col("n_too_short") + col("n_repetitive")
      + col("n_low_diversity") + col("n_near_duplicate") =!= col("n_docs")).count()
    assert(bad == 0)
    assert(kr.filter(col("keep_rate") < 0 || col("keep_rate") > 1).count() == 0)
    kr.unpersist()
  }

  test("signal correlation is a valid Pearson r over the full corpus") {
    val df = TextAnalysis.qSignalCorr(spark, TestSpark.sf)
    val row = df.head()
    assert(row.getAs[Long]("n")
      == Tables.documents(spark, TestSpark.sf).count())
    val r = row.getAs[Double]("pearson_r")
    assert(r >= -1.0 && r <= 1.0, s"pearson_r out of range: $r")
    assert(row.getAs[Double]("mean_logp") < 0.0)
  }

  test("epoch schedule: cap binds exactly when fair share exceeds it") {
    val df = Training.qEpochSchedule(spark, TestSpark.sf)
    assert(df.filter(col("epochs") > Training.MaxEpochs).count() == 0)
    assert(df.filter(col("alloc_tokens") > col("fair_share")).count() == 0)
    assert(df.filter(col("unused_budget") =!=
      col("fair_share") - col("alloc_tokens")).count() == 0)
    // uncapped sources take their full fair share
    val bad = df.filter(col("epochs") < Training.MaxEpochs
      && col("alloc_tokens") =!= col("fair_share")).count()
    assert(bad == 0)
  }

  test("stopword discovery: DF bounds hold and threshold is respected") {
    val df = TextAnalysis.qStopwordDf(spark, TestSpark.sf).cache()
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(df.count() > 0, "corpus has function words")
    assert(df.filter(col("n_docs") =!= nDocs).count() == 0)
    assert(df.filter(col("df_docs") > col("n_docs")).count() == 0)
    assert(df.filter(col("df_pct") < TextAnalysis.StopDfPct).count() == 0)
    df.unpersist()
  }

  test("join size estimate equals the materialized join exactly") {
    val row = Relational.qJoinSizeEst(spark, TestSpark.sf).head()
    val ev = Tables.events(spark, TestSpark.sf)
    val actual = ev.filter(col("event_type") === "purchase")
      .select("user_id")
      .join(ev.filter(col("event_type") === "click").select("user_id"),
        "user_id")
      .count()
    assert(row.getAs[Long]("join_rows") == actual,
      s"histogram estimate ${row.getAs[Long]("join_rows")} != joined $actual")
    assert(row.getAs[Long]("amp_x100") == row.getAs[Long]("join_rows") * 100 /
      (row.getAs[Long]("n_left") + row.getAs[Long]("n_right")))
  }

  test("chunk dedup: dup groups bounded by chunk mass, counts consistent") {
    val df = operators.TextPipeline.qChunkDedup(spark, TestSpark.sf).cache()
    assert(df.count() > 0, "synthetic corpus has duplicate chunks")
    assert(df.filter(col("n_copies") < 2).count() == 0)
    assert(df.filter(col("n_docs") > col("n_copies")).count() == 0)
    val totalChunks = operators.TextPipeline.qChunk(spark, TestSpark.sf).count()
    assert(df.agg(sum("n_copies")).head().getLong(0) <= totalChunks)
    df.unpersist()
  }

  test("degree dist: bucket ranges are exact powers of two, mass = node count") {
    val df = graph.Analytics.qDegreeDist(spark, TestSpark.sf).cache()
    val nodes = graph.Analytics.qEntityDegree(spark, TestSpark.sf).count()
    assert(df.agg(sum("n_nodes")).head().getLong(0) == nodes)
    assert(df.filter(col("min_deg") < expr("cast(pow(2, bucket) as bigint)")
      || col("max_deg") >= expr("cast(pow(2, bucket + 1) as bigint)")).count() == 0)
    df.unpersist()
  }

  test("lsh bucket stats: histogram mass equals band rows, exact pair loads") {
    val df = operators.Dedup.qLshBucketStats(spark, TestSpark.sf).cache()
    val bandRows = Tables.documents(spark, TestSpark.sf)
      .filter(size(split(col("text"), " ")) >= 3).count() * operators.Dedup.LshBands
    val mass = df.agg(sum(col("bucket_size") * col("n_buckets"))).head().getLong(0)
    assert(mass == bandRows, s"histogram mass $mass != band rows $bandRows")
    assert(df.filter(col("pairs") =!=
      expr("n_buckets * (bucket_size * (bucket_size - 1) div 2)")).count() == 0)
    assert(df.filter(col("bucket_size") < 1).count() == 0)
    df.unpersist()
  }

  test("skew report: ranked, exact shares, heaviest key at least fair") {
    val df = operators.Relational.qSkewReport(spark, TestSpark.sf).cache()
    val rows = df.orderBy("rk").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n") <= a.getAs[Long]("n"))
    case _ => ()
    }
    // the heaviest key is never below the uniform fair share
    assert(rows.head.getAs[Long]("fair_x100") >= 100L)
    assert(df.filter(col("share_ppm") < 0 || col("share_ppm") > 1000000L)
      .count() == 0)
    df.unpersist()
  }

  test("embed outliers: ranked descending, max bounds mean, exact ratios") {
    val df = Training.qEmbedOutliers(spark, TestSpark.sf).cache()
    val n = Tables.embeddings(spark, TestSpark.sf).count()
    assert(df.count() == math.min(Training.OutlierK.toLong, n))
    assert(df.filter(col("d2") < 0).count() == 0)
    // rk orders by distance: each row's d2 <= the previous row's
    val rows = df.orderBy("rk").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("d2") <= a.getAs[Long]("d2"))
    case _ => ()
    }
    // the farthest vector is at least the corpus mean distance out
    assert(rows.head.getAs[Long]("ratio_pct") >= 100L)
    assert(df.filter(col("ratio_pct") =!=
      expr("d2 * 100 div mean_d2")).count() == 0)
    df.unpersist()
  }

  test("event transitions: totals reconcile and probabilities are exact floors") {
    val df = operators.Events.qEventTransitions(spark, TestSpark.sf).cache()
    // every event except each user's first contributes exactly one pair
    val ev = Tables.events(spark, TestSpark.sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val got = df.agg(sum("n_trans")).head().getLong(0)
    assert(got == expected, s"sum(n_trans)=$got, events-users=$expected")
    // src_total is the row's own group sum; p_ppm the exact integer floor
    assert(df.filter(col("p_ppm") =!=
      expr("n_trans * 1000000 div src_total")).count() == 0)
    val badTotal = df.groupBy("src_type")
      .agg(sum("n_trans").as("s"), max("src_total").as("t"), min("src_total").as("t2"))
      .filter(col("s") =!= col("t") || col("s") =!= col("t2")).count()
    assert(badTotal == 0)
    df.unpersist()
  }

  test("source entropy: bounds hold and a uniform mix maximizes it") {
    val df = operators.Curation.qSourceEntropy(spark, TestSpark.sf).cache()
    assert(df.count() > 0)
    // H >= 0; exp(H) in [1, k]; H/ln(k) in [0, 1] (grid slack 1e-5)
    val bad = df.filter(col("entropy") < -1e-5
      || col("eff_sources") < 1.0 - 1e-5
      || col("eff_sources") > col("n_sources").cast("double") + 1e-5
      || col("norm_entropy") < -1e-5 || col("norm_entropy") > 1.0 + 1e-5)
      .count()
    assert(bad == 0)
    // lang_tokens is the exact sum over the per-(lang, source) rollup
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("lang").agg(sum("nt").as("expect"))
    assert(df.join(docs, "lang")
      .filter(col("lang_tokens") =!= col("expect")).count() == 0)
    df.unpersist()
  }

  test("token gini: Lorenz points nest and the coefficient is bounded") {
    val r = operators.Curation.qTokenGini(spark, TestSpark.sf).head()
    val n = r.getAs[Long]("n_sources")
    val g = r.getAs[Double]("gini")
    val t50 = r.getAs[Long]("top50_sources")
    val t90 = r.getAs[Long]("top90_sources")
    assert(n > 0 && g >= 0.0 && g < 1.0)
    assert(t50 >= 1 && t50 <= t90 && t90 <= n)
    // re-derive top50 independently: smallest prefix of sources by
    // descending tokens whose sum reaches half the total
    val st = Tables.documents(spark, TestSpark.sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("tk"))
      .orderBy(col("tk").desc, col("source"))
      .collect().map(_.getAs[Long]("tk"))
    val total = st.sum
    val expect50 = st.scanLeft(0L)(_ + _).tail.indexWhere(_ * 2 >= total) + 1
    assert(t50 == expect50, s"top50=$t50 expected=$expect50")
  }

  test("entropy and gini hit closed-form values on a hand-built corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ent").toString
    // one lang, two sources with token masses 3:1 → p = (0.75, 0.25)
    // H = −(0.75·ln0.75 + 0.25·ln0.25) = 0.562335, eff = e^H = 1.754765,
    // norm = H/ln2 = 0.811278
    Seq((1L, "w w w", "en", "a", 5L), (2L, "w", "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = operators.Curation.qSourceEntropy(spark, dir).head()
    assert(e.getAs[Long]("n_sources") == 2L)
    assert(e.getAs[Long]("lang_tokens") == 4L)
    assert(math.abs(e.getAs[Double]("entropy") - 0.562335) < 5e-6)
    assert(math.abs(e.getAs[Double]("eff_sources") - 1.754765) < 5e-6)
    assert(math.abs(e.getAs[Double]("norm_entropy") - 0.811278) < 5e-6)
    // gini of masses (3,1): sorted asc ranks (1,2) → S1 = 1·1 + 2·3 = 7,
    // G = 2·7/(2·4) − 3/2 = 0.25; top50 needs only the big source,
    // top90 needs both
    val g = operators.Curation.qTokenGini(spark, dir).head()
    assert(g.getAs[Long]("n_sources") == 2L
      && g.getAs[Long]("total_tokens") == 4L)
    assert(math.abs(g.getAs[Double]("gini") - 0.25) < 1e-9)
    assert(g.getAs[Long]("top50_sources") == 1L
      && g.getAs[Long]("top90_sources") == 2L)
    // equal masses: gini exactly 0, entropy exactly ln 2 on the grid
    Seq((1L, "w w", "en", "a", 3L), (2L, "w w", "en", "b", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val g2 = operators.Curation.qTokenGini(spark, dir).head()
    assert(g2.getAs[Double]("gini") == 0.0)
    val e2 = operators.Curation.qSourceEntropy(spark, dir).head()
    assert(math.abs(e2.getAs[Double]("entropy") - math.log(2)) < 5e-6)
    assert(math.abs(e2.getAs[Double]("norm_entropy") - 1.0) < 5e-6)
  }

  test("assortativity: |r| <= 1 and the moments cover every edge twice") {
    val r = Analytics.qAssortativity(spark, TestSpark.sf).head()
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0, s"r=$a out of range")
    val nUndirected = Analytics.cooccur(spark, TestSpark.sf).count()
    assert(r.getAs[Long]("n_edges") == nUndirected)
    // mean endpoint degree over both orientations >= 1 by construction
    assert(r.getAs[Double]("mean_end_degree") >= 1.0)
  }

  test("winnow: pairs ordered, overlap in [threshold, 1], exact dups score 1.0") {
    val w = operators.Dedup.qWinnow(spark, TestSpark.sf).cache()
    assert(w.filter(col("doc_id_a") >= col("doc_id_b")).count() == 0)
    assert(w.filter(col("overlap") < operators.Dedup.WinnowOverlap
      || col("overlap") > 1.0).count() == 0)
    assert(w.filter(col("n_shared") < 1L).count() == 0)
    // identical texts have identical fingerprint sets → any exact-dup
    // pair that surfaces must score exactly 1.0
    val exactPairs = operators.Dedup.qDedupExact(spark, TestSpark.sf)
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("canonical_id").as("doc_id_a"), col("doc_id").as("doc_id_b"))
    val offenders = w.join(exactPairs, Seq("doc_id_a", "doc_id_b"))
      .filter(col("overlap") =!= 1.0).count()
    assert(offenders == 0, "an identical-text pair scored < 1.0")
    w.unpersist()
  }

  test("cdc dedup: counts consistent and boundaries are content-anchored") {
    val c = operators.Dedup.qDedupCdc(spark, TestSpark.sf).cache()
    assert(c.count() > 0)
    assert(c.filter(col("n_docs") < 2 || col("n_occ") < col("n_docs")
      || col("n_words") < 1L).count() == 0)
    // shift-robustness, the property fixed-size chunking lacks: a doc
    // prefixed with one new word re-chunks to the SAME interior chunks
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    Seq((1L, base.trim, "en", "a", 1L),
        (2L, ("prefixword " + base).trim, "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the two docs must share at least one content-defined chunk
    assert(operators.Dedup.qDedupCdc(spark, dir).count() > 0)
    c.unpersist()
  }

  test("session paths: rk consecutive, counts monotone, bounded by transitions") {
    val p = operators.Events.qSessionPaths(spark, TestSpark.sf).cache()
    val rows = p.orderBy("rk").collect()
    assert(rows.nonEmpty && rows.length <= operators.Events.PathTopK)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    val counts = rows.map(_.getAs[Long]("n_paths"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // total trigrams per session = max(0, n_events - 2): the top path
    // can never exceed the corpus-wide trigram budget
    val budget = operators.Events.qSessionize(spark, TestSpark.sf)
      .select(greatest(col("n_events") - 2, lit(0L)).as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(counts.sum <= budget)
    p.unpersist()
  }

  test("entity trends: delta arithmetic exact, top risers ordered") {
    val t = Analytics.qEntityTrends(spark, TestSpark.sf).cache()
    val rows = t.orderBy("rk").collect()
    assert(rows.nonEmpty && rows.length <= Analytics.TrendTopK)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    assert(rows.forall(r => r.getAs[Long]("delta")
      == r.getAs[Long]("n_mentions") - r.getAs[Long]("prev_mentions")))
    assert(rows.forall(r => r.getAs[Long]("prev_mentions") >= 0L))
    assert(rows.forall { r =>
      val wk = r.getAs[Long]("week"); wk >= 0L && wk <= 52L })
    val deltas = rows.map(_.getAs[Long]("delta"))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
    t.unpersist()
  }
}
