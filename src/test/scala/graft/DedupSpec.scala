package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale-design invariants of the dedup family: the banded (pigeonhole
  * / LSH-blocked) plans must return EXACTLY the pairs the quadratic
  * all-pairs filter would, and blocking must actually split the data.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pigeonhole segments partition the signature bits exactly") {
    for ((bits, d) <- Seq((16, 2), (60, 6))) {
      val segs = Dedup.pigeonholeSegments(bits, d)
      assert(segs.size == d + 1)
      assert(segs.map(_._2).sum == bits)
      segs.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o2 == o1 + w1)
        case _ =>
      }
    }
  }

  /** All-pairs reference (test-only — the O(n²) plan the operators avoid). */
  private def brutePairs(sig: Column, maxHamming: Int): Set[(Long, Long, Int)] = {
    val sigs = Tables.documents(spark, TestSpark.sf)
      .withColumn("sig", sig).select("doc_id", "sig")
    sigs.select(col("doc_id").as("ida"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("doc_id").as("idb"), col("sig").as("sb")))
      .filter(col("ida") < col("idb"))
      .withColumn("h", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("h") <= maxHamming)
      .select("ida", "idb", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue())).toSet
  }

  test("temporal dedup equals minhash dedup restricted to the day window") {
    import spark.implicits._
    val plain = Dedup.qDedupMinhash(spark, TestSpark.sf)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    def day(id: Long) = id * 37 % 365
    val want = plain.filter { case (a, b, _) =>
      math.abs(day(a) - day(b)) <= Dedup.TemporalWindow
    }
    val got = Dedup.qDedupTemporal(spark, TestSpark.sf)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // the bucket±1 blocking must not lose any in-window pair, and the
    // |Δday| filter must not admit any out-of-window pair
    assert(got == want, s"temporal ${got.size} vs windowed-plain ${want.size}")
    assert(got.nonEmpty, "same-week near-dups exist in the synthetic corpus")
    assert(got.size < plain.size, "the day window must exclude far-apart re-posts")
  }

  test("native shingle + minhash expressions reproduce the HOF folds exactly") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
    val nat = docs.select(col("doc_id"),
      graft.functions.WordShingles.word_shingles(col("words"), 3).as("s"))
    val hof = docs.select(col("doc_id"), Dedup.shingleColHof(col("words")).as("s"))
    // element ORDER matters too (array_distinct first-occurrence), so
    // compare the arrays verbatim, not as sets
    assert(nat.except(hof).count() == 0 && hof.except(nat).count() == 0,
      "native WordShingles must reproduce the HOF shingle arrays verbatim")
    val sigNat = nat.withColumn("sig",
      graft.functions.MinHashSig.minhash_sig(col("s"), Dedup.MinhashK))
      .select("doc_id", "sig")
    val sigHof = Dedup.minhashSigsHof(nat)
    assert(sigNat.except(sigHof).count() == 0 && sigHof.except(sigNat).count() == 0,
      "native MinHashSig must reproduce the HOF signature fold verbatim")
  }

  test("banded 16-bit simhash == brute-force all-pairs") {
    val banded = Dedup.qDedupSimhash(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue())).toSet
    assert(banded == brutePairs(expr(Dedup.SimhashSigSql), Dedup.HammingMax))
    assert(banded.nonEmpty)
  }

  test("banded 60-bit simhash == brute-force all-pairs") {
    val banded = Dedup.qDedupSimhash64(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue())).toSet
    val sig64 = graft.functions.SimHash64.simhash64(split(col("text"), " "))
    assert(banded == brutePairs(sig64, Dedup.Hamming64Max))
    assert(banded.nonEmpty)
  }

  test("embedding dedup LSH blocking bounds the largest block") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val n = e.count()
    val sigArr = array((0 until Dedup.EmbLshTables).map(t =>
      Similarity.srpSigCol(col("v"),
        t * Dedup.EmbLshBits until (t + 1) * Dedup.EmbLshBits)): _*)
    val maxBlock = e.select(posexplode(sigArr).as(Seq("t", "bucket")))
      .groupBy("t", "bucket").count()
      .agg(max("count")).head().getLong(0)
    // blocking must genuinely split: no (table, bucket) holds more than
    // half the corpus, so per-block pairing can't degenerate to all-pairs
    assert(maxBlock <= n / 2, s"largest LSH block $maxBlock of $n vectors")
  }

  test("embedding dedup verified pairs are all >= threshold and bucket-witnessed") {
    val rows = Dedup.qDedupEmbedding(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= Dedup.CosineThreshold))
  }

  test("cluster assignment is consistent with the verified pairs") {
    val clusters = Dedup.qDedupClusters(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc present, canonical <= doc_id
    assert(clusters.size == Tables.documents(spark, TestSpark.sf).count())
    clusters.foreach { case (d, (c, sz)) =>
      assert(c <= d); assert(sz >= 1)
    }
    // both ends of every near-dup pair share a cluster label
    val pairs = Dedup.qDedupMinhash(spark, TestSpark.sf)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster_size is the label's cardinality
    val byLabel = clusters.values.groupBy(_._1).view.mapValues(_.size).toMap
    clusters.values.foreach { case (c, sz) => assert(sz == byLabel(c)) }
    // dedup keeps exactly one canonical per cluster
    val kept = clusters.count { case (d, (c, _)) => d == c }
    assert(kept == byLabel.size)
  }

  test("minhash estimate is slot-quantized; exact on identical sets") {
    val rows = Dedup.qMinhashEst(spark, TestSpark.sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, jac, err) =>
      // est = matching-slots/K → a multiple of 1/16
      val slots = est * Dedup.MinhashK
      assert(math.abs(slots - math.round(slots)) < 1e-9, s"est $est not slot-quantized")
      assert(math.abs(err - math.abs(est - jac)) < 1e-6)
      // identical shingle sets hash to identical signatures
      if (jac == 1.0) assert(est == 1.0, s"identical sets but est $est")
    }
  }

  test("containment pairs = brute force over sampled-witness candidates") {
    val got = Dedup.qDedupContainment(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    // in-memory reference: 3-gram shingle sets, min-wise sampled blocking
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8")); md.reset()
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .filter(_._2.size >= 3)
      .map { case (id, ws) => id -> ws.sliding(3).map(_.mkString(" ")).toSet }
    // discriminative witness: sampled AND within the doc-frequency cap
    val docFreq = docs.flatMap { case (_, s) => s }
      .groupBy(identity).view.mapValues(_.size).toMap
    def witness(x: String): Boolean =
      h32(x) % Dedup.ContainSampleMod == 0 &&
        docFreq(x) >= 2 && docFreq(x) <= Dedup.ContainMaxDf
    val want = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = sa & sb
      if inter.exists(witness)
      c = BigDecimal(inter.size.toDouble / math.min(sa.size, sb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= Dedup.ContainmentThreshold
    } yield (ia, ib) -> c).toMap
    assert(got == want, s"got ${got.size} want ${want.size} pairs")
    // containment dominates jaccard: every Jaccard-verified minhash
    // pair that the sampler catches has containment >= its jaccard
    val jac = Dedup.qDedupMinhash(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    jac.foreach { case (k, j) =>
      got.get(k).foreach(c => assert(c >= j, s"pair $k: containment $c < jaccard $j"))
    }
  }

  test("substring dedup matches an in-memory reference implementation") {
    val sub = Dedup.qDedupSubstring(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(sub.nonEmpty)
    assert(sub.values.exists(_._2 > 0), "corpus lost its near-dup span fixtures")
    // brute-force reference over the collected corpus (raw span strings,
    // no hashing — md5 keying must not change the answer)
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .filter(_._2.size >= Dedup.SubW)
    val spans = docs.flatMap { case (id, ws) =>
      ws.sliding(Dedup.SubW).zipWithIndex.map { case (w, p) => (id, p, w.mkString(" ")) }
    }
    val dup = spans.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val ref = docs.map { case (id, ws) =>
      val hits = spans.filter(s => s._1 == id && dup(s._3))
      val covered = hits.flatMap(s => s._2 until s._2 + Dedup.SubW).distinct.size
      id -> ((ws.size - Dedup.SubW + 1).toLong, hits.size.toLong,
        BigDecimal(covered.toDouble / ws.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(sub.keySet == ref.keySet)
    sub.foreach { case (id, got) =>
      assert(got == ref(id), s"doc $id: got $got want ${ref(id)}")
    }
  }

  test("cross-source dups: group mass equals the verified pair count") {
    val spark = TestSpark.spark
    val df = Dedup.qCrossSourceDups(spark, TestSpark.sf).cache()
    val nPairs = Dedup.qDedupMinhash(spark, TestSpark.sf).count()
    assert(df.agg(sum("n_pairs")).head().getLong(0) == nPairs)
    assert(df.filter(col("avg_jac_micro") =!=
      expr("sum_jac_micro div n_pairs")).count() == 0)
    // every pair is at least at the verification threshold
    assert(df.filter(col("avg_jac_micro") <
      (Dedup.JaccardThreshold * 1e6).toLong).count() == 0)
    df.unpersist()
  }

  test("best copy: one survivor per cluster, and it is the longest copy") {
    val spark = TestSpark.spark
    val df = Dedup.qBestCopy(spark, TestSpark.sf).cache()
    assert(df.count() ==
      Tables.documents(spark, TestSpark.sf).count(), "one row per doc")
    val perCluster = df.groupBy("canonical_id")
      .agg(sum("keep").as("kept"), max("best_doc").as("bmax"),
        min("best_doc").as("bmin"))
    assert(perCluster.filter(col("kept") =!= 1L).count() == 0,
      "exactly one keep per cluster")
    assert(perCluster.filter(col("bmax") =!= col("bmin")).count() == 0)
    // the survivor's n_chars is the cluster max (tie -> smallest id)
    val chars = Tables.documents(spark, TestSpark.sf).select("doc_id", "n_chars")
    val bad = df.join(chars, "doc_id")
      .groupBy("canonical_id")
      .agg(min(struct((-col("n_chars")).as("nn"), col("doc_id"))).as("w"),
        max(when(col("keep") === 1L, col("doc_id"))).as("got"))
      .filter(col("w.doc_id") =!= col("got")).count()
    assert(bad == 0, "keep flag not on the longest copy")
    df.unpersist()
  }

  // ---------- capped pair-stream twins (round 9) ----------

  /** Shared check: the capped twin against its full pair stream.
    * bestIsSmallest picks the sort sense of the "K best" rule.
    */
  private def checkCapped(full: Seq[(Long, Long, Double)],
      capped: Seq[(Long, Long, Double, Int, Long)],
      bestIsSmallest: Boolean, requireBite: Boolean = true): Unit = {
    val partners: Map[Long, Seq[(Long, Double)]] =
      (full.map(p => (p._1, (p._2, p._3))) ++ full.map(p => (p._2, (p._1, p._3))))
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2) }
    val byDoc = capped.groupBy(_._1)
    // every doc with at least one partner appears in the capped view
    assert(byDoc.keySet == partners.keySet,
      s"doc sets diverge: ${byDoc.keySet.diff(partners.keySet)} / ${partners.keySet.diff(byDoc.keySet)}")
    val k = Dedup.PairTopK
    partners.foreach { case (d, ps) =>
      val rows = byDoc(d).sortBy(_._4)
      // stats column reconciles with the FULL stream — nothing silently lost
      assert(rows.forall(_._5 == ps.length),
        s"doc $d n_partners=${rows.head._5} but full stream has ${ps.length}")
      assert(rows.length == math.min(k, ps.length),
        s"doc $d kept ${rows.length} of ${ps.length} (cap $k)")
      // under the cap: the partner SET is complete
      if (ps.length <= k)
        assert(rows.map(_._2).toSet == ps.map(_._1).toSet,
          s"doc $d lost partners under the cap")
      // at or over the cap: the kept rows are exactly the K best
      val best = ps.sortBy { case (p, s) =>
        (if (bestIsSmallest) s else -s, p) }.take(k)
      assert(rows.map(r => (r._2, r._3)) == best,
        s"doc $d kept ${rows.map(r => (r._2, r._3))} != best $best")
    }
    // the test is vacuous unless the cap actually bites somewhere
    if (requireBite)
      assert(partners.values.exists(_.length > k),
        "fixture must contain a doc with more than PairTopK partners")
  }

  test("capped simhash twin: complete under the cap, exact stats, K closest") {
    val full = Dedup.qDedupSimhash(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).doubleValue())).toSeq
    val capped = Dedup.qDedupSimhashTopk(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("partner"),
        r.getAs[Number]("hamming").doubleValue(), r.getAs[Int]("rk"),
        r.getAs[Long]("n_partners"))).toSeq
    checkCapped(full, capped, bestIsSmallest = true)
  }

  test("capped embedding twin: complete under the cap, exact stats, K most-similar") {
    val full = Dedup.qDedupEmbedding(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val capped = Dedup.qDedupEmbeddingTopk(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("partner"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rk"),
        r.getAs[Long]("n_partners"))).toSeq
    // sf0.001's embedding pair stream is sparse (no vec exceeds the
    // cap) — the cap-bite property is pinned by the synthetic test
    // below; this one checks the real-pipeline wiring end to end
    checkCapped(full, capped, bestIsSmallest = false, requireBite = false)
  }

  test("capped minhash twin: complete under the cap, exact stats, K most-similar") {
    val full = Dedup.qDedupMinhash(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val capped = Dedup.qDedupMinhashTopk(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("partner"),
        r.getAs[Double]("jaccard"), r.getAs[Int]("rk"),
        r.getAs[Long]("n_partners"))).toSeq
    // bite is pinned by the synthetic test below; this checks the
    // real-pipeline wiring end to end
    checkCapped(full, capped, bestIsSmallest = false, requireBite = false)
  }

  test("cappedPartners cuts to the K best on a dense synthetic pair set") {
    import spark.implicits._
    // a hub (doc 0) with 8 partners — over the cap — plus a 2-partner
    // satellite; similarity descends with partner id so the expected
    // cut is exact
    val pairs = ((1L to 8L).map(p => (0L, p, 1.0 - p * 0.05)) ++
      Seq((1L, 2L, 0.42))).toDF("a", "b", "sim")
    val got = Dedup.cappedPartners(pairs, "doc_id", "a", "b", "sim",
      bestIsSmallest = false).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("partner"),
        r.getAs[Double]("sim"), r.getAs[Int]("rk"), r.getAs[Long]("n_partners")))
    val full = ((1L to 8L).map(p => (0L, p, 1.0 - p * 0.05)) ++
      Seq((1L, 2L, 0.42))).map(t => (t._1, t._2, t._3))
    checkCapped(full, got.toSeq, bestIsSmallest = false)
    // the hub keeps exactly partners 1..5 (highest sim), reports 8
    val hub = got.filter(_._1 == 0L).sortBy(_._4)
    assert(hub.map(_._2).toSeq == (1L to 5L))
    assert(hub.forall(_._5 == 8L))
  }

  test("predictedPairs is exactly the bucket-join candidate mass") {
    import spark.implicits._
    // bucket sizes 4, 3, 1 → 6 + 3 + 0 = 9 candidate pairs
    val buckets = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("doc_id", "k")
    assert(Dedup.predictedPairs(buckets, Seq("k")) == 9L)
    assert(Dedup.predictedPairs(buckets.filter(col("k") === "zzz"), Seq("k")) == 0L)
    // overflow hygiene (r10 advice): the per-bucket term runs in
    // DECIMAL(38,0), so a hot bucket past ~4.3e9 rows cannot wrap
    // BIGINT into a negative term that lets the guard pass — pin the
    // exact SQL term at c = 5e9 (c·(c−1)/2 ≈ 1.25e19 > Long.MaxValue)
    val term = spark.sql(
      "SELECT CAST(c AS DECIMAL(38,0)) * (c - 1) / 2 AS p " +
        "FROM VALUES (CAST(5000000000 AS BIGINT)) t(c)").first().getDecimal(0)
    assert(term.compareTo(new java.math.BigDecimal("12499999997500000000")) == 0,
      s"decimal pair term lost precision: $term")
    assert(term.compareTo(new java.math.BigDecimal(Long.MaxValue)) > 0)
    // …and the BIGINT spelling really does misbehave (the bug being
    // guarded): ANSI mode throws, non-ANSI wraps negative — either
    // way it is NOT the correct positive mass the decimal term gives
    val wrapped = scala.util.Try(spark.sql(
      "SELECT c * (c - 1) div 2 AS p FROM VALUES (CAST(5000000000 AS BIGINT)) t(c)")
      .first().getLong(0)).toOption
    assert(wrapped.forall(_ < 0L), s"expected BIGINT wrap or ANSI throw, got $wrapped")
  }

  test("pair-load guard: uncapped emitters refuse over budget, capped twins are exempt") {
    val conf = spark.conf
    try {
      conf.set(Dedup.MaxPairsConf, "0")
      val err = intercept[IllegalStateException] {
        Dedup.qDedupSimhash(spark, TestSpark.sf).collect()
      }
      assert(err.getMessage.contains("q_dedup_simhash_topk"),
        s"refusal must direct callers to the capped twin: ${err.getMessage}")
      assert(err.getMessage.contains(Dedup.MaxPairsConf))
      intercept[IllegalStateException] {
        Dedup.qDedupMinhash(spark, TestSpark.sf).collect()
      }
      intercept[IllegalStateException] {
        Dedup.qDedupEmbedding(spark, TestSpark.sf).collect()
      }
      // the raw candidate-stream emitter runs the same band self-join
      // — it must refuse too (review finding: it was left unguarded)
      intercept[IllegalStateException] {
        Dedup.qNeardupCandidates(spark, TestSpark.sf).collect()
      }
      // round 11 (r10 verdict #6): the remaining pair emitters join
      // the load-proved family. q_dedup_ngram's block mass is
      // positive at this SF, so budget 0 trips it like the LSH three
      intercept[IllegalStateException] {
        Dedup.qDedupNgram(spark, TestSpark.sf).collect()
      }
      // the tighter-blocked emitters (time-bucketed bands, DF-capped
      // rare keys) can have ZERO predicted mass on the tiny fixture —
      // budget -1 proves the guard WIRING regardless (0 > -1 refuses)
      conf.set(Dedup.MaxPairsConf, "-1")
      intercept[IllegalStateException] {
        Dedup.qDedupTemporal(spark, TestSpark.sf).collect()
      }
      intercept[IllegalStateException] {
        Dedup.qDedupContainment(spark, TestSpark.sf).collect()
      }
      intercept[IllegalStateException] {
        Dedup.qWinnow(spark, TestSpark.sf).collect()
      }
      val mErr = intercept[IllegalStateException] {
        multimodal.Media.qMediaPhash(spark, TestSpark.sf).collect()
      }
      assert(mErr.getMessage.contains("PhashBits"),
        s"media refusal must name its blocking remedy: ${mErr.getMessage}")
      conf.set(Dedup.MaxPairsConf, "0")
      // the capped twins are the escape hatch — they must still run
      // under the same zero budget
      assert(Dedup.qDedupSimhashTopk(spark, TestSpark.sf).collect().nonEmpty)
    } finally conf.unset(Dedup.MaxPairsConf)
    // default budget: the emitter runs
    assert(Dedup.qDedupSimhash(spark, TestSpark.sf).collect().nonEmpty)
  }

  test("pair-load guard fires on the 10×-amplified corpus and passes at 1×") {
    val base = Tables.documents(spark, TestSpark.sf)
    val one = Dedup.predictedPairs(Dedup.bandKeysOfDocs(base), Seq("bkey"))
    val dense = Dedup.predictedPairs(
      Dedup.bandKeysOfDocs(Amplify.documents(base, 10)), Seq("bkey"))
    assert(one > 0 && dense > one, s"vacuous fixture: one=$one dense=$dense")
    // a budget BETWEEN the two masses: 1× runs, 10× refuses — the
    // operational shape the guard exists for (same knob, same corpus
    // family, only the scale differs)
    val tmp = java.nio.file.Files.createTempDirectory("graft-guard-").toString
    Amplify.documents(base, 10).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val conf = spark.conf
    try {
      conf.set(Dedup.MaxPairsConf, ((one + dense) / 2).toString)
      assert(Dedup.qDedupMinhash(spark, TestSpark.sf).collect().nonEmpty)
      val err = intercept[IllegalStateException] {
        Dedup.qDedupMinhash(spark, tmp).collect()
      }
      assert(err.getMessage.contains("q_dedup_minhash_topk"))
    } finally conf.unset(Dedup.MaxPairsConf)
  }
}
