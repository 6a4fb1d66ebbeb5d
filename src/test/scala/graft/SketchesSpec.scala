package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.streaming.EventStream

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL distinct within 5% of exact per event type") {
    val bad = Sketches.approxDistinct(spark, TestSpark.sf)
      .filter(abs(col("approx_users") - col("exact_users"))
        > col("exact_users") * 0.05)
      .count()
    assert(bad == 0)
  }

  test("approx median within 10% of exact per event type") {
    val bad = Sketches.approxQuantiles(spark, TestSpark.sf)
      .filter(abs(col("approx_p50") - col("exact_p50"))
        > abs(col("exact_p50")) * 0.10)
      .count()
    assert(bad == 0)
  }

  test("Misra-Gries sketch honors the paper guarantees vs exact counts") {
    val k = 8
    val est = Sketches.freqItems(spark, TestSpark.sf, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= k, s"sketch kept ${est.size} > k=$k counters")
    val exact = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (k + 1)
    // estimates never exceed truth; undercount bounded by n/(k+1)
    est.foreach { case (w, e) =>
      assert(e <= exact(w), s"$w overestimated: $e > ${exact(w)}")
      assert(exact(w) - e <= bound, s"$w undercount ${exact(w) - e} > $bound")
    }
    // every true heavy hitter survives the sketch
    exact.collect { case (w, c) if c > bound => w }
      .foreach(w => assert(est.contains(w), s"heavy hitter $w missing"))
  }

  test("kmv overlap: sketch algebra is consistent and error-bounded") {
    val df = Sketches.qKmvOverlap(spark, TestSpark.sf).cache()
    val nTypes = Tables.events(spark, TestSpark.sf)
      .select("event_type").distinct().count()
    assert(df.count() == nTypes * (nTypes - 1) / 2, "one row per type pair")
    // inclusion-exclusion consistency + probability bounds
    assert(df.filter(col("est_inter") > col("est_a") + col("est_b")).count() == 0)
    assert(df.filter(col("exact_inter") > col("exact_union")).count() == 0)
    assert(df.filter(col("jac_ppm") < 0 || col("jac_ppm") > 1000000L).count() == 0)
    assert(df.filter(col("exact_jac_ppm") < 0
      || col("exact_jac_ppm") > 1000000L).count() == 0)
    // KMV with k=64 has σ ≈ 1/√(k−2) ≈ 12.7%; 4σ bounds the union est
    val bad = df.filter(abs(col("est_union") - col("exact_union"))
      > col("exact_union") * 0.51).count()
    assert(bad == 0, "union estimate outside 4σ of exact")
    df.unpersist()
  }

  test("streaming dedup keeps exactly the distinct event_ids") {
    val out = EventStream.runDedupToMemory(spark, TestSpark.sf, "dedup_out")
    val exact = Tables.events(spark, TestSpark.sf)
      .select("event_id").distinct().count()
    assert(out.count() == exact)
    assert(out.select("event_id").distinct().count() == exact)
  }

  test("count-min sketch never underestimates; heavy keys stay sharp") {
    val est = Sketches.cmsEstimate(spark, TestSpark.sf).cache()
    // the hard CMS guarantee: every estimate >= the true count
    assert(est.filter(col("est") < col("exact")).count() == 0)
    // total counter mass per hash row is exactly the token stream size
    val n = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " "))).count()
    val rowMass = Sketches.cmsCounters(spark, TestSpark.sf)
      .groupBy("j").agg(sum("c").as("m"))
    assert(rowMass.filter(col("m") =!= n).count() == 0)
    assert(rowMass.count() == Sketches.CmsDepth.toLong)
    // expected overcount per probe is N/w per row; min over d rows is
    // far tighter — 10·N/w catches a broken hash without flaking
    val bound = 10L * n / Sketches.CmsWidth
    val worst = est.agg(max("overcount")).head().getLong(0)
    assert(worst <= bound, s"worst overcount $worst > $bound")
    // the most frequent token's relative error stays under 10%
    val top = est.orderBy(col("exact").desc).head()
    assert(top.getAs[Long]("overcount") * 10 <= top.getAs[Long]("exact"),
      s"heavy key overcount ${top.getAs[Long]("overcount")} vs ${top.getAs[Long]("exact")}")
    est.unpersist()
  }

  test("CMS counters stream: micro-batch cells converge to the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the same cell aggregation runs as a streaming stateful agg —
    // cell-wise addition IS the merge, so batch boundaries are moot
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val streamCells = input.toDF().toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("word"))
      .select(explode(transform(
        sequence(lit(0), lit(Sketches.CmsDepth - 1)),
        j => struct(j.as("j"),
          (conv(substring(md5(concat(lit("cms"), j, lit("#"), col("word"))),
            1, 8), 16, 10).cast("long") % Sketches.CmsWidth).as("bucket"))))
        .as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val q = streamCells.writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try {
      val (h1, h2) = docs.splitAt(docs.size / 2)
      input.addData(h1: _*)
      q.processAllAvailable()
      input.addData(h2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cms_stream")
    val want = Sketches.cmsCounters(spark, TestSpark.sf)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "streamed CMS cells differ from the batch sketch")
  }

  test("AMS F2: estimator lands near exact; sign sums add across shards") {
    val r = Sketches.amsF2(spark, TestSpark.sf).head()
    val est = r.getAs[Double]("f2_est")
    val exact = r.getAs[Long]("f2_exact")
    assert(exact > 0 && est > 0)
    // median-of-means over 45 tug-of-war estimators: within a factor
    // of 2 is a conservative, non-flaky envelope for this corpus
    assert(est > exact / 2.0 && est < exact * 2.0,
      s"AMS est $est vs exact $exact")
    // LINEARITY — the merge property: Z over the whole corpus equals
    // the cell-wise sum of Z over a doc_id-parity split, exactly
    val docs = Tables.documents(spark, TestSpark.sf)
    val whole = Sketches.amsSigns(docs)
    val a = Sketches.amsSigns(docs.filter(col("doc_id") % 2 === 0))
      .withColumnRenamed("z", "za")
    val b = Sketches.amsSigns(docs.filter(col("doc_id") % 2 === 1))
      .withColumnRenamed("z", "zb")
    val merged = a.join(b, "j")
    assert(whole.join(merged, "j")
      .filter(col("z") =!= col("za") + col("zb")).count() == 0)
    assert(whole.count() == (Sketches.AmsGroups * Sketches.AmsPerGroup).toLong)
  }

  test("weighted sample: deterministic, distinct, and weight-biased") {
    import graft.operators.Training
    val k = 20
    val s1 = Training.weightedSample(spark, TestSpark.sf, k)
    val rows = s1.collect()
    assert(rows.length == k)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == k)
    // partition-count invariance: same sample from any layout (the
    // keys are pure hash functions of doc_id)
    val s2 = Training.weightedSample(spark, TestSpark.sf, k)
    assert(s1.collect().toSeq == s2.collect().toSeq)
    // bias: selection frequency across independent salts must favor
    // long documents (w = token mass). Compare the sampled mean token
    // mass against the corpus mean — A-ES with w-proportional
    // inclusion should pull it up decisively.
    val corpusMean = Tables.documents(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.size(split(col("text"), " "))
        .cast("double").as("w")).agg(avg("w")).head().getDouble(0)
    val sampleMeans = (1 to 8).map { i =>
      Training.weightedSample(spark, TestSpark.sf, k, s"bias$i")
        .agg(avg("w")).head().getDouble(0)
    }
    assert(sampleMeans.count(_ > corpusMean) >= 7,
      s"sample means $sampleMeans vs corpus mean $corpusMean")
  }
}
