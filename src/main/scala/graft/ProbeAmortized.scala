package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-query timing of the graph family cold
  * (pipeline recompute) vs amortized (bucketed Catalog tables), run
  * twice to separate codegen compilation from steady-state. Not part
  * of the driver contract — used to audit that the materialized path
  * actually pays for itself (Bench reports it only as two aggregate
  * segment entries).
  */
object ProbeAmortized {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gq = Bench.GraphAmortizedQs
    def timeThunk(tag: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"[probe] $tag ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    def time(tag: String, n: String): Unit =
      timeThunk(s"$tag $n")(SparkEntry.queries(n)(spark, sfDir).count())
    // warm-up at smallest sf (same as Bench)
    gq.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    gq.foreach(time("cold1", _))
    gq.foreach(time("cold2", _))
    timeThunk("materialize")(sources.Catalog.materializeGraph(spark, sfDir))
    spark.conf.set(operators.TextPipeline.MaterializedConf, sfDir)
    try {
      gq.foreach(time("amort1", _))
      gq.foreach(time("amort2", _))
      // the §2.6 overlapped shape the Bench segment runs (round 12)
      timeThunk("amort_par")(Bench.countOverlapped(spark, gq, sfDir))
      timeThunk("amort_par2")(Bench.countOverlapped(spark, gq, sfDir))
    } finally spark.conf.unset(operators.TextPipeline.MaterializedConf)
    // same protocol for the DEDUP segment (xad6q — historically the
    // widest run-to-run swing in the suite; this isolates whether a
    // slow segment was the plan or the host)
    val dq = Bench.DedupAmortizedQs
    dq.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    dq.foreach(time("dd_cold1", _))
    dq.foreach(time("dd_cold2", _))
    timeThunk("materialize_shingles")(
      sources.Catalog.materializeShingles(spark, sfDir))
    spark.conf.set(operators.Dedup.MaterializedConf, sfDir)
    try {
      dq.foreach(time("dd_amort1", _))
      dq.foreach(time("dd_amort2", _))
      timeThunk("dd_amort_par")(Bench.countOverlapped(spark, dq, sfDir))
      timeThunk("dd_amort_par2")(Bench.countOverlapped(spark, dq, sfDir))
    } finally spark.conf.unset(operators.Dedup.MaterializedConf)
    // same protocol for the ANN segment (standing IVF + PQ index)
    val aq = Bench.AnnAmortizedQs
    aq.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    aq.foreach(time("ann_cold1", _))
    aq.foreach(time("ann_cold2", _))
    timeThunk("materialize_ann")(sources.Catalog.materializeAnn(spark, sfDir))
    spark.conf.set(operators.Similarity.MaterializedConf, sfDir)
    try {
      aq.foreach(time("ann_amort1", _))
      aq.foreach(time("ann_amort2", _))
      timeThunk("ann_amort_par")(Bench.countOverlapped(spark, aq, sfDir))
      timeThunk("ann_amort_par2")(Bench.countOverlapped(spark, aq, sfDir))
    } finally spark.conf.unset(operators.Similarity.MaterializedConf)
    // ANF register artifact: rebuild vs serve vs incremental maintain.
    // The merge batch's edges are already standing (full-corpus
    // build), so anf_merge_1pct measures the pure cone walk — the
    // replay upper bound and a fair proxy for a same-sized real batch
    // (a real batch adds the improvement appends on top).
    timeThunk("anf_cold_query") {
      SparkEntry.queries("q_anf_hll")(spark, sfDir).count()
    }
    timeThunk("materialize_anf")(sources.Catalog.materializeAnf(spark, sfDir))
    timeThunk("anf_serve1")(sources.Catalog.anfEstimates(spark).count())
    timeThunk("anf_serve2")(sources.Catalog.anfEstimates(spark).count())
    val batch = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 100 === 7)
    timeThunk("anf_merge_1pct")(sources.Catalog.mergeAnfDocs(spark, batch))
    timeThunk("anf_compact")(sources.Catalog.compactAnfRegs(spark))
    timeThunk("anf_serve_postcompact")(sources.Catalog.anfEstimates(spark).count())
    spark.stop()
  }
}
