package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DirtyDataSpec's twin for the events and embeddings tables: real
  * event streams carry malformed/NULL JSON props, NULL event types,
  * and zero-variance values; real vector stores carry NULL, empty,
  * wrong-dimension, and NaN embeddings. Operators must not throw —
  * the rows must degrade (drop / null out), never fail the stage.
  */
class DirtyEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dirtyev").toString
    val evSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", LongType, nullable = false), // epoch nanos
      StructField("user_id", LongType, nullable = true), // anonymous events
      StructField("event_type", StringType, nullable = true),
      StructField("value", DoubleType, nullable = false),
      StructField("props", StringType, nullable = true)))
    val base = 1704110400L * 1000000000L
    val ev = new java.util.ArrayList[org.apache.spark.sql.Row]()
    def add(id: Long, min: Long, u: Long, t: String, v: Double, p: String): Unit =
      ev.add(org.apache.spark.sql.Row(id, base + min * 60000000000L, u, t, v, p))
    add(1L, 0L, 10L, "view", 1.0, """{"page":"a"}""")
    add(2L, 1L, 10L, "click", 2.0, "{not json at all")   // malformed JSON
    add(3L, 2L, 10L, null, 3.0, null)                    // null type + props
    add(4L, 3L, 11L, "purchase", 0.0, "")                // empty props
    add(5L, 200L, 11L, "view", -5.0, """{"page":null}""") // null JSON value
    add(6L, 201L, 12L, "view", Double.NaN, """[1,2,3]""") // NaN + non-object
    ev.add(org.apache.spark.sql.Row(7L, base + 300L * 60000000000L,
      null, "view", 1.0, "{}")) // anonymous: NULL user_id
    spark.createDataFrame(ev, evSchema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true),
      StructField("label", IntegerType, nullable = false)))
    val em = new java.util.ArrayList[org.apache.spark.sql.Row]()
    def vec(id: Long, v: Seq[Float], l: Int): Unit =
      em.add(org.apache.spark.sql.Row(id, v, l))
    vec(0L, Seq.tabulate(64)(i => (i % 7).toFloat / 7f), 0)
    vec(1L, Seq.tabulate(64)(i => (i % 5).toFloat / 5f), 1)
    vec(2L, null, 0)                       // NULL embedding
    vec(3L, Seq.empty[Float], 1)           // empty vector
    vec(4L, Seq(1f, 2f, 3f), 0)            // wrong dimension
    vec(5L, Seq.tabulate(64)(_ => 0f), 1)  // zero vector (norm 0)
    vec(6L, Seq.tabulate(64)(i => if (i == 0) Float.NaN else 0.5f), 0) // NaN
    spark.createDataFrame(em, embSchema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def runs(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
    test(s"$name survives dirty events/vectors") {
      assert(df.collect() != null)
    }

  runs("q_json_props")(operators.Events.qJsonProps(spark, dir))
  runs("q_events_window")(operators.Events.qEventsWindow(spark, dir))
  runs("q_sessionize")(operators.Events.qSessionize(spark, dir))
  runs("q_top_users")(operators.Events.qTopUsers(spark, dir))
  runs("q_event_anomaly")(operators.Events.qEventAnomaly(spark, dir))
  runs("q_event_transitions")(operators.Events.qEventTransitions(spark, dir))
  runs("q_session_paths")(operators.Events.qSessionPaths(spark, dir))
  runs("q_burst_detect")(operators.Events.qBurstDetect(spark, dir))
  runs("q_retention")(operators.Events.qRetention(spark, dir))
  runs("q_cosine_topk")(operators.Similarity.qCosineTopk(spark, dir))
  runs("q_knn_join")(operators.Similarity.qKnnJoin(spark, dir))
  runs("q_ann_lsh")(operators.Similarity.qAnnLsh(spark, dir))
  runs("q_ann_ivf")(operators.Similarity.qAnnIvf(spark, dir))
  runs("q_ann_pq")(operators.Similarity.qAnnPq(spark, dir))
  runs("q_ann_ivfpq")(operators.Similarity.qAnnIvfPq(spark, dir))
  runs("q_ann_ivfpq_refine")(operators.Similarity.qAnnIvfPqRefine(spark, dir))
  runs("q_knn_join_ivf")(operators.Similarity.qKnnJoinIvf(spark, dir))
  runs("q_ann_recall")(operators.Similarity.qAnnRecall(spark, dir))
  runs("q_ann_sq8")(operators.Similarity.qAnnSq8(spark, dir))
  runs("q_ann_binary")(operators.Similarity.qAnnBinary(spark, dir))
  runs("q_lsh_tune")(operators.Similarity.qLshTune(spark, dir))
  runs("q_dedup_embedding")(operators.Dedup.qDedupEmbedding(spark, dir))
  runs("q_dedup_embedding_topk")(operators.Dedup.qDedupEmbeddingTopk(spark, dir))
  runs("q_embed_outliers")(operators.Training.qEmbedOutliers(spark, dir))
  runs("q_quantize_embeddings")(
    operators.Training.qQuantizeEmbeddings(spark, dir))
  runs("q_join_size_est")(operators.Relational.qJoinSizeEst(spark, dir))
  runs("q_funnel")(operators.Events.qFunnel(spark, dir))
  runs("q_pivot")(operators.Events.qPivot(spark, dir))
  runs("q_session_window")(operators.Events.qSessionWindow(spark, dir))
  runs("q_rolling_avg")(operators.Events.qRollingAvg(spark, dir))
  runs("q_range_join")(operators.Events.qRangeJoin(spark, dir))
  runs("q_asof_join")(operators.Relational.qAsofJoin(spark, dir))
  runs("q_dau_stickiness")(operators.Events.qDauStickiness(spark, dir))
  runs("q_skew_report")(operators.Relational.qSkewReport(spark, dir))
  runs("q_hll_distinct")(operators.Sketches.qHllDistinct(spark, dir))
  runs("q_kmv_distinct")(operators.Sketches.qKmvDistinct(spark, dir))
  runs("q_kmv_overlap")(operators.Sketches.qKmvOverlap(spark, dir))

  test("q_join_size_est degrades to amp 0 when neither join side has rows") {
    // an events slice with ONLY view rows: both keyed aggregates empty,
    // n_left + n_right = 0 — must yield amp_x100 = 0, not DIVIDE_BY_ZERO
    val d = java.nio.file.Files.createTempDirectory("graft_noviews").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = true),
      StructField("value", DoubleType, nullable = false),
      StructField("props", StringType, nullable = true)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.add(org.apache.spark.sql.Row(1L, 1704110400L * 1000000000L,
      10L, "view", 1.0, "{}"))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = operators.Relational.qJoinSizeEst(spark, d).head()
    assert(r.getAs[Long]("amp_x100") == 0L)
    assert(r.getAs[Long]("join_rows") == 0L)
  }
}
