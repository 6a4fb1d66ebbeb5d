package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guard against driver-side events.parquet regeneration drift: the
  * `ts` column has shipped as parquet TIMESTAMP(NANOS) (read as long
  * under nanosAsLong) in rounds 1-4 and as native timestamp[us]
  * (TIMESTAMP_NTZ) from round 5. Tables.events must yield the SAME
  * epoch-nanos BIGINT `ts` for every encoding it can meet, so a future
  * regeneration can't silently break the 9 events operators again.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one known instant, µs precision (what every encoding can carry)
  private val baseUs = 1704110400000000L // 2024-01-01 12:00:00 UTC

  private def writeEvents(encode: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Seq((1L, baseUs, 10L, "click", 1.5, "{}"),
        (2L, baseUs + 90L * 1000000L, 10L, "purchase", 2.5, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", encode)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readNorm(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == LongType,
      s"normalized ts must be BIGINT nanos, got ${df.schema("ts").dataType}")
    df.select("event_id", "ts").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private val expected = Seq(
    (1L, baseUs * 1000L),
    (2L, (baseUs + 90L * 1000000L) * 1000L))

  test("plain INT64 (epoch-nanos long) passes through") {
    val dir = writeEvents(col("ts_us") * lit(1000L))
    assert(readNorm(dir) == expected)
  }

  test("timestamp[us] (TIMESTAMP_NTZ) converts to epoch-nanos") {
    val dir = writeEvents(
      timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    // confirm the fixture really wrote the drifted encoding
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    assert(readNorm(dir) == expected)
  }

  test("timestamp (UTC-adjusted TimestampType) converts to epoch-nanos") {
    val dir = writeEvents(timestamp_micros(col("ts_us")))
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampType)
    assert(readNorm(dir) == expected)
  }

  test("the real generated events table reads as BIGINT nanos") {
    val df = Tables.events(spark, TestSpark.sf)
    assert(df.schema("ts").dataType == LongType)
    // sanity: values land in a plausible epoch-nanos range (year > 2000)
    val mn = df.agg(min("ts")).head.getLong(0)
    assert(mn > 946684800L * 1000000000L, s"ts=$mn not epoch-nanos")
  }

  test("streaming reader inherits the normalized contract") {
    val df = graft.streaming.EventStream.readEventStream(spark, TestSpark.sf)
    assert(df.schema("ts").dataType == LongType)
    assert(df.schema("ts_t").dataType == TimestampType)
  }

  test("narrowed documents/embeddings integrals widen back to BIGINT") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_docs").toString
    // a regeneration could plausibly narrow ids/measures to int32
    Seq((1, "alpha beta gamma", "en", "src0", 500),
        (2, "delta epsilon", "de", "src1", 260))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1, Array(0.5f, 0.5f), 3), (2, Array(1.0f, 0.0f), 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val d = Tables.documents(spark, dir)
    assert(d.schema("doc_id").dataType == LongType)
    assert(d.schema("n_chars").dataType == LongType)
    // the arithmetic that died on the events drift works on int32 input
    assert(d.select(expr("n_chars div 256").as("b"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 1L))
    val e = Tables.embeddings(spark, dir)
    assert(e.schema("vec_id").dataType == LongType)
    assert(e.count() == 2)
  }

  test("current generated documents/embeddings read with no cast in the plan") {
    // today's files are already BIGINT — the normalizer must be a
    // no-op so scan pushdown/pruning claims in PLANS.md stay honest
    val d = Tables.documents(spark, TestSpark.sf)
    assert(d.schema("doc_id").dataType == LongType)
    assert(!d.queryExecution.analyzed.toString.contains("cast(doc_id"),
      "unexpected cast node on the un-drifted documents scan")
    val e = Tables.embeddings(spark, TestSpark.sf)
    assert(e.schema("vec_id").dataType == LongType)
    assert(!e.queryExecution.analyzed.toString.contains("cast(vec_id"),
      "unexpected cast node on the un-drifted embeddings scan")
  }
}
