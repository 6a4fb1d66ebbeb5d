package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextPipeline

/** Materialized storage layer: how graft tables are laid out on disk
  * so downstream queries don't pay shuffles.
  *
  * - `materializeGraph` writes chunks + mentions BUCKETED by doc_id
  *   (sorted within buckets): a chunk⋈mention join then plans with NO
  *   Exchange on either side — at 100 TB this is the difference
  *   between a join that moves nothing and one that moves everything.
  *   (SourcesSpec asserts the Exchange-free plan.)
  * - `writePartitioned` writes documents partitioned by lang:
  *   language-filtered scans prune whole directories
  *   (PartitionFilters, zero I/O for other languages).
  * - CSV/JSON round-trips cover the interchange formats.
  */
object Catalog {

  val Buckets = 16

  /** Write chunks + mentions as bucketed, sorted tables. */
  def materializeGraph(spark: SparkSession, dir: String,
      chunksTable: String = "graft_chunks",
      mentionsTable: String = "graft_mentions"): Unit = {
    // Drop + clear stale locations (a previously interrupted run may
    // have left the directory without the catalog entry).
    Seq(chunksTable, mentionsTable).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
    TextPipeline.chunks(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "doc_id").sortBy("doc_id", "chunk_id")
      .saveAsTable(chunksTable)
    TextPipeline.mentions(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "doc_id").sortBy("doc_id", "chunk_id")
      .saveAsTable(mentionsTable)
  }

  /** The co-located join over the bucketed tables: both per-doc
    * aggregations AND the join run on the bucket layout, so nothing
    * shuffles on doc_id (join keys must equal the bucket spec —
    * partial-key matches are rejected by the planner).
    */
  def bucketedJoin(spark: SparkSession,
      chunksTable: String = "graft_chunks",
      mentionsTable: String = "graft_mentions"): DataFrame = {
    val cstats = spark.table(chunksTable)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(length(col("chunk_text"))).as("total_chars"))
    val mstats = spark.table(mentionsTable)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_mentions"))
    cstats.join(mstats, "doc_id")
  }

  /** Documents partitioned by lang → per-language directory pruning. */
  def writePartitioned(spark: SparkSession, dir: String, outPath: String): Unit =
    Tables.documents(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("lang")
      .parquet(outPath)

  def readLang(spark: SparkSession, outPath: String, lang: String): DataFrame =
    spark.read.parquet(outPath).filter(col("lang") === lang)

  /** CSV round-trip (header + explicit schema on read). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)

  /** JSON-lines round-trip. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)
}
