package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Training-data preparation operators: deterministic splits, class
  * centroids, and sequence packing — the steps between "corpus" and
  * "training batches".
  *
  * Scale notes: the split is a stateless hash per row (no shuffle);
  * centroids are one map-side-combined groupBy over (label, dim);
  * packing is the same exclusive-prefix-sum shape as the chunker —
  * one shuffle on the partition key, bins assigned arithmetically,
  * no sequential driver loop.
  */
object Training {

  /** Deterministic 80/10/10 split via md5-hash bucketing of doc_id —
    * reproducible across engines and runs (no rand()).
    */
  def qTrainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        conv(substring(md5(concat(lit("split#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")

  /** Per-cluster centroids of the embedding space: mean per (label,
    * dimension) — one k-means maximization step, flattened to rows so
    * the oracle can replay it.
    */
  def qCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(round(avg(col("x").cast("double")), 6).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")

  val PackBudget = 128 // tokens per packed sequence bin

  /** Sequence packing: documents are packed into fixed token-budget
    * bins per (lang, split-hash) partition by exclusive prefix sum of
    * token counts — deterministic, parallel, no greedy driver loop.
    */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("cum") / PackBudget).cast("long"))
      .select("doc_id", "lang", "n_tokens", "bin_id")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_train_test_split" -> qTrainTestSplit,
    "q_centroids" -> qCentroids,
    "q_pack_sequences" -> qPackSequences)

  val oracles: Map[String, String] = Map(
    "q_train_test_split" ->
      """SELECT doc_id, lang,
        |  CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 < 80
        |    THEN 'train'
        |    WHEN CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 < 90
        |    THEN 'valid' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_centroids" ->
      """SELECT label, dim, round(avg(x), 6) AS centroid, count(*) AS n
        |FROM (
        |  SELECT label,
        |    unnest(generate_series(0, len(embedding) - 1)) AS dim,
        |    unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x
        |  FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $PackBudget)
         |    AS BIGINT) AS bin_id
         |FROM t ORDER BY doc_id""".stripMargin)
}
