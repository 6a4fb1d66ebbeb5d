package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate sketches for interactive-scale analytics: HLL distinct
  * counts and t-digest-style quantiles via the built-in codegen'd
  * approximations. No DuckDB oracle — sketch internals differ across
  * engines by design — so these are spec-bounded against the exact
  * answers instead (SketchesSpec: relative error limits).
  *
  * Scale: sketches are the 100 TB answer to countDistinct/percentile —
  * fixed-size state, map-side mergeable, one shuffle of sketch bytes.
  */
object Sketches {

  /** Approx vs exact distinct users/orders per event type. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** Approx (t-digest-ish) vs exact median of event value per type. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 1000)").as("approx_p50"),
        expr("percentile(value, 0.5)").as("exact_p50"))

  /** Misra–Gries heavy hitters over the corpus token stream via the
    * custom typed Aggregator (graft.functions.FreqItemsAgg): ≤ k
    * counters of state however large the vocabulary. Returns
    * (word, est) rows for the sketch's survivors.
    */
  def freqItems(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val agg = udaf(new graft.functions.FreqItemsAgg(k))
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(agg(col("word")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("word", "est")))
      .orderBy(col("est").desc, col("word"))
  }

  val HhCounters = 1024 // MG counters; guarantee covers any freq > n/(k+1)
  val HhFrac = 500.0    // report words with count >= n_total / HhFrac

  /** EXACT heavy hitters by two-pass candidate pruning — the pattern
    * that makes the Misra–Gries sketch oracle-able: pass 1 builds the
    * bounded MG summary (HhCounters counters/task, merged to one),
    * whose survivors are a guaranteed superset of every word with
    * frequency ≥ n/HhFrac (since HhFrac < HhCounters+1); pass 2
    * re-scans, keeps candidate tokens via a broadcast semi-join, and
    * counts them exactly.
    *
    * Scale: the full-vocabulary groupBy this replaces shuffles every
    * distinct token per task (billions at web scale); here the shuffle
    * is ≤ HhCounters sketch entries per task in pass 1 and ≤ the
    * candidate count in pass 2 — both fixed, corpus-size-independent.
    * The total count rides along as a broadcast 1-row cross join, not
    * a driver-side collect.
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val agg = udaf(new graft.functions.FreqItemsAgg(HhCounters))
    val cands = tokens.agg(agg(col("word")).as("sk"))
      .select(explode(map_keys(col("sk"))).as("word"))
    val total = tokens.agg(count(lit(1)).as("n_total"))
    tokens.join(broadcast(cands), "word")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") >= col("n_total") / lit(HhFrac))
      .select(col("word"), col("c"),
        round(col("c") / col("n_total").cast("double"), 6).as("frac"))
      .orderBy("word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> qHeavyHitters)

  val oracles: Map[String, String] = Map(
    "q_heavy_hitters" ->
      s"""WITH t AS MATERIALIZED (
         |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         |n AS (SELECT count(*) AS n_total FROM t)
         |SELECT word, count(*) AS c,
         |  round(count(*) / CAST(n_total AS DOUBLE), 6) AS frac
         |FROM t, n GROUP BY word, n_total
         |HAVING count(*) >= n_total / $HhFrac
         |ORDER BY word""".stripMargin)
}
