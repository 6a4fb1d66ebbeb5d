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
}
