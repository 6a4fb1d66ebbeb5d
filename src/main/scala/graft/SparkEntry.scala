package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan).
  *
  * Every operator module contributes a `queries` map (name → plan
  * builder) and, where the semantics are ANSI-SQL-expressible, a
  * matching DuckDB oracle. Column names are aliased identically on
  * both sides (the driver's compare sorts columns by name).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.TextPipeline.queries, operators.TextPipeline.oracles),
      (graph.NewsGraph.queries, graph.NewsGraph.oracles),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
      (operators.Events.queries, operators.Events.oracles),
      (operators.Dedup.queries, operators.Dedup.oracles),
      (operators.Similarity.queries, operators.Similarity.oracles),
      (graph.Analytics.queries, graph.Analytics.oracles),
      (multimodal.Media.queries, multimodal.Media.oracles),
      (cypher.CypherLite.queries, cypher.CypherLite.oracles),
      (operators.Retrieval.queries, operators.Retrieval.oracles),
      (operators.Training.queries, operators.Training.oracles),
      (operators.Tokenize.queries, operators.Tokenize.oracles),
      (operators.Curation.queries, operators.Curation.oracles),
      (operators.Sketches.queries, operators.Sketches.oracles),
      (sources.Catalog.queries, sources.Catalog.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
