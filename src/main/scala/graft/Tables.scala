package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers over the driver-generated parquet tables.
  *
  * Column pruning + filter pushdown happen automatically because every
  * operator builds a declarative plan on top of these scans; verify with
  * `.explain("formatted")` (ReadSchema / PushedFilters).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects —
    * read it as epoch-nanos long (column name stays `ts`).
    *
    * The nanosAsLong flag is a session conf (no per-read parquet
    * option exists for it), set once at session construction in every
    * graft entrypoint (Verify/Bench/TestSpark builders). The set here
    * is a belt-and-braces for EXTERNAL sessions (the driver builds its
    * own); it is process-global for nanos parquet, which this corpus's
    * single nanos table tolerates.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
