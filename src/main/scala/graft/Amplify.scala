package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data amplifier: writes an N×-replicated copy of a
  * testdata dir with per-replica key perturbation, so the sweep can
  * compare the SAME harness at 1× vs 10× the corpus (the sf0.1 → "sf1"
  * decade the round-7 protocol records in SURVEY §6).
  *
  * Perturbation design — each replica must look like NEW data, not a
  * literal duplicate, or the dedup family's pair generators would see
  * every document in a 10-clone near-dup group and measure a clone
  * workload instead of a bigger corpus:
  *   - documents: doc_id offset by r·stride; source suffixed `_r<r>`
  *     (Source-node count scales with replicas); every 4th word of
  *     `text` gets a replica salt token appended, which breaks ~all
  *     5-gram shingles across replicas while leaving the gazetteer
  *     entity surface intact — so mentions/graph work scales ×N and
  *     per-replica dedup structure matches the base corpus.
  *   - embeddings: vec_id offset; vector rotated by r positions (new
  *     points, same norm/distribution — ANN cell sizes scale ×N).
  *   - events: event_id/user_id offset (DAU, sessions, funnels ×N).
  *   - TPC-H tables: copied as-is (the relational anchors are not in
  *     the sweep's heavy families).
  *
  * Replica 0 gets the same transforms with salt `zq0`, so the 1× and
  * N× corpora differ only in volume, never in text shape — ratios are
  * transform-for-transform comparable.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<base> SPARK_GRAFT_AMP_OUT=<out>
  *        SPARK_GRAFT_AMP_N=<replicas> runMain graft.Amplify
  * then point Bench at <out> with SPARK_GRAFT_ONLY=<heavy families>.
  */
object Amplify {

  val Stride = 10000000L

  private def replicate(base: DataFrame, n: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(r => f(base, r)).reduce(_ unionAll _)

  def documents(base: DataFrame, n: Int): DataFrame = replicate(base, n) { (d, r) =>
    val salted = expr(
      s"array_join(transform(split(text, ' '), (w, i) -> IF(i % 4 = 3, concat(w, ' zq$r'), w)), ' ')")
    d.select(
      (col("doc_id") + lit(r * Stride)).as("doc_id"),
      salted.as("text"),
      col("lang"),
      concat(col("source"), lit(s"_r$r")).as("source"),
      length(salted).cast("long").as("n_chars"))
  }

  def embeddings(base: DataFrame, n: Int): DataFrame = replicate(base, n) { (e, r) =>
    e.select(
      (col("vec_id") + lit(r * Stride)).as("vec_id"),
      expr(s"transform(embedding, (x, i) -> element_at(embedding, ((i + $r) % size(embedding)) + 1))")
        .as("embedding"),
      col("label"))
  }

  def events(base: DataFrame, n: Int): DataFrame = replicate(base, n) { (e, r) =>
    e.select(
      (col("event_id") + lit(r * Stride)).as("event_id"),
      col("ts"),
      (col("user_id") + lit(r * Stride)).as("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  /** Planted-cluster embedding corpus (round 9) — the NON-isotropic
    * fixture the recall audits need: the driver's synthetic embeddings
    * carry no neighborhood structure (neighbor label-coherence ≈
    * chance), so recall measured on them is structurally
    * coverage-bound and says little about serving a corpus where
    * near-neighbors MEAN something. Deterministic integer-grid
    * construction (exactly representable as FLOAT, replayable in any
    * engine, no RNG):
    *
    *   v(i,d) = cent(i mod C, d)·8 + pert(i,d)
    *   cent(k,d) = (((k·37 + d)·(k + d·41 + 7) mod 97) mod 9) − 4  ∈ [−4, 4]
    *   pert(i,d) = ((i·13 + d·7) mod 5) − 2                        ∈ [−2, 2]
    *
    * The mod-97 mixing stage matters: anything of the form
    * `polynomial(k,d) mod 9` is periodic in k with period 9, which
    * silently merges clusters k and k+9 into ONE centroid (the first
    * cut did exactly that — 9 distinct centroids for 32 labels, and
    * label coherence read 0.24). The k·d cross term under a prime
    * modulus larger than C keeps every cluster's centroid sequence
    * distinct; the spec's coherence gate (≥ 0.99) is the regression
    * guard.
    *
    * Within-cluster cosine ≈ 1 (±2 perturbation on ±32-scale
    * coordinates); cross-cluster ≈ 0 — so each probe's true top-K IS
    * its own cluster, and `label` = cluster id makes coherence
    * directly checkable (ClusteredRecallSpec pins it ≫ chance).
    */
  def clusteredEmbeddings(spark: SparkSession, n: Long, clusters: Int): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${graft.operators.Similarity.Dim - 1}), d -> " +
        s"CAST(((((id % $clusters) * 37 + d) * ((id % $clusters) + d * 41 + 7)) % 97 % 9 - 4) * 8 + " +
        s"((id * 13 + d * 7) % 5 - 2) AS FLOAT))").as("embedding"),
      (col("id") % clusters).cast("int").as("label"))

  /** Writes the clustered corpus as an `embeddings.parquet` table so
    * the UNCHANGED ANN audit pipeline (qAnnRecall and every index it
    * builds) runs against it by just pointing `dir` at the fixture.
    */
  def writeClustered(spark: SparkSession, out: String, n: Long, clusters: Int): String = {
    clusteredEmbeddings(spark, n, clusters)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_AMP_OUT", "/root/repo/target/amp/x10")
    val n = sys.env.getOrElse("SPARK_GRAFT_AMP_N", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(documents(spark.read.parquet(s"$sfDir/documents.parquet"), n), "documents")
    write(embeddings(spark.read.parquet(s"$sfDir/embeddings.parquet"), n), "embeddings")
    write(events(spark.read.parquet(s"$sfDir/events.parquet"), n), "events")
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => write(spark.read.parquet(s"$sfDir/$t.parquet"), t))
    println(s"amplified $sfDir x$n -> $out")
    spark.stop()
  }
}
