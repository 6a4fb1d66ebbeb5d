package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Lexical retrieval scoring — TF-IDF and BM25 over the documents
  * table. This is the principled stand-in for the reference's Lucene
  * keyword index (`graph.py setup_fulltext_indexes` + the hybrid
  * search's keyword leg): same inverted-index statistics, computed as
  * two aggregations.
  *
  * Scale: term frequencies are one explode+groupBy on (doc, word);
  * document frequencies a groupBy on word; both map-side-combined.
  * The DF/avgdl scalars are broadcast literals, not shuffles.
  */
object Retrieval {

  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val QueryTerms: Seq[String] = Seq("spark", "join", "fast")

  private def termFreqs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))

  /** Top-5 TF-IDF terms per document (doc_id < 50 keeps output bounded).
    * The corpus size N rides the plan as a broadcast 1-row aggregate —
    * no synchronous driver `count()` job before the query even starts.
    */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreqs(spark, dir)
    val nDf = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val df = tf.groupBy("word").agg(countDistinct(col("doc_id")).as("dfreq"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
    tf.join(df, "word")
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("dfreq")), 6))
      .filter(col("doc_id") < 50)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("doc_id", "word", "tf", "tfidf", "rk")
      .orderBy("doc_id", "rk")
  }

  /** BM25 top-20 documents for the fixed query terms. N and avgdl are
    * folded in as ONE broadcast 1-row aggregate over a single documents
    * scan — the whole query is one job, not three driver round-trips
    * (count + count + head) plus a double scan.
    */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(split(col("text"), " ")).cast("double")).as("avgdl"))
    val tf = termFreqs(spark, dir)
      .filter(col("word").isin(QueryTerms.map(lit): _*))
    val dfreq = tf.groupBy("word").agg(countDistinct(col("doc_id")).as("dfreq"))
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("double").as("dl"))
    tf.join(dfreq, "word").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0))
      .withColumn("term_score",
        col("idf") * (col("tf") * (Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("term_score")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf" -> qTfidf,
    "q_bm25" -> qBm25)

  private val TfSql =
    """tf AS MATERIALIZED (
      |  SELECT doc_id, word, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY doc_id, word),
      |nn AS (SELECT count(*) AS n FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_tfidf" ->
      s"""WITH $TfSql,
         |dfreq AS (SELECT word, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY word),
         |scored AS (
         |  SELECT tf.doc_id, tf.word, tf.tf,
         |    round(tf.tf * ln((SELECT n FROM nn) / CAST(dfreq AS DOUBLE)), 6) AS tfidf
         |  FROM tf JOIN dfreq USING (word) WHERE tf.doc_id < 50)
         |SELECT doc_id, word, tf, tfidf, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, word) AS rk FROM scored)
         |WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "q_bm25" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(",")
      s"""WITH $TfSql,
         |qtf AS (SELECT * FROM tf WHERE word IN ($terms)),
         |dfreq AS (SELECT word, count(DISTINCT doc_id) AS dfreq FROM qtf GROUP BY word),
         |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
         |ad AS (SELECT avg(dl) AS avgdl FROM dl)
         |SELECT doc_id,
         |  round(sum(
         |    ln(((SELECT n FROM nn) - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
         |    * (tf * ($Bm25K1 + 1.0)) /
         |      (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / (SELECT avgdl FROM ad)))), 6)
         |    AS bm25,
         |  count(*) AS n_terms_hit
         |FROM qtf JOIN dfreq USING (word) JOIN dl USING (doc_id)
         |GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    })
}
