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

  /** (doc_id, bm25, n_terms_hit) for every document hitting ≥1 query
    * term. N and avgdl are folded in as ONE broadcast 1-row aggregate
    * over a single documents scan — the whole query is one job, not
    * three driver round-trips (count + count + head) plus a double
    * scan.
    */
  private def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
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
  }

  /** BM25 top-20 documents for the fixed query terms. */
  def qBm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  val RrfK = 60      // the standard reciprocal-rank-fusion damping constant
  val RrfPool = 50   // per-leg candidate pool
  val RrfTopK = 20

  /** Reciprocal-rank fusion of the keyword leg (BM25) and the vector
    * leg (cosine vs the vec_id=0 probe): score = Σ 1/(60 + rank) over
    * the legs that retrieved the doc — the standard hybrid-retrieval
    * combiner when the two scorers' scales aren't comparable (the
    * weighted-sum variant is qHybridSearch). Rank 0 in the output
    * means "not in that leg's pool".
    *
    * Scale shape: each leg is TakeOrdered into a 50-row pool (per-
    * partition heaps — no global sort, no single-partition window over
    * the corpus); ranking and fusion then run on 2×50 bounded rows.
    */
  def qRrf(spark: SparkSession, dir: String): DataFrame = {
    val bm = TopKUtil.globalTopK(bm25Scored(spark, dir), RrfPool, "doc_id",
        col("bm25").desc, col("doc_id"))
      .select(col("doc_id"), col("rk").cast("long").as("rank_bm25"))
    val e = Similarity.vectors(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("score", round(
        Similarity.dotCol(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
    val vec = TopKUtil.globalTopK(scored, RrfPool, "vec_id",
        col("score").desc, col("vec_id"))
      .select(col("vec_id").as("doc_id"), col("rk").cast("long").as("rank_vec"))
    bm.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("rank_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_vec")), lit(0.0)), 6))
      .select(col("doc_id"),
        coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
        coalesce(col("rank_vec"), lit(0L)).as("rank_vec"),
        col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(RrfTopK)
  }

  val DsMaxDfFrac = 0.95 // drop terms in > 95% of docs (stop-term guard)
  val DsMinCos = 0.9     // report pairs at or above this cosine

  /** Sparse "more like this": TF-IDF cosine between DOCUMENTS via an
    * inverted-index self-join — the lexical counterpart of the
    * embedding near-dup pass, and the classic related-articles
    * primitive. idf = ln(1 + N/df) (smoothed: positive even for
    * near-universal terms, which the synthetic corpus is full of).
    * Terms in more than DsMaxDfFrac of the corpus are dropped BEFORE
    * the join — true stopwords carry ~zero idf weight but quadratic
    * posting-list fan-out (the same skew guard as the containment
    * dedup's stop-shingle cap); norms use the same capped term space,
    * so cosine is exact within it and the oracle replays it.
    *
    * Scale shape: the pair join is keyed on the term with the
    * hottest posting lists removed, dot products are one
    * map-side-combined groupBy on (a, b), and norms ride two
    * doc-keyed joins — never an all-pairs document join. (On a truly
    * web-scale corpus the cap plus an LSH pre-block — qDedupMinhash's
    * band join — bounds the candidate set; here the corpus is dense
    * by construction and the threshold does the bounding.)
    */
  def qDocSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreqs(spark, dir)
    val nDf = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val dfq = tf.groupBy("word").agg(countDistinct(col("doc_id")).as("dfreq"))
    val wts = tf.join(dfq, "word")
      .crossJoin(broadcast(nDf))
      .filter(col("dfreq") <= col("n_docs") * DsMaxDfFrac)
      .select(col("doc_id"), col("word"),
        (col("tf") * log(lit(1.0) + col("n_docs") / col("dfreq"))).as("wt"))
      .localCheckpoint(false) // read by the norm agg AND both join legs
    val norms = wts.groupBy("doc_id")
      .agg(sqrt(sum(col("wt") * col("wt"))).as("nrm"))
    wts.select(col("doc_id").as("a"), col("word"), col("wt").as("wa"))
      .join(wts.select(col("doc_id").as("b"), col("word"), col("wt").as("wb")), "word")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("a"), col("nrm").as("na")), "a")
      .join(norms.select(col("doc_id").as("b"), col("nrm").as("nb")), "b")
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= DsMinCos)
      .select("a", "b", "cosine")
      .orderBy("a", "b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf" -> qTfidf,
    "q_bm25" -> qBm25,
    "q_doc_similarity" -> qDocSimilarity,
    "q_rrf" -> qRrf)

  private val TfSql =
    """tf AS MATERIALIZED (
      |  SELECT doc_id, word, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY doc_id, word),
      |nn AS (SELECT count(*) AS n FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_doc_similarity" ->
      s"""WITH $TfSql,
         |dfq AS (SELECT word, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY word),
         |wts AS MATERIALIZED (
         |  SELECT doc_id, word,
         |    tf * ln(1.0 + (SELECT n FROM nn) / CAST(dfreq AS DOUBLE)) AS wt
         |  FROM tf JOIN dfq USING (word)
         |  WHERE dfreq <= (SELECT n FROM nn) * $DsMaxDfFrac),
         |nrm AS MATERIALIZED (
         |  SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM wts GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, sum(a.wt * b.wt) AS dot
         |  FROM wts a JOIN wts b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT p.a, p.b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
         |FROM p JOIN nrm na ON p.a = na.doc_id JOIN nrm nb ON p.b = nb.doc_id
         |WHERE round(dot / (na.nrm * nb.nrm), 6) >= $DsMinCos
         |ORDER BY a, b""".stripMargin,
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
    "q_bm25" ->
      s"""WITH $Bm25Ctes
         |SELECT doc_id, bm25, n_terms_hit FROM bmdocs
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_rrf" ->
      s"""WITH $Bm25Ctes,
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |bmleg AS (
         |  SELECT doc_id, rank_bm25 FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25
         |    FROM bmdocs)
         |  WHERE rank_bm25 <= $RrfPool),
         |vecleg AS (
         |  SELECT doc_id, rank_vec FROM (
         |    SELECT vec_id AS doc_id, row_number() OVER (ORDER BY
         |      round(${Similarity.cosineDuckSql("v", "qv")}, 6) DESC, vec_id) AS rank_vec
         |    FROM e CROSS JOIN q WHERE vec_id <> 0)
         |  WHERE rank_vec <= $RrfPool)
         |SELECT doc_id, coalesce(rank_bm25, 0) AS rank_bm25,
         |  coalesce(rank_vec, 0) AS rank_vec, rrf
         |FROM (
         |  SELECT doc_id, rank_bm25, rank_vec,
         |    round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + rank_bm25), 0)
         |      + coalesce(CAST(1 AS DOUBLE) / ($RrfK + rank_vec), 0), 6) AS rrf
         |  FROM bmleg FULL OUTER JOIN vecleg USING (doc_id))
         |ORDER BY rrf DESC, doc_id LIMIT $RrfTopK""".stripMargin)

  /** Shared CTE chain ending in `bmdocs(doc_id, bm25, n_terms_hit)`. */
  private def Bm25Ctes: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(",")
    s"""$TfSql,
       |qtf AS (SELECT * FROM tf WHERE word IN ($terms)),
       |dfreq AS (SELECT word, count(DISTINCT doc_id) AS dfreq FROM qtf GROUP BY word),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
       |ad AS (SELECT avg(dl) AS avgdl FROM dl),
       |bmdocs AS MATERIALIZED (
       |  SELECT doc_id,
       |    round(sum(
       |      ln(((SELECT n FROM nn) - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
       |      * (tf * ($Bm25K1 + 1.0)) /
       |        (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / (SELECT avgdl FROM ad)))), 6)
       |      AS bm25,
       |    count(*) AS n_terms_hit
       |  FROM qtf JOIN dfreq USING (word) JOIN dl USING (doc_id)
       |  GROUP BY doc_id)""".stripMargin
  }
}
