package graft.operators

import graft.Ckpt.BarrierOps
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

  val QlMu = 100.0 // Dirichlet smoothing mass (μ), sized to ~doc length
  val QlTopK = 20

  /** Query-likelihood ranking with Dirichlet smoothing (Zhai &
    * Lafferty 2001) — the language-modeling member of the classical
    * ranking triad next to BM25 and TF-IDF: score(d) = Σ_t ln((tf +
    * μ·cf/|C|)/(|d| + μ)) over the query terms, candidates = docs
    * hitting ≥1 term. Per-term log-probs quantize to the integer
    * micro-grid BEFORE the per-doc sum (3 doubles summed in engine-
    * specific order could flip the 6th decimal); collection stats
    * (per-term cf, total token count) fold in as broadcast 1-row/
    * 3-row aggregates, never driver scalars.
    *
    * Scale shape: the (doc, word) TF aggregate is the same single
    * exchange BM25 pays; the candidate grid is |cands|×|Q| rows via
    * broadcast joins; top-k is TakeOrdered.
    */
  def qQlRanking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stats = docs.agg(
      sum(size(split(col("text"), " ")).cast("long")).as("coll_tokens"))
    val qtf = termFreqs(spark, dir)
      .filter(col("word").isin(QueryTerms.map(lit): _*))
    val cf = qtf.groupBy("word").agg(sum(col("tf")).as("cf"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    qtf.select("doc_id").distinct()
      .join(dl, "doc_id")
      .crossJoin(broadcast(cf))
      .join(qtf, Seq("doc_id", "word"), "left")
      .na.fill(0L, Seq("tf"))
      .crossJoin(broadcast(stats))
      .withColumn("lp_micro", round(log(
        (col("tf") + lit(QlMu) * col("cf") / col("coll_tokens")) /
          (col("dl") + lit(QlMu))) * lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("lp_micro")).as("qlm"),
        sum(when(col("tf") > 0, 1L).otherwise(0L)).as("n_terms_hit"))
      .withColumn("ql", round(col("qlm") / lit(1e6), 6))
      .select("doc_id", "n_terms_hit", "ql")
      .orderBy(col("ql").desc, col("doc_id"))
      .limit(QlTopK)
  }

  val PrfPool = 10      // pseudo-relevant pool (BM25 top-N)
  val PrfTopTerms = 10  // expansion terms emitted

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM3-lite):
    * take the BM25 top-PrfPool documents as the pseudo-relevant set
    * and score every term they contain by pool-TF × smoothed IDF —
    * the terms a retrieval layer appends to the query for a second
    * pass. Original query terms are excluded; weights ride the
    * integer micro-grid (one multiply per row — no float summation).
    *
    * Scale shape: the pool is a TakeOrdered PrfPool-row set broadcast
    * into the (already map-side-combined) term-frequency aggregate,
    * so pool term statistics aggregate over ≤ pool·doclen rows; the
    * corpus-wide document-frequency shuffle is the same single (word)
    * exchange TF-IDF already pays — nothing new scales with N.
    */
  def qPrfExpansion(spark: SparkSession, dir: String): DataFrame = {
    val pool = TopKUtil.globalTopK(bm25Scored(spark, dir), PrfPool,
        "doc_id", col("bm25").desc, col("doc_id"))
      .select("doc_id")
    val tf = termFreqs(spark, dir)
    val nDf = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val dfq = tf.groupBy("word").agg(countDistinct(col("doc_id")).as("dfreq"))
    tf.join(broadcast(pool), "doc_id")
      .groupBy("word")
      .agg(sum(col("tf")).as("pool_tf"), count(lit(1)).as("pool_df"))
      .join(dfq, "word")
      .crossJoin(broadcast(nDf))
      .filter(!col("word").isin(QueryTerms.map(lit): _*))
      .withColumn("weight_micro",
        round(col("pool_tf") * log(lit(1.0) + col("n_docs") / col("dfreq")) * lit(1e6))
          .cast("long"))
      .select("word", "pool_tf", "pool_df", "dfreq", "weight_micro")
      .orderBy(col("weight_micro").desc, col("word"))
      .limit(PrfTopTerms)
  }

  val DsSlots = 64  // feature-hash slots (vocabulary-size independent)
  val DsProbes = 20 // related-articles probe set: doc_id < DsProbes
  val DsTopK = 5

  /** Lexical "related articles": top-k TF-IDF-cosine neighbors from
    * the corpus for each probe article — the serving shape of
    * more-like-this (per-article on demand), not an all-pairs sweep.
    *
    * Two corpus-killers are designed out. (1) The naive
    * inverted-index self-join is quadratic on this corpus (31-word
    * vocabulary ⇒ every posting list is ~80% of the corpus; measured
    * 92 s at sf0.1, and the vectors are too mutually similar for LSH
    * to separate 0.9 from the 0.6 median). Instead each doc's TF-IDF
    * weights (idf = ln(1 + N/df), smoothed) are FEATURE-HASHED into
    * DsSlots dense slots (the hashing trick — md5(word) mod slots, so
    * vocabulary size never matters), with weights quantized to
    * integer micro-units BEFORE the slot sum so the sum is
    * associative and engine-exact. (2) Scoring is a broadcast of the
    * probe batch against ONE corpus scan (64-long dot per probe per
    * doc — linear in the corpus), and per-probe top-k runs through
    * the TopKPerGroup heap operator, never a corpus-sized rank
    * window.
    */
  def qDocSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreqs(spark, dir)
    val nDf = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val dfq = tf.groupBy("word").agg(countDistinct(col("doc_id")).as("dfreq"))
    val sv = tf.join(dfq, "word")
      .crossJoin(broadcast(nDf))
      .select(col("doc_id"),
        (conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long") % DsSlots)
          .cast("int").as("slot"),
        round(col("tf") * log(lit(1.0) + col("n_docs") / col("dfreq")) * 1e6)
          .cast("long").as("wq"))
      .groupBy("doc_id", "slot").agg(sum(col("wq")).as("w"))
    val vecs = sv.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("w")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(DsSlots - 1)),
          i => coalesce(element_at(col("m"), i.cast("int")), lit(0L)).cast("double"))
          .as("v"))
      .withColumn("nrm", Similarity.normCol(col("v")))
      .barrier(false) // read by the probe side AND the corpus scan
    val probes = vecs.filter(col("doc_id") < DsProbes)
      .select(col("doc_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val scored = vecs.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b"),
        round(Similarity.dotCol(col("va"), col("v")) / (col("na") * col("nrm")), 6)
          .as("cosine"))
    graft.plans.TopKPerGroup.topK(scored, DsTopK, Seq("a"), "cosine", "b")
      .withColumn("rk", row_number().over(
        Window.partitionBy("a").orderBy(col("cosine").desc, col("b"))))
      .select("a", "b", "cosine", "rk")
      .orderBy("a", "rk")
  }

  val PassageTopK = 20

  /** Best-passage retrieval — chunk-level BM25 with the best chunk
    * per document, globally top-K (the passage-selection stage a RAG
    * server runs between document retrieval and context assembly —
    * q_rag_context consumes whole chunk sets; this ranks WITHIN the
    * document and surfaces the single snippet worth quoting).
    *
    * Scale shape: corpus statistics are a broadcast 1-row aggregate;
    * query-term postings shrink at the explode filter (only query
    * words survive the narrow pass); best-per-doc goes through the
    * TopKPerGroup heap (k=1 — never a per-doc rank window over all
    * passages), and the global cut is a PassageTopK-row TakeOrdered.
    */
  def qPassageRank(spark: SparkSession, dir: String): DataFrame = {
    val ch = TextPipeline.chunks(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("n_words").cast("double").as("dl"))
    val stats = ch.agg(count(lit(1)).cast("double").as("n_ch"),
      avg(col("dl")).as("avgdl"))
    val tf = ch.select(col("doc_id"), col("chunk_id"), col("dl"),
        explode(split(col("chunk_text"), " ")).as("word"))
      .filter(col("word").isin(QueryTerms.map(lit): _*))
      .groupBy("doc_id", "chunk_id", "dl", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("dfreq"))
    val scored = tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .withColumn("term_score",
        log((col("n_ch") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0)
          * (col("tf") * (Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1)
            * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id", "chunk_id")
      .agg(round(sum(col("term_score")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
    graft.plans.TopKPerGroup.topK(scored, 1, Seq("doc_id"), "bm25", "chunk_id")
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(PassageTopK)
      .select("doc_id", "chunk_id", "bm25", "n_terms_hit")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_passage_rank" -> qPassageRank,
    "q_tfidf" -> qTfidf,
    "q_bm25" -> qBm25,
    "q_prf_expansion" -> qPrfExpansion,
    "q_ql_ranking" -> qQlRanking,
    "q_doc_similarity" -> qDocSimilarity,
    "q_rrf" -> qRrf)

  private val TfSql =
    """tf AS MATERIALIZED (
      |  SELECT doc_id, word, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY doc_id, word),
      |nn AS (SELECT count(*) AS n FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_passage_rank" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(",")
      s"""WITH ${TextPipeline.ChunksSql},
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_ch,
         |  avg(CAST(n_words AS DOUBLE)) AS avgdl FROM chunks),
         |ctf AS MATERIALIZED (
         |  SELECT doc_id, chunk_id, CAST(n_words AS DOUBLE) AS dl, word,
         |    count(*) AS tf
         |  FROM (SELECT doc_id, chunk_id, n_words,
         |      unnest(string_split(chunk_text, ' ')) AS word FROM chunks)
         |  WHERE word IN ($terms)
         |  GROUP BY doc_id, chunk_id, n_words, word),
         |cdf AS (SELECT word, count(*) AS dfreq FROM ctf GROUP BY word),
         |sc AS MATERIALIZED (
         |  SELECT doc_id, chunk_id,
         |    round(sum(
         |      ln(((SELECT n_ch FROM st) - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
         |      * (tf * ${Bm25K1 + 1.0}) /
         |        (tf + $Bm25K1 * (1.0 - $Bm25B
         |          + $Bm25B * dl / (SELECT avgdl FROM st)))), 6) AS bm25,
         |    count(*) AS n_terms_hit
         |  FROM ctf JOIN cdf USING (word)
         |  GROUP BY doc_id, chunk_id),
         |best AS (SELECT doc_id, chunk_id, bm25, n_terms_hit FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY bm25 DESC, chunk_id) AS rn FROM sc)
         |  WHERE rn = 1)
         |SELECT doc_id, chunk_id, bm25, n_terms_hit FROM best
         |ORDER BY bm25 DESC, doc_id LIMIT $PassageTopK""".stripMargin
    },
    "q_doc_similarity" -> {
      val dot = Similarity.dotDuckSql("p.va", "e.v")
      s"""WITH $TfSql,
         |dfq AS (SELECT word, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY word),
         |sv AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) % $DsSlots AS INTEGER)
         |      AS slot,
         |    CAST(sum(CAST(round(tf * ln(1.0 + (SELECT n FROM nn)
         |      / CAST(dfreq AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS w
         |  FROM tf JOIN dfq USING (word)
         |  GROUP BY doc_id, slot),
         |dense AS (
         |  SELECT d.doc_id, s.slot, coalesce(sv.w, 0) AS w
         |  FROM (SELECT DISTINCT doc_id FROM sv) d
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${DsSlots - 1})) AS slot) s
         |  LEFT JOIN sv ON sv.doc_id = d.doc_id AND sv.slot = s.slot),
         |e AS MATERIALIZED (
         |  SELECT doc_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         |  FROM (SELECT doc_id, list(CAST(w AS DOUBLE) ORDER BY slot) AS v
         |        FROM dense GROUP BY doc_id)),
         |p AS (SELECT doc_id AS a, v AS va, nrm AS na FROM e WHERE doc_id < $DsProbes),
         |scored AS (
         |  SELECT p.a, e.doc_id AS b,
         |    round($dot / (p.na * e.nrm), 6) AS cosine
         |  FROM e CROSS JOIN p WHERE e.doc_id <> p.a)
         |SELECT a, b, cosine, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rk
         |  FROM scored)
         |WHERE rk <= $DsTopK ORDER BY a, rk""".stripMargin
    },
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
    "q_ql_ranking" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(",")
      s"""WITH $TfSql,
         |qtf AS (SELECT * FROM tf WHERE word IN ($terms)),
         |cf AS (SELECT word, CAST(sum(tf) AS BIGINT) AS cf
         |  FROM qtf GROUP BY word),
         |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
         |    AS dl FROM documents),
         |ct AS (SELECT CAST(sum(dl) AS BIGINT) AS coll_tokens FROM dl),
         |grid AS (
         |  SELECT c.doc_id, dl.dl, cf.cf, coalesce(q.tf, 0) AS tf,
         |    ct.coll_tokens
         |  FROM (SELECT DISTINCT doc_id FROM qtf) c
         |  JOIN dl USING (doc_id) CROSS JOIN cf
         |  LEFT JOIN qtf q ON q.doc_id = c.doc_id AND q.word = cf.word
         |  CROSS JOIN ct),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(sum(CAST(round(ln((tf + $QlMu * cf / coll_tokens)
         |      / (dl + $QlMu)) * 1e6) AS BIGINT)) AS BIGINT) AS qlm,
         |    CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_terms_hit
         |  FROM grid GROUP BY doc_id)
         |SELECT doc_id, n_terms_hit, round(qlm / 1000000.0, 6) AS ql
         |FROM sc ORDER BY ql DESC, doc_id LIMIT $QlTopK""".stripMargin
    },
    "q_prf_expansion" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(",")
      s"""WITH $Bm25Ctes,
         |pool AS (SELECT doc_id FROM bmdocs
         |  ORDER BY bm25 DESC, doc_id LIMIT $PrfPool),
         |ptf AS (SELECT word, CAST(sum(tf) AS BIGINT) AS pool_tf,
         |    CAST(count(*) AS BIGINT) AS pool_df
         |  FROM tf JOIN pool USING (doc_id) GROUP BY word),
         |adf AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfreq
         |  FROM tf GROUP BY word)
         |SELECT word, pool_tf, pool_df, dfreq,
         |  CAST(round(pool_tf * ln(1.0 + (SELECT n FROM nn)
         |    / CAST(dfreq AS DOUBLE)) * 1e6) AS BIGINT) AS weight_micro
         |FROM ptf JOIN adf USING (word)
         |WHERE word NOT IN ($terms)
         |ORDER BY weight_micro DESC, word LIMIT $PrfTopTerms""".stripMargin
    },
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
