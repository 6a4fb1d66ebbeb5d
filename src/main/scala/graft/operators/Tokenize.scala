package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Subword tokenization — the wordpiece-style greedy longest-match
  * segmenter every training pipeline runs before packing: each word is
  * walked left-to-right, at every position the LONGEST vocabulary
  * piece is consumed (single characters are the implicit fallback, so
  * every word tokenizes — no UNK). The vocabulary is a fixed literal
  * (in production: the learned merges file, broadcast the same way).
  *
  * Scale shape: the whole segmentation is ONE per-row `aggregate` fold
  * over character positions — embarrassingly parallel per document,
  * zero shuffles before the per-doc/per-piece aggregations; the vocab
  * rides the plan as codegen'd IN-lists (no join, no UDF). The DuckDB
  * oracle replays the identical fold with list_reduce, so piece
  * boundaries match exactly.
  */
object Tokenize {

  /** Fixed demo vocabulary (multi-char pieces; singles are implicit). */
  val Subwords: Seq[String] = Seq(
    "customer", "column", "window", "spark", "chunk", "value", "table",
    "group", "order", "line", "part", "cust", "omer", "win", "dow",
    "row", "val", "ing", "ion", "ue", "er", "ed", "re", "or", "an",
    "en", "ar", "on", "in", "st")

  private val byLen: Map[Int, Seq[String]] = Subwords.groupBy(_.length)
  private val lensDesc: Seq[Int] = byLen.keys.toSeq.sorted(Ordering[Int].reverse)

  /** Piece length consumed at position p of word w: longest vocab
    * match, else 1 (single-char fallback). Length-homogeneous IN-lists
    * make end-of-word probes safe: a truncated substr can never equal
    * a piece of the probed length.
    */
  private def pieceLen(w: Column, p: Column): Column =
    lensDesc.tail.foldLeft(
      when(substr(w, p, lit(lensDesc.head)).isin(byLen(lensDesc.head).map(lit): _*),
        lensDesc.head))(
      (acc, l) => acc.when(substr(w, p, lit(l)).isin(byLen(l).map(lit): _*), l))
      .otherwise(1)

  /** Greedy segmentation of one word into its pieces (array<string>):
    * fold over char positions; a position is a consume point iff it
    * equals the accumulator's cursor.
    */
  def subwordPieces(w: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(1).as("p"), array().cast("array<string>").as("parts")),
      (acc, i) => {
        val l = pieceLen(w, acc.getField("p"))
        when(i === acc.getField("p"),
          struct((acc.getField("p") + l).as("p"),
            concat(acc.getField("parts"),
              array(substr(w, acc.getField("p"), l))).as("parts")))
          .otherwise(acc)
      },
      acc => acc.getField("parts"))

  /** (doc_id, word, parts) via the NATIVE segmentation expression
    * (graft.functions.SubwordSplit): the HOF fold is CodegenFallback
    * (lambda-bearing), and driving it from a Generate costs ~4 s at
    * sf0.1; the generated-code walk is ~20× faster and spec-proved
    * piece-identical to the portable fold (`subwordPieces`).
    */
  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("parts", graft.functions.SubwordSplit.subword_split(col("word")))

  /** Per-document subword statistics (the packing-input numbers). */
  def qTokenizeSubword(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("parts"))).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        round(col("n_pieces") / col("n_words").cast("double"), 6).as("pieces_per_word"))
      .orderBy("doc_id")

  val VocabTopK = 25

  /** Corpus subword frequencies, top-K (the merges-audit view). */
  def qSubwordVocab(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(explode(col("parts")).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(VocabTopK)

  /** Per-language tokenizer fertility — the vocab-allocation metric
    * (how many subword pieces a language pays per word / per 100
    * chars): languages with high fertility are under-served by the
    * vocabulary and the merges budget should shift toward them.
    * Ratios ride the integer micro-grid (sum·10⁶ div count) so both
    * engines agree in any summation order.
    *
    * Scale shape: same single segmentation pass as the other two
    * tokenizer queries (native codegen'd walk, zero pre-agg shuffles),
    * then a map-side-combined rollup to #languages rows.
    */
  def qTokenFertility(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("parts"))).as("n_pieces"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .withColumn("fertility",
        round(expr("n_pieces * 1000000 div n_words") / lit(1e6), 6))
      .withColumn("pieces_per_100ch",
        round(expr("n_pieces * 100000000 div n_chars") / lit(1e6), 6))
      .select("lang", "n_words", "n_pieces", "n_chars",
        "fertility", "pieces_per_100ch")
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tokenize_subword" -> qTokenizeSubword,
    "q_token_fertility" -> qTokenFertility,
    "q_subword_vocab" -> qSubwordVocab)

  /** The same greedy walk in DuckDB as a per-word recursive CTE (one
    * recursion step per consumed piece; a truncated end-of-word probe
    * can never match a longer piece, so the cursor lands on exactly
    * length+1 — the unique final row per word). DuckDB 1.0's
    * list_reduce mis-evaluates struct accumulators, so the fold form
    * is not portable there.
    */
  private def pieceLenSql(w: String, p: String): String = {
    val cases = lensDesc.map { l =>
      val in = byLen(l).map(s => s"'$s'").mkString(", ")
      s"WHEN substr($w, $p, $l) IN ($in) THEN $l"
    }.mkString(" ")
    s"CASE $cases ELSE 1 END"
  }

  private def tokSql: String = {
    val lenAcc = pieceLenSql("w.word", "k.p")
    s"""w AS MATERIALIZED (
       |  SELECT doc_id, pos, word FROM (SELECT doc_id,
       |      unnest(string_split(text, ' ')) AS word,
       |      unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
       |    FROM documents)
       |  WHERE length(word) > 0),
       |walk(doc_id, pos, p, parts) AS (
       |  SELECT doc_id, pos, 1, CAST([] AS VARCHAR[]) FROM w
       |  UNION ALL
       |  SELECT k.doc_id, k.pos, k.p + $lenAcc,
       |    list_append(k.parts, substr(w.word, k.p, $lenAcc))
       |  FROM walk k JOIN w ON w.doc_id = k.doc_id AND w.pos = k.pos
       |  WHERE k.p <= length(w.word)),
       |tok AS MATERIALIZED (
       |  SELECT k.doc_id, k.parts FROM walk k JOIN w USING (doc_id, pos)
       |  WHERE k.p > length(w.word))""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_tokenize_subword" ->
      s"""WITH RECURSIVE $tokSql
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(parts)) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(len(parts)) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
         |    AS pieces_per_word
         |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_subword_vocab" ->
      s"""WITH RECURSIVE $tokSql
         |SELECT piece, count(*) AS n
         |FROM (SELECT unnest(parts) AS piece FROM tok)
         |GROUP BY piece ORDER BY n DESC, piece LIMIT $VocabTopK""".stripMargin,
    "q_token_fertility" ->
      s"""WITH RECURSIVE $tokSql,
         |wa AS (
         |  SELECT d.lang, count(*) AS n_words,
         |    CAST(sum(length(w.word)) AS BIGINT) AS n_chars
         |  FROM w JOIN documents d USING (doc_id) GROUP BY d.lang),
         |pc AS (
         |  SELECT d.lang, CAST(sum(len(parts)) AS BIGINT) AS n_pieces
         |  FROM tok JOIN documents d USING (doc_id) GROUP BY d.lang)
         |SELECT lang, n_words, n_pieces, n_chars,
         |  round((n_pieces * 1000000 // n_words) / 1000000.0, 6) AS fertility,
         |  round((n_pieces * 100000000 // n_chars) / 1000000.0, 6)
         |    AS pieces_per_100ch
         |FROM wa JOIN pc USING (lang) ORDER BY lang""".stripMargin)
}
