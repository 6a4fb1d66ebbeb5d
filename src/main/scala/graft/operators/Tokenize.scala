package graft.operators

import graft.Ckpt.BarrierOps
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

  val BpeRounds = 6

  /** BPE merge learning (Sennrich et al. 2016) — the distributed
    * counterpart of the tokenizer-training loop that PRODUCES the
    * merges file the greedy segmenter above consumes: start from
    * per-word character sequences (+ `</w>` end marker), and for
    * BpeRounds rounds (a) count adjacent symbol pairs weighted by word
    * frequency, (b) pick the most frequent pair (ties → lexicographic),
    * (c) merge its adjacent occurrences left-to-right in every word.
    *
    * The merge is ONE per-row fold: out = if last(out)==a ∧ x==b then
    * replace-last-with-ab else append — exact left-to-right BPE
    * semantics (a just-merged `ab` can never equal the left symbol
    * `a`, so runs like `aaa` merge at alternate positions, matching
    * the reference implementation). The oracle can't run that fold
    * (DuckDB's list_reduce mis-evaluates struct accumulators — see
    * tokSql note), so it replays the PROVABLY equivalent gaps-and-
    * islands form: within each run of consecutive matching positions,
    * merge the odd offsets.
    *
    * Scale shape: the corpus collapses to the (word, freq) vocabulary
    * ONCE (the only corpus-sized shuffle, carrying bare words); every
    * round after is vocabulary-sized — pair counting is map-side
    * combined, the best pair is TakeOrdered(1) broadcast back, the
    * merge fold is narrow per word. 100 TB of text with a 10M-word
    * vocabulary trains in rounds × vocabulary cost, exactly like the
    * single-node reference loop but with each round a parallel pass.
    */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeRun(spark, dir)._1

  /** The vocabulary frame after the last merge round (qBpeVocab's input). */
  private def bpeFinalVocab(spark: SparkSession, dir: String): DataFrame =
    bpeRun(spark, dir)._2

  /** (merge table, final vocabulary) — see qBpeTrain. */
  private def bpeRun(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val v0 = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat(
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        array(lit("</w>"))))
    var vocab = v0.barrier(false)
    val merges = Seq.newBuilder[DataFrame]
    for (r <- 1 to BpeRounds) {
      // fully-merged single-symbol words contribute no pairs: Spark's
      // sequence(1, 0) DESCENDS (it is empty in DuckDB/Postgres), so an
      // unguarded size-1 syms would probe element_at(syms, 2) and throw
      // — bitten by corpora with a hyper-frequent short token whose
      // merges chain to completion inside BpeRounds (the oracle's
      // generate_series(1, 0) is already empty, so this guard is what
      // keeps both engines on the same semantics)
      val pairs = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(col("a").as("pa"), col("b").as("pb"), col("cnt"))
        .barrier(false) // 1 row: read by the merge fold AND the output
      merges += best.select(lit(r).as("step"), col("pa").as("lft"),
        col("pb").as("rgt"), concat(col("pa"), col("pb")).as("merged"),
        col("cnt").as("pair_count"))
      vocab = vocab.crossJoin(broadcast(best))
        .withColumn("syms", aggregate(
          col("syms"),
          array().cast("array<string>"),
          (out, x) => when(size(out) > 0
              && element_at(out, -1) === col("pa") && x === col("pb"),
            concat(slice(out, lit(1), size(out) - 1),
              array(concat(col("pa"), col("pb")))))
            .otherwise(concat(out, array(x)))))
        .select("word", "freq", "syms")
        .barrier(false) // vocabulary-sized; flattens per-round lineage
    }
    (merges.result().reduce(_ unionByName _).orderBy("step"), vocab)
  }

  val BpeVocabTopK = 20

  /** The symbol vocabulary AFTER the learned merges — the audit view
    * of qBpeTrain's output (what the merges actually did to the
    * corpus): explode the final per-word symbol sequences weighted by
    * word frequency, top-BpeVocabTopK by corpus occurrences. Shares
    * qBpeTrain's round structure (the final vocabulary frame is the
    * last round's checkpoint); one more vocabulary-sized explode +
    * map-side-combined count, top-k via TakeOrdered.
    */
  def qBpeVocab(spark: SparkSession, dir: String): DataFrame =
    bpeFinalVocab(spark, dir)
      .select(col("freq"), explode(col("syms")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(BpeVocabTopK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tokenize_subword" -> qTokenizeSubword,
    "q_token_fertility" -> qTokenFertility,
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_vocab" -> qBpeVocab,
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

  /** BPE oracle: BpeRounds unrolled. Merge step = gaps-and-islands —
    * hit positions i where (syms[i],syms[i+1]) = the best pair; within
    * each run of consecutive hits merge odd offsets (≡ the Spark fold,
    * see qBpeTrain); rebuild drops positions following a merge.
    */
  private def bpeSql: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT pr['a'] AS a, pr['b'] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
         |      i -> {'a': syms[i], 'b': syms[i + 1]})) AS pr
         |    FROM $prev)
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |hit$r AS (
         |  SELECT p.word, p.i FROM
         |    (SELECT word, unnest(generate_series(1, len(syms) - 1)) AS i, syms
         |     FROM $prev) p, b$r
         |  WHERE p.syms[p.i] = b$r.a AND p.syms[p.i + 1] = b$r.b),
         |mrg$r AS MATERIALIZED (
         |  SELECT word, i FROM (
         |    SELECT word, i, row_number() OVER (PARTITION BY word, i - rn ORDER BY i) AS off
         |    FROM (SELECT word, i, row_number() OVER (PARTITION BY word ORDER BY i) AS rn
         |      FROM hit$r))
         |  WHERE off % 2 = 1),
         |v$r AS MATERIALIZED (
         |  SELECT word, freq, list(sym ORDER BY j) AS syms FROM (
         |    SELECT q.word, q.freq, q.j,
         |      CASE WHEN m.i IS NOT NULL THEN (SELECT a || b FROM b$r)
         |           ELSE q.syms[q.j] END AS sym
         |    FROM (SELECT word, freq, unnest(generate_series(1, len(syms))) AS j, syms
         |      FROM $prev) q
         |    LEFT JOIN mrg$r m ON m.word = q.word AND m.i = q.j
         |    LEFT JOIN mrg$r m2 ON m2.word = q.word AND m2.i = q.j - 1
         |    WHERE m2.i IS NULL)
         |  GROUP BY word, freq)""".stripMargin
    }.mkString(",\n")
    val sels = (1 to BpeRounds).map(r =>
      s"SELECT $r AS step, a AS lft, b AS rgt, a || b AS merged, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |v0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    list_append(list_transform(generate_series(1, len(word)), i -> word[i:i]),
       |      '</w>') AS syms
       |  FROM w),
       |$rounds
       |$sels
       |ORDER BY step""".stripMargin
  }

  private def bpeVocabSql: String = {
    // same round CTEs as bpeSql, different head: final-vocab piece counts
    val body = bpeSql
    val prefix = body.substring(0, body.lastIndexOf("SELECT 1 AS step"))
    s"""${prefix}SELECT piece, CAST(sum(freq) AS BIGINT) AS n FROM (
       |  SELECT freq, unnest(syms) AS piece FROM v$BpeRounds)
       |GROUP BY piece ORDER BY n DESC, piece LIMIT $BpeVocabTopK""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_train" -> bpeSql,
    "q_bpe_vocab" -> bpeVocabSql,
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
