package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Text ingest pipeline: sentence split, chunking, gazetteer NER,
  * mention edges — the Spark re-expression of the reference ingest
  * (ref utils.py:14-38 chunking, crawler.py:88-118 chunk assembly,
  * ner.py:13-70 entity finding + adjacent merge).
  *
  * Design for scale: everything here is a narrow per-document pass
  * plus ONE shuffle on doc_id (window cumsum for chunk offsets); the
  * gazetteer is a broadcast dictionary join (the distributed stand-in
  * for model-based NER — at 100 TB you'd run inference the same way:
  * a per-partition map, never a shuffle of text).
  *
  * Chunking semantics (re-expression of the reference's greedy
  * sentence combiner): words are assigned to chunks by EXCLUSIVE
  * prefix sum of (len(word)+1) — chunk_id = floor(offset / L). This
  * is order-preserving, deterministic, and expressible identically in
  * ANSI SQL (the DuckDB oracle) and as a single Spark window.
  */
object TextPipeline {

  val ChunkLen = 64

  /** Gazetteer: the deterministic stand-in for GLiNER labels
    * person/organization/location (ref config.py RELEVANT_LABELS).
    * The synthetic corpus is lowercase, so capitalization NER is void.
    */
  val Gazetteer: Seq[(String, String)] = Seq(
    "customer" -> "person", "value" -> "person", "line" -> "person",
    "spark" -> "organization", "table" -> "organization",
    "part" -> "organization", "group" -> "organization",
    "row" -> "location", "column" -> "location", "window" -> "location")

  /** SQL literal for the gazetteer, shared by every oracle. */
  val GazetteerSql: String = Gazetteer
    .map { case (w, l) => s"('$w','$l')" }.mkString(", ")

  /** (doc_id, pos [1-based], word, off [exclusive char offset]). */
  def words(spark: SparkSession, dir: String): DataFrame =
    wordsOf(Tables.documents(spark, dir))

  /** The same tokenization over an arbitrary documents batch — the
    * ingest-side seam Catalog.mergeGraph derives a batch's chunk and
    * mention rows through (chunks/mentions are pure per-doc functions
    * of text, so batch-derived rows ARE the full-rebuild rows).
    */
  private[graft] def wordsOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "word")))
      .withColumn("pos", col("p0") + 1).drop("p0")
      .withColumn("off", coalesce(sum(length(col("word")) + 1).over(w), lit(0L)))
  }

  /** Words CTE for oracles (zipped unnest + exclusive window sum). */
  val WordsSql: String =
    """words AS MATERIALIZED (
      |  SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS word,
      |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      |  FROM documents),
      |woff AS MATERIALIZED (
      |  SELECT doc_id, pos, word,
      |    coalesce(sum(length(word) + 1) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM words)""".stripMargin

  def withChunkId(wordsDf: DataFrame): DataFrame =
    wordsDf.withColumn("chunk_id", floor(col("off") / ChunkLen).cast("int"))

  /** When this session conf holds the CURRENT sf dir and the bucketed
    * tables exist, chunks()/mentions() serve Catalog.materializeGraph's
    * tables instead of recomputing the pipeline from the documents scan
    * — the production amortization path (write once per ingest, every
    * graph/cypher query reads the bucketed layout shuffle-free).
    * Dir-keyed so a stale materialization for another scale factor is
    * never served silently.
    */
  val MaterializedConf = "spark.graft.materializedGraphDir"

  private def materialized(spark: SparkSession, dir: String, table: String): Option[DataFrame] =
    if (spark.conf.getOption(MaterializedConf).contains(dir)
        && spark.catalog.tableExists(table)) Some(spark.table(table))
    else None

  /** Chunk table: (doc_id, chunk_id, chunk_text, n_chars, n_words).
    * NOTE: deliberately NOT cache()d — an InMemoryRelation here hides
    * runtime statistics from AQE and downstream joins lose their
    * broadcast/coalesce decisions (measured 7x slowdown on the
    * iterative graph queries). Cross-query reuse belongs to the
    * bucketed tables Catalog.materializeGraph writes (see
    * MaterializedConf).
    */
  def chunks(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "graft_chunks")
      .getOrElse(chunksOf(Tables.documents(spark, dir)))

  /** Chunk rows for an arbitrary documents batch (see wordsOf). */
  private[graft] def chunksOf(docs: DataFrame): DataFrame =
    chunksOfWords(withChunkId(wordsOf(docs)))

  /** The chunk aggregation over an already-built chunked-words table —
    * split out so Catalog.materializeGraph can derive chunks AND
    * mentions from ONE checkpointed words pass instead of re-running
    * the word-explode + offset window per table (round 11).
    */
  private[graft] def chunksOfWords(words: DataFrame): DataFrame =
    words
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        concat_ws(" ", graft.functions.SortedField.sorted_field(
          collect_list(struct(col("pos"), col("word"))), 1)).as("chunk_text"),
        count(lit(1)).cast("long").as("n_words"))
      .withColumn("n_chars", length(col("chunk_text")).cast("long"))

  val ChunksPieceSql: String =
    s"""chunks AS MATERIALIZED (
       |  SELECT doc_id, CAST(floor(off / $ChunkLen) AS INT) AS chunk_id,
       |    string_agg(word, ' ' ORDER BY pos) AS chunk_text,
       |    count(*) AS n_words
       |  FROM woff GROUP BY doc_id, CAST(floor(off / $ChunkLen) AS INT))""".stripMargin

  val ChunksSql: String = s"$WordsSql,\n$ChunksPieceSql"

  def qChunk(spark: SparkSession, dir: String): DataFrame =
    chunks(spark, dir)
      .select("doc_id", "chunk_id", "chunk_text", "n_chars", "n_words")
      .orderBy("doc_id", "chunk_id")

  /** Chunk-level exact dedup — RAG-index hygiene: a chunk repeated
    * across syndicated articles floods vector/fulltext top-k with
    * identical passages, so the index build dedups at CHUNK
    * granularity, not document granularity (doc-level dedup misses
    * partial syndication). Duplicate chunk groups by md5 identity
    * with copy/distinct-doc counts and the canonical first doc; the
    * retrieval-index analogue of Dedup.qDedupExact. Only 16-byte
    * hashes cross the one exchange — chunk text never shuffles.
    */
  def qChunkDedup(spark: SparkSession, dir: String): DataFrame =
    chunks(spark, dir)
      .select(col("doc_id"), md5(col("chunk_text")).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_copies") > 1)
      .select("h", "n_copies", "n_docs", "first_doc")
      .orderBy("h")

  /** The SAME chunk table as `chunks`, computed as one per-document
    * fold instead of the word-explode + window-cumsum plan: a walk
    * over a doc's words carrying (char offset, current chunk id,
    * buffer), flushing whenever floor(off/L) advances — chunk ids may
    * skip (a long word can jump a chunk boundary), so each emitted
    * chunk carries its id.
    *
    * ZERO exchanges (TextPipelineSpec asserts it): chunking is
    * embarrassingly parallel per document, and this plan keeps it that
    * way — the windowed variant shuffles every word on doc_id. The
    * fold is the native codegen ChunkFold expression (one generated
    * walk, no per-word array copies); `chunksFoldHof` below keeps the
    * portable HOF twin whose row-equality the spec proves. The trade
    * vs the windowed plan wins when the corpus-wide word shuffle —
    * not CPU — is the bottleneck, which is the 100 TB regime. The
    * oracle is the same SQL as q_chunk.
    */
  def chunksFold(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.ChunkFold.chunk_fold(col("text"), ChunkLen)).as("c"))
      .select(col("doc_id"),
        col("c.cid").as("chunk_id"),
        col("c.text").as("chunk_text"),
        length(col("c.text")).cast("long").as("n_chars"),
        size(split(col("c.text"), " ")).cast("long").as("n_words"))

  /** The original portable HOF `aggregate` twin of the native
    * ChunkFold expression — kept as the executable spec of the fold
    * semantics (TextPipelineSpec proves native ≡ HOF ≡ windowed).
    * CodegenFallback: ~10× the native walk's CPU, which is why the
    * serving path above compiles to the expression instead.
    */
  private[graft] def chunksFoldHof(spark: SparkSession, dir: String): DataFrame = {
    val emptyBuf = array().cast("array<string>")
    val emptyChunks = array().cast("array<struct<cid:int,text:string>>")
    def st(off: org.apache.spark.sql.Column, cid: org.apache.spark.sql.Column,
        buf: org.apache.spark.sql.Column, chunks: org.apache.spark.sql.Column) =
      struct(off.as("off"), cid.as("cid"), buf.as("buf"), chunks.as("chunks"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("chunks", aggregate(
        col("ws"),
        st(lit(0L), lit(0), emptyBuf, emptyChunks),
        (acc, w) => {
          val wCid = floor(acc.getField("off") / ChunkLen).cast("int")
          val nextOff = acc.getField("off") + length(w) + 1
          when(wCid === acc.getField("cid"),
            st(nextOff, acc.getField("cid"),
              concat(acc.getField("buf"), array(w)), acc.getField("chunks")))
            .otherwise(st(nextOff, wCid, array(w),
              concat(acc.getField("chunks"),
                array(struct(acc.getField("cid").as("cid"),
                  array_join(acc.getField("buf"), " ").as("text"))))))
        },
        acc => when(size(acc.getField("buf")) > 0,
          concat(acc.getField("chunks"),
            array(struct(acc.getField("cid").as("cid"),
              array_join(acc.getField("buf"), " ").as("text")))))
          .otherwise(acc.getField("chunks"))))
      .select(col("doc_id"), explode(col("chunks")).as("c"))
      .select(col("doc_id"),
        col("c.cid").as("chunk_id"),
        col("c.text").as("chunk_text"),
        length(col("c.text")).cast("long").as("n_chars"),
        size(split(col("c.text"), " ")).cast("long").as("n_words"))
  }

  def qChunkFold(spark: SparkSession, dir: String): DataFrame =
    chunksFold(spark, dir)
      .select("doc_id", "chunk_id", "chunk_text", "n_chars", "n_words")
      .orderBy("doc_id", "chunk_id")

  /** Sentence segmentation (ref utils.py:19-24): split on [.:;?!],
    * trim, keep len > 1, re-number surviving segments.
    */
  def qSentences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("p0")
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), "[.:;?!]")).as(Seq("p0", "seg")))
      .withColumn("sentence", trim(col("seg")))
      .filter(length(col("sentence")) > 1)
      .withColumn("seg_id", row_number().over(w))
      .select("doc_id", "seg_id", "sentence")
      .orderBy("doc_id", "seg_id")
  }

  /** Mention spans: gazetteer hits with ner.py:34-50 adjacent-merge —
    * consecutive same-label tokens in a chunk merge into one span
    * (islands via pos - row_number()).
    */
  def mentions(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "graft_mentions")
      .getOrElse(mentionsOf(Tables.documents(spark, dir)))

  /** Mention rows for an arbitrary documents batch (see wordsOf). */
  private[graft] def mentionsOf(docs: DataFrame): DataFrame =
    mentionsOfWords(withChunkId(wordsOf(docs)))

  /** Mention aggregation over an already-built chunked-words table
    * (see chunksOfWords — the shared-pass seam for materializeGraph).
    */
  private[graft] def mentionsOfWords(words: DataFrame): DataFrame = {
    import words.sparkSession.implicits._
    val gaz = Gazetteer.toDF("word", "label")
    val hits = words
      .join(broadcast(gaz), "word")
    val isl = Window.partitionBy("doc_id", "chunk_id", "label").orderBy("pos")
    hits
      .withColumn("grp", col("pos") - row_number().over(isl))
      .groupBy(col("doc_id"), col("chunk_id"), col("label"), col("grp"))
      .agg(
        concat_ws(" ", graft.functions.SortedField.sorted_field(
          collect_list(struct(col("pos"), col("word"))), 1)).as("name"),
        min(col("pos")).as("start_pos"),
        count(lit(1)).cast("long").as("n_tokens"))
      .drop("grp")
  }

  val MentionsPieceSql: String =
    s"""gaz(gword, label) AS (VALUES $GazetteerSql),
       |hits AS MATERIALIZED (
       |  SELECT doc_id, CAST(floor(off / $ChunkLen) AS INT) AS chunk_id,
       |    pos, word, label
       |  FROM woff JOIN gaz ON word = gword),
       |mentions AS MATERIALIZED (
       |  SELECT doc_id, chunk_id, label,
       |    string_agg(word, ' ' ORDER BY pos) AS name,
       |    min(pos) AS start_pos, count(*) AS n_tokens
       |  FROM (SELECT *, pos - row_number() OVER (
       |          PARTITION BY doc_id, chunk_id, label ORDER BY pos) AS grp
       |        FROM hits)
       |  GROUP BY doc_id, chunk_id, label, grp)""".stripMargin

  val MentionsSql: String = s"$WordsSql,\n$MentionsPieceSql"

  /** Full pipeline CTE block: words + chunks + mentions. */
  val PipelineSql: String = s"$WordsSql,\n$ChunksPieceSql,\n$MentionsPieceSql"

  def qMentions(spark: SparkSession, dir: String): DataFrame =
    mentions(spark, dir)
      .select("doc_id", "chunk_id", "start_pos", "name", "label", "n_tokens")
      .orderBy("doc_id", "chunk_id", "start_pos")

  /** Distinct entity inventory with corpus stats (the Entity nodes). */
  def qEntities(spark: SparkSession, dir: String): DataFrame =
    mentions(spark, dir)
      .groupBy(col("name"), col("label"))
      .agg(count(lit(1)).cast("long").as("n_mentions"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_mentions").desc, col("name"))

  /** Fuzzy full-text query strings (ref utils.py:46-60): strip Lucene
    * specials, suffix each word with ~0.8, AND-join.
    */
  def qFulltextQuery(spark: SparkSession, dir: String): DataFrame =
    mentions(spark, dir)
      .select(col("name"), col("label")).distinct()
      .withColumn("clean", trim(regexp_replace(col("name"), """[-+&|!(){}\[\]\^"~*?:\\]""", " ")))
      .withColumn("ft_query",
        concat(array_join(filter(split(col("clean"), "\\s+"), w => length(w) > 0), "~0.8 AND "),
          lit("~0.8")))
      .select("name", "label", "ft_query")
      .orderBy("name", "label")

  // ---- sentence-combining chunker (ref utils.py:27-38) ----------------

  /** Greedy combiner threshold (ref min_combination_len=1000 on ~5k-char
    * news articles; scaled to this corpus's ~300-char docs).
    */
  val MinCombineLen = 100

  /** The synthetic corpus carries no sentence punctuation, so the filler
    * tokens 'a'/'the' serve as the deterministic sentence delimiter — the
    * same stand-in style as the gazetteer for NER. Real corpora would use
    * the reference's `[.:;?!]` class (qSentences).
    */
  val SentenceDelimRe = """\b(?:a|the)\b"""

  /** Delimiter-token sentence segmentation: (doc_id, seg_id, sentence),
    * trim + len>1 survivors renumbered — the same shape as qSentences.
    */
  def delimSentences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("p0")
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), SentenceDelimRe)).as(Seq("p0", "seg")))
      .withColumn("sentence", trim(col("seg")))
      .filter(length(col("sentence")) > 1)
      .withColumn("seg_id", row_number().over(w))
      .select("doc_id", "seg_id", "sentence")
  }

  /** The reference's greedy sentence combiner (utils.py:27-38), exactly:
    * while the buffer's total char length < L, append the sentence;
    * otherwise emit '.'.join(buffer), reset — DROPPING the sentence that
    * triggered the flush — and the trailing under-filled buffer is never
    * emitted. Sequential per document, so it runs as ONE `aggregate` HOF
    * fold over each doc's sentence array: one doc_id shuffle total, per-doc
    * work bounded by doc length, fully distributed across documents (the
    * scale axis at 100 TB is #docs, not sentences-per-doc).
    */
  def combineSentences(sents: DataFrame, minLen: Int): DataFrame = {
    val emptyArr = array().cast("array<string>")
    def st(buf: org.apache.spark.sql.Column, blen: org.apache.spark.sql.Column,
        chunks: org.apache.spark.sql.Column) =
      struct(buf.as("buf"), blen.as("blen"), chunks.as("chunks"))
    sents
      .groupBy("doc_id")
      .agg(graft.functions.SortedField.sorted_field(
        collect_list(struct(col("seg_id"), col("sentence"))), 1).as("sarr"))
      .withColumn("chunks", aggregate(
        col("sarr"),
        st(emptyArr, lit(0), emptyArr),
        (acc, s) => when(acc.getField("blen") < minLen,
            st(concat(acc.getField("buf"), array(s)),
              acc.getField("blen") + length(s),
              acc.getField("chunks")))
          .otherwise(st(emptyArr, lit(0),
            concat(acc.getField("chunks"), array(array_join(acc.getField("buf"), "."))))),
        acc => acc.getField("chunks")))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_chars", length(col("chunk_text")).cast("long"))
      .withColumn("n_sentences", size(split(col("chunk_text"), "\\.")).cast("long"))
  }

  def qChunkSentences(spark: SparkSession, dir: String): DataFrame =
    combineSentences(delimSentences(spark, dir), MinCombineLen)
      .select("doc_id", "chunk_id", "chunk_text", "n_chars", "n_sentences")
      .orderBy("doc_id", "chunk_id")

  /** Oracle: the identical greedy walk as a per-doc recursive CTE. */
  val ChunkSentencesSql: String =
    s"""WITH RECURSIVE segs AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(text, '\\b(?:a|the)\\b')) AS seg,
       |    unnest(generate_series(1, len(string_split_regex(text, '\\b(?:a|the)\\b')))) AS p0
       |  FROM documents),
       |sents AS MATERIALIZED (
       |  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY p0) AS seg_id,
       |    trim(seg) AS sentence
       |  FROM segs WHERE length(trim(seg)) > 1),
       |walk(doc_id, seg_id, blen, buf, chunks) AS (
       |  SELECT doc_id, 0, 0, CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[])
       |  FROM (SELECT DISTINCT doc_id FROM sents)
       |  UNION ALL
       |  SELECT w.doc_id, w.seg_id + 1,
       |    CASE WHEN w.blen < $MinCombineLen THEN w.blen + length(s.sentence) ELSE 0 END,
       |    CASE WHEN w.blen < $MinCombineLen THEN list_append(w.buf, s.sentence)
       |         ELSE CAST([] AS VARCHAR[]) END,
       |    CASE WHEN w.blen < $MinCombineLen THEN w.chunks
       |         ELSE list_append(w.chunks, array_to_string(w.buf, '.')) END
       |  FROM walk w JOIN sents s ON s.doc_id = w.doc_id AND s.seg_id = w.seg_id + 1),
       |final AS (
       |  SELECT w.doc_id, w.chunks
       |  FROM walk w JOIN (SELECT doc_id, max(seg_id) mx FROM sents GROUP BY doc_id) n
       |    ON w.doc_id = n.doc_id AND w.seg_id = n.mx)
       |SELECT doc_id,
       |  unnest(generate_series(1, len(chunks))) - 1 AS chunk_id,
       |  unnest(chunks) AS chunk_text,
       |  unnest(list_transform(chunks, c -> CAST(length(c) AS BIGINT))) AS n_chars,
       |  unnest(list_transform(chunks, c -> CAST(len(string_split(c, '.')) AS BIGINT))) AS n_sentences
       |FROM final ORDER BY doc_id, chunk_id""".stripMargin

  val OvWindow = 48 // words per overlap chunk
  val OvStride = 32 // window stride (overlap = OvWindow - OvStride)

  /** Sliding-window chunker WITH OVERLAP (the LangChain-style
    * splitter shape retrieval stacks default to — neighboring chunks
    * share OvWindow−OvStride words so no entity straddles a boundary
    * unseen): windows of OvWindow words every OvStride words, one per
    * start while start < n_words. Window starts are pure arithmetic
    * (sequence + slice HOFs per row) — zero shuffles, scan-speed like
    * the fold chunker; overlap multiplies output bytes, never shuffle
    * bytes.
    */
  def qChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 1)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"((size(words) - 1) div $OvStride) * $OvStride"),
            lit(OvStride)),
          st => concat_ws(" ", slice(col("words"), st + 1, lit(OvWindow)))))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_words", size(split(col("chunk_text"), " ")))
      .orderBy("doc_id", "chunk_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk" -> qChunk,
    "q_chunk_fold" -> qChunkFold,
    "q_chunk_overlap" -> qChunkOverlap,
    "q_chunk_sentences" -> qChunkSentences,
    "q_sentences" -> qSentences,
    "q_mentions" -> qMentions,
    "q_entities" -> qEntities,
    "q_fulltext_query" -> qFulltextQuery,
    "q_chunk_dedup" -> qChunkDedup)

  val oracles: Map[String, String] = Map(
    "q_chunk_overlap" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
         |  WHERE len(string_split(text, ' ')) >= 1),
         |st AS (
         |  SELECT doc_id, words, unnest(generate_series(0,
         |    ((len(words) - 1) // $OvStride) * $OvStride, $OvStride)) AS s
         |  FROM w)
         |SELECT doc_id, CAST(s // $OvStride AS INTEGER) AS chunk_id,
         |  array_to_string(words[s + 1 : s + $OvWindow], ' ') AS chunk_text,
         |  len(string_split(array_to_string(words[s + 1 : s + $OvWindow], ' '), ' '))
         |    AS n_words
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    "q_chunk_sentences" -> ChunkSentencesSql,
    "q_chunk" ->
      s"""WITH $ChunksSql
         |SELECT doc_id, chunk_id, chunk_text,
         |  length(chunk_text) AS n_chars, n_words
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    "q_chunk_dedup" ->
      s"""WITH $ChunksSql,
         |hh AS (SELECT doc_id, md5(chunk_text) AS h FROM chunks)
         |SELECT h, CAST(count(*) AS BIGINT) AS n_copies,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc
         |FROM hh GROUP BY h HAVING count(*) > 1 ORDER BY h""".stripMargin,
    // same rows as q_chunk by construction (the fold is an alternate
    // physical strategy, not different semantics) — same oracle
    "q_chunk_fold" ->
      s"""WITH $ChunksSql
         |SELECT doc_id, chunk_id, chunk_text,
         |  length(chunk_text) AS n_chars, n_words
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    "q_sentences" ->
      """WITH segs AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(text, '[.:;?!]')) AS seg,
        |    unnest(generate_series(1, len(string_split_regex(text, '[.:;?!]')))) AS p0
        |  FROM documents)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY p0) AS seg_id,
        |  trim(seg) AS sentence
        |FROM segs WHERE length(trim(seg)) > 1
        |ORDER BY doc_id, seg_id""".stripMargin,
    "q_mentions" ->
      s"""WITH $MentionsSql
         |SELECT doc_id, chunk_id, start_pos, name, label, n_tokens
         |FROM mentions ORDER BY doc_id, chunk_id, start_pos""".stripMargin,
    "q_entities" ->
      s"""WITH $MentionsSql
         |SELECT name, label, count(*) AS n_mentions,
         |  count(DISTINCT doc_id) AS n_docs
         |FROM mentions GROUP BY name, label
         |ORDER BY n_mentions DESC, name""".stripMargin,
    "q_fulltext_query" ->
      s"""WITH $MentionsSql,
         |names AS (SELECT DISTINCT name, label FROM mentions)
         |SELECT name, label,
         |  array_to_string(list_filter(string_split_regex(
         |      trim(regexp_replace(name, '[-+&|!(){}\\[\\]\\^"~*?:\\\\]', ' ', 'g')), '\\s+'),
         |    w -> length(w) > 0), '~0.8 AND ') || '~0.8' AS ft_query
         |FROM names ORDER BY name, label""".stripMargin)
}
