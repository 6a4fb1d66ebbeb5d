package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: signatures (minhash/simhash/fingerprints) are computed
  * PER ROW with higher-order functions — a narrow pass, no shuffle, no
  * UDF. The only shuffles are the LSH band-bucket self-join (16-byte
  * keys, never text×text) and the final verified-pair join. At 100 TB
  * the band join is the classic MinHash-LSH plan: shuffle cost is
  * O(docs × bands), independent of document length; skewed buckets are
  * handled by AQE skew-join splitting.
  */
object Dedup {

  val MinhashK = 16       // signature width
  val LshBands = 4        // bands of 4 rows each
  val JaccardThreshold = 0.5
  val SimhashBits = 16    // portable width (oracle-parity); see SURVEY §5
  val HammingMax = 2
  val CosineThreshold = 0.35

  /** words → distinct word-3-gram shingles, per row (no shuffle). */
  private def shingleCol(words: Column): Column =
    array_distinct(transform(sequence(lit(0), size(words) - 3),
      i => concat_ws(" ", slice(words, i + 1, lit(3)))))

  private val ShinglesSql =
    """docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(words) - 2),
      |    i -> array_to_string(words[i:i+2], ' '))) AS s
      |  FROM docs WHERE len(words) >= 3)""".stripMargin

  private def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), shingleCol(col("words")).as("s"))

  /** Exact dedup: md5(text) groups; every doc maps to its canonical. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val byHash = Window.partitionBy("h")
    Tables.documents(spark, dir)
      .withColumn("h", md5(col("text")))
      .withColumn("canonical_id", min(col("doc_id")).over(byHash))
      .withColumn("n_copies", count(lit(1)).over(byHash))
      .select("doc_id", "canonical_id", "n_copies")
      .orderBy("doc_id")
  }

  /** MinHash signatures: ONE md5 per shingle → 32-bit base hash, then
    * K affine rehashes (h·A_j + B_j mod P) — 16× fewer md5 calls than
    * per-seed hashing, identical arithmetic in the SQL oracle.
    */
  val MinhashP = 1000000007L
  private def affineA(j: Int): Long = 1000003L + 7919L * j
  private def affineB(j: Int): Long = 12345L + 911L * j

  private def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir).withColumn("sig",
      // Single fold: the hash array is the aggregate INPUT (evaluated
      // once — CollapseProject can't inline it 16×); the accumulator
      // carries all K running minima.
      aggregate(
        transform(col("s"), x => conv(substring(md5(x), 1, 8), 16, 10).cast("long")),
        array_repeat(lit(MinhashP), MinhashK),
        (acc, h) => zip_with(acc, sequence(lit(0L), lit(MinhashK - 1L)),
          (m, j) => least(m,
            (h * (lit(1000003L) + lit(7919L) * j) + lit(12345L) + lit(911L) * j) % MinhashP))))
      // Materialization barrier: without it CollapseProject inlines the
      // 300-step fold into every downstream lambda reference (~30×
      // slowdown measured). Lazy, so only queries that use it pay.
      .localCheckpoint(false)

  /** MinHash + LSH near-dup pairs, verified by true shingle Jaccard.
    * Bands shuffle only (doc_id, 16-byte band key) — candidate ids are
    * deduped BEFORE the shingle arrays are joined back for
    * verification, so text-sized payloads never ride the LSH shuffle.
    */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val r = MinhashK / LshBands
    val bands = minhashSigs(spark, dir)
      .withColumn("bkeys", transform(sequence(lit(0), lit(LshBands - 1)),
        band => md5(concat(
          array_join(slice(col("sig"), band * r + 1, lit(r)), "|"),
          lit("#"), band.cast("string")))))
      .select(col("doc_id"), explode(col("bkeys")).as("bkey"))
    val cand = bands.select(col("doc_id").as("doc_id_a"), col("bkey"))
      .join(bands.select(col("doc_id").as("doc_id_b"), col("bkey")), Seq("bkey"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b")
      .distinct()
    val sh = shingles(spark, dir)
    cand
      .join(sh.select(col("doc_id").as("doc_id_a"), col("s").as("sa")), "doc_id_a")
      .join(sh.select(col("doc_id").as("doc_id_b"), col("s").as("sb")), "doc_id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** 16-bit SimHash per row via HOF folds (portable width; the 64-bit
    * native-Expression variant is the bench path — SURVEY §5). The
    * token hashes `hs` are materialized once per row so the per-bit
    * fold does integer ops only (one md5 per token, not per token·bit).
    */
  private val SimhashSigSql: String =
    s"""cast(aggregate(
       |  zip_with(
       |    aggregate(
       |      transform(split(text, ' '),
       |        w -> cast(conv(substring(md5(w), 1, 4), 16, 10) as int)),
       |      array_repeat(0, $SimhashBits),
       |      (acc, h) -> zip_with(acc, sequence(0, ${SimhashBits - 1}),
       |        (c, b) -> c + ((shiftright(h, b) & 1) * 2 - 1))),
       |    sequence(0, ${SimhashBits - 1}),
       |    (c, b) -> if(c > 0, shiftleft(1, b), 0)),
       |  0, (a, x) -> a + x) as int)""".stripMargin

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .withColumn("sig", expr(SimhashSigSql))
      .select("doc_id", "sig")
    val a = sigs.select(col("doc_id").as("doc_id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("doc_id_b"), col("sig").as("sig_b"))
    a.crossJoin(b)
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= HammingMax)
      .select("doc_id_a", "doc_id_b", "hamming")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** n-gram Jaccard near-dups, blocked on the min-shingle fingerprint
    * (two docs share a block only if their winnowing witness matches —
    * near-identical docs almost surely do; no O(n²)).
    */
  def qDedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val keyed = shingles(spark, dir)
      .withColumn("block", array_min(transform(col("s"), x => md5(x))))
      .localCheckpoint(false)   // barrier: see minhashSigs
    val cand = keyed.select(col("doc_id").as("doc_id_a"), col("block"))
      .join(keyed.select(col("doc_id").as("doc_id_b"), col("block")), Seq("block"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "block")
    cand
      .join(keyed.select(col("doc_id").as("doc_id_a"), col("s").as("sa")), "doc_id_a")
      .join(keyed.select(col("doc_id").as("doc_id_b"), col("s").as("sb")), "doc_id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.3)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Embedding-cosine near-dup pairs, blocked by cluster label.
    * Norms are computed once per vector (narrow pass), so the pair
    * join does one dot product per pair, not three folds.
    */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.normCol(col("v")))
    val a = e.select(col("vec_id").as("vec_id_a"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_id_b"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cosine", round(
        Similarity.dotCol(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= CosineThreshold)
      .select("vec_id_a", "vec_id_b", "label", "cosine")
      .orderBy("vec_id_a", "vec_id_b")
  }

  /** 60-bit SimHash via the native codegen Expression (the scale path;
    * graft.functions.SimHash64) — same pair semantics at a tighter
    * hamming radius than the 16-bit portable variant.
    */
  val Hamming64Max = 6

  def qDedupSimhash64(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .withColumn("sig", graft.functions.SimHash64.simhash64(split(col("text"), " ")))
      .select("doc_id", "sig")
    val a = sigs.select(col("doc_id").as("doc_id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("doc_id_b"), col("sig").as("sig_b"))
    a.crossJoin(b)
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= Hamming64Max)
      .select("doc_id_a", "doc_id_b", "hamming")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Corpus-level MinHash per source via the custom typed Aggregator
    * (graft.functions.MinHashAgg): the signature of the UNION of all
    * shingle sets published by a source — flattened to rows for the
    * oracle.
    */
  def qSourceMinhash(spark: SparkSession, dir: String): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(new graft.functions.MinHashAgg(MinhashK))
    shingles(spark, dir)
      .select(col("doc_id"),
        explode(transform(col("s"),
          x => conv(substring(md5(x), 1, 8), 16, 10).cast("long"))).as("h"))
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(agg(col("h")).as("sig"))
      .select(col("source"), posexplode(col("sig")).as(Seq("j", "sig_j")))
      .orderBy("source", "j")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_minhash" -> qSourceMinhash,
    "q_dedup_simhash64" -> qDedupSimhash64,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_ngram" -> qDedupNgram,
    "q_dedup_embedding" -> qDedupEmbedding)

  private val SimhashDuckSql: String =
    s"""CAST(list_sum(list_transform(generate_series(0, ${SimhashBits - 1}), b ->
       |  CASE WHEN list_sum(list_transform(hs, h ->
       |    (((h >> b) & 1) * 2 - 1))) > 0 THEN (1 << b) ELSE 0 END)) AS INTEGER)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_source_minhash" ->
      s"""WITH $ShinglesSql,
         |hs AS MATERIALIZED (
         |  SELECT d.source, CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest(s) AS x FROM sh)
         |  JOIN documents d USING (doc_id))
         |SELECT source, j,
         |  min((h * (1000003 + 7919 * j) + 12345 + 911 * j) % $MinhashP) AS sig_j
         |FROM hs, (SELECT unnest(generate_series(0, ${MinhashK - 1})) AS j)
         |GROUP BY source, j ORDER BY source, j""".stripMargin,
    "q_dedup_simhash64" ->
      s"""WITH docs AS (SELECT doc_id, list_transform(string_split(text, ' '),
         |    w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)) AS hs FROM documents),
         |sigs AS MATERIALIZED (
         |  SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
         |    CASE WHEN list_sum(list_transform(hs, h ->
         |      (((h >> b) & 1) * 2 - 1))) > 0 THEN (CAST(1 AS BIGINT) << b)
         |    ELSE 0 END)) AS BIGINT) AS sig
         |  FROM docs)
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |  bit_count(xor(a.sig, b.sig)) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= $Hamming64Max
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    "q_dedup_exact" ->
      """WITH g AS (
        |  SELECT md5(text) AS h, min(doc_id) AS canonical_id,
        |    count(*) AS n_copies
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, canonical_id, n_copies
        |FROM documents JOIN g ON md5(text) = h
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $ShinglesSql,
         |hsh AS MATERIALIZED (
         |  SELECT doc_id, s, list_transform(s,
         |    x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS hs
         |  FROM sh),
         |sigs AS (
         |  SELECT doc_id, s, list_transform(generate_series(0, ${MinhashK - 1}),
         |    j -> list_aggregate(list_transform(hs,
         |      h -> (h * (1000003 + 7919 * j) + 12345 + 911 * j) % $MinhashP), 'min')) AS sig
         |  FROM hsh),
         |bands AS (
         |  SELECT doc_id, s,
         |    md5(array_to_string(sig[1 + 4*band : 4 + 4*band], '|') || '#' || band) AS bkey
         |  FROM sigs, (SELECT unnest(generate_series(0, ${LshBands - 1})) AS band)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |verified AS (
         |  SELECT doc_id_a, doc_id_b,
         |    round(len(list_intersect(sa.s, sb.s)) /
         |      CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS DOUBLE), 6)
         |      AS jaccard
         |  FROM cand JOIN sh sa ON sa.doc_id = doc_id_a
         |            JOIN sh sb ON sb.doc_id = doc_id_b)
         |SELECT * FROM verified WHERE jaccard >= $JaccardThreshold
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH docs AS (SELECT doc_id, list_transform(string_split(text, ' '),
         |    w -> CAST('0x' || substr(md5(w), 1, 4) AS INTEGER)) AS hs FROM documents),
         |sigs AS MATERIALIZED (SELECT doc_id, $SimhashDuckSql AS sig FROM docs)
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |  bit_count(xor(a.sig, b.sig)) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= $HammingMax
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    "q_dedup_ngram" ->
      s"""WITH $ShinglesSql,
         |keyed AS (
         |  SELECT doc_id, s,
         |    list_aggregate(list_transform(s, x -> md5(x)), 'min') AS block
         |  FROM sh)
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |  round(len(list_intersect(a.s, b.s)) /
         |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE), 6) AS jaccard
         |FROM keyed a JOIN keyed b ON a.block = b.block AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s)) /
         |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.3
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    "q_dedup_embedding" -> {
      val dot = Similarity.dotDuckSql("a.v", "b.v")
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, label, v,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         |  FROM (SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |    FROM embeddings))
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label,
         |  round($dot / (a.nrm * b.nrm), 6) AS cosine
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE $dot / (a.nrm * b.nrm) >= $CosineThreshold
         |ORDER BY vec_id_a, vec_id_b""".stripMargin
    })
}
