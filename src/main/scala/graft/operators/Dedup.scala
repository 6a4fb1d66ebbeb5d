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

  /** MinHash signature array: sig[j] = min over shingles of
    * md5(shingle || '#' || j) — string minhash, portable to SQL.
    */
  private def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir).withColumn("sig",
      transform(sequence(lit(0), lit(MinhashK - 1)),
        j => array_min(transform(col("s"),
          x => md5(concat(x, lit("#"), j.cast("string")))))))

  /** MinHash + LSH near-dup pairs, verified by true shingle Jaccard. */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val r = MinhashK / LshBands
    val bands = minhashSigs(spark, dir)
      .select(col("doc_id"), col("s"), explode(sequence(lit(0), lit(LshBands - 1))).as("band"))
      .join(minhashSigs(spark, dir).select(col("doc_id"), col("sig")), "doc_id")
      .withColumn("bkey", md5(concat(
        array_join(slice(col("sig"), col("band") * r + 1, lit(r)), "|"),
        lit("#"), col("band").cast("string"))))
      .select("doc_id", "s", "bkey")
    val a = bands.select(col("doc_id").as("doc_id_a"), col("s").as("sa"), col("bkey"))
    val b = bands.select(col("doc_id").as("doc_id_b"), col("s").as("sb"), col("bkey"))
    val cand = a.join(b, Seq("bkey"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "sa", "sb")
      .dropDuplicates("doc_id_a", "doc_id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** 16-bit SimHash per row via nested HOF folds (portable width; the
    * 64-bit native-Expression variant is the bench path — SURVEY §5).
    */
  private val SimhashSparkSql: String = {
    val h16 = "cast(conv(substring(md5(w), 1, 4), 16, 10) as int)"
    s"""cast(aggregate(sequence(0, ${SimhashBits - 1}), 0, (acc, b) ->
       |  acc + if(aggregate(words, 0, (a2, w) ->
       |    a2 + ((shiftright($h16, b) & 1) * 2 - 1)) > 0, shiftleft(1, b), 0)) as int)""".stripMargin
  }

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("sig", expr(SimhashSparkSql))
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
    val a = keyed.select(col("doc_id").as("doc_id_a"), col("s").as("sa"), col("block"))
    val b = keyed.select(col("doc_id").as("doc_id_b"), col("s").as("sb"), col("block"))
    a.join(b, Seq("block"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.3)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Embedding-cosine near-dup pairs, blocked by cluster label. */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.select(col("vec_id").as("vec_id_a"), col("label"), col("v").as("va"))
    val b = e.select(col("vec_id").as("vec_id_b"), col("label"), col("v").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cosine", round(Similarity.cosineCol(col("va"), col("vb")), 6))
      .filter(col("cosine") >= CosineThreshold)
      .select("vec_id_a", "vec_id_b", "label", "cosine")
      .orderBy("vec_id_a", "vec_id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_ngram" -> qDedupNgram,
    "q_dedup_embedding" -> qDedupEmbedding)

  private val SimhashDuckSql: String = {
    val h16 = "CAST('0x' || substr(md5(w), 1, 4) AS INTEGER)"
    s"""CAST(list_sum(list_transform(generate_series(0, ${SimhashBits - 1}), b ->
       |  CASE WHEN list_sum(list_transform(words, w ->
       |    ((($h16 >> b) & 1) * 2 - 1))) > 0 THEN (1 << b) ELSE 0 END)) AS INTEGER)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
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
         |sigs AS (
         |  SELECT doc_id, s, list_transform(generate_series(0, ${MinhashK - 1}),
         |    j -> list_aggregate(list_transform(s, x -> md5(x || '#' || j)), 'min')) AS sig
         |  FROM sh),
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
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |sigs AS (SELECT doc_id, $SimhashDuckSql AS sig FROM docs)
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
    "q_dedup_embedding" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings)
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label,
         |  round(${Similarity.cosineDuckSql("a.v", "b.v")}, 6) AS cosine
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${Similarity.cosineDuckSql("a.v", "b.v")} >= $CosineThreshold
         |ORDER BY vec_id_a, vec_id_b""".stripMargin)
}
