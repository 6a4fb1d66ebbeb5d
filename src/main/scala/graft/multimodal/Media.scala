package graft.multimodal

import graft.Ckpt.BarrierOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batches.
  *
  * The decode itself is STUBBED (no codec libs in this container) with
  * a deterministic fake — `decodeStub` derives a fixed-width feature
  * vector from the raw bytes — but the Spark-side plumbing is real:
  * schema (binary + metadata), per-partition batched processing
  * (`mapPartitions`, the Scala analogue of mapInPandas batches),
  * partition sizing, and a typed Dataset API.
  *
  * Scale: binary payloads never shuffle — features are extracted in a
  * narrow pass and only the (small) feature rows flow downstream.
  * Media tables should be stored with payloads in their own parquet
  * column chunk so metadata-only queries never read the bytes
  * (columnar pruning does this for free).
  */
object Media {

  val FeatureDim = 16

  case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeature(doc_id: Long, mime: String, n_bytes: Int,
    features: Array[Float])

  /** Fabricate a media table from documents (text bytes as payload —
    * the stand-in for real image/audio blobs; schema is the real one).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("lang") === "en", "image/png")
          .when(col("lang") === "de", "audio/wav")
          .otherwise("video/mp4").as("mime"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Deterministic fake decode: 16-bucket byte histogram, L1-normalized.
    * A real deployment swaps this body for the codec call; the batch
    * shape (Iterator→Iterator, per-partition) is what matters.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val h = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) % FeatureDim) += 1f; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    h.map(_ / n)
  }

  /** Batched feature extraction: one decode pass per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeature(r.doc_id, r.mime, r.media.length, decodeStub(r.media))
      }
    }
  }

  /** Frame sampling stub: every `stride`-th byte window stands in for
    * a video frame grab; returns (doc_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 64, frameLen: Int = 8): DataFrame =
    media.toDF()
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), floor((octet_length(col("media")) - 1) / stride).cast("int")),
          i => substring(col("media"), (i * stride + 1).cast("int"), lit(frameLen))))
        .as(Seq("frame_idx", "frame_bytes")))

  /** SQL-expressible slice of the media features (oracle-checked):
    * metadata + payload stats that must survive the binary round-trip.
    */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
      .withColumn("content_md5", md5(col("media")))
      .withColumn("n_space_bytes",
        (col("n_bytes") - octet_length(replace(col("media").cast("string"), lit(" "), lit("")))).cast("long"))
      .withColumn("first_byte", ascii(substring(col("media").cast("string"), 1, 1)).cast("long"))
      .select("doc_id", "mime", "n_bytes", "content_md5", "n_space_bytes", "first_byte")
      .orderBy("doc_id")

  val PhashBits = 16
  val PhashHammingMax = 2

  /** Media near-dup pairs by perceptual hash — the image-dedup shape
    * of a multimodal curation pipeline (aHash over decoded features):
    * bit b of the signature is "histogram bucket b above the mean"
    * (16·count > total, exact integer compare), computed per row from
    * the payload bytes; candidate pairs then ride the SAME pigeonhole
    * banding as text SimHash (Dedup.simhashPairs) — a hamming ≤ 2
    * equi-join on 8-byte segment keys, never payload×payload. A real
    * deployment swaps the histogram for decoded image features; the
    * signature-then-band plan is unchanged.
    */
  def qMediaPhash(spark: SparkSession, dir: String): DataFrame = {
    val payload = col("media").cast("string")
    // position-shifted binning — the cheap analogue of pHash's spatial
    // sensitivity; a pure byte histogram is near-constant across docs
    // drawn from one character distribution (measured: 98k/125k pairs
    // within hamming 2 at sf0.001 vs 325 with the position term).
    // ONE pass builds the histogram: chars via split (O(1) per char —
    // a substr(i) probe re-scans the string to position i, and 16
    // filter() passes re-inlined the whole bucket transform: the
    // first cut of this query cost 28 s at sf0.1; this one 0.3 s),
    // then a single fold carries all 16 counts in the accumulator.
    val hist = aggregate(
      transform(split(payload, ""), (ch, i) => (ascii(ch) + i + 1) % PhashBits),
      array_repeat(lit(0), PhashBits),
      (acc, b) => transform(acc, (c, j) => when(j === b, c + 1).otherwise(c)))
    val sig = aggregate(
      zip_with(hist, sequence(lit(0), lit(PhashBits - 1)),
        // 1 << b as an exact power (codegen'd pow over ints ≤ 2^15)
        (c, b) => when(c * PhashBits > length(payload),
          pow(lit(2.0), b).cast("int")).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    val sigs = mediaTable(spark, dir).toDF()
      .select(col("doc_id"), sig.as("sig"))
      .barrier(false)   // one histogram pass; both band-join sides read it
    // round 11 (r10 verdict #6): the pigeonhole band join is the
    // same quadratic-capable shape as text SimHash — guard it on the
    // same segment keys (no capped media twin exists; the remedy is
    // tighter blocking via more PhashBits)
    graft.operators.Dedup.pairLoadGuard(
      graft.operators.Dedup.segKeys(sigs, PhashBits, PhashHammingMax),
      Seq("seg_idx", "seg_val"), "q_media_phash",
      "tighter blocking (raise PhashBits)")
    graft.operators.Dedup.simhashPairs(sigs, PhashBits, PhashHammingMax)
      .orderBy("doc_id_a", "doc_id_b")
  }

  val FrameStride = 64
  val FrameLen = 8

  /** Frame-sample audit (oracle-checked): the sampleFrames plumbing —
    * one "frame" per FrameStride bytes, FrameLen bytes each — reduced
    * to SQL-expressible per-frame facts (md5 + length). The payload
    * stays in its map task: frames are derived in a narrow per-row
    * pass (substring slices of the binary column), only the 16-byte
    * digests flow downstream — exactly how a real frame-grab +
    * embed stage ships features, not frames, off the scan.
    */
  def qMediaFrames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), FrameStride, FrameLen)
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame_bytes")).as("frame_md5"),
        octet_length(col("frame_bytes")).cast("long").as("n_bytes"))
      .orderBy("doc_id", "frame_idx")

  /** Per-modality corpus manifest — the first query every multimodal
    * training run issues (how many items / bytes per modality, size
    * spread, exact byte-dedup incidence) and the input to its storage
    * budget. Metadata-only: the payload column contributes one
    * octet_length + one md5 per row inside a narrow pass, the
    * aggregate collapses to #mime rows map-side, and on a properly
    * laid-out table (payload in its own column chunk) the byte stats
    * come from a scan that never decodes anything.
    */
  def qMediaManifest(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("mime"),
        octet_length(col("media")).cast("long").as("nb"),
        md5(col("media")).as("cmd5"))
      .groupBy("mime")
      .agg(count(lit(1)).as("n_items"),
        sum("nb").as("total_bytes"),
        min("nb").as("min_bytes"),
        max("nb").as("max_bytes"),
        round(avg("nb"), 6).as("avg_bytes"),
        countDistinct(col("cmd5")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("cmd5"))).as("n_exact_dups"))
      .orderBy("mime")

  val ResizeStride = 4   // keep every 4th byte (stand-in for pixel decimation)
  val ResizeCap = 256    // output payload cap (the "target resolution")

  /** Resize plumbing — the last of the brief's four media verbs
    * (decode / feature-extract / frame-sample / RESIZE): payloads are
    * decimated by a deterministic byte stride and capped, standing in
    * for pixel-space downsampling exactly like decodeStub stands in
    * for the codec (a real deployment swaps the sampling expression
    * for the image op; the narrow binary→binary pass, the metadata
    * columns, and the original-never-shuffles shape are the real
    * plumbing). Emits old/new sizes + content digest so the
    * round-trip is oracle-checkable.
    */
  def qMediaResize(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .withColumn("s", col("media").cast("string"))
      // empty payloads make sequence(1, 0, stride) an illegal-bounds
      // task failure (DirtyDataSpec); pin the upper bound to >= 1 —
      // substr('', 1, 1) = '' so the resize of nothing is nothing
      .withColumn("resized",
        expr(s"""array_join(transform(
          sequence(1, greatest(least(length(s), ${ResizeStride * ResizeCap}), 1),
            $ResizeStride),
          i -> substr(s, i, 1)), '')"""))
      .select(col("doc_id"), col("mime"),
        octet_length(col("media")).cast("long").as("orig_bytes"),
        length(col("resized")).cast("long").as("resized_bytes"),
        md5(col("resized")).as("resized_md5"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_resize" -> qMediaResize,
    "q_media_features" -> qMediaFeatures,
    "q_media_frames" -> qMediaFrames,
    "q_media_manifest" -> qMediaManifest,
    "q_media_phash" -> qMediaPhash)

  val oracles: Map[String, String] = Map(
    "q_media_resize" ->
      s"""WITH r AS (
         |  SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN 'image/png'
         |         WHEN lang = 'de' THEN 'audio/wav'
         |         ELSE 'video/mp4' END AS mime,
         |    CAST(length(text) AS BIGINT) AS orig_bytes,
         |    array_to_string(list_transform(
         |      generate_series(1, least(length(text), ${ResizeStride * ResizeCap}),
         |        $ResizeStride),
         |      i -> substr(text, i, 1)), '') AS resized
         |  FROM documents)
         |SELECT doc_id, mime, orig_bytes,
         |  CAST(length(resized) AS BIGINT) AS resized_bytes,
         |  md5(resized) AS resized_md5
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_media_manifest" ->
      """WITH m AS (
        |  SELECT CASE WHEN lang = 'en' THEN 'image/png'
        |           WHEN lang = 'de' THEN 'audio/wav'
        |           ELSE 'video/mp4' END AS mime,
        |    CAST(length(text) AS BIGINT) AS nb, md5(text) AS cmd5
        |  FROM documents)
        |SELECT mime, count(*) AS n_items,
        |  CAST(sum(nb) AS BIGINT) AS total_bytes,
        |  min(nb) AS min_bytes, max(nb) AS max_bytes,
        |  round(avg(nb), 6) AS avg_bytes,
        |  count(DISTINCT cmd5) AS n_distinct,
        |  count(*) - count(DISTINCT cmd5) AS n_exact_dups
        |FROM m GROUP BY mime ORDER BY mime""".stripMargin,
    "q_media_frames" ->
      s"""SELECT doc_id, frame_idx,
         |  md5(substr(text, CAST(frame_idx * $FrameStride + 1 AS INT), $FrameLen))
         |    AS frame_md5,
         |  length(substr(text, CAST(frame_idx * $FrameStride + 1 AS INT), $FrameLen))
         |    AS n_bytes
         |FROM (SELECT doc_id, text,
         |        unnest(generate_series(0, (length(text) - 1) // $FrameStride))
         |          AS frame_idx
         |      FROM documents)
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_media_features" ->
      """SELECT doc_id,
        |  CASE WHEN lang = 'en' THEN 'image/png'
        |       WHEN lang = 'de' THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  length(text) AS n_bytes,
        |  md5(text) AS content_md5,
        |  length(text) - length(replace(text, ' ', '')) AS n_space_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_phash" ->
      s"""WITH bs AS MATERIALIZED (
         |  SELECT doc_id, length(text) AS n,
         |    list_transform(generate_series(1, length(text)),
         |      i -> (ascii(substr(text, i, 1)) + i) % $PhashBits) AS b
         |  FROM documents),
         |sigs AS MATERIALIZED (
         |  SELECT doc_id, CAST(list_sum(list_transform(
         |    generate_series(0, ${PhashBits - 1}), bb ->
         |      CASE WHEN $PhashBits * len(list_filter(b, x -> x = bb)) > n
         |        THEN (1 << bb) ELSE 0 END)) AS INTEGER) AS sig
         |  FROM bs),
         |seg AS MATERIALIZED (
         |  SELECT doc_id, sig, seg_idx,
         |    ${graft.operators.Dedup.segCaseSql(PhashBits, PhashHammingMax)} AS seg_val
         |  FROM sigs, (SELECT unnest(generate_series(0, $PhashHammingMax)) AS seg_idx))
         |${graft.operators.Dedup.bandedPairsSql(PhashHammingMax)}""".stripMargin)
}
