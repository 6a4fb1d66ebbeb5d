package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All are single
  * narrow passes over the documents scan — zero shuffles, codegen'd
  * `functions._` only (no UDFs), so they run at scan speed at 100 TB.
  */
object TextAnalysis {

  val EnStops: Seq[String] = Seq("the", "a")
  val DeStops: Seq[String] = Seq("der", "die", "das")
  val EsStops: Seq[String] = Seq("el", "la")
  val FrStops: Seq[String] = Seq("le", "et")

  private def hits(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isin(stops.map(lit): _*)))

  private def sqlHits(stops: Seq[String]): String =
    s"len(list_filter(words, w -> w IN (${stops.map(s => s"'$s'").mkString(",")})))"

  /** One-pass corpus profile — the monitoring row every pipeline run
    * emits before/after a curation stage: doc/source/lang counts,
    * token totals, length distribution (min/avg/max plus the short-doc
    * fraction that the length filter would drop). ONE scan, one
    * map-side-combined global aggregate, no shuffle of anything
    * row-sized — at 100 TB this is the cheapest query in the library,
    * and the one that runs most often.
    */
  def qCorpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        round(sum(when(col("n_tokens") < 15, 1L).otherwise(0L))
          / count(lit(1)).cast("double"), 6).as("short_frac"))

  /** Stopword-hit language ID (n-gram heuristic re-expression). */
  def qLangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("en_hits", hits(col("words"), EnStops))
      .withColumn("de_hits", hits(col("words"), DeStops))
      .withColumn("es_hits", hits(col("words"), EsStops))
      .withColumn("fr_hits", hits(col("words"), FrStops))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits")
          && col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits")
            && col("de_hits") > 0, "de")
          .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("und"))
      .select("doc_id", "pred_lang", "en_hits", "de_hits", "es_hits", "fr_hits")
      .orderBy("doc_id")

  /** Quality scoring: length/token/type stats + composite score. */
  def qQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("n_types", size(array_distinct(col("words"))).cast("long"))
      .withColumn("n_stop", hits(col("words"), EnStops).cast("long"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        col("n_tokens"), col("n_types"),
        round(col("n_types") / col("n_tokens").cast("double"), 6).as("type_token_ratio"),
        round((length(col("text")) - col("n_tokens") + 1) / col("n_tokens").cast("double"), 6)
          .as("avg_token_len"),
        round(col("n_stop") / col("n_tokens").cast("double"), 6).as("stopword_ratio"),
        round(lit(0.4) * least(lit(1.0), col("n_tokens") / lit(50.0))
          + lit(0.3) * (col("n_types") / col("n_tokens").cast("double"))
          + lit(0.3) * (lit(1.0) - col("n_stop") / col("n_tokens").cast("double")), 6)
          .as("quality_score"))
      .orderBy("doc_id")

  /** Curriculum buckets: documents split into low/mid/high terciles of
    * the composite quality score — the "easy data last" ordering a
    * curriculum or data-mixing schedule consumes. The tercile
    * thresholds are ONE broadcast 1-row percentile aggregate (exact
    * interpolated percentile, same convention as qPercentiles); the
    * bucketing itself is a narrow compare — no rank window, no global
    * sort, no ntile (which would funnel the corpus through one
    * partition).
    */
  def qQualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val q = qQuality(spark, dir).select("doc_id", "quality_score")
    val th = q.agg(
      round(expr("percentile(quality_score, 0.33)"), 6).as("p33"),
      round(expr("percentile(quality_score, 0.66)"), 6).as("p66"))
    q.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("quality_score") <= col("p33"), "low")
          .when(col("quality_score") <= col("p66"), "mid")
          .otherwise("high"))
      .select("doc_id", "quality_score", "bucket")
      .orderBy("doc_id")
  }

  // Fixed logistic-regression weights (a pretrained fasttext-style
  // quality classifier's linear head, frozen): intercept, type-token
  // ratio, stopword ratio, ln(doc length). Quantized-logit keep
  // threshold = round(ln(3)·1e6), i.e. p(keep) ≥ 0.75.
  val QcW0 = -2.0; val QcWTtr = 1.5; val QcWStop = 2.5; val QcWLen = 0.4
  val QcKeepLogit: Long = math.round(math.log(3.0) * 1e6)

  /** Model-based quality classification: score every document with a
    * frozen linear model over cheap lexical features and bucket into
    * keep / review / drop — the "classifier filter" stage of a
    * training-data pipeline (the model is a stand-in for a served
    * fasttext/linear head; the Spark side — feature extraction, one
    * narrow pass, integer-quantized logits so distributed float order
    * can never flip a bucket — is the real plumbing).
    *
    * One scan, zero shuffles (the final orderBy is presentation). The
    * logit is quantized to a 1e-6 grid BEFORE thresholding and the
    * sigmoid is computed FROM the quantized value, so engine and
    * oracle walk identical numbers.
    */
  def qQualityClassifier(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("ttr",
        size(array_distinct(col("words"))) / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        hits(col("words"), EnStops) / col("n_tokens").cast("double"))
      .withColumn("logit_u",
        round((lit(QcW0) + lit(QcWTtr) * col("ttr") + lit(QcWStop) * col("stop_ratio")
          + lit(QcWLen) * log(col("n_tokens"))) * lit(1000000.0)).cast("long"))
      .withColumn("p_keep",
        round(lit(1.0) / (lit(1.0) + exp(col("logit_u") * lit(-0.000001))), 6))
      .withColumn("label",
        when(col("logit_u") >= QcKeepLogit, "keep")
          .when(col("logit_u") >= 0L, "review")
          .otherwise("drop"))
      .select("doc_id", "n_tokens", "logit_u", "p_keep", "label")
      .orderBy("doc_id")

  /** Token counting: whitespace tokens + BPE-ish regex pieces. */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** Document fingerprint: md5 of normalized text + min word-3-gram
    * hash (winnowing-style witness).
    */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("words", split(col("norm"), " "))
      .select(
        col("doc_id"),
        md5(col("norm")).as("fp_md5"),
        // < 3 words → no trigram witness → NULL, matching the oracle's
        // empty generate_series; unguarded, sequence(0, size-3) turns
        // DESCENDING and slice throws on the negative start (real
        // corpora contain empty/whitespace docs — DirtyDataSpec pins)
        when(size(col("words")) >= 3,
          array_min(transform(sequence(lit(0), size(col("words")) - 3),
            i => md5(concat_ws(" ", slice(col("words"), i + 1, lit(3)))))))
          .as("min_shingle_hash"))
      .orderBy("doc_id")

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1 quality
    * filters): fraction of all word-bigram occurrences taken by the
    * most frequent bigram, and fraction of bigram/trigram occurrences
    * that are duplicated.
    *
    * Shape: ONE corpus pass emits both gram sizes in a single explode,
    * and grams travel as 32-bit md5 keys — the (doc_id, n, gram)
    * shuffle carries 8-byte keys with map-side partial counts, never
    * gram text. The oracle hashes with the identical md5 arithmetic,
    * so even hash-collision behavior matches exactly. Docs under 3
    * words are excluded up front (the previous inner join on the
    * trigram side dropped them anyway — same output).
    */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    // native (n, md5-prefix-hash) gram structs — one generated walk
    // per document (PropertySpec proves equality with the HOF chain)
    def gramHashes(n: Int) =
      graft.functions.GramHashStructs.gram_hash_structs(col("words"), n)
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(concat(gramHashes(2), gramHashes(3))).as("g"))
      .groupBy(col("doc_id"), col("g.n").as("n"), col("g.gh").as("gh"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n")
      .agg(round(max(col("c")) / sum(col("c")).cast("double"), 6).as("top"),
        round(sum(when(col("c") >= 2, col("c")).otherwise(0L))
          / sum(col("c")).cast("double"), 6).as("dup"))
      .groupBy("doc_id")
      .agg(
        max(when(col("n") === 2, col("top"))).as("top_bigram_frac"),
        max(when(col("n") === 2, col("dup"))).as("dup_bigram_frac"),
        max(when(col("n") === 3, col("top"))).as("top_trigram_frac"),
        max(when(col("n") === 3, col("dup"))).as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  /** The gazetteer's person names — the PII class for the scrub pass. */
  val PiiWords: Seq[String] =
    TextPipeline.Gazetteer.collect { case (w, "person") => w }

  /** PII scrubbing (C4/CCNet-style redaction): count and redact PII
    * tokens (person names here; emails/phones are the same
    * regexp_replace shape). Narrow codegen'd pass, zero shuffles.
    */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val piiRe = s"\\b(${PiiWords.mkString("|")})\\b"
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(filter(col("words"), w => w.isin(PiiWords.map(lit): _*)))
          .cast("long").as("n_pii"),
        substring(regexp_replace(col("text"), piiRe, "[PII]"), 1, 80)
          .as("scrubbed_head"))
      .orderBy("doc_id")
  }

  val VocabK = 100

  /** Corpus vocabulary statistics: global top-K tokens by frequency.
    * One map-side-combined groupBy over (token) + a TakeOrdered k-row
    * take — the Zipf-head report a tokenizer-training pipeline pulls
    * from a 100 TB corpus in a single pass.
    */
  def qVocabTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(VocabK)

  /** Corpus-unigram language-model scoring (the CCNet-style
    * perplexity-bucket signal, with the corpus itself as the LM):
    * p(w) = count(w)/total, doc score = mean log p over its tokens.
    *
    * Cross-engine float discipline: each word's log-probability is
    * quantized ONCE per vocabulary entry to integer micro-nats
    * (round(ln(p)·10⁶)); the per-document aggregation then sums exact
    * integers, so the result is independent of summation order — the
    * rule that keeps averages hash-stable across engines (a float
    * fold over millions of tokens would not be).
    *
    * Scale shape: vocabulary build is one map-side-combined groupBy;
    * the corpus total folds in as a 1-row broadcast (no driver-side
    * scalar job); scoring is a (word) equi-join — the Zipf head that
    * dominates token mass makes the vocab side broadcast-able after
    * frequency truncation at real scale.
    */
  def qUnigramLm(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").as("t"))
    val lq = vocab.crossJoin(broadcast(total))
      .select(col("w"),
        round(log(col("c").cast("double") / col("t")) * 1e6).cast("long").as("lq"))
    toks.join(lq, "w")
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"), sum("lq").as("slq"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("slq").cast("double") / col("n_tokens") / lit(1e6), 6).as("avg_logp"))
      .orderBy("doc_id")
  }

  val BigramLambda = 0.7   // interpolation weight on the bigram term

  /** Interpolated-bigram LM scoring: p(w2|w1) = λ·c(w1,w2)/c(w1) +
    * (1−λ)·c(w2)/T — the next step up from qUnigramLm and the same
    * perplexity-bucket role with context sensitivity (a KenLM-lite).
    * Same cross-engine float discipline: the log-probability is
    * quantized ONCE per DISTINCT BIGRAM to integer micro-nats, so
    * per-doc sums are order-independent.
    *
    * Scale shape: transitions are a per-row HOF zip (narrow); bigram
    * and unigram tables are map-side-combined groupBys; scoring is
    * one (w1, w2) equi-join. Docs need ≥2 words (no transitions
    * otherwise).
    */
  def qBigramLm(spark: SparkSession, dir: String): DataFrame = {
    val trans = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("words"), lit(1), size(col("words")) - 1),
        slice(col("words"), lit(2), size(col("words")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("t"))
      .select(col("doc_id"), col("t.w1"), col("t.w2"))
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum("c").as("t"))
    val bi = trans.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val lq = bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        round(log(lit(BigramLambda) * (col("c12").cast("double") / col("c1"))
          + lit(1 - BigramLambda) * (col("c2").cast("double") / col("t"))) * 1e6)
          .cast("long").as("lq"))
    trans.join(lq, Seq("w1", "w2"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_transitions"), sum("lq").as("slq"))
      .select(col("doc_id"), col("n_transitions"),
        round(col("slq").cast("double") / col("n_transitions") / lit(1e6), 6)
          .as("avg_logp2"))
      .orderBy("doc_id")
  }

  // Flesch reading-ease coefficients (Flesch 1948; public formula) and
  // the quantized band thresholds (micro-units so the bucket boundary
  // is an integer compare, never a float one).
  val FreBase = 206.835; val FreWps = 1.015; val FreSpw = 84.6
  val FreEasyU = 60000000L; val FreStdU = 30000000L

  /** Readability scoring — the Flesch reading-ease / FK-grade quality
    * signal a curation pipeline logs beside Gopher stats. Syllables
    * use the deterministic vowel-group heuristic (runs of [aeiouy],
    * floored at one per word); sentences are terminal-punctuation
    * runs, floored at 1. One narrow codegen'd pass, zero shuffles —
    * scan speed at 100 TB. The score is quantized to integer
    * micro-units BEFORE banding so engine and oracle bucket on
    * identical longs (same discipline as qQualityClassifier).
    */
  def qReadability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_sents", greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long")))
      .withColumn("n_syll", greatest(col("n_words"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("long")))
      .withColumn("fre_u",
        round((lit(FreBase)
          - lit(FreWps) * (col("n_words").cast("double") / col("n_sents"))
          - lit(FreSpw) * (col("n_syll").cast("double") / col("n_words"))) * 1e6)
          .cast("long"))
      .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
        round(col("fre_u") / lit(1e6), 6).as("fre"),
        when(col("fre_u") >= FreEasyU, "easy")
          .when(col("fre_u") >= FreStdU, "standard")
          .otherwise("hard").as("band"))
      .orderBy("doc_id")

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    * every document with the corpus unigram LM, then split into
    * head / middle / tail terciles WITHIN each language — the
    * language-conditioned quality partition CCNet feeds downstream
    * filters from (a global cut would let high-resource languages set
    * the bar for low-resource ones).
    *
    * Scale shape: qUnigramLm's one vocab groupBy + one scoring join;
    * the per-language tercile thresholds are a #langs-row broadcast
    * (exact interpolated percentile — never a corpus-wide rank
    * window). avg_logp is derived from integer micro-nat sums, so the
    * tercile boundary compare is on identical doubles in both engines.
    */
  def qPerplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = qUnigramLm(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
    val th = scored.groupBy("lang").agg(
      round(expr("percentile(avg_logp, 0.33)"), 6).as("p33"),
      round(expr("percentile(avg_logp, 0.66)"), 6).as("p66"))
    scored.join(broadcast(th), "lang")
      .withColumn("bucket",
        when(col("avg_logp") <= col("p33"), "tail")
          .when(col("avg_logp") <= col("p66"), "middle")
          .otherwise("head"))
      .select("doc_id", "lang", "avg_logp", "bucket")
      .orderBy("doc_id")
  }

  /** Pearson correlation between the composite quality score and the
    * corpus-unigram-LM score — the filter-agreement diagnostic: a
    * high correlation says the cheap heuristic score and the LM
    * signal would keep/drop mostly the same documents, so one of the
    * two passes can be dropped at 100 TB; a low one says they carry
    * independent information and both stay. Both signals quantize to
    * integer micro-units per doc, the five regression sums are exact
    * longs in one map-side-combined aggregate, and the final 1-row
    * arithmetic converts to double BEFORE the n·Σxy products (the
    * long product would overflow past ~10⁵ docs) — the identical IEEE
    * expression on identical longs in both engines.
    */
  def qSignalCorr(spark: SparkSession, dir: String): DataFrame = {
    val x = qQuality(spark, dir).select(col("doc_id"),
      round(col("quality_score") * 1e6).cast("long").as("x"))
    val y = qUnigramLm(spark, dir).select(col("doc_id"),
      round(col("avg_logp") * 1e6).cast("long").as("y"))
    x.join(y, "doc_id")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("num", col("nd") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("denx", col("nd") * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("deny", col("nd") * col("syy").cast("double")
        - col("sy").cast("double") * col("sy").cast("double"))
      .select(col("n"),
        round(col("sx").cast("double") / col("nd") / lit(1e6), 6)
          .as("mean_quality"),
        round(col("sy").cast("double") / col("nd") / lit(1e6), 6)
          .as("mean_logp"),
        round(col("num") / sqrt(col("denx") * col("deny")), 6).as("pearson_r"))
  }

  val ZipfHead = 100 // fit over the frequency head (the Zipf regime)

  /** Zipf-law fit over the vocabulary head — the corpus-health metric
    * (a natural corpus fits log(freq) ≈ intercept + slope·log(rank)
    * with slope ≈ −1; templated/duplicated corpora bend it): ordinary
    * least squares on (ln rank, ln freq), both quantized once to
    * integer micro-nats so all five regression sums are exact
    * integers — slope/intercept/r² derive from identical longs in
    * both engines, making IEEE arithmetic bit-identical.
    *
    * Scale shape: one map-side-combined vocabulary groupBy, a
    * ZipfHead-row TakeOrdered (never a vocab-wide rank window — the
    * numbering window runs on the ≤100 survivors), and a 1-row
    * regression aggregate.
    */
  def qZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val head = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(ZipfHead)
      .withColumn("rank", row_number().over(
        Window.partitionBy(pmod(length(col("word")), lit(1)))
          .orderBy(col("n").desc, col("word"))))
      .withColumn("x", round(log(col("rank").cast("double")) * 1e6).cast("long"))
      .withColumn("y", round(log(col("n").cast("double")) * 1e6).cast("long"))
    head
      .agg(count(lit(1)).as("np"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("num", (col("np") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("den", (col("np") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("deny", (col("np") * col("syy") - col("sy") * col("sy")).cast("double"))
      .withColumn("slope", col("num") / col("den"))
      .select(col("np"),
        round(col("slope"), 6).as("slope"),
        round((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("np").cast("double") / lit(1e6), 6).as("intercept"),
        round(col("num") * col("num") / (col("den") * col("deny")), 6).as("r2"))
  }

  val StopDfPct = 50L  // words present in > this % of documents

  /** Corpus-specific stopword discovery by document frequency: the
    * words appearing in ≥ StopDfPct% of documents, with exact integer
    * DF percent. Published stopword lists don't transfer across
    * domains/languages; quality signals (stopword ratio, fulltext
    * scoring) want the CORPUS's own function words, recomputed as the
    * corpus drifts. One distinct-words-per-doc explode + one
    * map-side-combined DF aggregate + a 1-row doc-count broadcast —
    * the candidate set after the DF filter is vocabulary-of-function-
    * words sized, never corpus sized.
    */
  def qStopwordDf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df_docs"))
      .crossJoin(broadcast(n))
      .withColumn("df_pct", expr("df_docs * 100 div n_docs"))
      .filter(col("df_pct") >= StopDfPct)
      .select("word", "df_docs", "n_docs", "df_pct")
      .orderBy("word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stopword_df" -> qStopwordDf,
    "q_zipf_fit" -> qZipfFit,
    "q_bigram_lm" -> qBigramLm,
    "q_unigram_lm" -> qUnigramLm,
    "q_vocab_topk" -> qVocabTopk,
    "q_corpus_stats" -> qCorpusStats,
    "q_lang_id" -> qLangId,
    "q_quality" -> qQuality,
    "q_quality_buckets" -> qQualityBuckets,
    "q_quality_classifier" -> qQualityClassifier,
    "q_token_count" -> qTokenCount,
    "q_fingerprint" -> qFingerprint,
    "q_repetition" -> qRepetition,
    "q_pii_scrub" -> qPiiScrub,
    "q_readability" -> qReadability,
    "q_perplexity_buckets" -> qPerplexityBuckets,
    "q_signal_corr" -> qSignalCorr)

  val oracles: Map[String, String] = Map(
    "q_stopword_df" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
         |  FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |d AS (SELECT word, CAST(count(*) AS BIGINT) AS df_docs
         |  FROM w GROUP BY word)
         |SELECT word, df_docs, n_docs,
         |  CAST(df_docs * 100 // n_docs AS BIGINT) AS df_pct
         |FROM d, n WHERE df_docs * 100 // n_docs >= $StopDfPct
         |ORDER BY word""".stripMargin,
    "q_signal_corr" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words
         |  FROM documents),
         |qs AS (SELECT doc_id,
         |  CAST(round(round(0.4 * least(1.0, len(words) / 50.0)
         |    + 0.3 * (len(list_distinct(words)) / CAST(len(words) AS DOUBLE))
         |    + 0.3 * (1.0 - ${sqlHits(EnStops)} / CAST(len(words) AS DOUBLE)), 6)
         |    * 1000000) AS BIGINT) AS x
         |  FROM w),
         |toks AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |vocab AS (SELECT tok AS wd, count(*) AS c FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab),
         |lq AS MATERIALIZED (
         |  SELECT wd, CAST(round(ln(CAST(c AS DOUBLE) / t) * 1000000) AS BIGINT)
         |    AS lq
         |  FROM vocab CROSS JOIN tot),
         |ys AS (SELECT doc_id,
         |    CAST(round(round(CAST(sum(lq) AS DOUBLE) / count(*) / 1000000.0, 6)
         |      * 1000000) AS BIGINT) AS y
         |  FROM toks JOIN lq ON lq.wd = toks.tok
         |  GROUP BY doc_id),
         |s AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM qs JOIN ys USING (doc_id)),
         |d AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
         |  FROM s)
         |SELECT n,
         |  round(CAST(sx AS DOUBLE) / nd / 1000000.0, 6) AS mean_quality,
         |  round(CAST(sy AS DOUBLE) / nd / 1000000.0, 6) AS mean_logp,
         |  round(num / sqrt(denx * deny), 6) AS pearson_r
         |FROM d""".stripMargin,
    "q_readability" ->
      s"""WITH s AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  greatest(CAST(1 AS BIGINT),
         |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sents,
         |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS vg
         |  FROM documents),
         |u AS (SELECT doc_id, n_words, n_sents,
         |  greatest(n_words, vg) AS n_syll FROM s),
         |f AS (SELECT doc_id, n_words, n_sents, n_syll,
         |  CAST(round(($FreBase
         |    - $FreWps * (CAST(n_words AS DOUBLE) / n_sents)
         |    - $FreSpw * (CAST(n_syll AS DOUBLE) / n_words)) * 1000000) AS BIGINT)
         |    AS fre_u FROM u)
         |SELECT doc_id, n_words, n_sents, n_syll,
         |  round(fre_u / 1000000.0, 6) AS fre,
         |  CASE WHEN fre_u >= $FreEasyU THEN 'easy'
         |       WHEN fre_u >= $FreStdU THEN 'standard'
         |       ELSE 'hard' END AS band
         |FROM f ORDER BY doc_id""".stripMargin,
    "q_perplexity_buckets" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |vocab AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab),
        |lq AS MATERIALIZED (
        |  SELECT w, CAST(round(ln(CAST(c AS DOUBLE) / t) * 1000000) AS BIGINT) AS lq
        |  FROM vocab CROSS JOIN tot),
        |scored AS MATERIALIZED (
        |  SELECT toks.doc_id, d.lang,
        |    round(CAST(sum(lq) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_logp
        |  FROM toks JOIN lq USING (w)
        |  JOIN documents d ON d.doc_id = toks.doc_id
        |  GROUP BY toks.doc_id, d.lang),
        |th AS (SELECT lang, round(quantile_cont(avg_logp, 0.33), 6) AS p33,
        |  round(quantile_cont(avg_logp, 0.66), 6) AS p66
        |  FROM scored GROUP BY lang)
        |SELECT doc_id, s.lang, avg_logp,
        |  CASE WHEN avg_logp <= p33 THEN 'tail'
        |       WHEN avg_logp <= p66 THEN 'middle'
        |       ELSE 'head' END AS bucket
        |FROM scored s JOIN th ON th.lang = s.lang
        |ORDER BY doc_id""".stripMargin,
    "q_zipf_fit" ->
      s"""WITH c AS (
         |  SELECT word, count(*) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  GROUP BY word),
         |h AS (
         |  SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rank
         |  FROM (SELECT * FROM c ORDER BY n DESC, word LIMIT $ZipfHead)),
         |xy AS (
         |  SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS x,
         |    CAST(round(ln(n) * 1000000) AS BIGINT) AS y
         |  FROM h),
         |s AS (
         |  SELECT count(*) AS np, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM xy),
         |d AS (
         |  SELECT np, CAST(np * sxy - sx * sy AS DOUBLE) AS num,
         |    CAST(np * sxx - sx * sx AS DOUBLE) AS den,
         |    CAST(np * syy - sy * sy AS DOUBLE) AS deny, sx, sy
         |  FROM s)
         |SELECT np, round(num / den, 6) AS slope,
         |  round((CAST(sy AS DOUBLE) - (num / den) * CAST(sx AS DOUBLE))
         |    / CAST(np AS DOUBLE) / 1000000.0, 6) AS intercept,
         |  round(num * num / (den * deny), 6) AS r2
         |FROM d""".stripMargin,
    "q_bigram_lm" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |trans AS MATERIALIZED (
         |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
         |    SELECT doc_id, unnest(list_transform(generate_series(1, len(words) - 1),
         |      i -> {'w1': words[i], 'w2': words[i+1]})) AS u
         |    FROM w WHERE len(words) >= 2)),
         |toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |uni AS MATERIALIZED (SELECT tok AS wd, count(*) AS c FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
         |bi AS (SELECT w1, w2, count(*) AS c12 FROM trans GROUP BY w1, w2),
         |lq AS MATERIALIZED (
         |  SELECT b.w1, b.w2,
         |    CAST(round(ln($BigramLambda * (c12 / CAST(u1.c AS DOUBLE))
         |      + ${1 - BigramLambda} * (u2.c / CAST(t AS DOUBLE))) * 1000000) AS BIGINT) AS lq
         |  FROM bi b JOIN uni u1 ON u1.wd = b.w1 JOIN uni u2 ON u2.wd = b.w2
         |  CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_transitions,
         |  round(CAST(sum(lq) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_logp2
         |FROM trans JOIN lq USING (w1, w2)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_unigram_lm" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |vocab AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab),
        |lq AS MATERIALIZED (
        |  SELECT w, CAST(round(ln(CAST(c AS DOUBLE) / t) * 1000000) AS BIGINT) AS lq
        |  FROM vocab CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(lq) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_logp
        |FROM toks JOIN lq USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_vocab_topk" ->
      s"""SELECT word, count(*) AS n
         |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |GROUP BY word ORDER BY n DESC, word LIMIT $VocabK""".stripMargin,
    "q_corpus_stats" ->
      """WITH t AS (
        |  SELECT source, lang, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents)
        |SELECT count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |  round(avg(n_tokens), 6) AS avg_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |  round(CAST(sum(CASE WHEN n_tokens < 15 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS short_frac
        |FROM t""".stripMargin,
    "q_lang_id" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |h AS (SELECT doc_id,
         |  ${sqlHits(EnStops)} AS en_hits, ${sqlHits(DeStops)} AS de_hits,
         |  ${sqlHits(EsStops)} AS es_hits, ${sqlHits(FrStops)} AS fr_hits
         |FROM w)
         |SELECT doc_id,
         |  CASE WHEN en_hits >= de_hits AND en_hits >= es_hits
         |        AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
         |    WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
         |    WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
         |    WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END AS pred_lang,
         |  en_hits, de_hits, es_hits, fr_hits
         |FROM h ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents),
         |s AS (SELECT doc_id, length(text) AS n_chars, len(words) AS n_tokens,
         |  len(list_distinct(words)) AS n_types, ${sqlHits(EnStops)} AS n_stop FROM w)
         |SELECT doc_id, n_chars, n_tokens, n_types,
         |  round(n_types / CAST(n_tokens AS DOUBLE), 6) AS type_token_ratio,
         |  round((n_chars - n_tokens + 1) / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len,
         |  round(n_stop / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
         |  round(0.4 * least(1.0, n_tokens / 50.0)
         |    + 0.3 * (n_types / CAST(n_tokens AS DOUBLE))
         |    + 0.3 * (1.0 - n_stop / CAST(n_tokens AS DOUBLE)), 6) AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_quality_buckets" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents),
         |s AS (SELECT doc_id, length(text) AS n_chars, len(words) AS n_tokens,
         |  len(list_distinct(words)) AS n_types, ${sqlHits(EnStops)} AS n_stop FROM w),
         |qs AS MATERIALIZED (SELECT doc_id,
         |  round(0.4 * least(1.0, n_tokens / 50.0)
         |    + 0.3 * (n_types / CAST(n_tokens AS DOUBLE))
         |    + 0.3 * (1.0 - n_stop / CAST(n_tokens AS DOUBLE)), 6) AS quality_score
         |  FROM s),
         |th AS (SELECT round(quantile_cont(quality_score, 0.33), 6) AS p33,
         |  round(quantile_cont(quality_score, 0.66), 6) AS p66 FROM qs)
         |SELECT doc_id, quality_score,
         |  CASE WHEN quality_score <= p33 THEN 'low'
         |       WHEN quality_score <= p66 THEN 'mid'
         |       ELSE 'high' END AS bucket
         |FROM qs CROSS JOIN th ORDER BY doc_id""".stripMargin,
    "q_quality_classifier" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |s AS (SELECT doc_id, len(words) AS n_tokens,
         |  len(list_distinct(words)) / CAST(len(words) AS DOUBLE) AS ttr,
         |  ${sqlHits(EnStops)} / CAST(len(words) AS DOUBLE) AS stop_ratio FROM w),
         |lg AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(round(($QcW0 + $QcWTtr * ttr + $QcWStop * stop_ratio
         |    + $QcWLen * ln(n_tokens)) * 1000000.0) AS BIGINT) AS logit_u FROM s)
         |SELECT doc_id, n_tokens, logit_u,
         |  round(1.0 / (1.0 + exp(logit_u * -0.000001)), 6) AS p_keep,
         |  CASE WHEN logit_u >= $QcKeepLogit THEN 'keep'
         |       WHEN logit_u >= 0 THEN 'review' ELSE 'drop' END AS label
         |FROM lg ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
        |  length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH w AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |gs AS (
        |  SELECT doc_id, 2 AS n, unnest(list_transform(
        |      generate_series(1, len(words) - 1),
        |      i -> array_to_string(words[i:i+1], ' '))) AS g FROM w
        |  UNION ALL
        |  SELECT doc_id, 3 AS n, unnest(list_transform(
        |      generate_series(1, len(words) - 2),
        |      i -> array_to_string(words[i:i+2], ' '))) AS g FROM w),
        |c AS (SELECT doc_id, n, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS gh,
        |    count(*) AS c
        |  FROM gs GROUP BY doc_id, n, gh),
        |s AS (SELECT doc_id, n,
        |    round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top,
        |    round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
        |      / CAST(sum(c) AS DOUBLE), 6) AS dup
        |  FROM c GROUP BY doc_id, n)
        |SELECT doc_id,
        |  max(CASE WHEN n = 2 THEN top END) AS top_bigram_frac,
        |  max(CASE WHEN n = 2 THEN dup END) AS dup_bigram_frac,
        |  max(CASE WHEN n = 3 THEN top END) AS top_trigram_frac,
        |  max(CASE WHEN n = 3 THEN dup END) AS dup_trigram_frac
        |FROM s GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" -> {
      val alt = PiiWords.mkString("|")
      val inList = PiiWords.map(w => s"'$w'").mkString(",")
      s"""SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), w -> w IN ($inList))) AS n_pii,
         |  substr(regexp_replace(text, '\\b($alt)\\b', '[PII]', 'g'), 1, 80)
         |    AS scrubbed_head
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |w AS (SELECT doc_id, norm, string_split(norm, ' ') AS words FROM n)
        |SELECT doc_id, md5(norm) AS fp_md5,
        |  list_aggregate(list_transform(generate_series(1, len(words) - 2),
        |    i -> md5(array_to_string(words[i:i+2], ' '))), 'min') AS min_shingle_hash
        |FROM w ORDER BY doc_id""".stripMargin)
}
