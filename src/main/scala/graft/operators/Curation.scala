package graft.operators

import graft.Ckpt.BarrierOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** End-to-end corpus curation: the C4/Gopher-style keep/drop decision
  * that composes the individual quality signals into one verdict per
  * document — length floor, bigram-repetition ceiling, type-token
  * diversity floor, and near-duplicate suppression (only a cluster's
  * canonical survives). First failing rule wins as the reject reason,
  * mirroring how curation pipelines report drop statistics.
  *
  * Scale shape: length/diversity are narrow scan passes; repetition is
  * one map-side-combined (doc_id, gram) shuffle; the duplicate signal
  * joins the pair-graph cluster table (Dedup.qDedupClusters — the
  * propagation loop runs on the dup subgraph, not the corpus).
  */
object Curation {

  val MinTokens = 15
  val MaxDupBigramFrac = 0.15
  val MinTypeTokenRatio = 0.35

  def qFilterPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
    val base = docs.select(
      col("doc_id"),
      size(col("words")).cast("long").as("n_tokens"),
      (size(array_distinct(col("words"))) /
        size(col("words")).cast("double")).as("ttr"))
    val rep = docs
      .select(col("doc_id"),
        explode(graft.functions.WordNgrams.word_ngrams(col("words"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        (sum(when(col("c") >= 2, col("c")).otherwise(0L))
          / sum(col("c")).cast("double")).as("dupfrac"))
    // near-dup signal needs canonical labels only — skip the
    // cluster-size aggregation qDedupClusters adds on top
    val clusters = Dedup.clusterLabels(spark, dir)
      .select(col("node").as("doc_id"), col("comp").as("canonical_id"))
    base.join(rep, "doc_id").join(clusters, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("doc_id")))
      .withColumn("reason",
        when(col("n_tokens") < MinTokens, "too_short")
          .when(col("dupfrac") > MaxDupBigramFrac, "repetitive")
          .when(col("ttr") < MinTypeTokenRatio, "low_diversity")
          .when(col("canonical_id") =!= col("doc_id"), "near_duplicate")
          .otherwise("keep"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("ttr"), 6).as("ttr"),
        round(col("dupfrac"), 6).as("dup_bigram_frac"),
        (col("reason") === "keep").as("keep"),
        col("reason"))
      .orderBy("doc_id")
  }

  /** Per-source curation yield — the dashboard row a data team reads
    * after every filter-pipeline run: docs/tokens in, keep counts,
    * keep rates, and the per-reason drop breakdown (fixed reason
    * columns — the verdict vocabulary is closed). Composes
    * qFilterPipeline's verdicts with one (doc_id) equi-join to pick
    * up the source, then collapses to #sources rows in a single
    * map-side-combined aggregate; rates are integer micro-division.
    */
  def qKeepRate(spark: SparkSession, dir: String): DataFrame = {
    val v = qFilterPipeline(spark, dir).select("doc_id", "n_tokens", "reason")
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    def nReason(r: String) =
      sum(when(col("reason") === r, 1L).otherwise(0L)).as(s"n_$r")
    v.join(src, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        nReason("keep"), nReason("too_short"), nReason("repetitive"),
        nReason("low_diversity"), nReason("near_duplicate"),
        sum(when(col("reason") === "keep", col("n_tokens")).otherwise(0L))
          .as("kept_tokens"),
        sum("n_tokens").as("total_tokens"))
      .withColumn("keep_rate",
        round(expr("n_keep * 1000000 div n_docs") / lit(1e6), 6))
      .withColumn("token_keep_rate",
        round(expr("kept_tokens * 1000000 div total_tokens") / lit(1e6), 6))
      .orderBy("source")
  }

  val DecontamN = 4    // word n-gram width for overlap detection
  val EvalBucket = 90  // md5 split buckets >= this form the held-out set

  /** Benchmark decontamination (GPT-3 §C / PaLM-style n-gram overlap):
    * flag training documents sharing any word 4-gram with the held-out
    * evaluation split (the same deterministic md5 bucketing as
    * qTrainTestSplit — bucket >= 90 is "test").
    *
    * Scale shape: grams are md5-hashed per row (narrow), so only
    * 16-byte keys ever shuffle; the eval side is benchmark-sized by
    * construction and broadcast — contamination check is a broadcast
    * semi-join at scan speed over the 100 TB training side, then one
    * (doc_id) count aggregation over the (rare) hits.
    */
  /** documents + split bucket (the qTrainTestSplit md5 bucketing). */
  private def bucketed(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("split#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % 100)

  /** explode of the distinct word-4-gram md5 hashes of a `words`
    * column — the native generated walk (PropertySpec proves equality
    * with the HOF array_distinct/transform/md5 chain). Callers filter
    * size(words) >= DecontamN first.
    */
  private def gramExplode =
    explode(graft.functions.DistinctGramMd5
      .distinct_gram_md5(col("words"), DecontamN)).as("gh")

  /** (doc_id, bucket, gh): distinct word-4-gram hashes per document. */
  private def decontamGrams(d: DataFrame): DataFrame =
    d.filter(size(col("words")) >= DecontamN)
      .select(col("doc_id"), col("bucket"), gramExplode)

  /** (doc_id, gh) for any (doc_id, text) frame — batch or streaming
    * (narrow per-row transform, so it is stream-safe); shared with the
    * streaming decontamination screen.
    */
  private[graft] def gramsOfDocs(docs: DataFrame): DataFrame =
    docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= DecontamN)
      .select(col("doc_id"), gramExplode)

  /** hits (doc_id → distinct contaminated gram count) → report rows. */
  private def decontamReport(d: DataFrame, hits: DataFrame): DataFrame =
    d.filter(col("bucket") < EvalBucket)
      .select(col("doc_id"),
        when(col("bucket") < 80, "train").otherwise("valid").as("split"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit_grams", coalesce(col("n_hit_grams"), lit(0L)))
      .withColumn("contaminated", col("n_hit_grams") > 0)
      .orderBy("doc_id")

  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = bucketed(spark, dir)
    val grams = decontamGrams(d)
    val evalGrams = grams.filter(col("bucket") >= EvalBucket).select("gh").distinct()
    val hits = grams.filter(col("bucket") < EvalBucket)
      .join(broadcast(evalGrams), "gh")
      .groupBy("doc_id").agg(countDistinct(col("gh")).as("n_hit_grams"))
    decontamReport(d, hits)
  }

  val BloomNumItems = 1000000L   // capacity sized for the eval grams (fpp ~1% at 8 bits/item)

  /** The same decontamination check through Spark's runtime-filter
    * machinery: the eval grams are folded into ONE Bloom filter (the
    * engine's own `BloomFilterAggregate`, the aggregate behind AQE's
    * injected runtime bloom filters), broadcast as a scalar, and the
    * training side is pruned by codegen'd `BloomFilterMightContain`
    * BEFORE any shuffle; only might-contain survivors reach the exact
    * gram join that removes false positives. Output is byte-identical
    * to qDecontaminate (the oracle is the same SQL).
    *
    * Why this is the 100 TB shape: the broadcast-hash-join check in
    * qDecontaminate already avoids shuffling the training grams, but
    * it still streams EVERY training gram row through a hash probe of
    * a table carrying the gram strings; here the first-pass probe is a
    * fixed 1 MB bit array with xxhash64 keys — no strings, no hash
    * table build per task — and the expensive exact join sees only the
    * (rare) contaminated tail. At a 4M-gram eval set the bloom is
    * ~4 MB where the broadcast hash table is hundreds — the difference
    * between a per-executor memory non-event and an OOM risk.
    */
  def qBloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.shims
    val d = bucketed(spark, dir)
    val grams = decontamGrams(d)
    val evalGrams = grams.filter(col("bucket") >= EvalBucket).select("gh").distinct()
      .barrier(false)   // benchmark-sized; feeds the bloom AND the exact confirm join
    val bloom = evalGrams.agg(shims.column(
      new BloomFilterAggregate(shims.expression(xxhash64(col("gh"))), BloomNumItems)
        .toAggregateExpression()).as("bf"))
    // might_contain requires its bloom input as a scalar subquery (the
    // same wiring InjectRuntimeFilter emits), not a join column
    val mightContain = shims.column(BloomFilterMightContain(
      ScalarSubquery(shims.analyzed(bloom)),
      shims.expression(xxhash64(col("gh")))))
    val hits = grams.filter(col("bucket") < EvalBucket)
      .filter(mightContain)
      .join(broadcast(evalGrams), "gh")
      .groupBy("doc_id").agg(countDistinct(col("gh")).as("n_hit_grams"))
    decontamReport(d, hits)
  }

  /** The WHOLE curation pipeline as one composed plan — the "what
    * actually survives into the training set" query: held-out split
    * assignment, quality gates (length / repetition / diversity),
    * near-duplicate suppression (cluster canonicals), and benchmark
    * decontamination, with the FIRST failing rule as each document's
    * reason. One DataFrame, one Catalyst plan: split hashing and
    * quality signals are narrow, the dup signal is the pair-graph
    * propagation (dup-subgraph-sized), the contamination signal is
    * the broadcast eval-gram semi-join — composing them adds joins on
    * doc_id, not new corpus scans of any widened shape.
    *
    * Rule order: held_out ≻ too_short ≻ repetitive ≻ low_diversity ≻
    * near_duplicate ≻ contaminated ≻ keep (a held-out doc is not
    * training data at all, so no other verdict applies to it).
    */
  def qCurationE2e(spark: SparkSession, dir: String): DataFrame = {
    val fp = qFilterPipeline(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("reason").as("q_reason"))
    val dec = qDecontaminate(spark, dir)
      .select(col("doc_id"), col("split"), col("contaminated"))
    fp.join(dec, Seq("doc_id"), "left")
      .withColumn("split", coalesce(col("split"), lit("test")))
      .withColumn("reason",
        when(col("split") === "test", "held_out")
          .when(col("q_reason") =!= "keep", col("q_reason"))
          .when(col("contaminated"), "contaminated")
          .otherwise("keep"))
      .withColumn("keep", col("reason") === "keep")
      .select("doc_id", "split", "n_tokens", "reason", "keep")
      .orderBy("doc_id")
  }

  /** Per-source curation report — the "which domains are worth
    * keeping" dashboard every crawl-curation loop maintains: document
    * and token volume, mean document length, language breadth, and
    * exact-duplicate incidence per source. Ratios ride the integer
    * micro-grid (sum·10⁶ div count), so they are reproducible in any
    * engine and any summation order.
    *
    * Scale shape: the duplicate signal reuses q_dedup_exact's md5
    * groups — the corpus-sized shuffle carries a 16-byte hash key and
    * a handful of longs, never text; the rollup is a map-side-combined
    * aggregation straight down to #sources rows.
    */
  def qSourceReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("text")).as("h"))
    val copies = docs.groupBy("h").agg(count(lit(1)).as("n_copies"))
    docs.join(copies, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("src_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("avg_tokens",
        round(expr("src_tokens * 1000000 div n_docs") / lit(1e6), 6))
      .withColumn("dup_frac",
        round(expr("dup_docs * 1000000 div n_docs") / lit(1e6), 6))
      .select("source", "n_docs", "src_tokens", "avg_tokens",
        "n_langs", "dup_docs", "dup_frac")
      .orderBy("source")
  }

  /** N-gram novelty per document — the memorization-risk signal: the
    * fraction of a doc's distinct word-4-grams that appear in NO
    * other document. Low-novelty docs are near-copies of corpus
    * content (they add little signal and amplify memorization); the
    * metric is also the per-doc complement of the corpus-level dedup
    * rates. Ratio rides the integer micro-grid.
    *
    * Scale shape: the same md5 gram hashing as decontamination — the
    * corpus shuffle carries 16-byte keys; document-frequency is one
    * map-side-combined count (each doc's grams are pre-deduped, so DF
    * is docs-containing, not occurrences), joined back by gram key.
    */
  def qGramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = gramsOfDocs(Tables.documents(spark, dir))
      .barrier(false) // read by the DF count AND the per-doc rollup
    val df = grams.groupBy("gh").agg(count(lit(1)).as("df"))
    grams.join(df, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(expr("n_unique * 1000000 div n_grams") / lit(1e6), 6))
      .select("doc_id", "n_grams", "n_unique", "novelty")
      .orderBy("doc_id")
  }

  /** Histogram bucket width (chars). Integer division keeps the
    * bucket id exact in both engines — a log2 bucket would put
    * power-of-two lengths on an fp rounding boundary.
    */
  val HistBucketChars = 256L

  /** Per-source document-length histogram with cumulative counts —
    * the corpus-shape diagnostic a curation run reports before and
    * after filtering (truncation spikes, boilerplate walls, and
    * source-specific length floors all show up as bucket anomalies).
    *
    * Scale shape: one map-side-combined shuffle on (source, bucket);
    * the per-source total is a second tiny agg over the bucket rows
    * (never the raw docs), and the cumulative window runs over ≤ a few
    * hundred bucket rows per source.
    */
  def qLengthHist(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.documents(spark, dir)
      .select(col("source"), expr(s"n_chars div $HistBucketChars").as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"))
    val tot = b.groupBy("source").agg(sum(col("n_docs")).as("src_docs"))
    b.join(tot, "source")
      .withColumn("share",
        round(expr("n_docs * 1000000 div src_docs") / lit(1e6), 6))
      .withColumn("cum_docs", sum(col("n_docs"))
        .over(Window.partitionBy("source").orderBy("bucket")))
      .select("source", "bucket", "n_docs", "share", "cum_docs")
      .orderBy("source", "bucket")
  }

  /** Corpus drift monitor: total-variation distance between the
    * length-bucket distributions of two crawl cohorts (a seeded-hash
    * doc_id split stands in for snapshot id — doc_id PARITY would
    * alias the round-robin source assignment), per source. The number
    * a pipeline alerts on when a source changes its template or
    * truncation behavior between snapshots. Per-bucket shares ride
    * the integer micro-grid so the BIGINT sum is order-immune;
    * TV = Σ|p−q|/2.
    *
    * Scale shape: same single (source, bucket) shuffle as the
    * histogram with both cohorts counted in one pass (conditional
    * sums, no second scan), then a per-source rollup over bucket rows.
    */
  def qDriftReport(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.documents(spark, dir)
      .select(col("source"), expr(s"n_chars div $HistBucketChars").as("bucket"),
        (conv(substring(md5(concat(lit("drift#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % 2).as("cohort"))
      .groupBy("source", "bucket")
      .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n1"))
    val t = b.groupBy("source")
      .agg(sum(col("n0")).as("t0"), sum(col("n1")).as("t1"))
      .filter(col("t0") > 0 && col("t1") > 0)
    b.join(t, "source")
      .groupBy("source")
      .agg(max(col("t0")).as("docs_a"), max(col("t1")).as("docs_b"),
        count(lit(1)).as("n_buckets"),
        sum(abs(expr("n0 * 1000000 div t0") - expr("n1 * 1000000 div t1")))
          .as("tvm"))
      .withColumn("tv_dist", round(col("tvm") / lit(2e6), 6))
      .select("source", "docs_a", "docs_b", "n_buckets", "tv_dist")
      .orderBy("source")
  }

  /** Shannon entropy of the per-language source mix, weighted by
    * token mass — the training-mix diversity audit: `entropy` in
    * nats, `eff_sources` = exp(H) (the "effective number of equally
    * weighted sources" actually feeding the mix — 200 crawl domains
    * with eff_sources 3.2 is a concentration alarm no count column
    * shows), and `norm_entropy` = H / ln(k) in [0,1] for cross-lang
    * comparison. Cross-engine float discipline: the share is floored
    * onto an integer ppm grid and each p·ln p term is quantized to
    * micro-nats BEFORE the sum (the qUnigramLm pattern), so the
    * distributed sum is order-independent; sub-ppm sources fall out
    * of the grid on both engines (their entropy mass is < 2e-5 nats).
    *
    * Scale shape: one map-side-combined groupBy(lang, source) over
    * the documents scan, then arithmetic on a #langs×#sources-row
    * table joined against its broadcast per-lang rollup.
    */
  def qSourceEntropy(spark: SparkSession, dir: String): DataFrame =
    entropyOfMix(Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("lang", "source").agg(sum("n_tokens").as("tk")))

  /** The entropy arithmetic over a (lang, source, tk) mix table —
    * shared by the batch query and the streaming monitor's snapshot
    * (EventStream.sourceMixStream), so both paths are provably the
    * same formula.
    */
  def entropyOfMix(st: DataFrame): DataFrame = {
    val lt = st.groupBy("lang")
      .agg(sum("tk").as("lang_tokens"), count(lit(1)).as("n_sources"))
    st.join(broadcast(lt), "lang")
      .withColumn("p_ppm", expr("tk * 1000000 div lang_tokens"))
      .filter(col("p_ppm") > 0)
      .withColumn("term", round(col("p_ppm").cast("double") / lit(1e6)
        * log(col("p_ppm").cast("double") / lit(1e6)) * lit(1e6)).cast("long"))
      .groupBy("lang")
      .agg(max("n_sources").as("n_sources"),
        max("lang_tokens").as("lang_tokens"), sum("term").as("hm"))
      .select(col("lang"), col("n_sources"), col("lang_tokens"),
        round(-col("hm").cast("double") / lit(1e6), 6).as("entropy"),
        round(exp(-col("hm").cast("double") / lit(1e6)), 6).as("eff_sources"),
        round(when(col("n_sources") > 1, -col("hm").cast("double") / lit(1e6)
          / log(col("n_sources").cast("double"))).otherwise(0.0), 6)
          .as("norm_entropy"))
      .orderBy("lang")
  }

  /** Token-mass concentration across sources: the Gini coefficient
    * (sorted-rank formula G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n) plus the
    * Lorenz-curve operating points head-count style — the minimum
    * number of top sources covering 50% / 90% of all tokens. The
    * "does 1% of domains contribute half the corpus" crawl audit.
    * All rank/cumulative arithmetic is exact integer math on the
    * per-source token sums; doubles appear only in the final
    * single-row division, so both engines compute bit-identical
    * inputs. Ties broken by source name on both sides.
    *
    * Scale shape: the windows run over the per-SOURCE aggregate
    * (domain-bounded, ~10⁶ rows at web scale — a single partition's
    * worth), never over documents; the doc-level work is one
    * map-side-combined groupBy on the scan.
    */
  def qTokenGini(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("source").agg(sum("n_tokens").as("tk"))
      .barrier(false) // feeds 3 tiny aggregates below
    val ranked = st.withColumn("i",
      row_number().over(Window.orderBy(col("tk"), col("source"))))
    val cum = st.withColumn("cum", sum("tk").over(Window
      .orderBy(col("tk").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = st.agg(sum("tk").as("s"), count(lit(1)).as("n"))
    val s1 = ranked.agg(sum(expr("i * tk")).as("s1"))
    val conc = cum.crossJoin(broadcast(tot))
      .agg(sum(when(expr("(cum - tk) * 2 < s"), 1L).otherwise(0L)).as("t50"),
        sum(when(expr("(cum - tk) * 10 < s * 9"), 1L).otherwise(0L)).as("t90"))
    tot.crossJoin(broadcast(s1)).crossJoin(broadcast(conc))
      .select(col("n").as("n_sources"), col("s").as("total_tokens"),
        round(lit(2.0) * col("s1").cast("double")
          / (col("n").cast("double") * col("s").cast("double"))
          - (col("n").cast("double") + lit(1.0)) / col("n").cast("double"), 6)
          .as("gini"),
        col("t50").as("top50_sources"), col("t90").as("top90_sources"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_entropy" -> qSourceEntropy,
    "q_token_gini" -> qTokenGini,
    "q_length_hist" -> qLengthHist,
    "q_drift_report" -> qDriftReport,
    "q_filter_pipeline" -> qFilterPipeline,
    "q_keep_rate" -> qKeepRate,
    "q_gram_novelty" -> qGramNovelty,
    "q_source_report" -> qSourceReport,
    "q_curation_e2e" -> qCurationE2e,
    "q_decontaminate" -> qDecontaminate,
    "q_bloom_decontaminate" -> qBloomDecontaminate)

  /** Bloom pruning is a pure pre-filter (false positives die in the
    * exact gram join), so the oracle is the exact-semantics SQL.
    */
  private def decontamSql: String =
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS words,
         |    CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 AS bucket
         |  FROM documents),
         |g AS MATERIALIZED (
         |  SELECT doc_id, bucket, unnest(list_distinct(list_transform(
         |    generate_series(1, len(words) - ${DecontamN - 1}),
         |    i -> md5(array_to_string(words[i:i+${DecontamN - 1}], ' '))))) AS gh
         |  FROM d WHERE len(words) >= $DecontamN),
         |ev AS (SELECT DISTINCT gh FROM g WHERE bucket >= $EvalBucket),
         |hits AS (
         |  SELECT doc_id, count(DISTINCT gh) AS n_hit_grams
         |  FROM g JOIN ev USING (gh) WHERE bucket < $EvalBucket GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN bucket < 80 THEN 'train' ELSE 'valid' END AS split,
         |  coalesce(h.n_hit_grams, 0) AS n_hit_grams,
         |  coalesce(h.n_hit_grams, 0) > 0 AS contaminated
         |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |WHERE bucket < $EvalBucket ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_source_entropy" ->
      """WITH st AS (
        |  SELECT lang, source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tk
        |  FROM documents GROUP BY lang, source),
        |lt AS (SELECT lang, CAST(sum(tk) AS BIGINT) AS lang_tokens,
        |    CAST(count(*) AS BIGINT) AS n_sources FROM st GROUP BY lang),
        |tm AS (SELECT lang, n_sources, lang_tokens,
        |    CAST(round(CAST(tk * 1000000 // lang_tokens AS DOUBLE) / 1e6
        |      * ln(CAST(tk * 1000000 // lang_tokens AS DOUBLE) / 1e6) * 1e6)
        |      AS BIGINT) AS term
        |  FROM st JOIN lt USING (lang)
        |  WHERE tk * 1000000 // lang_tokens > 0)
        |SELECT lang, max(n_sources) AS n_sources,
        |  max(lang_tokens) AS lang_tokens,
        |  round(-CAST(sum(term) AS DOUBLE) / 1e6, 6) AS entropy,
        |  round(exp(-CAST(sum(term) AS DOUBLE) / 1e6), 6) AS eff_sources,
        |  round(CASE WHEN max(n_sources) > 1
        |    THEN -CAST(sum(term) AS DOUBLE) / 1e6
        |      / ln(CAST(max(n_sources) AS DOUBLE))
        |    ELSE 0 END, 6) AS norm_entropy
        |FROM tm GROUP BY lang ORDER BY lang""".stripMargin,
    "q_token_gini" ->
      """WITH st AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tk
        |  FROM documents GROUP BY source),
        |r AS (SELECT tk,
        |    CAST(row_number() OVER (ORDER BY tk, source) AS BIGINT) AS i
        |  FROM st),
        |c AS (SELECT tk, CAST(sum(tk) OVER (ORDER BY tk DESC, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM st),
        |t AS (SELECT CAST(sum(tk) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n FROM st),
        |s1 AS (SELECT CAST(sum(i * tk) AS BIGINT) AS s1 FROM r),
        |conc AS (SELECT
        |    CAST(sum(CASE WHEN (cum - tk) * 2 < s THEN 1 ELSE 0 END)
        |      AS BIGINT) AS t50,
        |    CAST(sum(CASE WHEN (cum - tk) * 10 < s * 9 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS t90
        |  FROM c, t)
        |SELECT n AS n_sources, s AS total_tokens,
        |  round(2.0 * CAST(s1 AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini,
        |  t50 AS top50_sources, t90 AS top90_sources
        |FROM t, s1, conc""".stripMargin,
    "q_length_hist" ->
      s"""WITH b AS (
         |  SELECT source, n_chars // $HistBucketChars AS bucket,
         |    count(*) AS n_docs
         |  FROM documents GROUP BY source, n_chars // $HistBucketChars),
         |t AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS src_docs
         |  FROM b GROUP BY source)
         |SELECT source, bucket, n_docs,
         |  round((n_docs * 1000000 // src_docs) / 1000000.0, 6) AS share,
         |  CAST(sum(n_docs) OVER (
         |    PARTITION BY source ORDER BY bucket) AS BIGINT) AS cum_docs
         |FROM b JOIN t USING (source)
         |ORDER BY source, bucket""".stripMargin,
    "q_drift_report" ->
      s"""WITH d AS (
         |  SELECT source, n_chars // $HistBucketChars AS bucket,
         |    CAST('0x' || substr(md5('drift#' || doc_id), 1, 8) AS BIGINT) % 2
         |      AS cohort
         |  FROM documents),
         |b AS (
         |  SELECT source, bucket,
         |    CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |  FROM d GROUP BY source, bucket),
         |t AS (SELECT source, CAST(sum(n0) AS BIGINT) AS t0,
         |    CAST(sum(n1) AS BIGINT) AS t1
         |  FROM b GROUP BY source HAVING sum(n0) > 0 AND sum(n1) > 0)
         |SELECT source, max(t0) AS docs_a, max(t1) AS docs_b,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  round(CAST(sum(abs(n0 * 1000000 // t0 - n1 * 1000000 // t1))
         |    AS BIGINT) / 2000000.0, 6) AS tv_dist
         |FROM b JOIN t USING (source)
         |GROUP BY source ORDER BY source""".stripMargin,
    "q_curation_e2e" ->
      s"""WITH ${Dedup.clusterCtes},
         |fw AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |fs AS (SELECT doc_id, len(words) AS n_tokens,
         |  len(list_distinct(words)) / CAST(len(words) AS DOUBLE) AS ttr FROM fw),
         |fg AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(words) - 1),
         |    i -> array_to_string(words[i:i+1], ' '))) AS g FROM fw),
         |fc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY doc_id, g),
         |fr AS (SELECT doc_id,
         |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE) AS dupfrac
         |  FROM fc GROUP BY doc_id),
         |canon AS (SELECT d.doc_id,
         |    coalesce(c.comp, d.doc_id) AS canonical_id
         |  FROM documents d LEFT JOIN c${Dedup.ClusterIters} c ON d.doc_id = c.node),
         |xd AS (SELECT doc_id, words,
         |    CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 AS bucket
         |  FROM fw),
         |xg AS MATERIALIZED (
         |  SELECT doc_id, bucket, unnest(list_distinct(list_transform(
         |    generate_series(1, len(words) - ${DecontamN - 1}),
         |    i -> md5(array_to_string(words[i:i+${DecontamN - 1}], ' '))))) AS gh
         |  FROM xd WHERE len(words) >= $DecontamN),
         |xev AS (SELECT DISTINCT gh FROM xg WHERE bucket >= $EvalBucket),
         |xhits AS (
         |  SELECT DISTINCT doc_id FROM xg JOIN xev USING (gh)
         |  WHERE bucket < $EvalBucket),
         |verdict AS (
         |  SELECT fs.doc_id,
         |    CASE WHEN xd.bucket >= $EvalBucket THEN 'test'
         |         WHEN xd.bucket >= 80 THEN 'valid' ELSE 'train' END AS split,
         |    fs.n_tokens,
         |    CASE WHEN xd.bucket >= $EvalBucket THEN 'held_out'
         |      WHEN fs.n_tokens < $MinTokens THEN 'too_short'
         |      WHEN fr.dupfrac > $MaxDupBigramFrac THEN 'repetitive'
         |      WHEN fs.ttr < $MinTypeTokenRatio THEN 'low_diversity'
         |      WHEN canon.canonical_id <> fs.doc_id THEN 'near_duplicate'
         |      WHEN xhits.doc_id IS NOT NULL THEN 'contaminated'
         |      ELSE 'keep' END AS reason
         |  FROM fs JOIN fr USING (doc_id)
         |    JOIN canon ON canon.doc_id = fs.doc_id
         |    JOIN xd ON xd.doc_id = fs.doc_id
         |    LEFT JOIN xhits ON xhits.doc_id = fs.doc_id)
         |SELECT doc_id, split, CAST(n_tokens AS BIGINT) AS n_tokens, reason,
         |  (reason = 'keep') AS keep
         |FROM verdict ORDER BY doc_id""".stripMargin,
    "q_decontaminate" -> decontamSql,
    "q_bloom_decontaminate" -> decontamSql,
    "q_gram_novelty" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
         |  FROM documents),
         |g AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(words) - ${DecontamN - 1}),
         |    i -> md5(array_to_string(words[i:i+${DecontamN - 1}], ' '))))) AS gh
         |  FROM w WHERE len(words) >= $DecontamN),
         |f AS (SELECT gh, count(*) AS df FROM g GROUP BY gh),
         |r AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
         |  FROM g JOIN f USING (gh) GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_unique,
         |  round((n_unique * 1000000 // n_grams) / 1000000.0, 6) AS novelty
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_source_report" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id, source, lang,
        |    len(string_split(text, ' ')) AS n_tokens, md5(text) AS h
        |  FROM documents),
        |c AS (SELECT h, count(*) AS n_copies FROM d GROUP BY h),
        |r AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
        |    count(DISTINCT lang) AS n_langs,
        |    CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS dup_docs
        |  FROM d JOIN c USING (h) GROUP BY source)
        |SELECT source, n_docs, src_tokens,
        |  round((src_tokens * 1000000 // n_docs) / 1000000.0, 6) AS avg_tokens,
        |  n_langs, dup_docs,
        |  round((dup_docs * 1000000 // n_docs) / 1000000.0, 6) AS dup_frac
        |FROM r ORDER BY source""".stripMargin,
    "q_filter_pipeline" ->
      s"""WITH $verdictCtes
         |SELECT doc_id, n_tokens, round(ttr, 6) AS ttr,
         |  round(dupfrac, 6) AS dup_bigram_frac,
         |  (reason = 'keep') AS keep, reason
         |FROM verdict ORDER BY doc_id""".stripMargin,
    "q_keep_rate" ->
      s"""WITH $verdictCtes,
         |vs AS (SELECT v.doc_id, v.n_tokens, v.reason, d.source
         |  FROM verdict v JOIN documents d ON d.doc_id = v.doc_id),
         |a AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(CASE WHEN reason = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_keep,
         |    CAST(sum(CASE WHEN reason = 'too_short' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_too_short,
         |    CAST(sum(CASE WHEN reason = 'repetitive' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_repetitive,
         |    CAST(sum(CASE WHEN reason = 'low_diversity' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_low_diversity,
         |    CAST(sum(CASE WHEN reason = 'near_duplicate' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_near_duplicate,
         |    CAST(sum(CASE WHEN reason = 'keep' THEN n_tokens ELSE 0 END)
         |      AS BIGINT) AS kept_tokens,
         |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |  FROM vs GROUP BY source)
         |SELECT source, n_docs, n_keep, n_too_short, n_repetitive,
         |  n_low_diversity, n_near_duplicate, kept_tokens, total_tokens,
         |  round((n_keep * 1000000 // n_docs) / 1000000.0, 6) AS keep_rate,
         |  round((kept_tokens * 1000000 // total_tokens) / 1000000.0, 6)
         |    AS token_keep_rate
         |FROM a ORDER BY source""".stripMargin)

  /** The filter-pipeline verdict CTE chain (shared by the
    * q_filter_pipeline and q_keep_rate oracles — identical rules).
    */
  private def verdictCtes: String =
    s"""${Dedup.clusterCtes},
       |fw AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |fs AS (SELECT doc_id, len(words) AS n_tokens,
       |  len(list_distinct(words)) / CAST(len(words) AS DOUBLE) AS ttr FROM fw),
       |fg AS (SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(words) - 1),
       |    i -> array_to_string(words[i:i+1], ' '))) AS g FROM fw),
       |fc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY doc_id, g),
       |fr AS (SELECT doc_id,
       |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE) AS dupfrac
       |  FROM fc GROUP BY doc_id),
       |canon AS (SELECT d.doc_id,
       |    coalesce(c.comp, d.doc_id) AS canonical_id
       |  FROM documents d LEFT JOIN c${Dedup.ClusterIters} c ON d.doc_id = c.node),
       |verdict AS MATERIALIZED (
       |  SELECT fs.doc_id, n_tokens, ttr, dupfrac,
       |    CASE WHEN n_tokens < $MinTokens THEN 'too_short'
       |      WHEN dupfrac > $MaxDupBigramFrac THEN 'repetitive'
       |      WHEN ttr < $MinTypeTokenRatio THEN 'low_diversity'
       |      WHEN canonical_id <> fs.doc_id THEN 'near_duplicate'
       |      ELSE 'keep' END AS reason
       |  FROM fs JOIN fr USING (doc_id) JOIN canon ON canon.doc_id = fs.doc_id)""".stripMargin
}
