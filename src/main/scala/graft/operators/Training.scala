package graft.operators

import graft.Ckpt.BarrierOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Training-data preparation operators: deterministic splits, class
  * centroids, and sequence packing — the steps between "corpus" and
  * "training batches".
  *
  * Scale notes: the split is a stateless hash per row (no shuffle);
  * centroids are one map-side-combined groupBy over (label, dim);
  * packing is the same exclusive-prefix-sum shape as the chunker —
  * one shuffle on the partition key, bins assigned arithmetically,
  * no sequential driver loop.
  */
object Training {

  /** Deterministic 80/10/10 split via md5-hash bucketing of doc_id —
    * reproducible across engines and runs (no rand()).
    */
  def qTrainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        conv(substring(md5(concat(lit("split#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")

  /** Per-cluster centroids of the embedding space: mean per (label,
    * dimension) — one k-means maximization step, flattened to rows so
    * the oracle can replay it.
    */
  def qCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(round(avg(col("x").cast("double")), 6).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")

  val KmK = 8        // clusters (deterministic init: vec_id = 97k)
  val KmStride = 97
  val KmRounds = 3   // Lloyd refinement rounds (fixed → oracle unrolls)

  /** Lloyd k-means over the embedding corpus — the clustering
    * primitive SemDeDup-style curation and IVF index builds train
    * offline: K broadcast centroids, map-side nearest-centroid
    * assignment, per-dimension mean recentering, repeated KmRounds
    * times. Init is the deterministic stride pick (same rule as the
    * IVF centroids), so both engines start identically; distances are
    * rounded to 6 decimals BEFORE the argmin (ties → smallest k) and
    * centroids re-rounded each recenter, so distributed float order
    * can never flip an assignment between rounds.
    *
    * Scale shape per round: assignment is a broadcast cross of K rows
    * against one corpus scan collapsing map-side to (vec_id, k, d2);
    * recentering is one map-side-combined (k, dim) mean — K·dim rows
    * shuffle, never vectors. Centroids localCheckpoint per round (K
    * rows) so lineage stays flat; the corpus frame checkpoints once
    * and every round re-reads it.
    */
  /** Final Lloyd assignment (vec_id, cluster, d2) — shared by
    * qKmeans and the cluster-quality audit.
    */
  private[operators] def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    def sqd(a: Column, b: Column): Column =
      graft.functions.SqDist.sq_dist(a, b)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .barrier(false) // read by every assign + recenter round
    var cents = e
      .filter(col("vec_id") % KmStride === 0 && col("vec_id") < KmStride * KmK)
      .select(expr(s"CAST(vec_id div $KmStride AS INT)").as("k"), col("v").as("cv"))
    var assigned: DataFrame = null
    for (r <- 1 to KmRounds) {
      assigned = e.crossJoin(broadcast(cents))
        .withColumn("d2", round(sqd(col("v"), col("cv")), 6))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("k"))).as("b"))
        .select(col("vec_id"), col("b.k").as("k"), col("b.d2").as("d2"))
      if (r < KmRounds) cents = assigned.join(e, "vec_id")
        .select(col("k"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("k", "dim")
        .agg(round(avg(col("x")), 6).as("c"))
        .groupBy("k")
        .agg(graft.functions.SortedField.sorted_field(
          collect_list(struct(col("dim"), col("c"))), 1).as("cv"))
        .barrier(false) // K rows; keeps per-round lineage flat
    }
    assigned.select(col("vec_id"), col("k").as("cluster"), col("d2"))
  }

  def qKmeans(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(spark, dir).orderBy("vec_id")

  val OutlierK = 16  // reported most-distant vectors

  /** Embedding-space outlier audit: squared distance of every vector
    * to the GLOBAL centroid, on an exact integer micro-grid so the
    * result cannot depend on distributed summation order (floats
    * quantize per element; the centroid, distances, and ratios are
    * all long arithmetic — both engines truncate integer division
    * toward zero, verified). Top-K most-distant vectors through the
    * TakeOrdered path, with the corpus mean distance and each
    * outlier's distance ratio as integer percent. Curation use:
    * embedding outliers are the candidate mislabeled/garbage docs a
    * pipeline routes to review before they poison neighbor-based
    * dedup or clustering.
    *
    * Scale: one posexplode pass (rows × dims), two map-side-combined
    * aggregates (per-dim centroid — |dims| rows — and the per-vector
    * distance), a broadcast of the |dims|-row centroid, TakeOrdered
    * for the K survivors. No corpus-sized window, nothing quadratic.
    */
  def qEmbedOutliers(spark: SparkSession, dir: String): DataFrame = {
    // NaN components would blow the integer-grid cast (ANSI
    // CAST_OVERFLOW); NULL embeddings explode to nothing anyway —
    // both screened up front, a no-op on the driver's clean vectors
    val q = Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull
        && !exists(col("embedding"), x => isnan(x.cast("double"))))
      .select(col("vec_id"), posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long"))).as(Seq("dim", "qi")))
    val cent = q.groupBy("dim")
      .agg(sum("qi").as("s"), count(lit(1)).as("n"))
      .select(col("dim"), expr("s div n").as("c"))
    val d2 = q.join(broadcast(cent), "dim")
      .withColumn("dd", col("qi") - col("c"))
      .groupBy("vec_id").agg(sum(col("dd") * col("dd")).as("d2"))
    val mean = d2.agg(expr("sum(d2) div count(1)").as("mean_d2"))
    TopKUtil.globalTopK(d2, OutlierK, "vec_id",
        col("d2").desc, col("vec_id"))
      .crossJoin(broadcast(mean))
      .withColumn("ratio_pct", expr("d2 * 100 div mean_d2"))
      .select("rk", "vec_id", "d2", "mean_d2", "ratio_pct")
      .orderBy("rk")
  }

  /** Cluster-quality audit: label purity of the Lloyd clustering —
    * the health check a curation pipeline runs on the clusters that
    * drive SemDeDup / prototypicality filtering before trusting them
    * (a cluster whose members disagree on label is mixing concepts;
    * its "prototypes" are noise). Per cluster: size, majority label
    * (smallest label on ties, via one struct-min aggregate — no rank
    * window), and purity on the integer micro-grid.
    *
    * Scale shape: the corpus collapses to ≤ K·|labels| cells in ONE
    * map-side-combined exchange on top of the assignment; everything
    * after runs on dozens of rows.
    */
  def qClusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val lab = kmeansAssign(spark, dir)
      .join(Tables.embeddings(spark, dir).select("vec_id", "label"), "vec_id")
      .groupBy("cluster", "label")
      .agg(count(lit(1)).as("n_cl"))
    val tot = lab.groupBy("cluster").agg(sum(col("n_cl")).as("n"))
    val top = lab.groupBy("cluster")
      .agg(min(struct((-col("n_cl")).as("nn"), col("label"))).as("b"))
      .select(col("cluster"), col("b.label").as("top_label"),
        (-col("b.nn")).as("n_top"))
    tot.join(top, "cluster")
      .withColumn("purity",
        round(expr("n_top * 1000000 div n") / lit(1e6), 6))
      .select("cluster", "n", "top_label", "n_top", "purity")
      .orderBy("cluster")
  }

  val PackBudget = 128 // tokens per packed sequence bin
  val PackBuckets = 32 // hash buckets per lang for the two-level prefix sum

  /** Sequence packing: documents are packed into fixed token-budget
    * bins by exclusive prefix sum of token counts in the canonical
    * order (lang, hash-bucket, doc_id) — deterministic, parallel, no
    * greedy driver loop.
    *
    * Two-level prefix sum, because a window partitioned solely on
    * `lang` makes one task walk an entire language (a constant
    * fraction of a 100 TB corpus): documents hash into PackBuckets
    * buckets per lang, the corpus-sized window runs per (lang, bkt) —
    * langs×buckets-way parallel — and a per-bucket cumulative offset
    * (computed on the langs×buckets-row aggregate, then broadcast)
    * lifts local sums to global ones with a narrow add. Any
    * deterministic order is a valid packing order; the oracle replays
    * the identical arithmetic as one ORDER BY (bkt, doc_id) window.
    */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bkt",
        conv(substring(md5(concat(lit("pack#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % PackBuckets)
    val wLocal = Window.partitionBy("lang", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // Exclusive running offset of whole buckets within each lang: a
    // window over the (lang, bkt) AGGREGATE — ≤ PackBuckets rows per
    // lang partition regardless of corpus size, so the lang-only
    // partition key is bounded here.
    val wOff = Window.partitionBy("lang").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy("lang", "bkt")
      .agg(sum("n_tokens").as("bkt_tokens"))
      .withColumn("offset", coalesce(sum(col("bkt_tokens")).over(wOff), lit(0L)))
      .select("lang", "bkt", "offset")
    docs
      .withColumn("local_cum",
        coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .join(broadcast(offsets), Seq("lang", "bkt"))
      .withColumn("cum", col("offset") + col("local_cum"))
      .withColumn("bin_id", floor(col("cum") / PackBudget).cast("long"))
      .select("doc_id", "lang", "n_tokens", "bin_id")
      .orderBy("doc_id")
  }

  val StratQuota = 50

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES, 2006): each row draws a hash-uniform u ∈ (0, 1]
    * and scores key = ln(u)/w; the k LARGEST keys are an exact
    * weighted sample without replacement (u^(1/w) order ≡ ln(u)/w
    * order). The "sample proportional to quality/token mass" primitive
    * a curation pipeline uses for eval subsets and mixture draws —
    * with NO rand(): u derives from md5(salt, doc_id), so any cluster,
    * any partitioning, any retry produces the same sample.
    *
    * Scale shape: one narrow scan computes (w, key); the global top-k
    * rides TopKUtil.globalTopK (TakeOrdered semantics — partial heaps,
    * k rows per partition) — no corpus sort, no window.
    */
  def weightedSample(spark: SparkSession, dir: String, k: Int,
      salt: String = "ws"): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("w", size(split(col("text"), " ")).cast("double"))
      .filter(col("w") > 0)
      // 12 hex chars → [0, 16^12); +1 maps onto (0, 1] so ln is finite
      .withColumn("u",
        (conv(substring(md5(concat(lit(s"$salt#"), col("doc_id"))), 1, 12),
          16, 10).cast("double") + 1.0) / lit(2.81474976710656e14))
      .withColumn("es_key", log(col("u")) / col("w"))
      .select("doc_id", "source", "w", "es_key")
    TopKUtil.globalTopK(docs, k, "doc_id", col("es_key").desc, col("doc_id"))
      .select("rk", "doc_id", "source", "w", "es_key")
  }

  /** Stratified quota sampling: exactly K docs per language stratum,
    * picked by smallest deterministic hash (reproducible "random"
    * order, no rand()). The per-stratum selection runs through the
    * TopKPerGroup heap operator — partial map-side heaps, k rows per
    * stratum per partition shuffled — never a stratum-sized rank
    * window, so a billion-doc stratum costs what K does.
    */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.documents(spark, dir)
      .withColumn("h",
        conv(substring(md5(concat(lit("strat#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long"))
      // TopKPerGroup keeps LARGEST by order col; negate for smallest-h
      .withColumn("neg_h", -col("h"))
      .select("lang", "doc_id", "h", "neg_h")
    val top = graft.plans.TopKPerGroup.topK(hashed, StratQuota,
      Seq("lang"), orderCol = "neg_h", tieCol = "doc_id")
    top.withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .select("lang", "doc_id", "h", "rk")
      .orderBy("lang", "rk")
  }

  val BootstrapReps = 32

  /** The 32-bit uniform for (doc, replicate): first 8 md5 hex chars. */
  def poissonU(docId: Column, r: Column): Column =
    conv(substring(md5(concat(lit("boot#"), docId.cast("string"),
      lit("#"), r.cast("string"))), 1, 8), 16, 10).cast("long")

  /** u → Poisson(1) resample count via fixed CDF thresholds on the
    * 2^32 grid (literal longs, engine-identical; >4 truncates to 4).
    * Shared by the batch operator and its streaming twin.
    */
  def poissonW(u: Column): Column =
    when(u < 1580030169L, 0L)
      .when(u < 3160060338L, 1L)
      .when(u < 3950075422L, 2L)
      .when(u < 4213413783L, 3L)
      .otherwise(4L)

  /** Poisson bootstrap of a corpus mean — the distributed bootstrap
    * (resampling-with-replacement is impossible at 100 TB, but each
    * replicate's per-row resample count is ≈Poisson(1), so R replicate
    * means fall out of ONE corpus scan: a narrow broadcast ×R row
    * expansion, then a map-side-combined aggregate whose output is R
    * rows). The per-(doc, replicate) weight is deterministic — a
    * 32-bit uniform from the first 8 md5 hex chars stepped through
    * fixed Poisson(1)-CDF thresholds (literal longs on the 2^32 grid,
    * identical in both engines; counts >4 truncate to 4, covering
    * 99.63% of the CDF exactly and the tail conservatively) — and the
    * replicate means land on an integer ppm grid via BIGINT division
    * decomposed as quotient·1e6 + (remainder·1e6) div n_eff, so the
    * intermediate never exceeds max(wsum, n_eff·1e6) and no float ever
    * crosses the engine boundary. Downstream, the 2.5/97.5 percentiles
    * of the 32 means are the CI; the replicate rows themselves are the
    * oracle-checked output.
    */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val reps = spark.range(BootstrapReps).select(col("id").as("r"))
    Tables.documents(spark, dir)
      .select("doc_id", "n_chars")
      .crossJoin(broadcast(reps))
      .withColumn("u", poissonU(col("doc_id"), col("r")))
      .withColumn("w", poissonW(col("u")))
      .groupBy("r")
      .agg(sum("w").as("n_eff"),
        sum(col("w") * col("n_chars")).as("wsum"))
      // greatest(n_eff,1): an all-zero-weight replicate (prob e^-n, so
      // only degenerate corpora) has wsum=0 too, so the guarded mean
      // degrades to 0 instead of a NULL-vs-DuckDB-//0-error divergence.
      .selectExpr("r", "n_eff",
        "(wsum div greatest(n_eff, 1)) * 1000000 + ((wsum % greatest(n_eff, 1)) * 1000000) div greatest(n_eff, 1) AS mean_ppm")
      .orderBy("r")
  }

  /** Int8 max-abs embedding quantization with reconstruction-error
    * report — the 4× storage cut applied before embeddings land in a
    * 100 TB vector store. Pure narrow HOF folds per row (codegen'd,
    * no UDF, zero shuffles); the oracle replays the identical
    * arithmetic, so scale/max_err/mse hash-match.
    */
  def qQuantizeEmbeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("maxabs",
        aggregate(col("v"), lit(0.0), (a, x) => greatest(a, abs(x))))
      // NaN components make maxabs NaN and the int8 cast an ANSI
      // CAST_OVERFLOW task failure — screen them with the zero
      // vectors (no-op on the driver's clean embeddings)
      .filter(col("maxabs") > 0 && !isnan(col("maxabs")))
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .withColumn("qv",
        transform(col("v"), x => round(x * col("scale")).cast("int")))
      .withColumn("err",
        zip_with(col("v"), col("qv"), (x, q) => x - q / col("scale")))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale"),
        round(aggregate(col("err"), lit(0.0), (a, x) => greatest(a, abs(x))), 6)
          .as("max_err"),
        round(aggregate(col("err"), lit(0.0), (a, x) => a + x * x)
          / size(col("v")), 6).as("mse"))
      .orderBy("vec_id")

  val DsirBuckets = 1024      // hashed n-gram feature space
  val DsirTargetLang = "de"   // the target-domain slice

  /** DSIR importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much
    * more likely its hashed-unigram features are under a TARGET
    * domain's bag-of-ngrams LM than under the whole-corpus source LM —
    * log w(x) = Σ_tokens [log p_target(h) − log p_source(h)] with
    * add-1 smoothing over the DsirBuckets feature space. The target
    * here is the DsirTargetLang slice; in production it is any
    * high-quality reference corpus. Positive log-weight = "looks more
    * like the target than the background" = selected.
    *
    * Scale shape: features hash to DsirBuckets buckets, so BOTH LMs
    * are one map-side-combined aggregation into a bucket-count table
    * that is broadcast back (1024 rows regardless of corpus size);
    * the per-doc score is one more map-side-combined sum. Log-probs
    * are quantized to a 1e-6 integer grid per bucket and summed as
    * BIGINTs — the per-doc weight is exactly reproducible in any
    * summation order.
    */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h",
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % DsirBuckets)
    val a0 = toks.groupBy("h").agg(
      count(lit(1)).as("cs"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val tot = a0.agg(sum("cs").as("ts"), sum("ct").as("tt"))
    val lm = a0.crossJoin(broadcast(tot))
      .select(col("h"),
        (round(log((col("ct") + lit(1.0)) / (col("tt") + lit(DsirBuckets)))
          * lit(1000000.0)).cast("long")
          - round(log((col("cs") + lit(1.0)) / (col("ts") + lit(DsirBuckets)))
            * lit(1000000.0)).cast("long")).as("dlp"))
    val scored = toks.join(broadcast(lm), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("dlp")).as("logw_u"))
      // per-token normalization: the raw sum scales with doc length,
      // so selection on it would just pick short docs. FLOORED onto
      // the integer micro-grid — round(x/n/1e6, 6) sits exactly on a
      // .5 boundary whenever n divides the sum evenly, where the two
      // engines' rounding modes disagree (observed at sf0.1); a floor
      // of the identical IEEE quotient is boundary-free.
      .withColumn("avg_ulogw",
        floor(col("logw_u") / col("n_tokens")).cast("long"))
      .withColumn("avg_logw", round(col("avg_ulogw") / lit(1000000.0), 6))
    // selection threshold = 80th percentile of the per-token weight
    // (one broadcast 1-row exact-percentile aggregate, same
    // convention as q_quality_buckets — no rank window); integer
    // micro-units vs a 6-decimal threshold can only disagree within
    // 1e-6, far below the integer grid spacing
    val th = scored.agg(
      round(expr("percentile(avg_ulogw, 0.8)"), 6).as("p80"))
    scored.crossJoin(broadcast(th))
      .withColumn("selected", col("avg_ulogw") >= col("p80"))
      .select("doc_id", "n_tokens", "logw_u", "avg_logw", "selected")
      .orderBy("doc_id")
  }

  val MixBudget = 1000L // token budget per source domain

  /** Domain-mixture sampling: cap every source at a fixed token budget
    * by deterministic hash-rate sampling — the "domain weights" step
    * of a training-data mix. The acceptance threshold is pure integer
    * arithmetic (budget·10⁶ div src_tokens, capped at 10⁶), so the
    * same docs are selected in any engine — no float rate, no rand().
    *
    * Scale shape: one map-side-combined per-source token aggregation
    * (as many rows as sources), broadcast back, then a narrow
    * hash-compare pass over the corpus — selection costs one scan no
    * matter how skewed the domains are.
    */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val totals = toks.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    toks.join(broadcast(totals), "source")
      .withColumn("threshold",
        least(lit(1000000L), expr(s"${MixBudget * 1000000L} div src_tokens")))
      .withColumn("h",
        conv(substring(md5(concat(lit("mix#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % 1000000L)
      .withColumn("selected", col("h") < col("threshold"))
      .select("doc_id", "source", "n_tokens", "threshold", "selected")
      .orderBy("doc_id")
  }

  /** Temperature-scaled domain mixture — the multilingual-training
    * weighting (XLM-R §3.1: p_d ∝ (n_d/N)^α): flatten the domain
    * distribution so low-resource sources are upsampled relative to
    * their raw share. α is fixed at 0.5, i.e. the scaling is sqrt —
    * IEEE sqrt is correctly rounded, so both engines compute the
    * identical double before it is quantized to integer micro-units;
    * every downstream quotient is integer division (order-independent,
    * boundary-free). eff_tokens = the source's token budget under the
    * temperature weights at the corpus's total size.
    *
    * Scale shape: one map-side-combined aggregation down to #sources
    * rows, a broadcast 1-row total, then arithmetic on the tiny
    * aggregate — corpus cost is exactly one scan regardless of skew.
    */
  def qMixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("src_tokens"))
      .withColumn("u",
        round(sqrt(col("src_tokens").cast("double")) * 1e6).cast("long"))
    val tot = t.agg(sum("u").as("tot_u"), sum("src_tokens").as("tot_tokens"))
    t.crossJoin(broadcast(tot))
      .withColumn("share_micro", expr("src_tokens * 1000000 div tot_tokens"))
      .withColumn("w_micro", expr("u * 1000000 div tot_u"))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        round(col("share_micro") / lit(1e6), 6).as("share"),
        round(col("w_micro") / lit(1e6), 6).as("weight"),
        expr("w_micro * tot_tokens div 1000000").as("eff_tokens"))
      .orderBy("source")
  }

  val NumShards = 8

  /** Deterministic shuffle-shard for training export: every document
    * gets a (shard, pos) address from a salted hash — the "global
    * shuffle" a dataloader expects, without a global sort. shard =
    * hash mod S is a stateless narrow pass; pos ranks by hash WITHIN
    * each shard, so the window parallelizes across shards (never the
    * single-partition global row_number). Reproducible across engines
    * and runs — no rand(); re-running on the same corpus yields the
    * same shard files byte-for-byte.
    */
  def qShardExport(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.documents(spark, dir)
      .withColumn("h",
        conv(substring(md5(concat(lit("shard#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("shard", pmod(col("h"), lit(NumShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** The training-export composition — the last mile of the pipeline
    * as ONE Catalyst plan: curation verdict (quality gates + near-dup
    * suppression + decontamination; only `keep` docs survive) →
    * token-budget sequence packing of the survivors → deterministic
    * shard address per packed bin. What a dataloader actually reads.
    *
    * Scale shape: the verdict subplan is qCurationE2e's (doc_id joins,
    * no new corpus scans); packing reuses the two-level prefix-sum
    * shape (the corpus window runs per hash-bucket; the offset window
    * runs on the ≤PackBuckets-row aggregate under a constant
    * non-foldable key, the TopKUtil convention); shard assignment is
    * a narrow hash. Composing adds no shuffle wider than (doc_id).
    */
  def qTrainingExport(spark: SparkSession, dir: String): DataFrame = {
    val kept = Curation.qCurationE2e(spark, dir)
      .filter(col("keep"))
      .select(col("doc_id"), col("n_tokens"))
      .withColumn("bkt",
        conv(substring(md5(concat(lit("xpack#"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % PackBuckets)
      // survivors only (doc_id, n_tokens, bkt) — checkpointed so the
      // curation subplan runs ONCE, not once per consumer (the offsets
      // aggregate and the packing window both read it)
      .barrier(false)
    val wLocal = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.partitionBy(pmod(col("bkt"), lit(1))).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = kept.groupBy("bkt")
      .agg(sum("n_tokens").as("bkt_tokens"))
      .withColumn("offset", coalesce(sum(col("bkt_tokens")).over(wOff), lit(0L)))
      .select("bkt", "offset")
    kept
      .withColumn("local_cum",
        coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .join(broadcast(offsets), "bkt")
      .withColumn("cum", col("offset") + col("local_cum"))
      .withColumn("bin_id", floor(col("cum") / PackBudget).cast("long"))
      .withColumn("shard",
        conv(substring(md5(concat(lit("xshard#"), col("bin_id"))), 1, 8), 16, 10)
          .cast("long") % NumShards)
      .select("doc_id", "n_tokens", "bin_id", "shard")
      .orderBy("doc_id")
  }

  val PcaRounds = 3

  /** Top principal component of the embedding corpus by power
    * iteration — the spectral primitive behind embedding-drift audits,
    * whitening, and low-rank compression: w ← Σᵢ (xᵢ−μ)((xᵢ−μ)·w),
    * normalized, PcaRounds times from the deterministic e₀ start. The
    * covariance matrix is never materialized — each round touches
    * only per-vector dots and a per-dimension sum.
    *
    * Cross-engine float discipline, stricter than the cosine queries:
    * inputs are lifted to integer micro-units at the scan (xq =
    * round(x·10⁶)), the centering mean is an integer division, the
    * per-vector dot and the per-dimension accumulation are pure
    * BIGINT arithmetic (dot downscaled by 10⁶ between the two
    * products to stay in range), and the only float ops — the
    * normalize — run over the SAME 64 integers in the same fold
    * order, so IEEE correctly-rounded ops give bit-identical w on
    * both engines. No rounding boundary anywhere.
    *
    * Scale shape: per round, ONE corpus pass computes the dots
    * (narrow, w broadcast as a 1-row frame) and one map-side-combined
    * (dim) sum shuffles 64 rows; μ is the same shape once up front.
    * That is the textbook distributed power iteration.
    */
  def qTopComponent(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xq"))
      .barrier(false) // read by the mean AND every round's pass
    val mu = e.select(posexplode(col("xq")).as(Seq("dim", "x")))
      .groupBy("dim").agg(expr("sum(x) div count(*)").as("m"))
      .agg(graft.functions.SortedField.sorted_field(
        collect_list(struct(col("dim"), col("m"))), 1).as("mu"))
      .barrier(false) // 1 row
    var w = mu.select(
        expr("transform(sequence(0, size(mu) - 1), " +
          "i -> CAST(CASE WHEN i = 0 THEN 1000000 ELSE 0 END AS BIGINT))").as("wq"),
        col("mu"))
      .barrier(false)
    for (_ <- 1 to PcaRounds) {
      val sums = e.crossJoin(broadcast(w))
        .withColumn("ds", expr(
          "aggregate(transform(sequence(0, size(xq) - 1), " +
            "j -> (xq[j] - mu[j]) * wq[j]), CAST(0 AS BIGINT), (a, t) -> a + t) " +
            "div 1000000"))
        .select(col("ds"), col("mu"), posexplode(col("xq")).as(Seq("dim", "x")))
        .withColumn("t", col("ds") * (col("x") - element_at(col("mu"), col("dim") + 1)))
        .groupBy("dim").agg(sum("t").as("s"))
      w = sums
        .agg(graft.functions.SortedField.sorted_field(
          collect_list(struct(col("dim"), col("s"))), 1).as("sv"))
        .withColumn("nrm", sqrt(expr(
          "aggregate(transform(sv, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), " +
            "CAST(0 AS DOUBLE), (a, t) -> a + t)")))
        .crossJoin(broadcast(mu))
        .select(expr("transform(sv, x -> CAST(round(x / nrm * 1000000) AS BIGINT))").as("wq"),
          col("mu"))
        .barrier(false) // 1 row; flattens per-round lineage
    }
    w.select(posexplode(col("wq")).as(Seq("dim", "l_micro")))
      .select(col("dim"), col("l_micro"),
        round(col("l_micro") / 1e6, 6).as("loading"))
      .orderBy("dim")
  }

  val EpochFactor = 2L   // total token budget = EpochFactor × corpus tokens
  val MaxEpochs = 4L     // repetition cap per source (value decays past ~4)

  /** Data-constrained epoch allocation (Muennighoff et al. 2023:
    * repeating data holds value for ~4 epochs, then decays): split a
    * token budget of EpochFactor × the corpus EVENLY across sources,
    * cap each source at MaxEpochs passes over its own tokens, and
    * report the per-source epoch count plus the budget left on the
    * table by capped sources — the schedule a data-constrained
    * pretraining run feeds its sampler.
    *
    * All allocation arithmetic is integer (micro-epochs via `div`), so
    * the schedule is byte-identical across engines and partitionings.
    * Scale shape: one map-side-combined scan down to #sources rows, a
    * broadcast 1-row total, then arithmetic on the tiny aggregate.
    */
  def qEpochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("src_tokens"))
    val tot = t.agg(sum("src_tokens").as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    t.crossJoin(broadcast(tot))
      .withColumn("fair_share", expr(s"tot_tokens * $EpochFactor div n_sources"))
      .withColumn("alloc_tokens",
        least(col("fair_share"), expr(s"src_tokens * $MaxEpochs")))
      .withColumn("epochs_micro", expr("alloc_tokens * 1000000 div src_tokens"))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        col("fair_share"), col("alloc_tokens"),
        round(col("epochs_micro") / lit(1e6), 6).as("epochs"),
        (col("fair_share") - col("alloc_tokens")).as("unused_budget"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_epoch_schedule" -> qEpochSchedule,
    "q_top_component" -> qTopComponent,
    "q_training_export" -> qTrainingExport,
    "q_domain_mix" -> qDomainMix,
    "q_kmeans" -> qKmeans,
    "q_cluster_purity" -> qClusterPurity,
    "q_mix_temperature" -> qMixTemperature,
    "q_dsir_weights" -> qDsirWeights,
    "q_train_test_split" -> qTrainTestSplit,
    "q_centroids" -> qCentroids,
    "q_pack_sequences" -> qPackSequences,
    "q_stratified_sample" -> qStratifiedSample,
    "q_shard_export" -> qShardExport,
    "q_quantize_embeddings" -> qQuantizeEmbeddings,
    "q_bootstrap_ci" -> qBootstrapCi,
    "q_embed_outliers" -> qEmbedOutliers)

  /** The same KmRounds Lloyd rounds unrolled as SQL CTEs (assign →
    * recenter → … → final assign), identical rounding points.
    */
  private def kmeansCtes: String = {
    def sqd(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    def assign(name: String, cPrev: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, k, d2 FROM (
         |    SELECT e.vec_id, c.k, round(${sqd("e.v", "c.cv")}, 6) AS d2,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${sqd("e.v", "c.cv")}, 6), c.k) AS rn
         |    FROM e CROSS JOIN $cPrev c)
         |  WHERE rn = 1)""".stripMargin
    def recenter(name: String, aPrev: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT k, list(c ORDER BY dim) AS cv FROM (
         |    SELECT a.k, ed.dim, round(avg(ed.x), 6) AS c
         |    FROM $aPrev a JOIN ed ON a.vec_id = ed.vec_id
         |    GROUP BY a.k, ed.dim)
         |  GROUP BY k)""".stripMargin
    val rounds = (1 until KmRounds)
      .map(r => s"${assign(s"a$r", s"c${r - 1}")},\n${recenter(s"c$r", s"a$r")}")
      .mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |ed AS MATERIALIZED (
       |  SELECT vec_id, unnest(generate_series(0, len(v) - 1)) AS dim,
       |    unnest(v) AS x
       |  FROM e),
       |c0 AS (SELECT CAST(vec_id // $KmStride AS INT) AS k, v AS cv
       |  FROM e WHERE vec_id % $KmStride = 0 AND vec_id < ${KmStride * KmK}),
       |$rounds,
       |${assign(s"a$KmRounds", s"c${KmRounds - 1}")}""".stripMargin
  }

  /** Shared Lloyd CTE chain ending in a$KmRounds(vec_id, k, d2). */
  private def kmeansSql: String =
    s"""WITH $kmeansCtes
       |SELECT vec_id, k AS cluster, d2 FROM a$KmRounds ORDER BY vec_id""".stripMargin

  private def clusterPuritySql: String =
    s"""WITH $kmeansCtes,
       |lab AS (SELECT a.k AS cluster, emb.label,
       |    CAST(count(*) AS BIGINT) AS n_cl
       |  FROM a$KmRounds a JOIN embeddings emb ON a.vec_id = emb.vec_id
       |  GROUP BY a.k, emb.label),
       |tot AS (SELECT cluster, CAST(sum(n_cl) AS BIGINT) AS n
       |  FROM lab GROUP BY cluster),
       |top AS (SELECT cluster, label AS top_label, n_cl AS n_top FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cluster
       |    ORDER BY n_cl DESC, label) AS rn FROM lab)
       |  WHERE rn = 1)
       |SELECT cluster, n, top_label, n_top,
       |  round((n_top * 1000000 // n) / 1000000.0, 6) AS purity
       |FROM tot JOIN top USING (cluster) ORDER BY cluster""".stripMargin

  /** Power-iteration oracle: identical integer micro-unit arithmetic,
    * rounds unrolled (see qTopComponent's float-discipline note).
    */
  private def topComponentSql: String = {
    val rounds = (1 to PcaRounds).map { r =>
      s"""dd$r AS (
         |  SELECT e.vec_id, e.xq,
         |    CAST(list_sum(list_transform(generate_series(1, len(e.xq)),
         |      j -> (e.xq[j] - w.mu[j]) * w.wq[j])) AS BIGINT) // 1000000 AS ds
         |  FROM e, w${r - 1} w),
         |s$r AS (
         |  SELECT list(s ORDER BY dim) AS sv FROM (
         |    SELECT t.dim, CAST(sum(t.ds * (t.x - mu.mu[t.dim])) AS BIGINT) AS s
         |    FROM (SELECT d.ds, unnest(generate_series(1, len(d.xq))) AS dim,
         |        unnest(d.xq) AS x FROM dd$r d) t, mu
         |    GROUP BY t.dim)),
         |w$r AS MATERIALIZED (
         |  SELECT list_transform(sv, x -> CAST(round(x / sqrt(list_sum(
         |      list_transform(sv, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
         |      * 1000000) AS BIGINT)) AS wq,
         |    (SELECT mu FROM mu) AS mu
         |  FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
       |  FROM embeddings),
       |mu AS MATERIALIZED (
       |  SELECT list(m ORDER BY dim) AS mu FROM (
       |    SELECT dim, CAST(CAST(sum(x) AS BIGINT) // count(*) AS BIGINT) AS m
       |    FROM (SELECT unnest(generate_series(1, len(xq))) AS dim, unnest(xq) AS x
       |      FROM e)
       |    GROUP BY dim)),
       |w0 AS (SELECT list_transform(generate_series(1, len(mu)),
       |    i -> CAST(CASE WHEN i = 1 THEN 1000000 ELSE 0 END AS BIGINT)) AS wq, mu
       |  FROM mu),
       |$rounds
       |SELECT dim - 1 AS dim, CAST(wq[dim] AS BIGINT) AS l_micro,
       |  round(wq[dim] / 1000000.0, 6) AS loading
       |FROM (SELECT unnest(generate_series(1, len(wq))) AS dim, wq FROM w$PcaRounds)
       |ORDER BY dim""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bootstrap_ci" ->
      s"""WITH reps AS (SELECT unnest(generate_series(0, ${BootstrapReps - 1})) AS r),
         |x AS (
         |  SELECT reps.r, d.n_chars,
         |    CAST('0x' || substr(md5('boot#' || d.doc_id || '#' || reps.r), 1, 8)
         |      AS BIGINT) AS u
         |  FROM documents d CROSS JOIN reps),
         |w AS (
         |  SELECT r, n_chars,
         |    CASE WHEN u < 1580030169 THEN 0 WHEN u < 3160060338 THEN 1
         |         WHEN u < 3950075422 THEN 2 WHEN u < 4213413783 THEN 3
         |         ELSE 4 END AS w
         |  FROM x)
         |,agg AS (
         |  SELECT r, CAST(sum(w) AS BIGINT) AS n_eff,
         |    CAST(sum(w * n_chars) AS BIGINT) AS wsum
         |  FROM w GROUP BY r)
         |SELECT r, n_eff,
         |  (wsum // greatest(n_eff, 1)) * 1000000 + ((wsum % greatest(n_eff, 1)) * 1000000) // greatest(n_eff, 1) AS mean_ppm
         |FROM agg ORDER BY r""".stripMargin,
    "q_epoch_schedule" ->
      s"""WITH t AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS tot_tokens,
         |  count(*) AS n_sources FROM t),
         |a AS (SELECT source, n_docs, src_tokens,
         |    CAST(tot_tokens * $EpochFactor // n_sources AS BIGINT) AS fair_share,
         |    least(CAST(tot_tokens * $EpochFactor // n_sources AS BIGINT),
         |      src_tokens * $MaxEpochs) AS alloc_tokens
         |  FROM t CROSS JOIN tot)
         |SELECT source, n_docs, src_tokens, fair_share, alloc_tokens,
         |  round((alloc_tokens * 1000000 // src_tokens) / 1000000.0, 6) AS epochs,
         |  fair_share - alloc_tokens AS unused_budget
         |FROM a ORDER BY source""".stripMargin,
    "q_top_component" -> topComponentSql,
    "q_training_export" ->
      s"""WITH kept AS MATERIALIZED (
         |  SELECT doc_id, n_tokens,
         |    CAST('0x' || substr(md5('xpack#' || doc_id), 1, 8) AS BIGINT)
         |      % $PackBuckets AS bkt
         |  FROM (${Curation.oracles("q_curation_e2e")}) WHERE keep),
         |b AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(floor(coalesce(sum(n_tokens) OVER (
         |      ORDER BY bkt, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      / $PackBudget) AS BIGINT) AS bin_id
         |  FROM kept)
         |SELECT doc_id, n_tokens, bin_id,
         |  CAST('0x' || substr(md5('xshard#' || bin_id), 1, 8) AS BIGINT)
         |    % $NumShards AS shard
         |FROM b ORDER BY doc_id""".stripMargin,
    "q_kmeans" -> kmeansSql,
    "q_embed_outliers" ->
      s"""WITH v AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
         |  FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT vec_id, unnest(generate_series(0, len(xq) - 1)) AS dim,
         |    unnest(xq) AS qi
         |  FROM v),
         |cent AS (SELECT dim,
         |    CAST(sum(qi) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
         |  FROM q GROUP BY dim),
         |d AS MATERIALIZED (SELECT vec_id,
         |    CAST(sum((qi - c) * (qi - c)) AS BIGINT) AS d2
         |  FROM q JOIN cent USING (dim) GROUP BY vec_id),
         |m AS (SELECT CAST(sum(d2) AS BIGINT)
         |    // CAST(count(*) AS BIGINT) AS mean_d2 FROM d),
         |t AS (SELECT vec_id, d2,
         |    CAST(row_number() OVER (ORDER BY d2 DESC, vec_id) AS BIGINT) AS rk
         |  FROM d)
         |SELECT rk, vec_id, d2, mean_d2,
         |  CAST(d2 * 100 // mean_d2 AS BIGINT) AS ratio_pct
         |FROM t, m WHERE rk <= $OutlierK ORDER BY rk""".stripMargin,
    "q_cluster_purity" -> clusterPuritySql,
    "q_mix_temperature" ->
      """WITH t AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        |  FROM documents GROUP BY source),
        |u AS (SELECT source, n_docs, src_tokens,
        |    CAST(round(sqrt(CAST(src_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS u
        |  FROM t),
        |tot AS (SELECT CAST(sum(u) AS BIGINT) AS tot_u,
        |  CAST(sum(src_tokens) AS BIGINT) AS tot_tokens FROM u)
        |SELECT source, n_docs, src_tokens,
        |  round((src_tokens * 1000000 // tot_tokens) / 1000000.0, 6) AS share,
        |  round((u * 1000000 // tot_u) / 1000000.0, 6) AS weight,
        |  CAST((u * 1000000 // tot_u) * tot_tokens // 1000000 AS BIGINT) AS eff_tokens
        |FROM u CROSS JOIN tot ORDER BY source""".stripMargin,
    "q_dsir_weights" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % $DsirBuckets AS h
         |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
         |    FROM documents)),
         |a0 AS MATERIALIZED (
         |  SELECT h, count(*) AS cs,
         |    sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS ct
         |  FROM toks GROUP BY h),
         |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS ts,
         |  CAST(sum(ct) AS BIGINT) AS tt FROM a0),
         |lm AS MATERIALIZED (
         |  SELECT h,
         |    CAST(round(ln((ct + 1.0) / (tt + $DsirBuckets)) * 1000000) AS BIGINT)
         |    - CAST(round(ln((cs + 1.0) / (ts + $DsirBuckets)) * 1000000) AS BIGINT)
         |    AS dlp
         |  FROM a0 CROSS JOIN tot),
         |scored AS MATERIALIZED (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    CAST(sum(dlp) AS BIGINT) AS logw_u,
         |    CAST(floor(CAST(sum(dlp) AS BIGINT) / count(*)) AS BIGINT) AS avg_ulogw
         |  FROM toks JOIN lm USING (h)
         |  GROUP BY doc_id),
         |th AS (SELECT round(quantile_cont(avg_ulogw, 0.8), 6) AS p80 FROM scored)
         |SELECT doc_id, n_tokens, logw_u,
         |  round(avg_ulogw / 1000000.0, 6) AS avg_logw,
         |  avg_ulogw >= p80 AS selected
         |FROM scored CROSS JOIN th ORDER BY doc_id""".stripMargin,
    "q_domain_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
         |  FROM t GROUP BY source)
         |SELECT doc_id, t.source, n_tokens,
         |  least(1000000, ${MixBudget * 1000000L} // src_tokens) AS threshold,
         |  CAST('0x' || substr(md5('mix#' || doc_id), 1, 8) AS BIGINT) % 1000000
         |    < least(1000000, ${MixBudget * 1000000L} // src_tokens) AS selected
         |FROM t JOIN s ON t.source = s.source
         |ORDER BY doc_id""".stripMargin,
    "q_train_test_split" ->
      """SELECT doc_id, lang,
        |  CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 < 80
        |    THEN 'train'
        |    WHEN CAST('0x' || substr(md5('split#' || doc_id), 1, 8) AS BIGINT) % 100 < 90
        |    THEN 'valid' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_centroids" ->
      """SELECT label, dim, round(avg(x), 6) AS centroid, count(*) AS n
        |FROM (
        |  SELECT label,
        |    unnest(generate_series(0, len(embedding) - 1)) AS dim,
        |    unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x
        |  FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "q_shard_export" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5('shard#' || doc_id), 1, 8) AS BIGINT) AS h
         |  FROM documents),
         |s AS (SELECT doc_id, h, h % $NumShards AS shard FROM h)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
         |    AS pos
         |FROM s ORDER BY shard, pos""".stripMargin,
    "q_quantize_embeddings" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v,
        |  list_aggregate(list_transform(v, x -> abs(x)), 'max') AS maxabs FROM e),
        |s AS (SELECT vec_id, v, 127.0 / maxabs AS scale FROM m WHERE maxabs > 0),
        |q AS (SELECT vec_id, v, scale,
        |  list_transform(v, x -> CAST(round(x * scale) AS INT)) AS qv FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  round(list_aggregate(list_transform(generate_series(1, len(v)),
        |    i -> abs(v[i] - qv[i] / scale)), 'max'), 6) AS max_err,
        |  round(list_sum(list_transform(generate_series(1, len(v)),
        |    i -> (v[i] - qv[i] / scale) * (v[i] - qv[i] / scale))) / len(v), 6) AS mse
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    CAST('0x' || substr(md5('strat#' || doc_id), 1, 8) AS BIGINT) AS h
         |  FROM documents)
         |SELECT lang, doc_id, h, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY h, doc_id) AS rk FROM h)
         |WHERE rk <= $StratQuota ORDER BY lang, rk""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
         |    CAST('0x' || substr(md5('pack#' || doc_id), 1, 8) AS BIGINT)
         |      % $PackBuckets AS bkt
         |  FROM documents)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(floor(coalesce(sum(n_tokens) OVER (
         |    PARTITION BY lang ORDER BY bkt, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $PackBudget)
         |    AS BIGINT) AS bin_id
         |FROM t ORDER BY doc_id""".stripMargin)
}
