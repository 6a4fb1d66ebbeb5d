package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate sketches for interactive-scale analytics: HLL distinct
  * counts and t-digest-style quantiles via the built-in codegen'd
  * approximations. No DuckDB oracle — sketch internals differ across
  * engines by design — so these are spec-bounded against the exact
  * answers instead (SketchesSpec: relative error limits).
  *
  * Scale: sketches are the 100 TB answer to countDistinct/percentile —
  * fixed-size state, map-side mergeable, one shuffle of sketch bytes.
  */
object Sketches {

  /** Approx vs exact distinct users/orders per event type. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** Approx (t-digest-ish) vs exact median of event value per type. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 1000)").as("approx_p50"),
        expr("percentile(value, 0.5)").as("exact_p50"))

  /** Misra–Gries heavy hitters over the corpus token stream via the
    * custom typed Aggregator (graft.functions.FreqItemsAgg): ≤ k
    * counters of state however large the vocabulary. Returns
    * (word, est) rows for the sketch's survivors.
    */
  def freqItems(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val agg = udaf(new graft.functions.FreqItemsAgg(k))
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(agg(col("word")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("word", "est")))
      .orderBy(col("est").desc, col("word"))
  }

  val HhCounters = 1024 // MG counters; guarantee covers any freq > n/(k+1)
  val HhFrac = 500.0    // report words with count >= n_total / HhFrac

  /** EXACT heavy hitters by two-pass candidate pruning — the pattern
    * that makes the Misra–Gries sketch oracle-able: pass 1 builds the
    * bounded MG summary (HhCounters counters/task, merged to one),
    * whose survivors are a guaranteed superset of every word with
    * frequency ≥ n/HhFrac (since HhFrac < HhCounters+1); pass 2
    * re-scans, keeps candidate tokens via a broadcast semi-join, and
    * counts them exactly.
    *
    * Scale: the full-vocabulary groupBy this replaces shuffles every
    * distinct token per task (billions at web scale); here the shuffle
    * is ≤ HhCounters sketch entries per task in pass 1 and ≤ the
    * candidate count in pass 2 — both fixed, corpus-size-independent.
    * The total count rides along as a broadcast 1-row cross join, not
    * a driver-side collect.
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val agg = udaf(new graft.functions.FreqItemsAgg(HhCounters))
    val cands = tokens.agg(agg(col("word")).as("sk"))
      .select(explode(map_keys(col("sk"))).as("word"))
    val total = tokens.agg(count(lit(1)).as("n_total"))
    tokens.join(broadcast(cands), "word")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") >= col("n_total") / lit(HhFrac))
      .select(col("word"), col("c"),
        round(col("c") / col("n_total").cast("double"), 6).as("frac"))
      .orderBy("word")
  }

  val CmsDepth = 4   // d independent hash rows: P(all collide) ≤ 2^-d
  val CmsWidth = 512 // w counters per row: overcount ≤ e·N/w in expectation

  /** Count-Min sketch counters over the token stream (Cormode &
    * Muthukrishnan 2005): d×w integer counters; token t increments
    * counter (j, h_j(t)) for each of the d salted md5 hash rows. The
    * (j, bucket) table IS the mergeable sketch — shard sketches add
    * cell-wise, so a 100 TB corpus builds it as one map-side-combined
    * d·w-cell aggregate (fixed size, corpus-independent) instead of a
    * full-vocabulary shuffle.
    */
  def cmsCounters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .select(explode(transform(sequence(lit(0), lit(CmsDepth - 1)),
        j => struct(j.as("j"),
          (conv(substring(md5(concat(lit("cms"), j, lit("#"), col("word"))),
            1, 8), 16, 10).cast("long") % CmsWidth).as("bucket")))).as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-frequency estimates from the CMS: est(t) = min_j counter
    * (j, h_j(t)) — NEVER an underestimate (every counter t touches
    * contains all of t's increments), overcount bounded by colliding
    * mass. Exact counts ride along as audit columns (drop them at
    * scale; the probe side joins d broadcast-sized counter rows per
    * distinct word, the vocabulary never re-shuffles).
    */
  def cmsEstimate(spark: SparkSession, dir: String): DataFrame = {
    val exact = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("exact"))
    val probes = exact.select(col("word"), col("exact"),
        explode(transform(sequence(lit(0), lit(CmsDepth - 1)),
          j => struct(j.as("j"),
            (conv(substring(md5(concat(lit("cms"), j, lit("#"), col("word"))),
              1, 8), 16, 10).cast("long") % CmsWidth).as("bucket")))).as("cell"))
      .select(col("word"), col("exact"),
        col("cell.j").as("j"), col("cell.bucket").as("bucket"))
    probes.join(broadcast(cmsCounters(spark, dir)), Seq("j", "bucket"))
      .groupBy("word").agg(max("exact").as("exact"), min("c").as("est"))
      .withColumn("overcount", col("est") - col("exact"))
  }

  val AmsGroups = 5   // median over group means kills outlier estimators
  val AmsPerGroup = 9 // mean over 9 tames the 2·F2² estimator variance

  /** AMS/tug-of-war sign sums over the token stream (Alon, Matias &
    * Szegedy 1996): Z_j = Σ_t s_j(t) with s_j ∈ {−1,+1} from salted
    * md5 — 45 longs of TOTAL state for the corpus. Linearity is the
    * scale property: Z(A ∪ B) = Z(A) + Z(B), so shard sketches add
    * (spec-proved exactly on a corpus split); one map-side-combined
    * fixed-size aggregate, no vocabulary shuffle.
    */
  def amsSigns(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .select(explode(transform(
        sequence(lit(0), lit(AmsGroups * AmsPerGroup - 1)),
        j => struct(j.as("j"),
          (conv(substring(md5(concat(lit("ams"), j, lit("#"), col("word"))),
            1, 8), 16, 10).cast("long") % 2 * 2 - 1).as("s")))).as("c"))
      .groupBy(col("c.j").as("j")).agg(sum(col("c.s")).as("z"))

  /** F2 (second frequency moment — the SELF-join size Σ c²) estimated
    * from the AMS sketch as median-of-means over E[Z²] = F2, next to
    * the exact value q_join_size_est-style arithmetic gives — the
    * fixed-state path when the exact full-vocabulary aggregate stops
    * fitting. The median of AmsGroups means is exact arithmetic over
    * a 5-row table (sort_array/element_at — no percentile estimator
    * inside the estimator audit).
    */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val grouped = amsSigns(docs)
      .withColumn("g", expr(s"j div $AmsPerGroup"))
      .groupBy("g").agg(avg(expr("z * z")).as("m"))
    val est = grouped.agg(element_at(sort_array(collect_list(col("m"))),
      (AmsGroups + 1) / 2).as("f2_est"))
    val exact = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * c")).as("f2_exact"))
    est.crossJoin(broadcast(exact))
      .withColumn("rel_err",
        round(abs(col("f2_est") - col("f2_exact"))
          / col("f2_exact").cast("double"), 6))
  }

  val KmvK = 64
  val KmvHashMax = 1152921504606846976L   // 2^60: 15 hex digits of md5

  /** KMV (k-minimum-values) distinct-count sketch per event type
    * (Bar-Yossef et al. 2002), the ORACLE-CHECKED sketch the
    * spec-bounded approx_count_distinct above can't be: the estimate
    * is a pure function of the k smallest 60-bit md5 hashes —
    * n̂ = (k−1)·2^60/h_(k) — so DuckDB replays it bit-for-bit with the
    * identical hash arithmetic. Exact distinct and relative error ride
    * along as the audit columns (at 100 TB you'd drop them; here they
    * make the error honest).
    *
    * Scale shape: per-type k-minima via the TopKPerGroup bounded heap
    * (≤ k rows per type per input partition shuffle — the full
    * distinct-hash set never converges on one node); KmvK·#types rows
    * of final state. Mergeable by construction (union of minima).
    */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val dist = Tables.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(concat(lit("kmv#"), col("user_id"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val mins = graft.plans.TopKPerGroup.topK(
      dist.withColumn("nh", -col("h")), KmvK, Seq("event_type"), "nh", "h")
    val agg = mins.groupBy("event_type")
      .agg(max("h").as("h_k"), count(lit(1)).as("n_kept"))
    val exact = Tables.events(spark, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    agg.join(exact, "event_type")
      .withColumn("est_users",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(round(lit((KmvK - 1).toDouble)
            * (lit(KmvHashMax.toDouble) / col("h_k").cast("double"))).cast("long")))
      .select(col("event_type"), col("h_k"), col("n_kept"),
        col("est_users"), col("exact_users"),
        round(abs(col("est_users") - col("exact_users"))
          / col("exact_users").cast("double"), 6).as("rel_err"))
      .orderBy("event_type")
  }

  /** Pairwise source-overlap estimation from KMV sketch ALGEBRA: the
    * per-type k-minimum-value sketches (same md5 hash discipline as
    * qKmvDistinct) are merged per type pair — union estimate = the k
    * smallest of the merged minima, intersection by
    * inclusion-exclusion, Jaccard as exact integer ppm. The pairwise
    * stage therefore touches KmvK·|types| sketch rows, never the raw
    * events: that is the 100 TB shape for "which sources overlap and
    * by how much" (pairwise joins of raw data are quadratic in data
    * size; sketch merges are constant-size per pair). The
    * exact-intersection/union columns ride along as the audit at test
    * scale — at real scale they are dropped, and the sketch columns
    * are the product. Every estimate is derived from the same 60-bit
    * integer minima with identical double expression order in both
    * engines, so the oracle matches exactly.
    */
  def qKmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val dist = Tables.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(concat(lit("kmv#"), col("user_id"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val mins = graft.plans.TopKPerGroup.topK(
        dist.withColumn("nh", -col("h")), KmvK, Seq("event_type"), "nh", "h")
      .select(col("event_type"), col("h"))
    def est(hk: Column, nk: Column): Column =
      when(nk < KmvK, nk).otherwise(
        round(lit((KmvK - 1).toDouble)
          * (lit(KmvHashMax.toDouble) / hk.cast("double"))).cast("long"))
    val perType = mins.groupBy("event_type")
      .agg(max("h").as("h_k"), count(lit(1)).as("n_kept"))
      .select(col("event_type"), est(col("h_k"), col("n_kept")).as("est"))
    val types = mins.select(col("event_type").as("ta")).distinct()
    // |types|² pair generation is the algorithm (tiny row count);
    // the sketch merge below stays an equi-join via the pair explode.
    val pairs = types.join(broadcast(types.select(col("ta").as("tb"))),
      col("ta") < col("tb"))
    val unionH = pairs
      .withColumn("event_type", explode(array(col("ta"), col("tb"))))
      .join(broadcast(mins), "event_type")
      .select("ta", "tb", "h").distinct()
    val kuAgg = graft.plans.TopKPerGroup.topK(
        unionH.withColumn("nh", -col("h")), KmvK, Seq("ta", "tb"), "nh", "h")
      .groupBy("ta", "tb")
      .agg(max("h").as("hk_u"), count(lit(1)).as("nk_u"))
      .select(col("ta"), col("tb"), est(col("hk_u"), col("nk_u")).as("est_union"))
    // exact audit: distinct (type, user) pairs self-joined on user
    val du = Tables.events(spark, dir)
      .select("event_type", "user_id").distinct()
    val xInter = du.toDF("ta", "u").join(du.toDF("tb", "u2"),
        col("u") === col("u2") && col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("exact_inter"))
    val xTypes = du.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
    kuAgg
      .join(broadcast(perType.toDF("ta", "est_a")), "ta")
      .join(broadcast(perType.toDF("tb", "est_b")), "tb")
      .join(broadcast(xTypes.toDF("ta", "exact_a")), "ta")
      .join(broadcast(xTypes.toDF("tb", "exact_b")), "tb")
      .join(broadcast(xInter), Seq("ta", "tb"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("est_inter",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("exact_union",
        col("exact_a") + col("exact_b") - col("exact_inter"))
      .withColumn("jac_ppm", expr("est_inter * 1000000 div est_union"))
      .withColumn("exact_jac_ppm", expr("exact_inter * 1000000 div exact_union"))
      .select("ta", "tb", "est_a", "est_b", "est_union", "est_inter",
        "exact_inter", "exact_union", "jac_ppm", "exact_jac_ppm")
      .orderBy("ta", "tb")
  }

  val HllM = 256                     // registers (p = 8)
  /** The rho-suffix divisor is WINDOW-FIXED at 256 (13 hex digits =
    * 52 bits), NOT derived from HllM: `h div m` for m < 256 leaves a
    * > 52-bit suffix whose variable-width hex window skews rho off
    * its geometric law (measured +50% hot on the ANF estimate when
    * m = 64 derived its own window). Any m ≤ 256 reads disjoint
    * bits (reg = low log2(m), rho = bits 8-59); retuning HllM
    * requires ONLY this comment's invariant, never this constant.
    */
  val RhoWindowDiv = 256
  require(HllM <= RhoWindowDiv,
    "HllM > 256 would overlap the register index with the 52-bit rho window")
  val HllAlphaMm: Double =           // α_m · m² (Flajolet et al. 2007)
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
  val HllPow53 = 9007199254740992L   // 2^53: the integer register scale

  /** HyperLogLog distinct count per event type (Flajolet et al. 2007)
    * — the register-based sketch beside the KMV order-statistics one,
    * ORACLE-CHECKED because every piece is exact-integer or a single
    * deterministic double op: the 60-bit md5 hash splits into an
    * 8-bit register index and a 52-bit suffix whose leading-zero rank
    * comes from hex-string arithmetic (identical in both engines);
    * the harmonic sum Σ2^(−reg) is computed as exact LONGS scaled by
    * 2^53 (a float sum of mixed-magnitude powers of two would be
    * summation-order-dependent — the one thing a distributed engine
    * cannot promise); the estimate is one double division by the
    * exact scaled sum, with Flajolet's small-range linear-counting
    * correction. Fixed 256-register state per type, mergeable by
    * register max — the classic 100 TB cardinality shape.
    */
  def qHllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val regs = Tables.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(concat(lit("hll#"), col("user_id"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .withColumn("reg", col("h") % HllM)
      .withColumn("hs", lpad(hex(expr(s"h div $RhoWindowDiv")), 13, "0"))
      .withColumn("z", length(regexp_extract(col("hs"), "^0*", 0)))
      .withColumn("d1", expr("substr(hs, z + 1, 1)"))
      .withColumn("rho",
        when(col("z") === 13, lit(53))
          .otherwise(col("z") * 4 + lit(1)
            + when(col("d1") === "1", 3)
              .when(col("d1").isin("2", "3"), 2)
              .when(col("d1").isin("4", "5", "6", "7"), 1)
              .otherwise(0)))
      .groupBy("event_type", "reg").agg(max(col("rho")).as("mrho"))
    val exact = Tables.events(spark, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    regs.groupBy("event_type")
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(cast(1 as bigint), cast(53 - mrho as int))"))
          .as("s_present"))
      .withColumn("v_zero", lit(HllM.toLong) - col("n_present"))
      .withColumn("s_scaled",
        col("s_present") + col("v_zero") * lit(HllPow53))
      .withColumn("est_raw",
        lit(HllAlphaMm * HllPow53.toDouble) / col("s_scaled").cast("double"))
      .withColumn("est_d",
        when(col("est_raw") <= 2.5 * HllM && col("v_zero") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero")))
          .otherwise(col("est_raw")))
      .withColumn("est_users", round(col("est_d")).cast("long"))
      .join(exact, "event_type")
      .select(col("event_type"), col("n_present"), col("v_zero"),
        col("est_users"), col("exact_users"),
        round(abs(col("est_users") - col("exact_users"))
          / col("exact_users").cast("double"), 6).as("rel_err"))
      .orderBy("event_type")
  }

  val HistBuckets = 256

  /** One-pass histogram quantiles per event type — the mergeable,
    * fixed-state alternative to an exact sort-based percentile at
    * 100 TB (two cheap passes: a 3-number min/max/count broadcast,
    * then one map-side-combined bucket count; ≤ HistBuckets rows per
    * type of state, and histograms merge by addition so this runs as
    * a streaming/partial aggregate too). The approx quantile is the
    * midpoint of the first bucket whose cumulative count crosses
    * q·n; exact percentiles ride along as the audit columns, with the
    * absolute error reported. Bucket arithmetic is the identical IEEE
    * expression in both engines, so assignment is replayable.
    */
  def qHistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).select("event_type", "value")
    val rng = ev.groupBy("event_type").agg(
      min("value").as("vmin"), max("value").as("vmax"), count(lit(1)).as("n"))
    val hist = ev.join(broadcast(rng), "event_type")
      .withColumn("bkt",
        when(col("vmax") === col("vmin"), 0L)
          .otherwise(least(lit((HistBuckets - 1).toLong),
            floor((col("value") - col("vmin")) * HistBuckets
              / (col("vmax") - col("vmin"))).cast("long"))))
      .groupBy("event_type", "bkt").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum("c").over(w))
      .join(broadcast(rng), "event_type")
    def approx(q: Double, name: String) =
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("bkt"))).as(name)
    val ap = cum.groupBy("event_type", "vmin", "vmax", "n")
      .agg(approx(0.5, "b50"), approx(0.9, "b90"))
      .select(col("event_type"), col("n"),
        round(col("vmin") + (col("b50") + 0.5) * (col("vmax") - col("vmin"))
          / HistBuckets, 6).as("approx_p50"),
        round(col("vmin") + (col("b90") + 0.5) * (col("vmax") - col("vmin"))
          / HistBuckets, 6).as("approx_p90"))
    val exact = ev.groupBy("event_type").agg(
      round(expr("percentile(value, 0.5)"), 6).as("exact_p50"),
      round(expr("percentile(value, 0.9)"), 6).as("exact_p90"))
    ap.join(exact, "event_type")
      .withColumn("err_p50", round(abs(col("approx_p50") - col("exact_p50")), 6))
      .withColumn("err_p90", round(abs(col("approx_p90") - col("exact_p90")), 6))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> qHeavyHitters,
    "q_kmv_distinct" -> qKmvDistinct,
    "q_hll_distinct" -> qHllDistinct,
    "q_hist_quantiles" -> qHistQuantiles,
    "q_kmv_overlap" -> qKmvOverlap)

  val oracles: Map[String, String] = Map(
    "q_hll_distinct" ->
      s"""WITH hh AS (
         |  SELECT event_type,
         |    CAST('0x' || substr(md5('hll#' || user_id), 1, 15) AS BIGINT) AS h
         |  FROM events),
         |rr AS (
         |  SELECT event_type, h % $HllM AS reg,
         |    lpad(hex(h // $RhoWindowDiv), 13, '0') AS hs
         |  FROM hh),
         |rho AS (
         |  SELECT event_type, reg,
         |    CASE WHEN z = 13 THEN 53
         |      ELSE z * 4 + 1 + (CASE WHEN d1 = '1' THEN 3
         |        WHEN d1 IN ('2','3') THEN 2
         |        WHEN d1 IN ('4','5','6','7') THEN 1 ELSE 0 END)
         |    END AS rho
         |  FROM (SELECT event_type, reg,
         |      length(regexp_extract(hs, '^0*')) AS z,
         |      substr(hs, length(regexp_extract(hs, '^0*')) + 1, 1) AS d1
         |    FROM rr)),
         |regs AS (SELECT event_type, reg, max(rho) AS mrho
         |  FROM rho GROUP BY event_type, reg),
         |a AS (SELECT event_type,
         |    count(*) AS n_present,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - mrho)) AS BIGINT) AS s_present
         |  FROM regs GROUP BY event_type),
         |e AS (SELECT event_type, n_present,
         |    $HllM - n_present AS v_zero,
         |    s_present + ($HllM - n_present) * $HllPow53 AS s_scaled
         |  FROM a),
         |est AS (SELECT event_type, n_present, v_zero,
         |    CASE WHEN ${HllAlphaMm * HllPow53.toDouble}
         |        / CAST(s_scaled AS DOUBLE) <= ${2.5 * HllM}
         |        AND v_zero > 0
         |      THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v_zero)
         |      ELSE ${HllAlphaMm * HllPow53.toDouble} / CAST(s_scaled AS DOUBLE)
         |    END AS est_d
         |  FROM e),
         |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY event_type)
         |SELECT est.event_type, CAST(n_present AS BIGINT) AS n_present,
         |  CAST(v_zero AS BIGINT) AS v_zero,
         |  CAST(round(est_d) AS BIGINT) AS est_users, exact_users,
         |  round(abs(CAST(round(est_d) AS BIGINT) - exact_users)
         |    / CAST(exact_users AS DOUBLE), 6) AS rel_err
         |FROM est JOIN x ON x.event_type = est.event_type
         |ORDER BY est.event_type""".stripMargin,
    "q_kmv_distinct" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT DISTINCT event_type,
         |    CAST('0x' || substr(md5('kmv#' || user_id), 1, 15) AS BIGINT) AS h
         |  FROM events),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM d),
         |a AS (SELECT event_type,
         |    max(CASE WHEN rn <= $KmvK THEN h END) AS h_k,
         |    CAST(sum(CASE WHEN rn <= $KmvK THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |  FROM r GROUP BY event_type),
         |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY event_type),
         |e AS (SELECT a.event_type, h_k, n_kept, exact_users,
         |    CASE WHEN n_kept < $KmvK THEN n_kept
         |      ELSE CAST(round(${(KmvK - 1).toDouble}
         |        * (${KmvHashMax.toDouble} / CAST(h_k AS DOUBLE))) AS BIGINT)
         |    END AS est_users
         |  FROM a JOIN x ON x.event_type = a.event_type)
         |SELECT event_type, h_k, n_kept, est_users, exact_users,
         |  round(abs(est_users - exact_users) / CAST(exact_users AS DOUBLE), 6)
         |    AS rel_err
         |FROM e ORDER BY event_type""".stripMargin,
    "q_hist_quantiles" ->
      s"""WITH rng AS MATERIALIZED (
         |  SELECT event_type, min(value) AS vmin, max(value) AS vmax,
         |    count(*) AS n
         |  FROM events GROUP BY event_type),
         |hist AS MATERIALIZED (
         |  SELECT e.event_type,
         |    CASE WHEN vmax = vmin THEN 0
         |      ELSE least(${HistBuckets - 1}, CAST(floor((value - vmin)
         |        * $HistBuckets / (vmax - vmin)) AS BIGINT))
         |    END AS bkt, count(*) AS c
         |  FROM events e JOIN rng ON rng.event_type = e.event_type
         |  GROUP BY e.event_type, bkt),
         |cum AS (SELECT event_type, bkt,
         |    sum(c) OVER (PARTITION BY event_type ORDER BY bkt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM hist),
         |ap AS (SELECT c.event_type, n, vmin, vmax,
         |    min(CASE WHEN cum >= ceil(0.5 * n) THEN bkt END) AS b50,
         |    min(CASE WHEN cum >= ceil(0.9 * n) THEN bkt END) AS b90
         |  FROM cum c JOIN rng ON rng.event_type = c.event_type
         |  GROUP BY c.event_type, n, vmin, vmax),
         |x AS (SELECT event_type,
         |    round(quantile_cont(value, 0.5), 6) AS exact_p50,
         |    round(quantile_cont(value, 0.9), 6) AS exact_p90
         |  FROM events GROUP BY event_type),
         |f AS (SELECT ap.event_type, n,
         |    round(vmin + (b50 + 0.5) * (vmax - vmin) / $HistBuckets, 6)
         |      AS approx_p50,
         |    round(vmin + (b90 + 0.5) * (vmax - vmin) / $HistBuckets, 6)
         |      AS approx_p90,
         |    exact_p50, exact_p90
         |  FROM ap JOIN x ON x.event_type = ap.event_type)
         |SELECT event_type, n, approx_p50, approx_p90, exact_p50, exact_p90,
         |  round(abs(approx_p50 - exact_p50), 6) AS err_p50,
         |  round(abs(approx_p90 - exact_p90), 6) AS err_p90
         |FROM f ORDER BY event_type""".stripMargin,
    "q_heavy_hitters" ->
      s"""WITH t AS MATERIALIZED (
         |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         |n AS (SELECT count(*) AS n_total FROM t)
         |SELECT word, count(*) AS c,
         |  round(count(*) / CAST(n_total AS DOUBLE), 6) AS frac
         |FROM t, n GROUP BY word, n_total
         |HAVING count(*) >= n_total / $HhFrac
         |ORDER BY word""".stripMargin,
    "q_kmv_overlap" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT DISTINCT event_type,
         |    CAST('0x' || substr(md5('kmv#' || user_id), 1, 15) AS BIGINT) AS h
         |  FROM events),
         |r AS MATERIALIZED (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM d),
         |m AS MATERIALIZED (SELECT event_type, h FROM r WHERE rn <= $KmvK),
         |ka AS (SELECT event_type, max(h) AS h_k,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM m GROUP BY event_type),
         |e AS MATERIALIZED (SELECT event_type,
         |    CASE WHEN n_kept < $KmvK THEN n_kept
         |      ELSE CAST(round(${(KmvK - 1).toDouble}
         |        * (${KmvHashMax.toDouble} / CAST(h_k AS DOUBLE))) AS BIGINT)
         |    END AS est
         |  FROM ka),
         |t AS (SELECT DISTINCT event_type FROM events),
         |p AS (SELECT a.event_type AS ta, b.event_type AS tb
         |  FROM t a JOIN t b ON a.event_type < b.event_type),
         |u AS (SELECT DISTINCT ta, tb, h
         |  FROM p JOIN m ON m.event_type = ta OR m.event_type = tb),
         |ur AS (SELECT ta, tb, h,
         |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |  FROM u),
         |ua AS (SELECT ta, tb, max(CASE WHEN rn <= $KmvK THEN h END) AS hk_u,
         |    CAST(sum(CASE WHEN rn <= $KmvK THEN 1 ELSE 0 END) AS BIGINT) AS nk_u
         |  FROM ur GROUP BY ta, tb),
         |uu AS (SELECT ta, tb,
         |    CASE WHEN nk_u < $KmvK THEN nk_u
         |      ELSE CAST(round(${(KmvK - 1).toDouble}
         |        * (${KmvHashMax.toDouble} / CAST(hk_u AS DOUBLE))) AS BIGINT)
         |    END AS est_union
         |  FROM ua),
         |du AS MATERIALIZED (SELECT DISTINCT event_type, user_id FROM events),
         |xt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
         |  FROM du GROUP BY event_type),
         |xi AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |    CAST(count(*) AS BIGINT) AS exact_inter
         |  FROM du a JOIN du b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |f AS (SELECT uu.ta, uu.tb, ea.est AS est_a, eb.est AS est_b, est_union,
         |    GREATEST(CAST(0 AS BIGINT), ea.est + eb.est - est_union) AS est_inter,
         |    COALESCE(exact_inter, CAST(0 AS BIGINT)) AS exact_inter,
         |    xa.exact_n + xb.exact_n - COALESCE(exact_inter, CAST(0 AS BIGINT))
         |      AS exact_union
         |  FROM uu
         |  JOIN e ea ON ea.event_type = uu.ta
         |  JOIN e eb ON eb.event_type = uu.tb
         |  JOIN xt xa ON xa.event_type = uu.ta
         |  JOIN xt xb ON xb.event_type = uu.tb
         |  LEFT JOIN xi ON xi.ta = uu.ta AND xi.tb = uu.tb)
         |SELECT ta, tb, est_a, est_b, est_union, est_inter, exact_inter,
         |  exact_union,
         |  CAST(est_inter * 1000000 // est_union AS BIGINT) AS jac_ppm,
         |  CAST(exact_inter * 1000000 // exact_union AS BIGINT) AS exact_jac_ppm
         |FROM f ORDER BY ta, tb""".stripMargin)
}
