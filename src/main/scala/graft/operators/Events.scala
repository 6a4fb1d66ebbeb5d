package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Batch event analytics — the batch twins of the structured-streaming
  * module (graft.streaming.EventStream). Window aggs and sessionization
  * shuffle once on their natural keys (bucket/event_type, user_id);
  * at scale the events source would be bucketed by user_id so the
  * sessionize window is shuffle-free.
  */
object Events {

  val SessionGapUs: Long = 1800L * 1000000L // 30 min

  /** Tumbling 1-hour window counts/sums per event type. */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", timestamp_micros(expr("ts div 1000"))).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        // avg derived from the ROUNDED sum: immune to fp summation
        // order at the rounding boundary (bit at sf0.1 otherwise)
        round(round(sum(col("value")), 2) / count(lit(1)), 6).as("avg_value"))
      .orderBy("bucket", "event_type")

  /** Sessionization: 30-min inactivity gap splits sessions per user. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new", when(col("gap").isNull || col("gap") > SessionGapUs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        round(sum(col("value")), 2).as("sum_value"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .select("user_id", "session_idx", "n_events", "start_us", "end_us",
        "duration_us", "sum_value")
      .orderBy("user_id", "session_idx")
  }

  /** Markov transition matrix over per-user event sequences: counts of
    * consecutive (src→dst) event-type pairs, plus each source type's
    * outgoing total and the transition probability as integer
    * parts-per-million (integer division on exact counts, so no float
    * crosses the engine boundary). The lag window shuffles once on
    * user_id — at scale, shuffle-free over a user_id-bucketed source,
    * like qSessionize — and the probability window runs on the
    * already-aggregated |types|² matrix, which is trivially small.
    */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val pairs = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("src_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("src_type").isNotNull)
      .groupBy(col("src_type"), col("event_type").as("dst_type"))
      .agg(count(lit(1)).as("n_trans"))
    pairs
      .withColumn("src_total",
        sum(col("n_trans")).over(Window.partitionBy("src_type")))
      .withColumn("p_ppm", expr("n_trans * 1000000 div src_total"))
      .select("src_type", "dst_type", "n_trans", "src_total", "p_ppm")
      .orderBy("src_type", "dst_type")
  }

  /** Top-20 users by total purchase value. TakeOrdered (orderBy+limit)
    * picks the 20 survivors — never a global rank window over every
    * user's aggregate (that plan funnels all users into one task).
    */
  def qTopUsers(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(round(sum(col("value")), 2).as("total_value"),
        count(lit(1)).as("n_purchases"))
    TopKUtil.globalTopK(totals, 20, "user_id",
        col("total_value").desc, col("user_id"))
      .orderBy("rk")
  }

  val RangeWindowUs: Long = 300L * 1000000L // ±5 min correlation window

  /** Time-range join — the operator Spark has no native plan for: a
    * naive `ON abs(c.ts - p.ts) <= W` compiles to a
    * BroadcastNestedLoopJoin (O(n·m) comparisons). Bucketization makes
    * it an equi-join: with bucket width = W, any click within W of a
    * purchase lives in the purchase's bucket ±1, so the purchase side
    * explodes to 3 bucket keys, the join is a hash join on bucket, and
    * the band predicate filters inside matched buckets — each
    * qualifying (purchase, click) pair matches on exactly one exploded
    * row, so no dedup is needed. Shuffle is O(3·|purchases| + |clicks|)
    * narrow rows; PlanSpec forbids the nested-loop plan.
    *
    * Click values are summed as exact integer cents so the per-purchase
    * totals are independent of float summation order across engines.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us").as("p_ts"))
    val pb = p.withColumn("bucket", explode(array(
      expr(s"p_ts div $RangeWindowUs - 1"),
      expr(s"p_ts div $RangeWindowUs"),
      expr(s"p_ts div $RangeWindowUs + 1"))))
    val c = ev.filter(col("event_type") === "click")
      .select(col("ts_us").as("c_ts"),
        round(col("value") * 100).cast("long").as("cents"),
        expr(s"(ts div 1000) div $RangeWindowUs").as("bucket"))
    val agg = pb.join(c, Seq("bucket"))
      .filter(abs(col("c_ts") - col("p_ts")) <= RangeWindowUs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_nearby_clicks"), sum(col("cents")).as("cents"))
    p.join(agg, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_nearby_clicks"), lit(0L)).as("n_nearby_clicks"),
        round(coalesce(col("cents"), lit(0L)) / lit(100.0), 2).as("click_value"))
      .orderBy("event_id")
  }

  /** 3-day moving average of daily event value per type (ROWS frame
    * over the pre-aggregated daily series — the rolling-metric shape).
    */
  def qRollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", timestamp_micros(expr("ts div 1000"))).as("day"),
        col("event_type"))
      .agg(sum(col("value")).as("day_value"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-2, 0)
    daily
      .withColumn("dv2", round(col("day_value"), 2))
      .withColumn("ma3", round(avg(col("dv2")).over(w), 6))
      .select(col("day"), col("event_type"),
        col("dv2").as("day_value"), col("ma3"))
      .orderBy("event_type", "day")
  }

  /** Semi-structured coverage: extract the numeric `k` from the JSON
    * props column and aggregate it per event type (integer sums —
    * exact, no rounding exposure).
    */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Daily event counts pivoted into one column per event type. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", timestamp_micros(expr("ts div 1000"))).as("day"))
      .pivot("event_type", EventTypes).count()
    EventTypes.foldLeft(daily)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("day")
  }

  val RetentionMaxDay = 7

  /** Cohort retention: users grouped by first-seen day, counted on
    * each subsequent active day up to +RetentionMaxDay — the classic
    * product-analytics triangle. Two map-side-combined aggregations
    * (per-user first day, then distinct (cohort, offset) user counts);
    * the per-user cohort join is the only user-keyed shuffle.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("day"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .withColumn("k", datediff(col("day"), col("cohort_day")))
      .filter(col("k") <= RetentionMaxDay)
      .groupBy("cohort_day", "k")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "k")
  }

  val AnomalyZ = 3.0

  /** Value-anomaly detection: events whose value is ≥ AnomalyZ sample
    * standard deviations from their event type's mean — the ops-
    * monitoring staple over a metrics stream. Per-type stats are ONE
    * map-side-combined aggregate joined back broadcast (types are a
    * tiny dim); flagging is a narrow compare.
    *
    * Cross-engine float discipline: mean and variance derive from
    * PRE-ROUNDED sums (round(Σx, 2), round(Σx², 2)) so both engines
    * compute identical doubles regardless of summation order — the
    * avg-at-the-rounding-boundary rule, applied to second moments.
    */
  def qEventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sx"),
        round(sum(col("value") * col("value")), 2).as("sx2"))
      .withColumn("mean", col("sx") / col("n"))
      // a single-event type has no sample variance: n−1 = 0 is an
      // ANSI DIVIDE_BY_ZERO task failure, not an Infinity (and a
      // zero-variance type can't z-score anything) — both degrade to
      // std 0 / z 0, a no-op on the driver's many-events-per-type data
      .withColumn("std", when(col("n") > 1, sqrt(
        (col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
        .otherwise(lit(0.0)))
      .select("event_type", "mean", "std")
    Tables.events(spark, dir)
      .join(broadcast(stats), "event_type")
      .withColumn("z", when(col("std") > 0,
        round((col("value") - col("mean")) / col("std"), 6)).otherwise(lit(0.0)))
      .filter(abs(col("z")) >= AnomalyZ)
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"),
        round(col("mean"), 6).as("type_mean"), col("z"))
      .orderBy("event_id")
  }

  /** Ordered conversion funnel view → click → purchase: the earliest
    * time each user reaches each successive step, where a step counts
    * only at-or-after the previous one (min-over-constrained-min, the
    * standard funnel semantics — a click before the first view is not
    * a conversion).
    *
    * Scale shape: three map-side-combined per-user min aggregations
    * chained by equi-joins on user_id — every stage shuffles on the
    * SAME key, so AQE reuses the partitioning; no per-user event
    * sequence is ever materialized and no window touches the raw
    * stream (the sequence logic lives in the ts >= prev-step filter).
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_us") >= col("t_view"))
      .groupBy("user_id").agg(min("ts_us").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts_us") >= col("t_click"))
      .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .otherwise(1).cast("int").as("funnel_step"))
      .orderBy("user_id")
  }

  /** Sessionization via the BUILT-IN session_window (Spark 3.2+) —
    * the declarative twin of qSessionize's lag/cumsum formulation and
    * of the streaming custom-state sessionizer. Same 30-min gap
    * semantics; end = last event + gap (session_window's exclusive
    * end) where qSessionize reports last-event time. Built-in-first:
    * the merging-window state machine lives in Spark's
    * UpdatingSessionsIterator, not hand-rolled code, and the SAME
    * expression works under a streaming groupBy with watermark.
    */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")

  val BurstTrailing = 24 // trailing comparison window (hourly rows)
  val BurstMinWin = 8    // minimum trailing rows before scoring
  val BurstZ = 2.0       // burst threshold on the z-score

  /** Burst detection — the trending signal: hourly event-type volumes
    * scored against their own trailing 24-hour distribution
    * (z = (n − μ)/σ), flagged when the spike clears BurstZ. The
    * temporal complement of qEventAnomaly (which finds outlier VALUES
    * within a type; this finds outlier VOLUMES over time — the "why
    * is checkout traffic 4σ above normal" alert, or trending topics
    * when the stream is article mentions). μ/σ derive from integer
    * count sums inside the frame, so both engines compute identical
    * doubles; z is rounded before the burst comparison.
    *
    * Scale shape: the raw stream collapses to (hour, type) rows in
    * ONE map-side-combined exchange; the trailing window runs per
    * event_type over its hourly aggregate series — thousands of rows
    * per year per type, never raw events.
    */
  def qBurstDetect(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", timestamp_micros(expr("ts div 1000"))).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(-BurstTrailing, -1)
    hourly
      .withColumn("w_n", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sum2", sum(col("n") * col("n")).over(w))
      .filter(col("w_n") >= BurstMinWin)
      .withColumn("mu", col("w_sum") / col("w_n"))
      .withColumn("sigma", sqrt(greatest(
        col("w_sum2") / col("w_n") - col("mu") * col("mu"), lit(0.0))))
      .withColumn("z", when(col("sigma") > 0,
        round((col("n") - col("mu")) / col("sigma"), 6)).otherwise(lit(0.0)))
      .withColumn("burst", col("z") >= BurstZ)
      .select(col("event_type"), col("bucket"), col("n"),
        round(col("mu"), 6).as("mu"), col("z"), col("burst"))
      .orderBy("event_type", "bucket")
  }

  val WauWindow = 7 // trailing days in the "weekly" active window

  /** DAU / trailing-WAU / stickiness per day — the engagement panel
    * every event pipeline serves. The only corpus-sized pass is the
    * (day, user) distinct (one map-side-combined exchange); the
    * trailing-window distinct then runs on that deduped set against a
    * BROADCAST day list (≤ 7× row expansion, never a raw-event range
    * scan — the window-distinct a SQL window can't express goes
    * through the small day×user join instead). Day is the integer
    * epoch-day of the nanosecond timestamp: pure `div`, identical in
    * both engines.
    */
  def qDauStickiness(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val days = dau.select(col("day").as("d0"))
    val wau = du.join(broadcast(days),
        col("day") >= col("d0") - (WauWindow - 1) && col("day") <= col("d0"))
      .groupBy("d0").agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d0"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 6).as("stickiness"))
      .orderBy("day")
  }

  val PathTopK = 20

  /** Top within-session event-type paths (length-3 n-grams of the
    * session's ordered event stream): the "what do users actually do"
    * companion to q_event_transitions' first-order Markov matrix —
    * a 3-gram distinguishes view→cart→purchase from view→cart→view,
    * which no transition matrix can.
    *
    * Scale shape: one shuffle on user_id (shared with sessionize; a
    * user_id-bucketed source makes it exchange-free), two lead()s in
    * the SAME window pass, then a map-side-combined count whose key
    * space is |event_types|³ — the final rank window runs on that
    * tiny aggregate, never on events.
    */
  /** The pre-rank counts stage of [[qSessionPaths]], exposed so the
    * streaming twin's parity spec can compare full path counts.
    */
  def sessionPathCounts(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val bySession = Window.partitionBy("user_id", "session_idx")
      .orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("gap").isNull || col("gap") > SessionGapUs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("e2", lead(col("event_type"), 1).over(bySession))
      .withColumn("e3", lead(col("event_type"), 2).over(bySession))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n_paths"))
  }

  def qSessionPaths(spark: SparkSession, dir: String): DataFrame = {
    sessionPathCounts(spark, dir)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))))
      .filter(col("rk") <= PathTopK)
      .orderBy("rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_paths" -> qSessionPaths,
    "q_dau_stickiness" -> qDauStickiness,
    "q_burst_detect" -> qBurstDetect,
    "q_session_window" -> qSessionWindow,
    "q_retention" -> qRetention,
    "q_event_anomaly" -> qEventAnomaly,
    "q_range_join" -> qRangeJoin,
    "q_json_props" -> qJsonProps,
    "q_pivot" -> qPivot,
    "q_rolling_avg" -> qRollingAvg,
    "q_events_window" -> qEventsWindow,
    "q_sessionize" -> qSessionize,
    "q_funnel" -> qFunnel,
    "q_top_users" -> qTopUsers,
    "q_event_transitions" -> qEventTransitions)

  val oracles: Map[String, String] = Map(
    "q_session_paths" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER
         |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
         |  FROM events),
         |s AS (
         |  SELECT *, CAST(sum(CASE WHEN gap IS NULL OR gap > ${SessionGapUs} THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM e),
         |p AS (
         |  SELECT event_type AS e1,
         |    lead(event_type, 1) OVER
         |      (PARTITION BY user_id, session_idx ORDER BY ts_us, event_id) AS e2,
         |    lead(event_type, 2) OVER
         |      (PARTITION BY user_id, session_idx ORDER BY ts_us, event_id) AS e3
         |  FROM s),
         |c AS (
         |  SELECT e1, e2, e3, count(*) AS n_paths FROM p
         |  WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1, 2, 3)
         |SELECT e1, e2, e3, n_paths, rk FROM (
         |  SELECT *, row_number() OVER (ORDER BY n_paths DESC, e1, e2, e3) AS rk
         |  FROM c)
         |WHERE rk <= $PathTopK ORDER BY rk""".stripMargin,
    "q_dau_stickiness" ->
      s"""WITH du AS MATERIALIZED (
         |  SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         |    user_id
         |  FROM events),
         |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
         |wau AS (SELECT d.day AS day, count(DISTINCT u.user_id) AS wau
         |  FROM (SELECT DISTINCT day FROM du) d
         |  JOIN du u ON u.day BETWEEN d.day - ${WauWindow - 1} AND d.day
         |  GROUP BY d.day)
         |SELECT day, dau, wau, round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
         |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    // session_window merges an event iff it lands strictly inside the
    // previous session's [start, last+gap) — so a gap of exactly GapUs
    // starts a NEW session (vs qSessionize's inclusive merge)
    "q_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER
         |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
         |  FROM events),
         |s AS (
         |  SELECT *, CAST(sum(CASE WHEN gap IS NULL OR gap >= ${SessionGapUs}
         |      THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_idx
         |  FROM e)
         |SELECT user_id, min(ts_us) AS start_us,
         |  max(ts_us) + ${SessionGapUs} AS end_us,
         |  count(*) AS n_events, round(sum(value), 2) AS sum_value
         |FROM s GROUP BY user_id, session_idx
         |ORDER BY user_id, start_us""".stripMargin,
    "q_funnel" ->
      """WITH e AS MATERIALIZED (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts_us) AS t_click FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND e.ts_us >= v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts_us) AS t_purchase FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND e.ts_us >= c.t_click GROUP BY e.user_id)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |            WHEN t_click IS NOT NULL THEN 2
        |            ELSE 1 END AS INTEGER) AS funnel_step
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q_retention" ->
      s"""WITH days AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         |cohort AS (
         |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
         |SELECT cohort_day, date_diff('day', cohort_day, day) AS k,
         |  count(DISTINCT d.user_id) AS n_users
         |FROM days d JOIN cohort c USING (user_id)
         |WHERE date_diff('day', cohort_day, day) <= $RetentionMaxDay
         |GROUP BY cohort_day, date_diff('day', cohort_day, day)
         |ORDER BY cohort_day, k""".stripMargin,
    "q_event_anomaly" ->
      s"""WITH st AS (
         |  SELECT event_type, count(*) AS n,
         |    round(sum(value), 2) AS sx,
         |    round(sum(value * value), 2) AS sx2
         |  FROM events GROUP BY event_type),
         |ms AS (SELECT event_type, sx / n AS mean,
         |    sqrt((sx2 - sx * sx / n) / (n - 1)) AS std
         |  FROM st)
         |SELECT event_id, e.event_type, round(value, 2) AS value,
         |  round(mean, 6) AS type_mean,
         |  round((value - mean) / std, 6) AS z
         |FROM events e JOIN ms ON e.event_type = ms.event_type
         |WHERE abs(round((value - mean) / std, 6)) >= $AnomalyZ
         |ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
         |  FROM events),
         |p AS (SELECT event_id, ts_us AS p_ts FROM e WHERE event_type = 'purchase'),
         |c AS (SELECT ts_us AS c_ts, CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM e WHERE event_type = 'click'),
         |j AS (SELECT p.event_id, count(*) AS n,
         |    CAST(sum(cents) AS BIGINT) AS cents
         |  FROM p JOIN c ON abs(c.c_ts - p.p_ts) <= $RangeWindowUs
         |  GROUP BY p.event_id)
         |SELECT p.event_id, coalesce(n, 0) AS n_nearby_clicks,
         |  round(coalesce(cents, 0) / 100.0, 2) AS click_value
         |FROM p LEFT JOIN j USING (event_id) ORDER BY event_id""".stripMargin,
    "q_json_props" ->
      """SELECT event_type,
        |  count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_pivot" -> {
      val cols = EventTypes.map(t =>
        s"count(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"").mkString(",\n  ")
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |  $cols
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin
    },
    "q_rolling_avg" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |    sum(value) AS day_value
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, round(day_value, 2) AS day_value,
        |  round(avg(round(day_value, 2)) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
        |FROM daily ORDER BY event_type, day""".stripMargin,
    "q_burst_detect" ->
      s"""WITH h AS (
         |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    event_type, CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |s AS (
         |  SELECT *,
         |    CAST(count(n) OVER w AS BIGINT) AS w_n,
         |    CAST(sum(n) OVER w AS BIGINT) AS w_sum,
         |    CAST(sum(n * n) OVER w AS BIGINT) AS w_sum2
         |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bucket
         |    ROWS BETWEEN $BurstTrailing PRECEDING AND 1 PRECEDING)),
         |t AS (
         |  SELECT event_type, bucket, n,
         |    w_sum / CAST(w_n AS DOUBLE) AS mu,
         |    sqrt(greatest(w_sum2 / CAST(w_n AS DOUBLE)
         |      - (w_sum / CAST(w_n AS DOUBLE)) * (w_sum / CAST(w_n AS DOUBLE)),
         |      0.0)) AS sigma
         |  FROM s WHERE w_n >= $BurstMinWin),
         |z AS (
         |  SELECT event_type, bucket, n, round(mu, 6) AS mu,
         |    CASE WHEN sigma > 0 THEN round((n - mu) / sigma, 6)
         |      ELSE 0.0 END AS z
         |  FROM t)
         |SELECT event_type, bucket, n, mu, z, z >= $BurstZ AS burst
         |FROM z ORDER BY event_type, bucket""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  round(round(sum(value), 2) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER
         |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
         |  FROM events),
         |s AS (
         |  SELECT *, CAST(sum(CASE WHEN gap IS NULL OR gap > ${SessionGapUs} THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM e)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us,
         |  max(ts_us) - min(ts_us) AS duration_us,
         |  round(sum(value), 2) AS sum_value
         |FROM s GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,
    "q_top_users" ->
      """WITH t AS (
        |  SELECT user_id, round(sum(value), 2) AS total_value,
        |    count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT user_id, total_value, n_purchases, rk FROM (
        |  SELECT *, row_number() OVER (ORDER BY total_value DESC, user_id) AS rk
        |  FROM t)
        |WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "q_event_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS src_type,
        |    event_type AS dst_type
        |  FROM events),
        |c AS (
        |  SELECT src_type, dst_type, count(*) AS n_trans
        |  FROM p WHERE src_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, n_trans,
        |  CAST(sum(n_trans) OVER (PARTITION BY src_type) AS BIGINT) AS src_total,
        |  CAST(n_trans * 1000000 // CAST(sum(n_trans) OVER (PARTITION BY src_type) AS BIGINT)
        |    AS BIGINT) AS p_ppm
        |FROM c ORDER BY src_type, dst_type""".stripMargin)
}
