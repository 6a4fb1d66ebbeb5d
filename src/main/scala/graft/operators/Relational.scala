package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** TPC-H-style relational anchors: correctness canaries + bench heads.
  *
  * These exist to pin the engine against the DuckDB oracle on plain
  * scan→filter→join→agg shapes before the domain operators pile on.
  * Monetary aggregates are rounded (2dp) so the driver's value-hash
  * compare is insensitive to fp summation order across engines.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (flagship `entry` query). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(round(sum(col("l_discount")), 4) / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style shipping-priority revenue top-10.
    * The customer side is dimension-sized → broadcast both joins;
    * lineitem never shuffles.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Per-group top-N: 3 highest-value orders per customer (window). */
  def qTopnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** The same per-customer top-3 written the NAIVE way — window rank,
    * filter, rank dropped — and left to the optimizer: TopKRewriteRule
    * (installed via TopKPerGroup.install / GraftExtensions) rewrites
    * the Project/Filter/Window stack into the TopKPerGroup heap
    * operator because the rank column is discarded. The tie is
    * asc_nulls_last so the rewrite provably matches the heap's null
    * ordering. PlanSpec asserts the Window is gone from the physical
    * plan; the oracle is the plain window SQL it must still equal.
    */
  def qTopnAuto(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.TopKPerGroup.install(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc_nulls_last)
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** ROLLUP aggregation (subtotal + grand-total rows; NULL group keys
    * labeled 'ALL' so the hash compare is type-stable).
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Full CUBE with grouping_id — all four grouping sets of the 2-D
    * aggregate in one pass: Catalyst expands grouping sets BEFORE the
    * exchange, so the partial aggregate combines map-side for every
    * set at once and the cube costs one shuffle, not four queries.
    * grouping_id disambiguates a genuine 'ALL' value from a rolled-up
    * null (same bit convention in both engines: leftmost column =
    * most significant bit).
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** Arbitrary GROUPING SETS — the third member of the grouped-
    * aggregation triad (ROLLUP and CUBE above are fixed lattices; a
    * report that wants JUST the two one-dimensional marginals plus the
    * grand total gets exactly those three sets, not CUBE's four).
    * Catalyst expands the sets BEFORE the exchange, so all three
    * marginals ride one map-side-combined shuffle — one pass over
    * lineitem instead of three queries.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** Exact percentiles of event value per type (linear interpolation —
    * identical convention in Spark `percentile` and DuckDB
    * `quantile_cont`).
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy("event_type")

  /** As-of join: for each purchase, the user's most recent click at or
    * before it — the classic point-in-time join, expressed as a
    * carry-forward window (single shuffle on user_id, no range scan).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("last_click_us"),
        (col("ts_us") - col("last_click_us")).as("us_since_click"))
      .orderBy("event_id")
  }

  /** Semi/anti join: customers with ≥1 high-priority order vs none
    * (EXISTS / NOT EXISTS — left_semi/left_anti, no row duplication).
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    val semi = cust.join(urgent, Seq("c_custkey"), "left_semi")
      .withColumn("has_urgent", lit(true))
    val anti = cust.join(urgent, Seq("c_custkey"), "left_anti")
      .withColumn("has_urgent", lit(false))
    semi.unionByName(anti).orderBy("c_custkey")
  }

  /** Skew-resistant two-phase (salted) aggregation: pre-aggregate on
    * (key, salt), then merge — same answer as a direct groupBy, which
    * is exactly what the oracle checks. The salt is deterministic
    * (orderkey % 8) so the plan is replayable.
    */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("salt", col("l_orderkey") % 8)
      .groupBy("l_returnflag", "salt")
      .agg(sum(col("l_quantity")).as("partial_qty"), count(lit(1)).as("partial_n"))
      .groupBy("l_returnflag")
      .agg(round(sum(col("partial_qty")), 2).as("sum_qty"),
        sum(col("partial_n")).as("n"))
      .orderBy("l_returnflag")

  val SkewK = 16  // heaviest keys reported

  /** Join/shuffle key-skew profiler — the measurement that DECIDES
    * whether qSaltedAgg's salting (or AQE skew splitting) is needed
    * on a key before a big shuffle: the SkewK heaviest keys with
    * their absolute count, corpus share in exact ppm, and the ratio
    * to a perfectly uniform fair share in integer percent (100 =
    * exactly fair). Two map-side-combined aggregates + TakeOrdered —
    * profiling a key column costs one narrow pass, which is why a
    * pipeline can afford to run it before EVERY new large join at
    * 100 TB instead of discovering the hot key from a straggler task.
    */
  def qSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("total"), count(lit(1)).as("n_keys"))
    TopKUtil.globalTopK(counts, SkewK, "user_id",
        col("n").desc, col("user_id"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn("fair_x100", expr("n * n_keys * 100 div total"))
      .select("rk", "user_id", "n", "share_ppm", "fair_x100")
      .orderBy("rk")
  }

  /** Join-cardinality pre-estimate — planner arithmetic exposed as an
    * operator: |A ⋈ B| on an equi-key is EXACTLY Σ_k cntA(k)·cntB(k),
    * so the output size of a join is computable from the two key
    * histograms without materializing a single joined row. One row of
    * sizing facts (inputs, shared keys, exact join rows,
    * amplification in integer percent of the combined input) — what
    * decides shuffle partition counts and whether qSkewReport-guided
    * salting is needed BEFORE paying for the join at 100 TB. The
    * histograms are map-side-combined aggregates; the key-histogram
    * join is |keys|-sized, not |rows|-sized. Purchases × clicks on
    * user_id here.
    */
  def qJoinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def keyed(t: String) = ev.filter(col("event_type") === t)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val a = keyed("purchase").toDF("user_id", "na")
    val b = keyed("click").toDF("user_id", "nb")
    a.join(b, "user_id")
      .agg(coalesce(sum(expr("na * nb")), lit(0L)).as("join_rows"),
        count(lit(1)).as("n_keys_shared"))
      .crossJoin(broadcast(a.agg(coalesce(sum("na"), lit(0L)).as("n_left"))))
      .crossJoin(broadcast(b.agg(coalesce(sum("nb"), lit(0L)).as("n_right"))))
      // greatest(…, 1): an events slice with no purchase AND no click
      // rows must degrade to amp 0, not an ANSI DIVIDE_BY_ZERO task
      .withColumn("amp_x100",
        expr("join_rows * 100 div greatest(n_left + n_right, 1)"))
      .select("n_left", "n_right", "n_keys_shared", "join_rows", "amp_x100")
  }

  /** Per-group top-N via the custom TopKPerGroup physical operator
    * (graft.plans: LogicalPlan + Strategy + partial/final heap exec) —
    * same answer as the window variant, radically less shuffle.
    */
  def qTopkCustom(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    graft.plans.TopKPerGroup.topK(base, 3, Seq("o_custkey"), "o_totalprice", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Window-function breadth: lead/lag, ntile, cume_dist, running
    * rank over the order history of one customer segment.
    */
  def qWindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
      .withColumn("next_order", lead(col("o_orderkey"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cdist", round(cume_dist().over(w), 6))
      .select("o_custkey", "o_orderkey", "prev_order", "next_order", "quartile", "cdist")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** FULL OUTER join coverage: every customer and every order priority
    * bucket, including unmatched sides.
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val bigCust = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_urgent"))
    bigCust.join(urgent, Seq("c_custkey"), "full_outer")
      .select(col("c_custkey"),
        coalesce(col("c_mktsegment"), lit("<none>")).as("c_mktsegment"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_suite" -> qWindowSuite,
    "q_full_outer" -> qFullOuter,
    "q_topk_custom" -> qTopkCustom,
    "q_semi_anti" -> qSemiAnti,
    "q_salted_agg" -> qSaltedAgg,
    "q1_agg" -> q1Agg,
    "q3_join" -> q3Join,
    "q_topn_per_group" -> qTopnPerGroup,
    "q_topn_auto" -> qTopnAuto,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_percentiles" -> qPercentiles,
    "q_asof_join" -> qAsofJoin,
    "q_skew_report" -> qSkewReport,
    "q_join_size_est" -> qJoinSizeEst)

  val oracles: Map[String, String] = Map(
    "q_join_size_est" ->
      """WITH a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS na
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |b AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nb
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |j AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS join_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys_shared
        |  FROM a JOIN b USING (user_id)),
        |l AS (SELECT CAST(coalesce(sum(na), 0) AS BIGINT) AS n_left FROM a),
        |r AS (SELECT CAST(coalesce(sum(nb), 0) AS BIGINT) AS n_right FROM b)
        |SELECT n_left, n_right, n_keys_shared, join_rows,
        |  CAST(join_rows * 100 // greatest(n_left + n_right, 1) AS BIGINT) AS amp_x100
        |FROM j, l, r""".stripMargin,
    "q_skew_report" ->
      s"""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY user_id),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
         |    CAST(count(*) AS BIGINT) AS n_keys FROM c),
         |r AS (SELECT user_id, n,
         |    CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rk
         |  FROM c)
         |SELECT rk, user_id, n,
         |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
         |  CAST(n * n_keys * 100 // total AS BIGINT) AS fair_x100
         |FROM r, t WHERE rk <= $SkewK ORDER BY rk""".stripMargin,
    "q_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  ntile(4) OVER w AS quartile,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(c.c_custkey, u.c_custkey) AS c_custkey,
        |  coalesce(c.c_mktsegment, '<none>') AS c_mktsegment,
        |  coalesce(u.n_urgent, 0) AS n_urgent
        |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey AS c_custkey, count(*) AS n_urgent
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
        |ON c.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_topk_custom" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, c_mktsegment,
        |  EXISTS (SELECT 1 FROM orders
        |          WHERE o_custkey = c_custkey
        |            AND o_orderpriority = '1-URGENT') AS has_urgent
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(round(sum(l_discount), 4) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
        |  FROM events)
        |SELECT event_id, user_id, ts_us, last_click_us,
        |  ts_us - last_click_us AS us_since_click
        |FROM e WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q_topn_auto" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
