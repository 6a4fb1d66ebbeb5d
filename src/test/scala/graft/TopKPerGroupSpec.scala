package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom operator matches the window row_number pattern exactly") {
    val base = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = TopKPerGroup.topK(base, 3, Seq("o_custkey"), "o_totalprice", "o_orderkey")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val window = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
    assert(custom.except(window).count() == 0)
    assert(window.except(custom).count() == 0)
  }

  test("plan shows the partial/final TopKPerGroupExec pair, no Sort") {
    val base = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopKPerGroup.topK(base, 3, Seq("o_custkey"), "o_totalprice", "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(plan.split("TopKPerGroup ").length >= 3, s"expected partial+final:\n$plan")
    assert(!plan.contains("Sort "), s"top-k must not sort:\n$plan")
  }

  test("k larger than any group returns everything") {
    val base = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val all = TopKPerGroup.topK(base, 1000000, Seq("o_custkey"), "o_totalprice", "o_orderkey")
    assert(all.count() == base.count())
  }

  test("unknown column fails loudly") {
    val base = Tables.orders(spark, TestSpark.sf).select("o_custkey", "o_orderkey")
    intercept[IllegalArgumentException] {
      TopKPerGroup.topK(base, 3, Seq("o_custkey"), "nope", "o_orderkey")
    }
  }

  test("BIGINT order values beyond 2^53 keep full precision") {
    import spark.implicits._
    // 2^53 and 2^53+1 are the SAME Double — a double-coerced ordering
    // would pick either; the native long ordering must pick 2^53+1
    val big = (1L << 53)
    val df = Seq((1L, 10L, big), (1L, 11L, big + 1), (1L, 12L, big - 1))
      .toDF("g", "id", "v")
    val top = TopKPerGroup.topK(df, 1, Seq("g"), "v", "id").collect()
    assert(top.length == 1 && top(0).getLong(2) == big + 1,
      s"lost long precision: ${top.toSeq}")
  }

  test("string and date order columns compare by native semantics") {
    import spark.implicits._
    val sdf = Seq((1L, 1L, "apple"), (1L, 2L, "Pear"), (1L, 3L, "zeta"))
      .toDF("g", "id", "s")
    val topS = TopKPerGroup.topK(sdf, 1, Seq("g"), "s", "id").collect()
    assert(topS(0).getString(2) == "zeta")
    val ddf = Seq((1L, 1L, java.sql.Date.valueOf("2020-01-02")),
      (1L, 2L, java.sql.Date.valueOf("2021-03-01")))
      .toDF("g", "id", "d")
    val topD = TopKPerGroup.topK(ddf, 1, Seq("g"), "d", "id").collect()
    assert(topD(0).getDate(2) == java.sql.Date.valueOf("2021-03-01"))
  }

  test("non-orderable order column is rejected at plan build") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("g", "id")
      .withColumn("m", map(lit("k"), lit(1)))
    intercept[IllegalArgumentException] {
      TopKPerGroup.topK(df, 1, Seq("g"), "m", "id")
    }
  }
}
