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
}
