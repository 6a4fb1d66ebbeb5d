package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.streaming.EventStream

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL distinct within 5% of exact per event type") {
    val bad = Sketches.approxDistinct(spark, TestSpark.sf)
      .filter(abs(col("approx_users") - col("exact_users"))
        > col("exact_users") * 0.05)
      .count()
    assert(bad == 0)
  }

  test("approx median within 10% of exact per event type") {
    val bad = Sketches.approxQuantiles(spark, TestSpark.sf)
      .filter(abs(col("approx_p50") - col("exact_p50"))
        > abs(col("exact_p50")) * 0.10)
      .count()
    assert(bad == 0)
  }

  test("streaming dedup keeps exactly the distinct event_ids") {
    val out = EventStream.runDedupToMemory(spark, TestSpark.sf, "dedup_out")
    val exact = Tables.events(spark, TestSpark.sf)
      .select("event_id").distinct().count()
    assert(out.count() == exact)
    assert(out.select("event_id").distinct().count() == exact)
  }
}
