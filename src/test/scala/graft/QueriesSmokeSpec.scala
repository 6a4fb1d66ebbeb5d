package graft

import org.scalatest.funsuite.AnyFunSuite

/** One generated test per SparkEntry query: runs at sf0.001, asserts
  * non-empty result and a non-null schema. The DuckDB oracle (driver
  * gate + tools/compare.py) covers value correctness; this guards
  * plan-construction regressions per operator.
  */
class QueriesSmokeSpec extends AnyFunSuite {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(TestSpark.spark, TestSpark.sf)
      assert(df.schema.fields.nonEmpty, "schema must be non-empty")
      // global scale guard: no operator may plan an unbounded
      // cartesian product — every cross pairing in the library rides
      // a broadcast of a provably tiny side (BNLJ) or a banded
      // equi-join, and this asserts it for EVERY query, not just the
      // plan-audited headline list
      assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or is documented rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
