package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without an Exchange on the join keys") {
    Catalog.materializeGraph(spark, TestSpark.sf)
    // force the sort-merge path so bucket co-location (not broadcast)
    // is what avoids the shuffle
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Catalog.bucketedJoin(spark)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed aggregations + join must not shuffle at all:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("lang-partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_part").toString
    Catalog.writePartitioned(spark, TestSpark.sf, out)
    val de = Catalog.readLang(spark, out, "de")
    val plan = de.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning:\n$plan")
    val expected = Tables.documents(spark, TestSpark.sf)
      .filter(col("lang") === "de").count()
    assert(de.count() == expected)
  }

  test("csv round-trip preserves the quality table") {
    val out = Files.createTempDirectory("graft_csv").toString
    val orig = operators.TextAnalysis.qTokenCount(spark, TestSpark.sf)
    Catalog.writeCsv(orig, out)
    val back = Catalog.readCsv(spark, out,
      "doc_id BIGINT, n_ws_tokens BIGINT, n_bpe_tokens BIGINT, n_chars BIGINT")
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }

  test("json round-trip preserves the lang-id table") {
    val out = Files.createTempDirectory("graft_json").toString
    val orig = operators.TextAnalysis.qLangId(spark, TestSpark.sf)
    Catalog.writeJson(orig, out)
    val back = Catalog.readJson(spark, out,
      "doc_id BIGINT, pred_lang STRING, en_hits INT, de_hits INT, es_hits INT, fr_hits INT")
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }
}
