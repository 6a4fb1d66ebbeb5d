package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64

class SimHash64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen and interpreted paths agree") {
    val df = Tables.documents(spark, TestSpark.sf)
      .withColumn("sig", SimHash64.simhash64(split(col("text"), " ")))
      .select("doc_id", "sig")
    val withCodegen = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(withCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("registers as a SQL function") {
    SimHash64.register(spark)
    val n = spark.sql(
      s"SELECT simhash64(split(text, ' ')) AS sig FROM parquet.`${TestSpark.sf}/documents.parquet`")
      .filter(col("sig") > 0).count()
    assert(n > 0)
  }

  test("signature matches the SQL-expressible 60-bit formula") {
    val viaExpr = Tables.documents(spark, TestSpark.sf)
      .withColumn("sig", SimHash64.simhash64(split(col("text"), " ")))
      .select("doc_id", "sig")
    val viaSql = Tables.documents(spark, TestSpark.sf).selectExpr("doc_id",
      """aggregate(
        |  zip_with(
        |    aggregate(
        |      transform(split(text, ' '),
        |        w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)),
        |      array_repeat(0, 60),
        |      (acc, h) -> zip_with(acc, sequence(0, 59),
        |        (c, b) -> c + cast(((shiftright(h, b) & 1) * 2 - 1) as int))),
        |    sequence(0, 59),
        |    (c, b) -> if(c > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))),
        |  cast(0 as bigint), (a, x) -> a + x) as sig""".stripMargin)
    assert(viaExpr.except(viaSql).count() == 0)
    assert(viaSql.except(viaExpr).count() == 0)
  }

  test("identical texts share a signature; near-identical are close") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark join merge sort the table"),
      (2L, "spark join merge sort the table"),
      (3L, "spark join merge sort the column")).toDF("id", "t")
      .withColumn("sig", SimHash64.simhash64(split(col("t"), " ")))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) < 30)
  }
}
