package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class SrpSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planeGroups: Seq[Seq[Int]] =
    (0 until Similarity.LshTables).map(t =>
      t * Similarity.LshBits until (t + 1) * Similarity.LshBits) ++
      (0 until Dedup.EmbLshTables).map(t =>
        t * Dedup.EmbLshBits until (t + 1) * Dedup.EmbLshBits)

  test("native SRP buckets equal the HOF fold buckets on the full corpus") {
    // every plane grouping used anywhere: 4 ANN tables of 8 bits,
    // 8 dedup-blocking tables of 4 bits
    val e = Similarity.vectors(spark, TestSpark.sf)
    planeGroups.zipWithIndex.foreach { case (planes, i) =>
      val bad = e.select(
          Similarity.srpSigNative(col("v"), planes).as("native"),
          Similarity.srpSigCol(col("v"), planes).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(bad == 0, s"plane group $i: native and HOF buckets must match")
    }
  }

  test("interpreted eval matches the codegen path") {
    val planes = planeGroups.head.map(Similarity.Hyperplanes(_)).toArray
    val vals = Similarity.vectors(spark, TestSpark.sf).limit(20)
      .select(col("v")).collect().map(_.getSeq[Double](0))
    vals.foreach { v =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v.toArray)
      val interp = graft.functions.SrpSig.compute(arr, planes)
      // the DataFrame path above ran through codegen; recompute one
      // vector directly and compare against the HOF column result
      val viaDf = Similarity.vectors(spark, TestSpark.sf)
        .select(Similarity.srpSigNative(col("v"), planeGroups.head).as("b"), col("v"))
        .filter(col("v") === typedLit(v)).select("b")
      assert(viaDf.head().getInt(0) == interp)
    }
  }
}
