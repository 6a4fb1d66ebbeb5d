package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact dedup: canonical_id <= doc_id and copies >= 1") {
    val bad = Dedup.qDedupExact(spark, TestSpark.sf)
      .filter(col("canonical_id") > col("doc_id") || col("n_copies") < 1)
      .count()
    assert(bad == 0)
  }

  test("minhash pairs have jaccard within [threshold, 1]") {
    val df = Dedup.qDedupMinhash(spark, TestSpark.sf)
    val bad = df.filter(col("jaccard") < Dedup.JaccardThreshold || col("jaccard") > 1.0).count()
    assert(bad == 0)
    assert(df.count() > 0, "sf0.001 corpus contains near-dups; LSH must find them")
  }

  test("simhash hamming bounded by signature width") {
    val bad = Dedup.qDedupSimhash(spark, TestSpark.sf)
      .filter(col("hamming") < 0 || col("hamming") > Dedup.SimhashBits).count()
    assert(bad == 0)
  }

  test("cosine of a vector with itself is 1") {
    val v = Similarity.vectors(spark, TestSpark.sf).filter(col("vec_id") === 0)
    val c = v.select(Similarity.cosineCol(col("v"), col("v")).as("c"))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("top-k scores are non-increasing") {
    val scores = Similarity.qCosineTopk(spark, TestSpark.sf)
      .select("score").collect().map(_.getDouble(0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("IVF ANN returns a subset of brute-force candidates with scores matching") {
    val bf = Similarity.qCosineTopk(spark, TestSpark.sf)
      .select(col("vec_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.qAnnIvf(spark, TestSpark.sf)
      .select(col("vec_id"), col("score")).collect()
    ivf.foreach { r =>
      bf.get(r.getLong(0)).foreach(s => assert(s == r.getDouble(1)))
    }
  }
}
