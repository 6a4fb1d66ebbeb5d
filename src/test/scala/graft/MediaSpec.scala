package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media

class MediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decode stub features are L1-normalized per row") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, TestSpark.sf))
    val bad = feats.toDF()
      .withColumn("s", aggregate(col("features"), lit(0.0), (acc, x) => acc + x))
      .filter(abs(col("s") - 1.0) > 1e-3)
      .count()
    assert(bad == 0)
  }

  test("media byte length matches document char length (utf8 1-byte corpus)") {
    val bad = Media.qMediaFeatures(spark, TestSpark.sf)
      .join(Tables.documents(spark, TestSpark.sf), "doc_id")
      .filter(col("n_bytes") =!= length(col("text")))
      .count()
    assert(bad == 0)
  }

  test("frame sampling yields ceil(bytes/stride) frames per doc") {
    val frames = Media.sampleFrames(Media.mediaTable(spark, TestSpark.sf), 64, 8)
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val bad = counts.join(Media.qMediaFeatures(spark, TestSpark.sf), "doc_id")
      .filter(col("n_frames") =!= floor((col("n_bytes") - 1) / 64) + 1)
      .count()
    assert(bad == 0)
  }
}
