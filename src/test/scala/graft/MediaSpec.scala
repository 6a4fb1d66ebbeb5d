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

  test("media phash pairs match a brute-force in-memory signature compare") {
    val got = Media.qMediaPhash(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue())).toSet
    assert(got.nonEmpty && got.forall(_._3 <= Media.PhashHammingMax))
    // reference signatures straight from the definition
    val sigs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1)
        val h = new Array[Int](Media.PhashBits)
        t.zipWithIndex.foreach { case (c, i0) =>
          h((c.toInt + i0 + 1) % Media.PhashBits) += 1 }
        val sig = (0 until Media.PhashBits)
          .filter(b => Media.PhashBits * h(b) > t.length).map(1 << _).sum
        r.getLong(0) -> sig
      }
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = Integer.bitCount(sa ^ sb) if d <= Media.PhashHammingMax
    } yield (ia, ib, d)).toSet
    assert(got == want, s"got ${got.size} want ${want.size} pairs")
  }
}
