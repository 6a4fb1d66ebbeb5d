package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.operators.TextPipeline

/** Property-based tests over generated corpora — invariants that must
  * hold for ANY input, not just the driver tables. (Raw ScalaCheck
  * generators with fixed seeds; the scalatest bridge isn't in the
  * offline cache.)
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("chunker is lossless for arbitrary generated texts") {
    import spark.implicits._
    val texts = samples(text, 40)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val words = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "word")))
      .withColumn("pos", col("p0") + 1)
      .withColumn("off", coalesce(sum(length(col("word")) + 1).over(w), lit(0L)))
    val chunks = TextPipeline.withChunkId(words)
      .groupBy("doc_id", "chunk_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("word")))),
        s => s.getField("word"))).as("chunk_text"))
    val rejoined = chunks.groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text"))).as("r"))
    val bad = rejoined.join(docs, "doc_id")
      .filter(col("r") =!= col("text")).count()
    assert(bad == 0, s"chunker lost content on generated texts")
  }

  test("simhash is token-order invariant (multiset semantics)") {
    val rnd = new scala.util.Random(7)
    samples(Gen.listOfN(30, word), 20).foreach { ws =>
      val a = sigOf(ws)
      val b = sigOf(rnd.shuffle(ws))
      assert(a == b, s"signature depends on token order for $ws")
    }
  }

  test("simhash: self-distance zero, valid range, duplicate-token sensitivity") {
    samples(Gen.listOfN(40, word), 20).foreach { ws =>
      val base = sigOf(ws)
      assert(java.lang.Long.bitCount(base ^ base) == 0)
      assert(base >= 0L, "60-bit signature must be non-negative")
      // simhash is multiset-weighted: duplicating the whole doc keeps
      // every vote's sign, so the signature is unchanged
      assert(sigOf(ws ++ ws) == base)
    }
  }

  private def sigOf(ws: Seq[String]): Long = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    SimHash64.compute(ArrayData.toArrayData(
      ws.map(w => UTF8String.fromString(w)).toArray))
  }
}
