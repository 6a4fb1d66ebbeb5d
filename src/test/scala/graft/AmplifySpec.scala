package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-sweep amplifier's invariants: each replica is NEW
  * data (disjoint keys, broken shingles, fresh sources) so the N×
  * corpus measures a bigger corpus rather than a clone workload, while
  * replica 0 keeps the 1× run transform-for-transform comparable.
  */
class AmplifySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val N = 3
  private lazy val baseDocs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
  private lazy val baseEmb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
  private lazy val baseEvents = spark.read.parquet(s"${TestSpark.sf}/events.parquet")

  test("documents: xN rows, disjoint doc_ids, per-replica sources, n_chars consistent") {
    val amp = Amplify.documents(baseDocs, N).cache()
    assert(amp.count() == baseDocs.count() * N)
    assert(amp.select("doc_id").distinct().count() == amp.count())
    // every replica contributes its own source namespace
    val suffixes = amp.select(regexp_extract(col("source"), "_r(\\d+)$", 1))
      .distinct().as[String].collect().toSet
    assert(suffixes == (0 until N).map(_.toString).toSet)
    // the stored n_chars matches the salted text it rides with
    assert(amp.filter(col("n_chars") =!= length(col("text"))).count() == 0)
  }

  test("documents: replica salt breaks cross-replica shingles but keeps entities") {
    val amp = Amplify.documents(baseDocs, N)
    // pick one base doc, compare its replica-0 and replica-1 texts
    val id0 = baseDocs.agg(min("doc_id")).as[Long].head()
    val texts = amp.filter(col("doc_id") % Amplify.Stride === id0)
      .orderBy("doc_id").select("text").as[String].collect()
    assert(texts.length == N)
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val overlap = shingles(texts(0)).intersect(shingles(texts(1)))
    // the every-4th-word salt leaves no 5-gram window untouched
    assert(overlap.isEmpty, s"cross-replica shingles survived: ${overlap.take(3)}")
    // salting only APPENDS tokens — the original word sequence (and so
    // every gazetteer entity surface) is a subsequence of each replica
    val w0 = texts(0).split(" ").filterNot(_.startsWith("zq")).mkString(" ")
    val w1 = texts(1).split(" ").filterNot(_.startsWith("zq")).mkString(" ")
    assert(w0 == w1)
  }

  test("embeddings: xN rows, disjoint vec_ids, rotation preserves the norm multiset") {
    val amp = Amplify.embeddings(baseEmb, N).cache()
    assert(amp.count() == baseEmb.count() * N)
    assert(amp.select("vec_id").distinct().count() == amp.count())
    val nrm = expr("round(sqrt(aggregate(embedding, 0.0D, (a, x) -> a + x * x)), 4)")
    val baseNorms = baseEmb.select(nrm.as("n")).groupBy("n").count()
    val ampNorms = amp.filter(col("vec_id") >= Amplify.Stride)
      .filter(col("vec_id") < 2 * Amplify.Stride).select(nrm.as("n")).groupBy("n").count()
    assert(baseNorms.except(ampNorms).isEmpty && ampNorms.except(baseNorms).isEmpty)
  }

  test("events: xN rows, user population scales xN") {
    val amp = Amplify.events(baseEvents, N).cache()
    assert(amp.count() == baseEvents.count() * N)
    assert(amp.select("user_id").distinct().count()
      == baseEvents.select("user_id").distinct().count() * N)
  }
}
