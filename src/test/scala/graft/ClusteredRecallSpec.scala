package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The recall audit on a corpus where recall MEANS something: the
  * driver's synthetic embeddings are isotropic (no neighborhood
  * structure), so q_ann_recall's numbers there are coverage-bound by
  * construction. This spec generates the deterministic planted-cluster
  * fixture (Amplify.clusteredEmbeddings), proves it is genuinely
  * non-isotropic, and re-runs the UNCHANGED 16-probe audit against it
  * — pinning that the IVF serving path and the ADC+refine path
  * actually find true neighbors when true neighbors exist. The
  * measured table is the SURVEY §6 clustered-audit row.
  */
class ClusteredRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = Similarity.ClusteredN
  private val Clusters = Similarity.ClusteredC

  test("planted-cluster fixture is genuinely non-isotropic: top-K label coherence ≈ 1") {
    // brute-force exact top-10 per probe in pure Scala, then check the
    // neighbors share the probe's cluster label — on the driver's
    // isotropic corpus this reads ≈ 1/Clusters (chance)
    val rows = Amplify.clusteredEmbeddings(spark, N, Clusters).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label")))
      .sortBy(_._1) // collect order is partition order, not vec_id order
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val coherence = (0 until Similarity.ProbeBatch).map { q =>
      val (_, qv, ql) = rows(q)
      val top = rows.filter(_._1 >= Similarity.ProbeBatch)
        .map { case (id, v, l) => (cos(qv, v), id, l) }
        .sortBy { case (s, id, _) => (-s, id) }.take(Similarity.KnnK)
      top.count(_._3 == ql).toDouble / Similarity.KnnK
    }
    val mean = coherence.sum / coherence.size
    assert(mean >= 0.99, s"fixture not clustered: label coherence $mean")
  }

  test("clustered audit: ivf and ivfpq_refine serve ≥0.9 mean recall; all legs measured") {
    // through the ORACLE KEY's own path (fixture write included)
    val got = Similarity.qAnnRecallClustered(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Double]("mean_recall"), r.getAs[Double]("min_recall")))).toMap
    assert(got.keySet == Set("binary", "ivf", "ivfpq", "ivfpq_refine", "lsh", "pq", "sq8"))
    // the verdict's bar: the cell-probing serving paths must actually
    // retrieve the planted neighbors
    assert(got("ivf")._1 >= 0.9, s"ivf mean recall ${got("ivf")._1} < 0.9")
    assert(got("ivfpq_refine")._1 >= 0.9,
      s"ivfpq_refine mean recall ${got("ivfpq_refine")._1} < 0.9")
    // sq8 is a flat exact-arithmetic scan at int8 precision — on a
    // strongly-separated corpus it must be near-perfect too
    assert(got("sq8")._1 >= 0.9, s"sq8 mean recall ${got("sq8")._1} < 0.9")
    // record every leg for the SURVEY clustered-audit row
    info(got.toSeq.sortBy(_._1)
      .map { case (m, (a, b)) => f"$m mean=$a%.3f min=$b%.3f" }.mkString("; "))
  }
}
