package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench reporting contract, asserted at the unit level so the
  * round-5 failure mode (metric line outgrowing the driver's
  * 2000-char log tail → parsed:null, the round's bench zeroed) fails
  * CI instead of the round.
  */
class BenchContractSpec extends AnyFunSuite {

  private val segments = Seq("x_mat_graph", "x_amortized6q",
    "x_mat_shingles", "x_amortized_dd6q")
  private val allNames = SparkEntry.queries.keys.toSeq ++ segments

  test("bench keys are collision-free across the whole query surface") {
    val keys = allNames.map(Bench.key)
    val dup = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dup.isEmpty, s"key collisions (runtime would index-suffix them " +
      s"and break round-over-round comparability): $dup")
  }

  test("worst-case metric line fits the driver's 2000-char tail with epilogue") {
    // r1 prints <10s values as "9.9" (3 chars) and >=10s as whole
    // seconds (<=3 chars under the 1000s ceiling) — so 3 chars per
    // value IS the worst case for a green run.
    val qs = allNames.map(n => s""""${Bench.key(n)}":9.9""")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":10000.00,"unit":"sec","queries":$qs,"sf":"sf0.001"}"""
    val epilogue = 100 // "[success] Total time: ..." is ~75 chars + newlines
    assert(line.length + epilogue <= 2000,
      s"metric line would be ${line.length} chars (+$epilogue epilogue); " +
        "compress keys in Bench.abbrev before adding more queries")
  }

  test("error strings are capped so a failing run still parses") {
    // 40-char digests, at most 2 on the line (plus the count): even a
    // many-failure run adds a bounded errors field.
    val maxErrField =
      s""","failures":999,"errors":{"${"k" * 8}":"${"e" * 40}","${"k" * 8}":"${"e" * 40}"}"""
    assert(maxErrField.length < 140)
  }
}
