package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench reporting contract, asserted at the unit level so the
  * round-5 failure mode (metric line outgrowing the driver's
  * 2000-char log tail → parsed:null, the round's bench zeroed) fails
  * CI instead of the round. As of round 6 the renderer is
  * self-limiting (Bench.metricLine): entries emit most-expensive-first
  * and truncate against LineBudget, so these tests pin BOTH properties
  * — no truncation at the current surface under worst-case digit
  * growth, and a hard line cap at any surface size.
  */
class BenchContractSpec extends AnyFunSuite {

  private val segments = Seq("x_mat_graph", "x_amortized_graph",
    "x_mat_shingles", "x_amortized_dedup")
  private val allNames = SparkEntry.queries.keys.toSeq ++ segments

  test("bench keys are collision-free across the whole query surface") {
    val keys = allNames.map(Bench.key)
    val dup = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dup.isEmpty, s"key collisions (runtime would index-suffix them " +
      s"and break round-over-round comparability): $dup")
  }

  test("worst-case green run at the current surface: fits, bounded drop, audit tail intact") {
    // <10s values print as "9.9" (3 chars) and >=10s as whole seconds
    // (<=3 chars under the 1000s ceiling) — 3 chars per value IS the
    // worst case for a green run. The driver tail fits ~204 9-char
    // entries; every key was already compressed to 2 chars in round 6,
    // so past that STRUCTURAL ceiling the renderer's escape hatch is
    // the contract: cheapest entries drop first, "dropped" reports the
    // count, and "nq" always carries the full surface size. Bound the
    // worst-case loss tightly so surface growth stays deliberate, and
    // note that REAL lines are shorter than this bound (sub-second
    // values are 3 chars, >=10s values 2-3 — the round-6 artifact held
    // 201 keys in 1863 chars).
    val named = allNames.map(n => (n, 9.9, None: Option[String]))
    val line = Bench.metricLine(named, 10000.0, "sf0.001")
    assert(line.length <= Bench.LineBudget,
      s"metric line is ${line.length} chars; budget ${Bench.LineBudget}")
    assert(line.contains(s""""nq":${named.size}"""))
    val dropped = "\"dropped\":(\\d+)".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    assert(dropped <= 8,
      s"worst-case line drops $dropped entries — keys must stay 2 chars " +
        "and surface growth past the tail ceiling must be deliberate")
    val missing = allNames.filterNot(n => line.contains(s""""${Bench.key(n)}":"""))
    assert(missing.size == dropped,
      s"missing keys (${missing.size}) must equal the reported drop count $dropped")
  }

  test("pathological surface growth truncates instead of blowing the tail") {
    // 400 queries at 999.9s each — far past any real surface. The line
    // must stay under budget, keep the most expensive entries, and
    // report how many it dropped.
    val named = (1 to 400).map(i =>
      (s"q_stress_query_number_$i", 1000.0 - i, None: Option[String]))
    val line = Bench.metricLine(named, 99999.0, "sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"truncated line is ${line.length} chars; budget ${Bench.LineBudget}")
    assert(line.contains("\"nq\":400"))
    assert(line.contains("\"dropped\":"), "oversize surface must self-report truncation")
    // most-expensive-first: the slowest entry always survives
    assert(line.contains(s""""${Bench.key("q_stress_query_number_1")}":999"""))
  }

  test("failing entries ride the line capped and the line still fits") {
    val named = allNames.zipWithIndex.map { case (n, i) =>
      (n, 9.9, if (i < 9) Some("e" * 40) else None: Option[String])
    }
    val line = Bench.metricLine(named, 10000.0, "sf0.01")
    assert(line.length <= Bench.LineBudget,
      s"failing-run line is ${line.length} chars; budget ${Bench.LineBudget}")
    assert(line.contains("\"failures\":9"))
    // at most two 40-char digests ride the line regardless of count
    assert(line.sliding(40).count(_ == "e" * 40) <= 2)
  }

  test("error strings are capped so a failing run still parses") {
    // 40-char digests, at most 2 on the line (plus the count): even a
    // many-failure run adds a bounded errors field.
    val maxErrField =
      s""","failures":999,"errors":{"${"k" * 8}":"${"e" * 40}","${"k" * 8}":"${"e" * 40}"}"""
    assert(maxErrField.length < 140)
  }
}
