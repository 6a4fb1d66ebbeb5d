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
    "x_mat_shingles", "x_amortized_dedup",
    "x_mat_ann", "x_amortized_ann")
  private val allNames = SparkEntry.queries.keys.toSeq ++ segments

  test("bench keys are collision-free across the whole query surface") {
    val keys = allNames.map(Bench.key)
    val dup = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dup.isEmpty, s"key collisions (runtime would index-suffix them " +
      s"and break round-over-round comparability): $dup")
  }

  test("worst-case green run at the current surface: full line, zero drop") {
    // Values render as integer deciseconds (round-7 change): a 9.9 s
    // entry is "99" (2 chars), so the whole-surface worst case for a
    // green run is 8 chars/entry. The round-6 line at 3-char values
    // silently dropped its 3-4 cheapest entries; the decisecond format
    // exists precisely so the FULL surface rides the line — pin that:
    // no "dropped" field at the current surface, every key present,
    // and the self-describing unit marker on the line.
    val named = allNames.map(n => (n, 9.9, None: Option[String]))
    val line = Bench.metricLine(named, 10000.0, "sf0.001")
    assert(line.length <= Bench.LineBudget,
      s"metric line is ${line.length} chars; budget ${Bench.LineBudget}")
    // nq rides ONLY truncated lines (on a full line the count is the
    // queries-map size — the 9 chars bought the 228-key surface)
    assert(!line.contains(""""nq":"""),
      "nq on a full line is pure overhead — it must ride truncation only")
    assert(line.contains(""""qunit":"ds""""), "unit marker must ride the line")
    assert(!line.contains("\"dropped\":"),
      "current surface must fit whole — add keys deliberately or shrink values")
    val missing = allNames.filterNot(n => line.contains(s""""${Bench.key(n)}":"""))
    assert(missing.isEmpty, s"keys missing from a non-truncated line: $missing")
  }

  test("deciseconds render: tenths precision, no decimal point") {
    assert(Bench.ds(6.1) == "61")
    assert(Bench.ds(0.04) == "0")
    assert(Bench.ds(0.37) == "4")
    assert(Bench.ds(12.0) == "120")
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
    // most-expensive-first: the slowest entry always survives (999 s
    // renders as 9990 deciseconds)
    assert(line.contains(s""""${Bench.key("q_stress_query_number_1")}":9990"""))
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

  test("failing full-surface run survives the 2000-char tail with the epilogue") {
    // The round-7 artifact killer: ONE failing query made the run exit
    // non-zero, and the epilogue after the final metric line (stderr
    // failure list + sbt's ~3 [error] lines) pushed the line's head out
    // of the driver's 2000-char tail → parsed:null. Simulate that run
    // end-to-end at the CURRENT surface: render the line as main would,
    // append the worst-case epilogue, take the trailing 2000 chars, and
    // assert the COMPLETE line is still inside the window.
    val named = allNames.zipWithIndex.map { case (n, i) =>
      (n, 9.9, if (i == 7) Some("SparkArithmeticException: ARITHMETIC_OV")
        else None: Option[String])
    }
    val line = Bench.metricLine(named, 10000.0, "sf0.1")
    assert(line.contains("\"failures\":1"))
    // worst-case epilogue: the capped stderr list lands AFTER the line
    // (stream interleaving is not guaranteed) + sbt's error epilogue
    val stderrList = ("[bench] 1 queries FAILED: " + "x" * 300)
      .take(Bench.FailListCap)
    val sbtEpilogue = Seq(
      "[error] Nonzero exit code returned from runner: 1",
      "[error] (Compile / runMain) Nonzero exit code returned from runner: 1",
      "[error] Total time: 310 s (05:10), completed Jan 1, 2026, 1:23:45 PM")
    val log = Seq("…earlier output…", line, stderrList) ++ sbtEpilogue
    val tail = log.mkString("\n").takeRight(2000)
    assert(tail.contains(line),
      s"metric line (${line.length} chars) must survive the tail window " +
        s"with the failure epilogue (${(stderrList +: sbtEpilogue).map(_.length).sum} chars) after it")
  }

  test("error strings are capped so a failing run still parses") {
    // 40-char digests, at most 2 on the line (plus the count): even a
    // many-failure run adds a bounded errors field.
    val maxErrField =
      s""","failures":999,"errors":{"${"k" * 8}":"${"e" * 40}","${"k" * 8}":"${"e" * 40}"}"""
    assert(maxErrField.length < 140)
  }
}
