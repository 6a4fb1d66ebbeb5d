package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench reporting contract, asserted at the unit level so the
  * round-5 failure mode (metric line outgrowing the driver's
  * 2000-char log tail → parsed:null, the round's bench zeroed) fails
  * CI instead of the round. As of round 9 the renderer carries two
  * complementary fields — `queries` (exact deciseconds, expensive
  * first) and `qpack` (fixed-width 4-char packed entries carrying the
  * COMPLETE surface) — so the 228-key exact-capacity cliff the round-8
  * verdict flagged is gone: these tests pin ≥300-key zero-loss
  * capacity under the worst-case failure epilogue, and a hard line cap
  * at any surface size.
  */
class BenchContractSpec extends AnyFunSuite {

  private val segments = Seq("x_mat_graph", "x_amortized_graph",
    "x_mat_shingles", "x_amortized_dedup",
    "x_mat_ann", "x_amortized_ann")
  private val allNames = SparkEntry.queries.keys.toSeq ++ segments

  /** An entry is carried when its exact value rides the dict OR its
    * 4-char group rides qpack (2-char key + 2-char base36 ds).
    */
  private def carried(line: String, name: String, dsB36: String): Boolean = {
    val k = Bench.key(name)
    line.contains(s""""$k":""") || {
      val pack = line.split(""""qpack":"""", 2)
      pack.length == 2 && pack(1).takeWhile(_ != '"').grouped(4)
        .contains(k + dsB36)
    }
  }

  test("bench keys are collision-free across the whole query surface") {
    val keys = allNames.map(Bench.key)
    val dup = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dup.isEmpty, s"key collisions (runtime would index-suffix them " +
      s"and break round-over-round comparability): $dup")
  }

  test("every bench key is exactly 2 chars (the qpack packability contract)") {
    // qpack's fixed-width decode requires 2-char keys; a 3-char key
    // silently demotes its entry to dict-only carriage and burns the
    // headroom this round added. New operators must get an abbrev rule.
    val bad = allNames.map(n => n -> Bench.key(n)).filter(_._2.length != 2)
    assert(bad.isEmpty, s"keys not packable (add an abbrev rule): $bad")
  }

  test("worst-case green run at the current surface: every key carried, zero drop") {
    // 9.9 s/entry (99 ds = base36 "2r") — the whole-surface worst case
    // for a green run. Every key must be decodable from the line (dict
    // exact or qpack packed), with no "dropped" field and the
    // self-describing unit marker riding the line.
    val named = allNames.map(n => (n, 9.9, None: Option[String]))
    val line = Bench.metricLine(named, 10000.0, "sf0.001")
    assert(line.length <= Bench.LineBudget,
      s"metric line is ${line.length} chars; budget ${Bench.LineBudget}")
    // nq rides ONLY truncated lines (on a full line the count is
    // recoverable from the carriers)
    assert(!line.contains(""""nq":"""),
      "nq on a full line is pure overhead — it must ride truncation only")
    assert(line.contains(""""qunit":"ds""""), "unit marker must ride the line")
    assert(line.contains(""""qpack":""""), "qpack must carry the full surface")
    assert(!line.contains("\"dropped\":"),
      "current surface must fit whole — add keys deliberately or shrink values")
    assert(!line.contains("\"clamped\":"),
      "no green sub-cap run may pay the clamped field")
    val missing = allNames.filterNot(n => carried(line, n, "2r"))
    assert(missing.isEmpty, s"keys missing from both carriers: $missing")
  }

  test("probe_pr rides the line when provided, inside the budget, zero loss") {
    // The round-10 drift-normalization field: the solo q_pagerank
    // deciseconds measured after warm-up. Its width is part of the
    // fixed epilogue, so carrying it can never silently evict a
    // query entry past the budget.
    val named = allNames.map(n => (n, 9.9, None: Option[String]))
    val line = Bench.metricLine(named, 10000.0, "sf0.1", Some(27L))
    assert(line.contains(""""probe_pr":27"""),
      "the canonical host-speed probe must ride the line")
    assert(line.length <= Bench.LineBudget)
    assert(!line.contains("\"dropped\":"))
    val missing = allNames.filterNot(n => carried(line, n, "2r"))
    assert(missing.isEmpty, s"keys missing from both carriers: $missing")
    // absent probe (SPARK_GRAFT_ONLY iteration runs) costs zero chars
    assert(!Bench.metricLine(named, 10000.0, "sf0.1").contains("probe_pr"))
  }

  test("capacity: a 320-key surface is carried whole, even with the failure epilogue") {
    // The round-8 cliff: 228 keys were the dict's EXACT capacity, so
    // key #229 started silently dropping entries. Pin the round-9 fix
    // at 320 synthetic 2-char keys (> the ≥260 the verdict asked for)
    // with worst-case 2-digit values, and assert zero loss.
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val names = for (a <- alpha; b <- alpha) yield s"$a$b"
    val synth = names.take(320).map(n => (n, 9.9, None: Option[String]))
    assert(synth.forall { case (n, _, _) => Bench.key(n).length == 2 })
    val line = Bench.metricLine(synth, 3168.0, "sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"320-key line is ${line.length} chars; budget ${Bench.LineBudget}")
    assert(!line.contains("\"dropped\":"),
      "320 keys must ride the carriers with zero loss")
    val missing = synth.map(_._1).filterNot(n => carried(line, n, "2r"))
    assert(missing.isEmpty, s"keys missing from both carriers: $missing")
    // the capacity guarantee must also hold with probe_pr occupying
    // the fixed epilogue (round-10 review finding: the probe shrinks
    // the carrier budget by ~4 entries and the 320-key pin never
    // exercised it)
    val lineP = Bench.metricLine(synth, 3168.0, "sf0.1", Some(33L))
    assert(lineP.length <= Bench.LineBudget,
      s"320-key line with probe_pr is ${lineP.length} chars; budget ${Bench.LineBudget}")
    assert(!lineP.contains("\"dropped\":") && lineP.contains("\"probe_pr\":33"),
      "320 keys + probe_pr must ride with zero loss")
    val missingP = synth.map(_._1).filterNot(n => carried(lineP, n, "2r"))
    assert(missingP.isEmpty, s"keys missing with probe_pr riding: $missingP")
    // and the line must survive the driver's 2000-char tail with the
    // sbt success epilogue after it
    val tail = Seq("…earlier…", line,
      "[success] Total time: 310 s (05:10), completed Jan 1, 2026")
      .mkString("\n").takeRight(2000)
    assert(tail.contains(line))
  }

  test("deciseconds render: tenths precision, no decimal point") {
    assert(Bench.ds(6.1) == "61")
    assert(Bench.ds(0.04) == "0")
    assert(Bench.ds(0.37) == "4")
    assert(Bench.ds(12.0) == "120")
  }

  test("qpack base36 values: 2 chars, clamped, never negative") {
    assert(Bench.b36(99L) == "2r")
    assert(Bench.b36(0L) == "00")
    assert(Bench.b36(35L) == "0z")
    assert(Bench.b36(1295L) == "zz")
    assert(Bench.b36(5000L) == "zz", "past-cap values clamp to the marker")
    assert(Bench.b36(-10L) == "00", "negative (failed-entry) values clamp to 0")
  }

  test("mass-clamp runs self-report entries carried only at clamp precision") {
    // 300 queries all past the 129.5 s qpack cap: the dict can hold
    // only ~55 exact values, so the rest read as exactly "zz" —
    // without the clamped field a load-inflated run would silently
    // understate its expensive tail. The line must flag the count and
    // still fit the budget.
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val names = for (a <- alpha; b <- alpha) yield s"$a$b"
    val synth = names.take(300).map(n => (n, 200.0, None: Option[String]))
    val line = Bench.metricLine(synth, 60000.0, "sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"mass-clamp line is ${line.length} chars; budget ${Bench.LineBudget}")
    assert(line.contains("\"clamped\":"),
      "clamp-precision-only carriage must be self-reported")
    assert(!line.contains("\"dropped\":"),
      "every key is still carried (qpack) — clamped, not dropped")
    val missing = synth.map(_._1).filterNot(n => carried(line, n, "zz"))
    assert(missing.isEmpty, s"keys missing from both carriers: $missing")
  }

  test("clamped qpack entries get exact dict values with priority") {
    // One 400 s entry among 300 cheap ones: its qpack group clamps to
    // "zz", so its EXACT value must ride the dict even though 300
    // refinement candidates compete for the leftover budget.
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val names = for (a <- alpha; b <- alpha) yield s"$a$b"
    val synth = ("qq", 400.0, None: Option[String]) +:
      names.filter(_ != "qq").take(300).map(n => (n, 0.5, None: Option[String])).toSeq
    val line = Bench.metricLine(synth, 550.0, "sf0.1")
    assert(line.contains(""""qq":4000"""),
      "a clamped entry's exact value must take dict priority")
    assert(line.length <= Bench.LineBudget)
  }

  test("pathological surface growth truncates instead of blowing the tail") {
    // 400 queries with long un-packable names at 999.9s each — far
    // past any real surface, and none qualify for qpack. The line must
    // stay under budget, keep the most expensive entries, and report
    // how many it dropped.
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
    // assert the COMPLETE line is still inside the window — with zero
    // entries dropped (round 9: qpack makes even the reduced failing
    // budget carry the whole surface).
    val named = allNames.zipWithIndex.map { case (n, i) =>
      (n, 9.9, if (i == 7) Some("SparkArithmeticException: ARITHMETIC_OV")
        else None: Option[String])
    }
    val line = Bench.metricLine(named, 10000.0, "sf0.1")
    assert(line.contains("\"failures\":1"))
    assert(!line.contains("\"dropped\":"),
      "a one-failure run must still carry the whole surface")
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
