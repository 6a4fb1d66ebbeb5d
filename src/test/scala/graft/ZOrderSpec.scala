package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder64
import graft.sources.Catalog

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spread/unspread round-trip every 31-bit pattern class") {
    val rnd = new scala.util.Random(7)
    val samples = Seq(0L, 1L, 2L, 3L, 0x7fffffffL, 0x40000000L, 0x55555555L,
      0x2aaaaaaaL) ++ Seq.fill(200)(rnd.nextLong().abs & 0x7fffffffL)
    samples.foreach { v =>
      assert(ZOrder64.unspread(ZOrder64.spread(v)) === v, s"round-trip $v")
    }
  }

  test("compute interleaves losslessly and clamps out-of-range keys monotonely") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong().abs & 0x7fffffffL
      val b = rnd.nextLong().abs & 0x7fffffffL
      val z = ZOrder64.compute(a, b)
      assert(z >= 0L, "z-value must stay non-negative (signed sort safety)")
      assert(ZOrder64.unspread(z) === a)
      assert(ZOrder64.unspread(z >>> 1) === b)
    }
    // saturation: below-range pins to the curve origin, above-range to the
    // far corner — monotone, never wrapped
    assert(ZOrder64.compute(-5L, 3L) === ZOrder64.compute(0L, 3L))
    assert(ZOrder64.compute(Long.MaxValue, 3L) === ZOrder64.compute(0x7fffffffL, 3L))
  }

  test("native expression matches the JVM helper and survives codegen") {
    val df = spark.range(500).select(
      col("id"),
      ZOrder64.zorder64(col("id") * 7 % 100, col("id")).as("zv"))
    df.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === ZOrder64.compute(id * 7 % 100, id))
    }
  }

  test("z-ordered layout confines a 2-D box to a strict file subset; hash layout scatters it") {
    val tmp = Files.createTempDirectory("zorder_spec").toString
    val zPath = s"$tmp/z"
    val hPath = s"$tmp/h"
    val nFiles = 16
    Catalog.writeZOrdered(spark, TestSpark.sf, zPath, nFiles)
    // counter-layout: same rows, hash-scattered across the same file count
    Tables.documents(spark, TestSpark.sf)
      .repartition(nFiles, col("doc_id"))
      .write.parquet(hPath)
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("doc_id").between(100, 299) && col("n_chars").between(100, 300))
        .select(input_file_name()).distinct().count()
    val zTouched = filesTouched(zPath)
    val hTouched = filesTouched(hPath)
    // 77 matching doc_ids over 16 hash buckets: essentially every file
    // (deterministic hash; allow a straggler-empty bucket or two)
    assert(hTouched >= (nFiles - 2).toLong,
      s"hash layout should scatter the box across ~all $nFiles files, got $hTouched")
    assert(zTouched < hTouched,
      s"z-order must confine the box to fewer files: z=$zTouched hash=$hTouched")
    assert(zTouched <= nFiles / 2,
      s"a ~15%-selectivity box should live in at most half the z-files, got $zTouched")
  }

  test("z-ordered layout is lossless: full read-back equals the source table") {
    val zPath = Files.createTempDirectory("zorder_lossless").toString + "/z"
    Catalog.writeZOrdered(spark, TestSpark.sf, zPath, 4)
    val src = Tables.documents(spark, TestSpark.sf)
    val back = spark.read.parquet(zPath)
    assert(back.count() === src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
    assert(back.join(src, Seq("doc_id", "n_chars", "lang", "source", "text"))
      .count() === src.count())
  }

  test("OPTIMIZE ZORDER as a snapshot commit: clustered rewrite behind a pointer flip") {
    // the full lakehouse housekeeping story from the two primitives:
    // v1 = raw ingest order, v2 = the SAME rows z-clustered — readers
    // pinned on v1 are untouched while the rewrite runs, and the flip
    // makes the clustered layout visible atomically
    val table = Files.createTempDirectory("zorder_snap").toString + "/t"
    val docs = Tables.documents(spark, TestSpark.sf)
    assert(Catalog.snapshotCommit(spark, docs.repartition(16, col("doc_id")), table) === 1)
    val pinned = Catalog.readSnapshot(spark, table)
    val zTmp = Files.createTempDirectory("zorder_snap_stage").toString + "/z"
    Catalog.writeZOrdered(spark, TestSpark.sf, zTmp, 16)
    assert(Catalog.snapshotCommit(spark, spark.read.parquet(zTmp), table) === 2)
    // rows identical across the rewrite; pinned reader still on v1
    assert(Catalog.readSnapshot(spark, table).count() === docs.count())
    assert(pinned.count() === docs.count())
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("doc_id").between(100, 299) && col("n_chars").between(100, 300))
        .select(input_file_name()).distinct().count()
    // the committed clustered version confines the box; v1 scatters it
    assert(filesTouched(Catalog.readSnapshot(spark, table)) <
      filesTouched(Catalog.readSnapshot(spark, table, version = 1)),
      "the z-clustered snapshot must touch fewer files for the 2-D box")
  }

  test("q_zorder_scan pushes both range predicates into the parquet scan") {
    val df = Catalog.qZOrderScan(spark, TestSpark.sf)
    // formatted mode prints the full PushedFilters list (toString
    // truncates it at 100 chars, hiding the n_chars entries)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(doc_id,100") &&
      plan.contains("GreaterThanOrEqual(n_chars,100"),
      s"both box predicates must reach the scan:\n$plan")
  }

  test("manifest stats prune a box query to only the matching z-ordered files") {
    // The Iceberg/Delta move the snapshot layer stopped short of:
    // at 100 TB parquet-footer pruning still pays a listing + footer
    // read per file — the manifest's per-file min/max answers from
    // metadata alone, BEFORE the scan is even constructed.
    val table = Files.createTempDirectory("manifest_prune").toString + "/t"
    val nFiles = 16
    // commit the z-clustered DataFrame DIRECTLY: re-reading a written
    // copy would bin-pack the small files together and coarsen the
    // layout the pruning claim depends on
    assert(Catalog.snapshotCommit(spark,
      Catalog.zOrderedDocuments(spark, TestSpark.sf, nFiles), table) === 1)
    val ranges = Map("doc_id" -> (100L, 299L), "n_chars" -> (100L, 300L))
    val (kept, total) = Catalog.prunedSnapshotFiles(table, ranges)
    assert(total >= nFiles - 2, s"expected ~$nFiles committed files, got $total")
    // correctness: pruned read + residual filter ≡ full read + filter
    def boxRows(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("doc_id").between(100, 299) && col("n_chars").between(100, 300))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val full = boxRows(Catalog.readSnapshot(spark, table))
    val pruned = boxRows(Catalog.readSnapshotPruned(spark, table, ranges))
    assert(pruned == full, "pruned scan must return the identical box rows")
    // the pruning claim: the kept set is EXACTLY the files the box
    // touches — no file is opened that footer pruning would also skip
    val touched = Catalog.readSnapshot(spark, table)
      .filter(col("doc_id").between(100, 299) && col("n_chars").between(100, 300))
      .select(input_file_name()).distinct().collect()
      .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    assert(touched.subsetOf(kept.toSet), "pruning must never drop a matching file")
    // min/max stats are per-column (same granularity as parquet
    // footers), so kept may exceed the exactly-touched set by files
    // whose column ranges overlap without a joint hit — bound the
    // looseness against the truly-touched set and require REAL
    // pruning (files dropped before the scan is constructed)
    assert(kept.size < total,
      s"the box must prune at least one file: kept ${kept.size}/$total")
    assert(kept.size <= touched.size + total / 2,
      s"per-column stats too loose: kept ${kept.size}, touched ${touched.size}, total $total")
    // string-equality pruning composes (lang is a stat column)
    val (langKept, _) = Catalog.prunedSnapshotFiles(table,
      Map.empty, eqs = Map("lang" -> "zz_no_such_lang"))
    assert(langKept.isEmpty || langKept.size < total,
      "an impossible lang literal should prune aggressively")
  }

  test("decimal-string stats prune numerically, never lexicographically") {
    // A DOUBLE-typed stat column records bounds like "5.5"/"30.5".
    // The old eq compare tried toLong, threw, and fell back to
    // lexicographic containment — which reads "30.5" < "7.5" and
    // WRONGLY prunes the file containing 7.5 (the same bug class the
    // integer path already fixed). Numeric parse must go through
    // toDouble on both paths.
    import spark.implicits._
    val table = Files.createTempDirectory("decimal_prune").toString + "/t"
    val df = Seq(5.5, 7.5, 30.5).toDF("doc_id").coalesce(1)
    assert(Catalog.snapshotCommit(spark, df, table) === 1)
    val (kept, total) = Catalog.prunedSnapshotFiles(
      table, Map.empty, eqs = Map("doc_id" -> "7.5"))
    assert(total == 1 && kept.size == 1,
      s"7.5 is inside [5.5, 30.5] — lexicographic fallback pruned it: $kept")
    // long ranges against decimal bounds overlap numerically
    val (kept2, _) = Catalog.prunedSnapshotFiles(table, Map("doc_id" -> (6L, 8L)))
    assert(kept2.size == 1, "range [6,8] overlaps [5.5,30.5]")
    // and a genuinely disjoint range still prunes
    val (kept3, _) = Catalog.prunedSnapshotFiles(table, Map("doc_id" -> (1000L, 2000L)))
    assert(kept3.isEmpty, "disjoint ranges must still prune decimal-stat files")
  }
}
