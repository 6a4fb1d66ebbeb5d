package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events
import graft.streaming.EventStream

/** Streaming twins must agree with their batch counterparts when fed
  * the same parquet data (memory sink, synchronous processing).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming windowed agg matches batch qEventsWindow") {
    val stream = EventStream.runWindowedToMemory(spark, TestSpark.sf, "win_out")
      .select("bucket", "event_type", "n_events", "sum_value")
    val batch = Events.qEventsWindow(spark, TestSpark.sf)
      .select("bucket", "event_type", "n_events", "sum_value")
    assert(stream.count() == batch.count())
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
  }

  test("streaming parquet sink + checkpoint round-trips the agg") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    EventStream.runWindowedToParquet(spark, TestSpark.sf, out, ckpt)
    val sunk = spark.read.parquet(out)
    // append-mode emits only watermark-closed windows; every emitted
    // row must match the batch result exactly
    val batch = Events.qEventsWindow(spark, TestSpark.sf)
      .select("bucket", "event_type", "n_events", "sum_value")
    assert(sunk.count() > 0)
    assert(sunk.select("bucket", "event_type", "n_events", "sum_value")
      .except(batch).count() == 0)
  }

  test("stateful running totals equal the batch purchase aggregation") {
    val evs = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .as[EventStream.Ev]
    val stream = EventStream.runningTotals(evs).toDF()
      .select(col("user_id"), round(col("total"), 2).as("total_value"),
        col("n").as("n_purchases"))
    val batch = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(round(sum(col("value")), 2).as("total_value"),
        count(lit(1)).as("n_purchases"))
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
  }

  test("production sessionizer keeps a session open across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val min = 60L * 1000000L // 1 min in µs
    val t0 = 1700000000L * 1000000L
    val input = MemoryStream[(Long, Long, Double)]
    val sessions = EventStream.sessionizeStreaming(
      input.toDF().toDF("user_id", "ts_us", "value"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_xbatch").start()
    try {
      input.addData((1L, t0, 1.0), (1L, t0 + min, 2.0)) // batch 1: open session
      q.processAllAvailable()
      input.addData((1L, t0 + 10 * min, 3.0)) // batch 2: SAME session continues
      q.processAllAvailable()
      // nothing emitted yet: the session lives in state, not split per batch
      assert(spark.table("sess_xbatch").filter(col("user_id") === 1).count() == 0)
      input.addData((2L, t0 + 120 * min, 9.0)) // batch 3: watermark advances
      q.processAllAvailable()
      input.addData((2L, t0 + 121 * min, 9.0)) // batch 4: u1 timeout fires
      q.processAllAvailable()
      val u1 = spark.table("sess_xbatch").filter(col("user_id") === 1).collect()
      assert(u1.length == 1, s"expected exactly one closed session, got ${u1.toSeq}")
      assert(u1(0).getAs[Long]("start_us") == t0)
      assert(u1(0).getAs[Long]("end_us") == t0 + 10 * min)
      assert(u1(0).getAs[Long]("n_events") == 3)
    } finally q.stop()
  }

  test("late-but-within-watermark event cannot regress an open session's end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val min = 60L * 1000000L
    val t0 = 1700000000L * 1000000L
    val input = MemoryStream[(Long, Long, Double)]
    val sessions = EventStream.sessionizeStreaming(
      input.toDF().toDF("user_id", "ts_us", "value"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_late").start()
    try {
      input.addData((1L, t0, 1.0), (1L, t0 + 10 * min, 2.0))
      q.processAllAvailable()
      // batch 2: a DELAYED event from inside the open session window
      // (5 min old, watermark lags 30 min — it is admitted). The old
      // merge branch set last_us back to t0+5min, so the next event
      // at +32min falsely split the session.
      input.addData((1L, t0 + 5 * min, 1.5))
      q.processAllAvailable()
      input.addData((1L, t0 + 32 * min, 3.0)) // 22 min after the TRUE end
      q.processAllAvailable()
      input.addData((2L, t0 + 200 * min, 9.0)) // watermark advance
      q.processAllAvailable()
      input.addData((2L, t0 + 201 * min, 9.0)) // u1 timeout fires
      q.processAllAvailable()
      val u1 = spark.table("sess_late").filter(col("user_id") === 1).collect()
      assert(u1.length == 1,
        s"late event must not split the session: ${u1.toSeq}")
      assert(u1(0).getAs[Long]("start_us") == t0)
      assert(u1(0).getAs[Long]("end_us") == t0 + 32 * min)
      assert(u1(0).getAs[Long]("n_events") == 4)
    } finally q.stop()
  }

  test("streaming upsert merges micro-batches into the catalog (exactly-once per key)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    sources.Catalog.initMerged(spark,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), path)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStream.upsertStream(
      input.toDF().toDF("doc_id", "text"), path, ckpt)
    try {
      input.addData((2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      input.addData((3L, "c2"), (4L, "d"))
      q.processAllAvailable()
    } finally q.stop()
    val out = sources.Catalog.readMerged(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c2", 4L -> "d"))
  }

  test("streaming graph ingest keeps the standing tables current and replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Dedup, TextPipeline}
    // base corpus materialized once (the ingest-time build)
    val baseDir = java.nio.file.Files.createTempDirectory("graft_gstream").toString
    def doc(id: Long, t: String) = (id, t, "en", "s", t.length.toLong)
    val base = Seq(doc(1L, "alpha beta alpha beta spark group news"),
        doc(2L, "gamma delta gamma delta spark group report"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
    sources.Catalog.materializeGraph(spark, baseDir)
    sources.Catalog.materializeShingles(spark, baseDir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gsck").toString
    val input = MemoryStream[(Long, String, String, String, Long)]
    // fresh per-stream ledger: batch ids restart at 0 for every new
    // stream, so a stale ledger from an earlier suite run (the
    // warehouse persists across JVMs) would silently skip batch 0
    spark.sql("DROP TABLE IF EXISTS graft_ledger_sspec")
    val q = EventStream.graphIngestStream(
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"), ckpt,
      ledgerTable = "graft_ledger_sspec")
    val d3 = doc(3L, "epsilon zeta epsilon zeta spark group update")
    val d4 = doc(4L, "eta theta eta theta column column wire")
    try {
      input.addData(d3)
      q.processAllAvailable()
      input.addData(d4, d3) // d3 REPLAYED — must append nothing
      q.processAllAvailable()
    } finally q.stop()
    val allDocs = base.unionByName(Seq(d3, d4)
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val wantChunks = TextPipeline.chunksOf(allDocs)
    val gotChunks = spark.table("graft_chunks")
    assert(gotChunks.count() == wantChunks.count(),
      s"replay duplicated rows: ${gotChunks.count()} vs ${wantChunks.count()}")
    assert(gotChunks.except(wantChunks).isEmpty &&
      wantChunks.except(gotChunks).isEmpty, "streamed chunks diverged")
    assert(spark.table("graft_mentions")
      .except(TextPipeline.mentionsOf(allDocs)).isEmpty, "mentions diverged")
    assert(spark.table("graft_shingles")
      .except(Dedup.shinglesOf(allDocs)).isEmpty, "shingles diverged")
  }

  test("graph ingest replay heals a crash BETWEEN the three table appends") {
    import graft.operators.{Dedup, TextPipeline}
    // ADVICE r7: the old chunks-only screen lost a batch's mention/
    // shingle rows FOREVER if the job died after the chunks append —
    // the replay saw the doc_ids already in graft_chunks and skipped
    // everything. Reproduce that exact crash window, then replay.
    val baseDir = java.nio.file.Files.createTempDirectory("graft_crash").toString
    def doc(id: Long, t: String) = (id, t, "en", "s", t.length.toLong)
    val base = Seq(doc(1L, "alpha beta alpha beta spark group news"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
    sources.Catalog.materializeGraph(spark, baseDir)
    sources.Catalog.materializeShingles(spark, baseDir)
    spark.sql("DROP TABLE IF EXISTS graft_ledger_crash")
    val b = Seq(doc(7L, "epsilon zeta epsilon zeta spark group update"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // simulated crash: ONLY the chunks append of batch 42 landed
    sources.Catalog.mergeChunks(spark, b)
    assert(spark.table("graft_chunks").filter($"doc_id" === 7L).count() > 0)
    assert(spark.table("graft_mentions").filter($"doc_id" === 7L).count() == 0,
      "crash window precondition: mentions append never ran")
    // replay of batch 42 (ledger has no commit record for it)
    EventStream.ingestGraphBatch(spark, b, 42L, "graft_ledger_crash")
    val allDocs = base.unionByName(b)
    assert(spark.table("graft_chunks").except(TextPipeline.chunksOf(allDocs)).isEmpty &&
      TextPipeline.chunksOf(allDocs).except(spark.table("graft_chunks")).isEmpty,
      "replay must not duplicate the chunks that DID land")
    assert(spark.table("graft_mentions").except(TextPipeline.mentionsOf(allDocs)).isEmpty &&
      TextPipeline.mentionsOf(allDocs).except(spark.table("graft_mentions")).isEmpty,
      "replay must heal the missing mention rows")
    assert(spark.table("graft_shingles").except(Dedup.shinglesOf(allDocs)).isEmpty &&
      Dedup.shinglesOf(allDocs).except(spark.table("graft_shingles")).isEmpty,
      "replay must heal the missing shingle rows")
    // second replay of the SAME batch id: committed → full no-op
    val counts = Seq("graft_chunks", "graft_mentions", "graft_shingles")
      .map(t => spark.table(t).count())
    EventStream.ingestGraphBatch(spark, b, 42L, "graft_ledger_crash")
    assert(Seq("graft_chunks", "graft_mentions", "graft_shingles")
      .map(t => spark.table(t).count()) == counts,
      "a committed batch id must replay as a no-op")
  }

  test("streaming ANF ingest keeps register layers current, replay- and crash-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.Analytics
    val baseDir = java.nio.file.Files.createTempDirectory("graft_anfstream").toString
    def doc(id: Long, t: String) = (id, t, "en", "s", t.length.toLong)
    val base = Seq(doc(1L, "alpha beta alpha beta spark group news"),
        doc(2L, "gamma delta gamma delta spark group report"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
    sources.Catalog.materializeAnf(spark, baseDir)
    spark.sql("DROP TABLE IF EXISTS graft_anf_ledger_sspec")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anfck").toString
    val input = MemoryStream[(Long, String, String, String, Long)]
    val q = EventStream.anfIngestStream(
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"), ckpt,
      ledgerTable = "graft_anf_ledger_sspec")
    val d3 = doc(3L, "epsilon zeta epsilon zeta spark table update")
    val d4 = doc(4L, "eta theta eta theta table group wire")
    try {
      input.addData(d3)
      q.processAllAvailable()
      input.addData(d4, d3) // d3 REPLAYED across batches
      q.processAllAvailable()
    } finally q.stop()
    // the streamed layers must equal a cold rebuild over ALL docs
    val allDir = java.nio.file.Files.createTempDirectory("graft_anfall").toString
    base.unionByName(Seq(d3, d4)
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$allDir/documents.parquet")
    sources.Catalog.materializeAnf(spark, allDir,
      regsTable = "graft_anf_regs_srb", edgesTable = "graft_anf_edges_srb")
    (0 to Analytics.AnfHops).foreach { h =>
      val got = sources.Catalog.anfRegsAt(spark, h)
      val want = sources.Catalog.anfRegsAt(spark, h, "graft_anf_regs_srb")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"streamed hop-$h layer diverged from the rebuild")
    }
    // crash window: a batch's edges landed but NO layer did — replay
    // of the same (uncommitted) batch must heal every layer
    val d5 = doc(5L, "iota kappa iota kappa spark window brief")
    val b5 = Seq(d5).toDF("doc_id", "text", "lang", "source", "n_chars")
    Analytics.edgesOf(b5)
      .join(spark.table("graft_anf_edges"), Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(sources.Catalog.Buckets, "src").sortBy("src", "dst")
      .saveAsTable("graft_anf_edges") // the simulated dead run
    EventStream.ingestAnfBatch(spark, b5, 99L, "graft_anf_ledger_sspec")
    val all5Dir = java.nio.file.Files.createTempDirectory("graft_anfa5").toString
    base.unionByName(Seq(d3, d4, d5)
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$all5Dir/documents.parquet")
    sources.Catalog.materializeAnf(spark, all5Dir,
      regsTable = "graft_anf_regs_srb5", edgesTable = "graft_anf_edges_srb5")
    (0 to Analytics.AnfHops).foreach { h =>
      val got = sources.Catalog.anfRegsAt(spark, h)
      val want = sources.Catalog.anfRegsAt(spark, h, "graft_anf_regs_srb5")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"crash replay left hop-$h stale vs the rebuild")
    }
    // committed batch id replays as a full no-op
    val n = spark.table("graft_anf_regs").count()
    EventStream.ingestAnfBatch(spark, b5, 99L, "graft_anf_ledger_sspec")
    assert(spark.table("graft_anf_regs").count() == n,
      "a committed batch id must replay as a no-op")
  }

  test("streaming decontamination screen matches the batch gram join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static held-out side: the grams of two fixture docs
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six")).toDF("doc_id", "text")
    val evalGrams = graft.operators.Curation.gramsOfDocs(evalDocs)
      .select("gh").distinct()
    // training docs: d1 shares a 4-gram with 100, d2 with 101 (two),
    // d3 is clean, d4 is too short to produce any gram
    val d1 = (1L, "x alpha beta gamma delta y")
    val d2 = (2L, "one two three four five z")
    val d3 = (3L, "totally clean text with no overlap at all")
    val d4 = (4L, "too short")
    val input = MemoryStream[(Long, String)]
    val q = EventStream.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), evalGrams)
      .writeStream.outputMode("update").format("memory")
      .queryName("decontam_stream").start()
    try {
      input.addData(d1, d3)
      q.processAllAvailable()
      input.addData(d2, d4)
      q.processAllAvailable()
    } finally q.stop()
    // update-mode sink: last emitted row per doc is the final count
    val got = spark.table("decontam_stream")
      .groupBy("doc_id").agg(max("n_hit_grams").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch reference over the same rows
    val want = graft.operators.Curation
      .gramsOfDocs(Seq(d1, d2, d3, d4).toDF("doc_id", "text"))
      .join(evalGrams, "gh")
      .groupBy("doc_id").agg(count("*").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream $got vs batch $want")
    assert(got.contains(1L) && got.contains(2L) && !got.contains(3L) && !got.contains(4L))
  }

  test("streaming source mix snapshot reproduces the batch entropy exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "w w w", "en", "a"), (2L, "w", "en", "b"),
      (3L, "x x", "de", "c"), (4L, "x x x x", "de", "d"),
      (5L, "y", "en", "a"))
    val input = MemoryStream[(Long, String, String, String)]
    val q = EventStream.sourceMixStream(
        input.toDF().toDF("doc_id", "text", "lang", "source"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("mix_stream").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // re-materialize the sink view: entropyOfMix self-joins the mix
    // table, and a memory-sink View resolves to the SAME attribute ids
    // on both sides (Spark internal error); fresh attributes fix it
    val sink = spark.table("mix_stream")
    val snap = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(sink.collect(): _*)),
      sink.schema)
    val batchMix = rows.toDF("doc_id", "text", "lang", "source")
      .select(col("lang"), col("source"),
        org.apache.spark.sql.functions.size(split(col("text"), " "))
          .cast("long").as("n_tokens"))
      .groupBy("lang", "source").agg(sum("n_tokens").as("tk"))
    assert(snap.except(batchMix).count() == 0
      && batchMix.except(snap).count() == 0)
    // the shared arithmetic over the snapshot IS the batch query
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = graft.operators.Curation.qSourceEntropy(spark, dir)
      .orderBy("lang").collect().toSeq
    val got = graft.operators.Curation.entropyOfMix(snap)
      .orderBy("lang").collect().toSeq
    assert(got == want, s"stream-derived $got vs batch $want")
  }

  test("streaming bootstrap sums converge to the batch replicate means across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 40L).map(i =>
      (i, s"doc number $i with some text", 10L + (i * 7) % 97))
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStream.bootstrapStream(
        input.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("boot_stream").start()
    try {
      input.addData(rows.take(17): _*)
      q.processAllAvailable()
      input.addData(rows.drop(17): _*)
      q.processAllAvailable()
    } finally q.stop()
    // the ppm division runs on the 32-row snapshot, the same split as
    // the batch plan's final project
    val snap = spark.table("boot_stream")
      .selectExpr("r", "n_eff",
        "(wsum div greatest(n_eff, 1)) * 1000000 + ((wsum % greatest(n_eff, 1)) * 1000000) div greatest(n_eff, 1) AS mean_ppm")
      .orderBy("r").collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_boot").toString
    rows.toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = graft.operators.Training.qBootstrapCi(spark, dir).collect().toSeq
    assert(snap == want, s"stream-derived $snap vs batch $want")
  }

  test("streaming boilerplate screen matches the batch line-hash join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // standing corpus: one 8-word line repeated in >= LineDupDocs docs
    val boiler = "cookie banner accept all terms privacy policy notice"
    val corpus = Seq(
      (100L, s"$boiler unique tail words for document one hundred xx"),
      (101L, s"$boiler unique tail words for document one hundred yy"),
      (102L, s"$boiler unique tail words for document one hundred zz"))
      .toDF("doc_id", "text")
    val boilerHashes = graft.operators.Dedup.lineHashesOfDocs(corpus)
      .groupBy("h").agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= graft.operators.Dedup.LineDupDocs)
      .select("h")
    // incoming batch: d1 leads with the boiler line (aligned), d2 is clean
    val d1 = (1L, s"$boiler something new entirely follows here right now")
    val d2 = (2L, "completely fresh words that no standing document contains today")
    val input = MemoryStream[(Long, String)]
    val q = EventStream.boilerplateScreenStream(
        input.toDF().toDF("doc_id", "text"), boilerHashes)
      .writeStream.outputMode("update").format("memory")
      .queryName("boiler_stream").start()
    try {
      input.addData(d1, d2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("boiler_stream")
      .select("doc_id", "n_boiler_lines")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Dedup.lineHashesOfDocs(
        Seq(d1, d2).toDF("doc_id", "text"))
      .join(boilerHashes, "h")
      .groupBy("doc_id").agg(count("*").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream $got vs batch $want")
    assert(got == Map(1L -> 1L), "only d1 carries the standing boiler line")
  }

  test("streaming CDC screen flags shifted syndication against the standing chunk set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // standing corpus: the same long passage in two docs → its
    // content-defined chunks are the standing duplicated-chunk set
    val passage = ("alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon ") * 3
    val corpus = Seq(
      (100L, passage.trim + " ending one"),
      (101L, passage.trim + " ending two")).toDF("doc_id", "text")
    val standing = graft.operators.Dedup.cdcChunksOfDocs(corpus)
      .groupBy("chunk_hash").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("chunk_hash")
    // incoming: d1 syndicates the passage SHIFTED by a new prefix —
    // content-anchored boundaries must still match; d2 is clean
    val d1 = (1L, "breaking exclusive " + passage.trim)
    val d2 = (2L, "completely fresh words that no standing document contains today at all")
    val input = MemoryStream[(Long, String)]
    val q = EventStream.cdcScreenStream(
        input.toDF().toDF("doc_id", "text"), standing)
      .writeStream.outputMode("update").format("memory")
      .queryName("cdc_stream").start()
    try {
      input.addData(d1, d2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cdc_stream")
      .select("doc_id", "n_dup_chunks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.operators.Dedup.cdcChunksOfDocs(
        Seq(d1, d2).toDF("doc_id", "text"))
      .join(standing, "chunk_hash")
      .groupBy("doc_id").agg(count("*").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream $got vs batch $want")
    assert(got.contains(1L) && got(1L) >= 1L,
      "the shifted syndicated copy must share standing chunks")
    assert(!got.contains(2L), "the clean doc must not be flagged")
  }

  test("streaming near-dup screen matches the batch band join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // standing corpus: three documents, long enough to shingle
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten"),
      (102L, "red orange yellow green blue indigo violet white black gray"))
      .toDF("doc_id", "text")
    val corpusBands = graft.operators.Dedup.bandKeysOfDocs(corpus)
      .select(col("bkey"), col("doc_id").as("corpus_doc_id"))
    // incoming: d1 is an exact re-crawl of 100 (identical signature →
    // all bands collide), d2 shares nothing, d3 is too short to shingle
    val d1 = (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val d2 = (2L, "totally fresh words that no standing document contains at all")
    val d3 = (3L, "too short")
    val input = MemoryStream[(Long, String)]
    val q = EventStream.nearDupScreenStream(
        input.toDF().toDF("doc_id", "text"), corpusBands)
      .writeStream.outputMode("update").format("memory")
      .queryName("neardup_stream").start()
    try {
      input.addData(d1, d2)
      q.processAllAvailable()
      input.addData(d3)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_stream")
      .groupBy("doc_id", "corpus_doc_id").agg(max("n_shared_bands").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // batch reference over the same incoming rows
    val want = graft.operators.Dedup.bandKeysOfDocs(
        Seq(d1, d2, d3).toDF("doc_id", "text"))
      .join(corpusBands, "bkey")
      .groupBy("doc_id", "corpus_doc_id").agg(count("*").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"stream $got vs batch $want")
    assert(got == Map((1L, 100L) -> graft.operators.Dedup.LshBands.toLong),
      "the exact re-crawl must collide with its standing twin in every band")
  }

  test("stateful sessionizer agrees with batch session counts") {
    val evs = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .as[EventStream.Ev]
    val sessions = EventStream.sessionize(evs)
    val streamCounts = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val batchCounts = Events.qSessionize(spark, TestSpark.sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    assert(streamCounts.except(batchCounts).count() == 0)
    assert(batchCounts.except(streamCounts).count() == 0)
  }

  test("streaming session_window agg matches the batch twin") {
    val got = EventStream.runSessionWindowToMemory(spark, TestSpark.sf, "sw_out")
    val want = Events.qSessionWindow(spark, TestSpark.sf)
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0)
    assert(want.except(got).count() == 0)
  }

  test("streaming URL screen admits one fetch per canonical URL") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def at(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // docs 0/20/40 share source src0 and wire id 0 → one canonical
    // URL under three different raw dressings; doc 1 is distinct
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStream.urlScreenStream(
        input.toDF().toDF("doc_id", "source", "ts_t"))
      .writeStream.outputMode("append").format("memory")
      .queryName("url_screen").start()
    try {
      input.addData((0L, "src0", at(0)), (1L, "src1", at(1)))
      q.processAllAvailable()
      input.addData((20L, "src0", at(5)), (40L, "src0", at(9)))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table("url_screen")
      .select("doc_id", "canonical_url").collect()
    assert(admitted.length == 2, s"expected 2 admissions, got ${admitted.toSeq}")
    val ids = admitted.map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L), s"first fetch per canonical URL: $ids")
    // canonical form matches the batch operator's derivation
    val urls = admitted.map(_.getString(1)).toSet
    assert(urls == Set("https://src0.example.com/wire/0",
      "https://src1.example.com/wire/0"), urls.toSeq.toString)
  }

  test("stream-stream attribution join matches the batch interval join") {
    val got = EventStream.runAttributionToMemory(spark, TestSpark.sf, "attr_out")
      .select("purchase_id", "click_id")
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_t").as("click_t"),
        col("event_id").as("click_id"))
    val want = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_t").as("purchase_t"),
        col("event_id").as("purchase_id"))
      .join(clicks,
        col("c_user") === col("user_id") &&
          col("click_t") >= col("purchase_t") - expr("INTERVAL 30 MINUTES") &&
          col("click_t") <= col("purchase_t"))
      .select("purchase_id", "click_id")
    assert(got.count() > 0, "attribution join produced no pairs")
    assert(got.except(want).count() == 0)
    assert(want.except(got).count() == 0)
  }

  test("streaming KMV sketch converges to the batch estimate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, TestSpark.sf)
      .select("event_type", "user_id")
      .as[EventStream.TypedUser].collect()
    // split arbitrarily: state must merge across batch boundaries
    val (b1, b2) = rows.splitAt(rows.length / 3)
    val input = MemoryStream[EventStream.TypedUser]
    val q = EventStream.kmvDistinctStream(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_out").start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // converged sketch per type: n_kept only grows and h_k only
    // shrinks across updates, so the struct-max picks the final state
    // without relying on row order in the memory sink
    val got = spark.table("kmv_out")
      .groupBy("event_type")
      .agg(max(struct(col("n_kept"), (-col("h_k")).as("neg_h"),
        col("est_users"), col("h_k"))).as("s"))
      .select(col("event_type"), col("s.n_kept"), col("s.h_k"),
        col("s.est_users"))
    val want = graft.operators.Sketches.qKmvDistinct(spark, TestSpark.sf)
      .select("event_type", "n_kept", "h_k", "est_users")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "streaming sketch state diverged from the batch KMV")
  }

  test("streaming MG sketch is exact across micro-batches when k covers the vocabulary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val words = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .collect().map(_.getString(0))
    val nDistinct = words.distinct.length
    val input = MemoryStream[String]
    // complete mode: the memory sink holds exactly the CURRENT state
    // after each trigger, so the final read IS the converged sketch
    val q = EventStream.heavyHittersStream(
        input.toDF().select(lit("all").as("grp"), col("value").as("word")),
        k = nDistinct + 8)
      .writeStream.outputMode("complete").format("memory")
      .queryName("mg_out").start()
    val (b1, b2) = words.splitAt(words.length / 2)
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // with k >= distinct the MG sketch never evicts, so counts are
    // EXACT whatever the batching
    val est = spark.table("mg_out")
      .select(explode(col("sketch")).as(Seq("word", "est")))
    val exact = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("est"))
    assert(est.except(exact).count() == 0 && exact.except(est).count() == 0,
      "streaming MG state diverged from exact counts at k >= |vocab|")
  }

  test("streaming MG sketch below capacity keeps the heavy hitter, never overestimates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 40% of the stream is 'hot'; k=4 counters, fed in 3 batches
    val stream = (1 to 200).flatMap(i =>
      Seq("hot") ++ (if (i % 5 == 0) Seq(s"cold$i", s"cold${i}b") else Seq(s"rare$i")))
    val input = MemoryStream[String]
    val q = EventStream.heavyHittersStream(
        input.toDF().select(lit("all").as("grp"), col("value").as("word")), k = 4)
      .writeStream.outputMode("complete").format("memory")
      .queryName("mg_small").start()
    try {
      stream.grouped(150).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val sk = spark.table("mg_small").head().getAs[Map[String, Long]]("sketch")
    val trueHot = stream.count(_ == "hot").toLong
    assert(sk.contains("hot"),
      s"freq > n/(k+1) key must survive the MG sketch: $sk")
    assert(sk("hot") <= trueHot, "MG must never overestimate")
    assert(sk("hot") >= trueHot - stream.size / 5,
      s"MG undercount beyond the n/(k+1) bound: ${sk("hot")} vs $trueHot")
  }

  test("streaming transitions converge to the batch matrix across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[EventStream.UserEv].collect()
      .sortBy(e => (e.ts_us, e.event_id))
    // time-ordered split: per-user order holds across the boundary,
    // so the one-row-per-user state must stitch the cross-batch pair
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[EventStream.UserEv]
    val q = EventStream.transitionsStream(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("tx_out").start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tx_out")
      .groupBy("src_type", "dst_type")
      .agg(count(lit(1)).as("n_trans"))
    val want = graft.operators.Events.qEventTransitions(spark, TestSpark.sf)
      .select("src_type", "dst_type", "n_trans")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "streaming transition counts diverged from the batch matrix")
  }

  test("streaming session paths equal the batch trigram counts across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[EventStream.UserEv].collect()
      .sortBy(e => (e.ts_us, e.event_id))
    // time-ordered split: the ≤2-event session tail in state must
    // stitch trigrams that straddle the batch boundary, and a session
    // gap at the boundary must clear it
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[EventStream.UserEv]
    val q = EventStream.sessionPathsStream(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("paths_out").start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("paths_out")
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_paths"))
    val want = graft.operators.Events.sessionPathCounts(spark, TestSpark.sf)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "streaming path counts diverged from the batch trigram counts")
  }

  test("streaming ANN probe matches qKnnJoinIvf across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val S = graft.operators.Similarity
    // the standing serving state: cell index over the corpus half
    // (vec_id >= 5, qKnnJoinIvf's split) + the one-row centroid array
    val index = S.ivfServingIndex(spark, TestSpark.sf)
      .filter(col("vec_id") >= 5).localCheckpoint(false)
    val centArr = S.ivfCentroidArray(spark, TestSpark.sf).localCheckpoint(false)
    // arriving queries: the same 5 probe vectors, split mid-stream
    val qRows = S.vectors(spark, TestSpark.sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    val input = MemoryStream[(Long, Seq[Double], Double)]
    val q = EventStream.annProbeStream(
        input.toDF().toDF("query_id", "qv", "qnrm"), centArr, index)
      .writeStream.outputMode("complete").format("memory")
      .queryName("ann_stream").start()
    try {
      input.addData(qRows.take(2).toSeq: _*); q.processAllAvailable()
      input.addData(qRows.drop(2).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ann_stream")
      .select(col("query_id"), posexplode(col("topk")).as(Seq("i", "t")))
      .select(col("query_id"), col("t._2").as("vec_id"),
        col("t._1").as("score_micro"), (col("i") + 1).as("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
      .toSet
    val want = S.qKnnJoinIvf(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Math.round(r.getDouble(2) * 1e6), r.getInt(3).toLong))
      .toSet
    assert(got == want, {
      val miss = want -- got; val extra = got -- want
      s"stream vs batch diverged: missing=${miss.take(5)} extra=${extra.take(5)}"
    })
  }

  test("annProbeRejects makes screened-out queries observable with reasons") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = graft.operators.Similarity.Dim
    val good = (1L, Seq.fill(dim)(1.0), math.sqrt(dim))
    val wrongDim = (2L, Seq.fill(dim - 3)(1.0), 1.0)
    val zeroNorm = (3L, Seq.fill(dim)(0.0), 0.0)
    val input = MemoryStream[(Long, Seq[Double], Double)]
    val q = EventStream.annProbeRejects(
        input.toDF().toDF("query_id", "qv", "qnrm"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ann_rejects").start()
    try {
      input.addData(good, wrongDim, zeroNorm); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ann_rejects").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "wrong_dim", 3L -> "zero_or_nan_norm"),
      s"reject stream diverged: $got")
    // null vectors / null norms (batch frame — MemoryStream tuples
    // can't carry nulls) get their OWN reasons: a null norm labeled
    // zero_or_nan_norm sends triage hunting for zero vectors instead
    // of the missing-norm producer
    val batch = Seq((4L, null: Seq[Double], java.lang.Double.valueOf(1.0)),
        (5L, Seq.fill(dim)(1.0), null: java.lang.Double))
      .toDF("query_id", "qv", "qnrm")
    val b = EventStream.annProbeRejects(batch).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == Map(4L -> "null_vector", 5L -> "null_norm"))
  }

  test("JVM kmvHash matches the Catalyst md5 hash expression bit-for-bit") {
    val ids = Seq(0L, 1L, 7L, 123456789L, -5L, Long.MaxValue)
    val fromSql = ids.toDF("user_id")
      .select(conv(substring(md5(concat(lit("kmv#"), col("user_id"))), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0))
    val fromJvm = ids.map(EventStream.kmvHash)
    assert(fromSql.toSeq == fromJvm)
  }
}
