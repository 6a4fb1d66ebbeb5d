package graft.streaming

import graft.Ckpt.BarrierOps
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-streaming twins of the batch event operators
  * (graft.operators.Events): the same aggregations declared over
  * `readStream`, with watermarks bounding state, plus a
  * flatMapGroupsWithState sessionizer for custom state logic.
  *
  * Scale: state is keyed by (window, event_type) / user_id — both
  * naturally partitioned; the 30-min watermark bounds state size to
  * the active-session working set regardless of total stream volume.
  */
object EventStream {

  /** Streaming parquet needs an explicit schema; the events file's ts
    * encoding has drifted between driver rounds (TIMESTAMP(NANOS)-as-
    * long vs native timestamp[us]), so the schema is taken from a
    * driver-side batch-metadata peek of the actual files (footer read
    * only, no data scan) and `ts` is then normalized to the epoch-nanos
    * BIGINT contract by the same adapter the batch readers use
    * (graft.Tables.normalizeTs).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    val raw = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeTs(raw)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming twin of Events.qEventsWindow: tumbling 1-hour windows
    * per event type, 2-hour watermark.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(start_us: Long, last_us: Long, n: Long, sum_value: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long, sum_value: Double)

  /** Batch-scoped sessionizer (test/demo path): state is DROPPED at
    * the end of every invocation — the trailing open session is
    * flushed and `state.remove()`d, so results are correct ONLY when
    * the whole input arrives in one batch (as in the batch-parity
    * spec). A session spanning two micro-batches would be emitted as
    * two rows. The production path is [[sessionizeStreaming]], which
    * keeps open sessions in state across batches and closes them via
    * event-time timeout.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = graft.operators.Events.SessionGapUs
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // Sort this batch's events; fold into open sessions, emitting
          // closed ones. (Batch-at-once semantics for the memory-sink
          // test path — state is intentionally never read or written;
          // a production job relies on watermark timeouts.)
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.value))
          var open: Option[SessionState] = None
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_us - s.last_us <= gapUs =>
                open = Some(s.copy(last_us = e.ts_us, n = s.n + 1,
                  sum_value = s.sum_value + e.value))
              case Some(s) =>
                out += SessionOut(user, s.start_us, s.last_us, s.n, s.sum_value)
                open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              case None =>
                open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
            }
          }
          // Emit the trailing open session too (end-of-stream flush for
          // the test path).
          open.foreach(s => out += SessionOut(user, s.start_us, s.last_us, s.n, s.sum_value))
          out.result().iterator
      }
  }

  case class EvT(user_id: Long, ts_us: Long, value: Double, ts_t: java.sql.Timestamp)

  /** Production sessionizer: open sessions LIVE IN STATE across
    * micro-batches. A session is emitted exactly once — either when a
    * later event of the same user opens a new session (gap logic), or
    * when the event-time watermark passes last_event + gap and the
    * EventTimeTimeout fires. Input: a streaming DataFrame with
    * (user_id, ts_us µs, value); watermarking happens here.
    */
  def sessionizeStreaming(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = graft.operators.Events.SessionGapUs
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", s"${gapUs / 60000000L} minutes")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[EvT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // inactivity close: watermark passed last_us + gap
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start_us, s.last_us, s.n, s.sum_value))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.value))
            val out = Seq.newBuilder[SessionOut]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.last_us <= gapUs =>
                  // max/min, not assignment: a LATE-but-within-watermark
                  // event (the case the 30-min watermark exists to
                  // admit) must never regress the session end — a
                  // regressed last_us mis-splits on the next event and
                  // fires the inactivity timeout early
                  open = Some(s.copy(
                    start_us = math.min(s.start_us, e.ts_us),
                    last_us = math.max(s.last_us, e.ts_us),
                    n = s.n + 1,
                    sum_value = s.sum_value + e.value))
                case Some(s) =>
                  out += SessionOut(user, s.start_us, s.last_us, s.n, s.sum_value)
                  open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
                case None =>
                  open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_us / 1000L + gapUs / 1000L)
            }
            out.result().iterator
          }
      }
  }

  case class SpendTotal(user_id: Long, total: Double, n: Long)

  /** Stateful running leaderboard: per-user purchase totals maintained
    * in `mapGroupsWithState` (Update-mode state shape; the batch twin
    * is Events.qTopUsers' aggregation).
    */
  def runningTotals(events: Dataset[Ev]): Dataset[SpendTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SpendTotal, SpendTotal](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SpendTotal]) =>
          val prev = state.getOption.getOrElse(SpendTotal(user, 0.0, 0L))
          val next = evs.foldLeft(prev)((acc, e) =>
            acc.copy(total = acc.total + e.value, n = acc.n + 1))
          state.update(next)
          next
      }
  }

  case class TypedUser(event_type: String, user_id: Long)
  case class KmvSketch(mins: Array[Long])
  case class KmvEstimate(event_type: String, n_kept: Long, h_k: Long,
    est_users: Long)

  /** The batch KMV op's 60-bit hash (first 15 hex digits of
    * md5("kmv#"+user_id)), computed JVM-side so streaming state and
    * the Catalyst expression walk identical values — the batch/stream
    * parity contract every other twin in this module keeps.
    */
  def kmvHash(userId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kmv#$userId".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Streaming KMV cardinality sketch — live distinct-user monitoring
    * per event type (Sketches.qKmvDistinct's twin at ingest time):
    * the k smallest hashes live in `mapGroupsWithState` state (fixed
    * ≤ k longs per type — bounded however many users flow through),
    * each micro-batch folds its hashes in and emits the updated
    * estimate. KMV state is a semilattice (union-then-take-k), so
    * arrival order and batch boundaries can't change the converged
    * sketch — which is exactly what the parity spec asserts.
    */
  def kmvDistinctStream(events: Dataset[TypedUser]): Dataset[KmvEstimate] = {
    import events.sparkSession.implicits._
    val k = graft.operators.Sketches.KmvK
    val hmax = graft.operators.Sketches.KmvHashMax
    events.groupByKey(_.event_type)
      .mapGroupsWithState[KmvSketch, KmvEstimate](GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[TypedUser], state: GroupState[KmvSketch]) =>
          val prev = state.getOption.map(_.mins).getOrElse(Array.empty[Long])
          val merged = (prev ++ rows.map(r => kmvHash(r.user_id)))
            .distinct.sorted.take(k)
          state.update(KmvSketch(merged))
          val est =
            if (merged.length < k) merged.length.toLong
            else math.round((k - 1).toDouble * (hmax.toDouble / merged.last.toDouble))
          KmvEstimate(typ, merged.length.toLong,
            if (merged.isEmpty) 0L else merged.last, est)
      }
  }

  case class UserEv(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String)
  case class LastEv(ts_us: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, src_type: String, dst_type: String)

  /** Streaming twin of Events.qEventTransitions' pair stage: per-user
    * consecutive (src→dst) event-type pairs emitted at ingest. State
    * is ONE row per user — the latest event seen — so state size is
    * the active-user working set, independent of stream volume. Each
    * micro-batch sorts its per-user slice by (ts_us, event_id) — the
    * batch op's window order — emits the boundary pair against the
    * stored last event plus the intra-batch pairs, and retains the
    * new latest. With a time-ordered feed (batch boundaries anywhere)
    * the emitted pair counts converge to the batch transition matrix,
    * which is exactly what the parity spec asserts.
    */
  def transitionsStream(events: Dataset[UserEv]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[UserEv], state: GroupState[LastEv]) =>
          val sorted = evs.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val withPrev = state.getOption
              .map(l => UserEv(user, l.ts_us, l.event_id, l.event_type))
              .toIndexedSeq ++ sorted
            val last = sorted.last
            state.update(LastEv(last.ts_us, last.event_id, last.event_type))
            withPrev.sliding(2).collect {
              case Seq(a, b) => Transition(user, a.event_type, b.event_type)
            }
          }
      }
  }

  case class PathEv(ts_us: Long, event_id: Long, event_type: String)
  case class PathState(evs: Seq[PathEv])
  case class PathOut(user_id: Long, e1: String, e2: String, e3: String)

  /** Streaming twin of Events.sessionPathCounts' trigram stage:
    * per-user state is the last ≤2 events of the OPEN session (a gap
    * over SessionGapUs clears it — the sessionize boundary), so each
    * arriving event emits at most one length-3 path. State size is
    * bounded at two small rows per active user, independent of both
    * stream volume and session length; with a time-ordered feed the
    * emitted path multiset equals the batch trigram counts exactly,
    * which the parity spec asserts across a mid-corpus split.
    */
  def sessionPathsStream(events: Dataset[UserEv]): Dataset[PathOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, PathOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[UserEv], state: GroupState[PathState]) =>
          val sorted = evs.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            var buf = state.getOption.map(_.evs.toVector).getOrElse(Vector.empty)
            val out = Vector.newBuilder[PathOut]
            for (e <- sorted) {
              if (buf.nonEmpty
                  && e.ts_us - buf.last.ts_us > graft.operators.Events.SessionGapUs)
                buf = Vector.empty
              if (buf.size == 2)
                out += PathOut(user, buf(0).event_type, buf(1).event_type, e.event_type)
              buf = (buf :+ PathEv(e.ts_us, e.event_id, e.event_type)).takeRight(2)
            }
            state.update(PathState(buf))
            out.result().iterator
          }
      }
  }

  /** Streaming heavy hitters — the Misra–Gries typed Aggregator
    * (functions.FreqItemsAgg, Sketches.freqItems' batch engine) run AS
    * a streaming stateful aggregate: state is the ≤ k-counter sketch
    * per group, each micro-batch merges in through the SAME
    * Aggregator merge the batch path uses — one sketch implementation,
    * two execution modes (the mergeable-summaries property is exactly
    * what makes a sketch streamable). Update mode emits the current
    * sketch per group per batch; with k ≥ distinct keys the sketch is
    * exact regardless of arrival order, and below that the
    * Misra–Gries guarantees hold (never overestimates, any key with
    * freq > n/(k+1) survives) — both spec-pinned.
    */
  def heavyHittersStream(words: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new graft.functions.FreqItemsAgg(k))
    words.groupBy("grp").agg(agg(col("word")).as("sketch"))
  }

  /** Streaming exact dedup twin: drop duplicate event_ids within the
    * watermark horizon (the streaming analogue of Dedup.qDedupExact's
    * grouping — bounded state via the event-time watermark).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming crawl-frontier URL screen — qDedupUrl's twin at ingest
    * time: canonicalize each arriving raw URL (stateless narrow
    * projection, same expression as batch) and admit only the FIRST
    * fetch of each canonical URL inside the watermark horizon. State
    * is one row per canonical URL and expires with the watermark —
    * the frontier's working set, never the full crawl history.
    */
  def urlScreenStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("canonical_url", graft.operators.Dedup.canonicalUrl(
        graft.operators.Dedup.rawUrl(col("doc_id"), col("source"))))
      .withWatermark("ts_t", "2 hours")
      .dropDuplicatesWithinWatermark("canonical_url")

  /** Run the dedup stream into a memory sink (synchronous; test/demo). */
  def runDedupToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = dedupStream(readEventStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** End-to-end streaming job: parquet source → windowed agg →
    * parquet sink with checkpointing (the production shape: restart
    * picks up from the checkpoint). Synchronous for the test path.
    */
  def runWindowedToParquet(spark: SparkSession, dir: String,
      outPath: String, checkpoint: String): Unit = {
    val q = windowedAgg(readEventStream(spark, dir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming ingest → MERGE upsert: every micro-batch lands in the
    * Catalog.initMerged layout through foreachBatch + mergeDocuments —
    * the standard idempotent-sink pattern for continuous re-crawl (the
    * reference's MERGE loop, graph.py:44-131, as a stream). Because
    * the sink is a key-compacting MERGE, a replayed batch after
    * failure re-applies to the same end state: exactly-once per key
    * without a transactional sink. Batches are key-deduped (arbitrary
    * row per key within one batch — upstream should emit one version
    * per key per batch, as with MERGE on a unique uid).
    */
  def upsertStream(stream: DataFrame, basePath: String, checkpoint: String,
      keyCol: String = "doc_id"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.Catalog.mergeDocuments(
          batch.sparkSession, basePath, batch.dropDuplicates(keyCol), keyCol)
      }
      .start()

  /** Streaming ingest → standing graph/shingle tables: every
    * micro-batch of documents appends its chunk/mention/shingle rows
    * through Catalog.mergeChunks/mergeMentions/mergeShingles — the
    * continuous-ingest twin of the materialize-once path, so the
    * amortized query family stays current as documents arrive instead
    * of waiting for a rebuild. Replay-safety is per
    * [[ingestGraphBatch]]; batch ids are scoped to ONE stream, so a
    * deployment running several ingest streams must give each its own
    * ledgerTable (batch 7 of stream A is not batch 7 of stream B).
    */
  def graphIngestStream(docs: DataFrame, checkpoint: String,
      ledgerTable: String = "graft_ingest_ledger"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestGraphBatch(batch.sparkSession, batch.toDF(), batchId, ledgerTable)
      }
      .start()

  /** One graph-ingest micro-batch, replay-safe against foreachBatch's
    * at-least-once delivery AND a crash BETWEEN the three table
    * appends (they are not atomic — ADVICE r7):
    *
    *  - Each standing table is screened against ITS OWN doc_id set,
    *    not a single table's: a run that crashed after the chunks
    *    append but before mentions/shingles re-derives exactly the
    *    missing tables' rows on replay (the former chunks-only screen
    *    filtered the replayed docs out entirely and silently lost
    *    their mention/shingle rows forever).
    *  - A committed-batch LEDGER (one batch_id row appended strictly
    *    AFTER all three appends succeed) short-circuits replays of
    *    fully-committed batches — without it, a doc that legitimately
    *    produces zero rows for some table would be re-derived on
    *    every restart (correct but wasted work; the ledger bounds it
    *    to one replay window).
    *
    * Idempotency argument: appends only ever add rows for doc_ids a
    * table does not yet contain, so any interleaving of crashes and
    * replays converges to exactly-one-copy per (table, doc_id); the
    * ledger append is the commit point and is itself idempotent
    * (duplicate batch_id rows are harmless — the screen is EXISTS).
    */
  private[graft] def ingestGraphBatch(s: SparkSession, batch0: DataFrame,
      batchId: Long, ledgerTable: String = "graft_ingest_ledger"): Unit = {
    if (s.catalog.tableExists(ledgerTable) &&
        !s.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty)
      return // fully committed — replay is a no-op
    val batch = batch0.dropDuplicates("doc_id")
      .barrier(false) // read by up to three screens + merges
    def freshFor(table: String): DataFrame = {
      // heal BEFORE the existence check: a compaction swap that died
      // mid-rename leaves the live name absent — an unhealed screen
      // would return the batch unscreened and the merge (which heals
      // internally) would then append duplicates forever
      graft.sources.Catalog.healSwap(s, table)
      val screened =
        if (s.catalog.tableExists(table))
          batch.join(s.table(table).select("doc_id").distinct(),
            Seq("doc_id"), "left_anti")
        else batch
      // eager: the isEmpty probe and the merge's write would otherwise
      // run the standing-table-sized screen join twice per micro-batch
      screened.barrier()
    }
    val c = freshFor("graft_chunks")
    if (!c.isEmpty) graft.sources.Catalog.mergeChunks(s, c)
    val m = freshFor("graft_mentions")
    if (!m.isEmpty) graft.sources.Catalog.mergeMentions(s, m)
    val g = freshFor("graft_shingles")
    if (!g.isEmpty) graft.sources.Catalog.mergeShingles(s, g)
    // commit point: all three tables own the batch now. If the ledger
    // is absent from the CATALOG, clear any stale warehouse dir first
    // (a leftover location from a dead catalog fails the create with
    // LOCATION_ALREADY_EXISTS — the catalog is the source of truth).
    import s.implicits._
    if (!s.catalog.tableExists(ledgerTable))
      graft.sources.Catalog.dropManaged(s, ledgerTable)
    Seq(batchId).toDF("batch_id")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(ledgerTable)
  }

  /** Streaming ingest → standing ANF registers: every micro-batch of
    * documents folds its co-occurrence edges into the per-hop
    * register layers through Catalog.mergeAnfDocs — the continuous
    * twin of materializeAnf, so effective-diameter / reach-curve
    * serving (Catalog.anfEstimates) stays current as documents arrive
    * instead of waiting for a register rebuild. Replay-safety is
    * structural: the merge's cone walk is a pure function of
    * (standing tables, batch edges) and appends only
    * dominated-screened improvements, so an at-least-once redelivery
    * or a crash between the edge append and any layer append heals on
    * replay; the ledger exists only to make committed-batch replays
    * free instead of a wasted cone walk. Batch ids are scoped to ONE
    * stream (same contract as graphIngestStream).
    */
  def anfIngestStream(docs: DataFrame, checkpoint: String,
      ledgerTable: String = "graft_anf_ledger"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestAnfBatch(batch.sparkSession, batch.toDF(), batchId, ledgerTable)
      }
      .start()

  /** One ANF-ingest micro-batch: ledger short-circuit, then the
    * idempotent register merge, then the commit record (appended
    * strictly after the merge completed — the same commit-point
    * discipline as ingestGraphBatch).
    */
  private[graft] def ingestAnfBatch(s: SparkSession, batch: DataFrame,
      batchId: Long, ledgerTable: String = "graft_anf_ledger"): Unit = {
    if (s.catalog.tableExists(ledgerTable) &&
        !s.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty)
      return // fully committed — replay is a no-op
    graft.sources.Catalog.mergeAnfDocs(s, batch.dropDuplicates("doc_id"))
    import s.implicits._
    if (!s.catalog.tableExists(ledgerTable))
      graft.sources.Catalog.dropManaged(s, ledgerTable)
    Seq(batchId).toDF("batch_id")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(ledgerTable)
  }

  /** Ingest-time state bound shared by the per-key screen aggregates:
    * one document's (or query's) contributing rows all live in its
    * own arrival micro-batch (current_timestamp is batch-constant in
    * micro-batch mode), so the aggregate needs no unbounded
    * cross-batch state — keying by an ingest-time window under a
    * processing-time watermark lets the state store EVICT each key
    * once the watermark passes its window. A continuous crawl's
    * screen state stays window-sized instead of stream-lifetime-
    * sized (it USED to grow one row per key forever); the window
    * column is dropped after each agg because screen keys arrive
    * once.
    *
    * OUTPUT CONTRACT (public, every `ingestStamped` screen): rows are
    * per-(ingest-window, key) PARTIALS. A key whose contributing rows
    * arrive in windows more than [[IngestWindow]] apart emits one row
    * per window, not one cumulative row — the price of bounded state.
    * All screen counters are additive (counts and sums), so a
    * consumer that needs cumulative per-key totals re-aggregates by
    * key (`groupBy(key).agg(sum(…))`); a consumer treating each row
    * as a standalone observation (the screening/alerting shape these
    * exist for) uses them as-is. Keys that arrive within one window —
    * the overwhelmingly common crawl shape, where a doc's rows all
    * ride its own micro-batch — emit exactly one row.
    */
  private val IngestWindow = "10 minutes"
  private def ingestStamped(df: DataFrame): DataFrame =
    df.withColumn("ingest_t", current_timestamp())
      .withWatermark("ingest_t", IngestWindow)

  /** Streaming ANN retrieval twin — qKnnJoinIvf at serve time: each
    * ARRIVING query vector picks its IvfProbes nearest cells from the
    * broadcast one-row centroid array (a stateless per-row HOF sort —
    * the in-RAM centroid table every query server holds, so there is
    * no aggregate and no stream state before the cell join), probes
    * the STANDING cell index by stream-static equi-join on cid
    * (mirroring the dedup screens' standing band/hash indexes), and
    * keeps its top-k by cosine through ONE bounded update-mode
    * aggregate (TopKByScoreAgg: state = k pairs per query, mergeable,
    * so micro-batch boundaries cannot change the converged result).
    * Scores ride the same integer micro-grid as the batch plan —
    * StreamingSpec splits the query stream mid-batch and matches
    * qKnnJoinIvf exactly.
    */
  /** The usable-query screen annProbeStream applies, factored so the
    * serving stream and its reject side output can never drift: a
    * null/wrong-dim/zero-norm query would null-poison the probe pick
    * and silently emit garbage top-k.
    */
  private def annQueryUsable: Column =
    col("qv").isNotNull &&
      size(col("qv")) === graft.operators.Similarity.Dim &&
      col("qnrm") > 0 && !isnan(col("qnrm"))

  /** The observable reject side of annProbeStream (round 9): a
    * malformed query produces NO serving row, which is
    * indistinguishable from a query with zero candidates — so
    * rejects get their own output stream with a reason column,
    * mirroring writeTextDocs' observable-malformed-skip principle.
    * Stateless narrow filter: run it against the same query stream
    * (or its batch frame) alongside the serving stream.
    */
  def annProbeRejects(queries: DataFrame): DataFrame =
    queries.filter(!coalesce(annQueryUsable, lit(false)))
      .select(col("query_id"),
        when(col("qv").isNull, lit("null_vector"))
          .when(size(col("qv")) =!= graft.operators.Similarity.Dim,
            lit("wrong_dim"))
          .when(col("qnrm").isNull, lit("null_norm"))
          .otherwise(lit("zero_or_nan_norm")).as("reason"))

  def annProbeStream(queries: DataFrame, centArray: DataFrame,
      index: DataFrame,
      k: Int = graft.operators.Similarity.KnnK): DataFrame = {
    import graft.operators.Similarity.IvfProbes
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    // the prepVectors screen the batch path gets for free (its queries
    // come from vectors()); rejected rows are OBSERVABLE through
    // annProbeRejects, never silently absent
    val screened = queries.filter(annQueryUsable)
    val probed = screened.withColumn("one", lit(1))
      .join(broadcast(centArray.withColumn("one", lit(1))), "one")
      // per-row probe pick: sort (−qcos, cid) structs ascending =
      // cosine desc with cid tie-break — the batch probe pick's exact
      // ordering (dot's HOF fold is spec'd bit-equal to the native)
      .withColumn("probes", slice(transform(array_sort(transform(col("cents"),
          c => struct((-(dot(col("qv"), c.getField("cv"))
              / (col("qnrm") * c.getField("cnrm")))).as("negq"),
            c.getField("cid").as("cid")))),
          s => s.getField("cid")), 1, IvfProbes))
      .select(col("query_id"), col("qv"), col("qnrm"),
        explode(col("probes")).as("cid"))
    val scored = probed.join(index, "cid")
      .withColumn("score_micro",
        round(round(dot(col("qv"), col("v")) / (col("nrm") * col("qnrm")), 6) * 1e6)
          .cast("long"))
    val topk = udaf(new graft.functions.TopKByScoreAgg(k))
    ingestStamped(scored)
      .groupBy(window(col("ingest_t"), IngestWindow), col("query_id"))
      .agg(topk(col("score_micro"), col("vec_id")).as("topk"))
      .select("query_id", "topk")
  }

  /** Streaming decontamination screen: documents are checked against
    * the STATIC held-out gram set as they arrive — the continuous-
    * ingest twin of Curation.qDecontaminate. Per-row 4-gram hashing is
    * a stateless narrow pass; the membership check is a stream-static
    * broadcast join (stateless — no stream state grows with the eval
    * set); the per-doc hit counter is the only streaming state,
    * ingest-windowed so it evicts instead of accumulating one row per
    * screened doc forever. At scale the static side is the same
    * benchmark-sized broadcast the batch plan uses.
    */
  def decontaminateStream(docs: DataFrame, evalGrams: DataFrame): DataFrame =
    ingestStamped(graft.operators.Curation.gramsOfDocs(docs))
      .join(broadcast(evalGrams), "gh")
      .groupBy(window(col("ingest_t"), IngestWindow), col("doc_id"))
      .agg(count(lit(1)).as("n_hit_grams"))
      .select("doc_id", "n_hit_grams")

  /** Streaming near-dup screen — qDedupMinhash's twin at ingest time:
    * each arriving document is shingled, MinHash-signed, and LSH-
    * banded with the SAME native expressions as batch (a stateless
    * narrow per-row pass — no stream state grows with the corpus),
    * then probed against the STANDING corpus band index by equi-join
    * on the 16-byte band key (stream-static; Spark broadcasts the
    * static side when it fits, shuffles it when the standing index is
    * itself large — either way no stream state scales with it). A hit
    * is the LSH candidate condition — the new document collides with
    * a standing document in ≥1 band; output is the candidate-pair
    * stream (doc_id, corpus_doc_id, n_shared_bands), which a crawl
    * screen drops outright or routes to the batch verification join.
    * The per-pair counter is the only streaming state,
    * ingest-windowed so it evicts instead of accumulating one row
    * per candidate pair forever.
    */
  def nearDupScreenStream(docs: DataFrame, corpusBands: DataFrame): DataFrame =
    ingestStamped(graft.operators.Dedup.bandKeysOfDocs(docs))
      .join(corpusBands, "bkey")
      .groupBy(window(col("ingest_t"), IngestWindow),
        col("doc_id"), col("corpus_doc_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .select("doc_id", "corpus_doc_id", "n_shared_bands")

  /** Streaming source-mix monitor — q_source_entropy's ingest twin:
    * running token mass per (lang, source) as documents arrive. ONE
    * stateful aggregate whose state is mix-table-sized (#langs ×
    * #sources — dashboard-sized at any corpus scale, the state never
    * grows with documents); the entropy/diversity arithmetic runs
    * downstream on the snapshot via Curation.entropyOfMix (a second
    * chained streaming aggregate is a multi-agg plan Structured
    * Streaming rejects, and the mix table is tiny anyway — the same
    * split the batch query uses).
    */
  def sourceMixStream(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("lang", "source")
      .agg(sum("n_tokens").as("tk"))

  /** Streaming Poisson-bootstrap sums — live corpus-metric error bars
    * at ingest (q_bootstrapCi's twin). Each arriving doc fans out to
    * BootstrapReps rows through a broadcast stream-static join on a
    * constant key (the static side is the 32-row replicate table, so
    * the fan-out is narrow), gets the SAME deterministic per-(doc,
    * replicate) Poisson(1) weight as the batch operator
    * (Training.poissonU/poissonW — one implementation, two execution
    * modes), and lands in ONE stateful aggregate whose state is
    * exactly BootstrapReps rows regardless of volume. Replicate sums
    * are plain additive, so micro-batch boundaries and arrival order
    * cannot change the converged (n_eff, wsum) — the parity spec
    * splits the corpus mid-stream and matches the batch operator's
    * replicate means exactly. The ppm division runs downstream on the
    * 32-row snapshot (same split as the batch plan's final project).
    */
  def bootstrapStream(docs: DataFrame): DataFrame = {
    val reps = broadcast(docs.sparkSession.range(
        graft.operators.Training.BootstrapReps)
      .select(col("id").as("r"), lit(1).as("one")))
    docs.select(col("doc_id"), col("n_chars"), lit(1).as("one"))
      .join(reps, "one")
      .withColumn("w", graft.operators.Training.poissonW(
        graft.operators.Training.poissonU(col("doc_id"), col("r"))))
      .groupBy("r")
      .agg(sum("w").as("n_eff"),
        sum(col("w") * col("n_chars")).as("wsum"))
  }

  /** Streaming boilerplate screen: incoming documents are checked
    * against the STANDING boilerplate line-hash set as they arrive —
    * the continuous-ingest twin of Dedup.qDedupLines (new crawl
    * batches get their nav-bar/cookie-banner mass flagged against
    * yesterday's corpus statistics without rescanning the corpus).
    * Line hashing is a stateless narrow pass; the membership check is
    * a stream-static equi-join on the 8-byte hash (Spark broadcasts
    * the static side when it fits, and falls back to a stream-static
    * shuffle join when the standing set is itself large — no stream
    * state grows with it either way); the per-doc counters are the
    * only streaming state, ingest-windowed so they evict.
    */
  def boilerplateScreenStream(docs: DataFrame, boilerHashes: DataFrame): DataFrame =
    ingestStamped(graft.operators.Dedup.lineHashesOfDocs(docs))
      .join(boilerHashes, "h")
      .groupBy(window(col("ingest_t"), IngestWindow), col("doc_id"))
      .agg(count(lit(1)).as("n_boiler_lines"),
        sum(col("n_chars")).as("boiler_chars"))
      .select("doc_id", "n_boiler_lines", "boiler_chars")

  /** Streaming CDC-chunk screen — qDedupCdc's ingest twin: incoming
    * documents are content-defined-chunked (stateless narrow pass,
    * boundaries anchored to word hashes so a syndicated copy with an
    * inserted paragraph still shares every untouched chunk) and
    * checked against the STANDING duplicated-chunk hash set from the
    * batch pass. Stream-static equi-join on the 16-byte hash; the
    * per-doc counters are the only streaming state, ingest-windowed
    * so the state store holds a window of flagged docs, never the
    * stream's lifetime of them.
    */
  def cdcScreenStream(docs: DataFrame, dupChunkHashes: DataFrame): DataFrame =
    ingestStamped(graft.operators.Dedup.cdcChunksOfDocs(docs))
      .join(dupChunkHashes, "chunk_hash")
      .groupBy(window(col("ingest_t"), IngestWindow), col("doc_id"))
      .agg(count(lit(1)).as("n_dup_chunks"),
        sum(col("n_words")).as("dup_words"))
      .select("doc_id", "n_dup_chunks", "dup_words")

  /** Run the windowed agg over the parquet-backed stream into a memory
    * sink and return the materialized result (synchronous; test/demo).
    */
  def runWindowedToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = windowedAgg(readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Streaming twin of Events.qSessionWindow: the BUILT-IN
    * session_window under a watermarked streaming groupBy — Spark's
    * merging-session state instead of the hand-rolled
    * flatMapGroupsWithState sessionizer. Append mode emits a session
    * once the watermark passes its end.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("sum_value"))

  /** Run the session-window agg into a memory sink (synchronous). */
  def runSessionWindowToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = sessionWindowAgg(readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Stream-stream interval join: attribute each purchase to the same
    * user's clicks in the preceding 30 minutes (the click-attribution
    * shape; batch twin of the time-range semantics in
    * Events.qRangeJoin). Both sides are branches of the SAME source
    * stream, watermarked independently; the time-range predicate plus
    * the watermarks bound the join state — Spark evicts click rows
    * once the purchase-side watermark passes click_t + 30 min, so
    * state is O(events in the attribution horizon), not O(stream).
    */
  def attributionJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_t").as("click_t"),
        col("event_id").as("click_id"))
      .withWatermark("click_t", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_t").as("purchase_t"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_t", "2 hours")
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_t") >= col("purchase_t") - expr("INTERVAL 30 MINUTES") &&
        col("click_t") <= col("purchase_t"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_t"), col("click_t"), col("value"))
  }

  /** Run the attribution join over the parquet-backed stream into a
    * memory sink (synchronous; test/demo).
    */
  def runAttributionToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = attributionJoin(readEventStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
