package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => " "
    case c => c.toString
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.parquet is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up so the first timed query isn't charged
    // startup: run the whole suite once at the smallest scale factor
    // (same plan shapes, tiny data) — whole-stage codegen compiles and
    // Janino caches once here, and the timed pass below measures
    // steady-state execution, not who-ran-first compilation order.
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    // Optional comma-separated subset for local iteration; the driver
    // never sets it, so the full suite runs per round.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val warmDir = "/root/testdata/sf0.001"
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // A failing query is REPORTED, not silently timed at -1: per-query
    // err strings and a failure count ride the emitted JSON.
    // Periodic GC nudge: localCheckpoint blocks are only released after
    // their DataFrames are collected AND the ContextCleaner runs — over
    // ~100 queries the accumulated blocks inflate later queries' GC
    // time (a full-suite run measured 146 s vs ~101 s; solo re-runs of
    // the "slow" tail queries were normal). Untimed, every 16 queries.
    var i = 0
    val results = selected.map { case (name, fn) =>
      i += 1
      if (i % 16 == 0) System.gc()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(e.toString.linesIterator.next().take(200))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // Amortized graph path: materialize the bucketed chunk/mention
    // tables once (timed), then re-run the graph-query family against
    // them via the MaterializedConf indirection — the production
    // "ingest once, query many" shape. Reported as two pseudo-query
    // entries so the one-line JSON contract is unchanged.
    val amortized: Seq[(String, Double, Option[String])] =
      if (only.isEmpty) {
        val gq = Seq("q_cooccur", "q_entity_degree", "q_graph_nodes",
          "q_chunks_by_entities", "q_article_topics", "q_cypher_ex1")
          .filter(SparkEntry.queries.contains)
        try {
          val t0 = System.nanoTime()
          sources.Catalog.materializeGraph(spark, sfDir)
          val tMat = (System.nanoTime() - t0) / 1e9
          spark.conf.set(operators.TextPipeline.MaterializedConf, sfDir)
          val t1 = System.nanoTime()
          gq.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
          val tRun = (System.nanoTime() - t1) / 1e9
          Seq(("x_mat_graph", tMat, None),
            (s"x_amortized${gq.size}q", tRun, None))
        } catch {
          case e: Throwable =>
            Seq(("x_graph_amortized", -1.0,
              Some(e.toString.linesIterator.next().take(200))))
        } finally spark.conf.unset(operators.TextPipeline.MaterializedConf)
      } else Seq.empty
    val all = results.toSeq ++ amortized
    // The driver captures only the trailing ~2000 chars of output, so
    // the whole JSON line (plus sbt's epilogue) must fit in that
    // window: 1-decimal per-query timings (the totals carry the
    // precision), sf basename, failures/errors fields only on failure.
    // 1-decimal timings with trailing ".0" dropped ("2.0" → "2")
    def r1(v: Double): String = {
      val s = "%.1f".format(v)
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
    // keys drop the uniform "q_" prefix, shorten the cypher family
    // ("cypher_ex14" → "cx14"), and abbreviate recurring words: with
    // 105+ queries the line must stay inside the driver's ~2000-char
    // log tail (sbt epilogue included) or the round's bench JSON
    // records parsed:null — round 2's did. Abbreviation map documented
    // in SURVEY §6.
    val abbrev = Seq(
      "dedup_" -> "dd_", "chunks_" -> "ch_", "chunk_" -> "ch_",
      "entity_" -> "ent_", "entities" -> "ents", "cosine_" -> "cos_",
      "embeddings" -> "embs", "embedding" -> "emb", "articles" -> "arts",
      "sources" -> "srcs", "mentioning" -> "ment", "mentions" -> "ments",
      "quantize_" -> "qnt_", "sequences" -> "seqs",
      "stratified_sample" -> "strat", "train_test_split" -> "tts",
      "tokenize_" -> "tok_", "subword" -> "sw", "decontaminate" -> "decon",
      "retrieval" -> "retr", "fingerprint" -> "fprint",
      "percentiles" -> "pctls", "heavy_hitters" -> "hh",
      "shortest_path" -> "spath", "components" -> "comps",
      "containment" -> "contain", "repetition" -> "rept",
      "sessionize" -> "sess", "fulltext_query" -> "ftq", "media_" -> "md_",
      "filter_pipeline" -> "fpipe", "events_window" -> "ev_window",
      "event_anomaly" -> "ev_anom", "graph_" -> "g_",
      "window_suite" -> "win_suite", "incremental" -> "incr",
      "pagerank_weighted" -> "wpr", "link_prediction" -> "linkpred",
      "doc_similarity" -> "doc_sim", "session_window" -> "sess_win")
    def key(k: String): String = {
      val base = k.stripPrefix("q_").replaceFirst("^cypher_ex", "cx")
      abbrev.foldLeft(base) { case (s, (a, b)) => s.replace(a, b) }
    }
    val qs = all.map { case (k, v, _) => s"\"" + key(k) + "\":" + r1(v) }
      .mkString("{", ",", "}")
    val errs = all.collect { case (k, _, Some(e)) => s"\"${esc(k)}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val nFail = all.count(_._3.isDefined)
    val total = results.map(_._2).sum
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val errField =
      if (nFail > 0) s""","failures":$nFail,"errors":$errs""" else ""
    println(s"""{"metric":"total","value":${"%.2f".format(total)},"unit":"sec","queries":$qs$errField,"sf":"$sfName"}""")
    spark.stop()
    if (nFail > 0) System.err.println(s"[bench] $nFail queries FAILED: $errs")
  }
}
