package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiling harness for optimization work (guide §1): runs one
  * or more queries exactly the way Bench times them (same session
  * config, warm-up, count() action) and prints a per-job breakdown —
  * job wall time, description, stage count, task count, shuffle bytes —
  * so the expensive seconds inside a 4-6 s query can be attributed to
  * specific jobs/stages instead of guessed at.
  *
  * Usage: runMain graft.Profile q_louvain[,q_x,...] [sfDir] [reps]
  */
object Profile {
  private case class JobRow(id: Int, desc: String, ms: Long, stages: Int,
      tasks: Int, shufR: Long, shufW: Long)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q_pagerank"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // A/B config overrides for experiments: GRAFT_CONF="k=v;k=v"
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("OFF")

    val jobs = ArrayBuffer.empty[JobRow]
    val stages = ArrayBuffer.empty[(Int, String, Int, Long, Long, Long)]
    val starts = scala.collection.mutable.Map.empty[Int, (Long, String, Int)]
    // stageId → owning jobId (known at job start), and per-job stage
    // metric accumulators so JobRow.tasks/shufR/shufW report real
    // values instead of the r11 hardcoded zeros (ADVICE). Job wall
    // times are listener-delivery timestamps off the async bus —
    // treat them as ±bus-latency and overlapping across concurrent
    // jobs; the per-stage table below is the precise record.
    val stageJob = scala.collection.mutable.Map.empty[Int, Int]
    val jobAgg = scala.collection.mutable.Map.empty[Int, (Int, Long, Long)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // Attribute the job to its terminal stage's call site — the
        // source line whose action submitted it (setJobDescription is
        // not threaded through the operators, call sites are free).
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        starts(js.jobId) = (System.nanoTime(), site, js.stageIds.size)
        js.stageIds.foreach(sid => stageJob(sid) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
        stages += ((i.stageId, i.name, i.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000))
        stageJob.get(i.stageId).foreach { jid =>
          val (t, r, w) = jobAgg.getOrElse(jid, (0, 0L, 0L))
          jobAgg(jid) = (t + i.numTasks, r + m.shuffleReadMetrics.totalBytesRead,
            w + m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d, ns) =>
          val (t, r, w) = jobAgg.getOrElse(je.jobId, (0, 0L, 0L))
          jobs += JobRow(je.jobId, d, (System.nanoTime() - t0) / 1000000, ns, t, r, w)
        }
    }

    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      org.apache.spark.graft.MemoryRelease.dropBroadcasts()
    }

    // identical warm-up discipline to Bench (codegen caches, plan shapes)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    release()

    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      (1 to reps).foreach { r =>
        jobs.clear()
        stages.clear()
        stageJob.clear()
        jobAgg.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.MemoryRelease.drainListeners(spark.sparkContext)
        release()
        println(f"== $n rep $r: $dt%.2f s, ${jobs.size} jobs ==")
        val byDesc = jobs.groupBy(_.desc).toSeq
          .map { case (d, rows) => (d, rows.map(_.ms).sum, rows.size) }
          .sortBy(-_._2)
        byDesc.take(30).foreach { case (d, ms, n2) =>
          println(f"  $ms%6d ms  x$n2%-4d ${d.take(110)}")
        }
        val tail = jobs.sortBy(-_.ms).take(15)
        println("  -- slowest single jobs --")
        tail.foreach(j => println(f"  job ${j.id}%4d ${j.ms}%6d ms  stages=${j.stages}%3d  ${j.desc.take(90)}"))
        val nst = stages.size
        val stWall = stages.map(_._4).sum
        val stRun = stages.map(_._5).sum
        val stCpu = stages.map(_._6).sum
        println(f"  -- $nst stages, wall=$stWall ms, taskRun=$stRun ms, taskCpu=$stCpu ms --")
        stages.sortBy(-_._4).take(12).foreach { case (id, nm, nt, wall, run, cpu) =>
          println(f"  stage $id%4d $wall%6d ms (run=$run%6d cpu=$cpu%6d tasks=$nt%3d) ${nm.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
