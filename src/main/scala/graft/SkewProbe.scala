package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Dev probe (SCALE.md "h10 skew evidence"): runs a registered query at
  * a given SF dir and reports PER-STAGE task-time spread from a
  * SparkListener — the task-level measurement that tells real key skew
  * (one straggler task dominating a stage) apart from box noise (which
  * moves whole runs, not single partitions).
  *
  * Output: one JSON line per stage with >= 4 tasks and >= 50 ms max
  * task time (smaller stages are dispatch noise), plus a summary line.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_QUERY (default
  * h10_sole_return_supplier), SPARK_GRAFT_CPUS. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_QUERY", "h10_sole_return_supplier")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (stageId, stageAttemptId) -> (runtimeMs, shuffleReadBytes, recordsRead)
    // — keyed per attempt so stage retries / speculative attempts report
    // their own distributions instead of merging into one
    val tasks = mutable.Map[(Int, Int), mutable.ArrayBuffer[(Long, Long, Long)]]()
    // job start/end counters: the listener bus delivers asynchronously,
    // so after the (synchronous) action returns the tail TaskEnd events
    // may still be queued; JobEnd is posted after a job's task events
    // and the bus is FIFO per listener, so started == ended means every
    // task event of those jobs has been delivered
    val jobsStarted = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobsEnded = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        val m = te.taskMetrics
        if (m != null) {
          val sr = if (m.shuffleReadMetrics != null)
            m.shuffleReadMetrics.totalBytesRead else 0L
          val rr = if (m.shuffleReadMetrics != null)
            m.shuffleReadMetrics.recordsRead else 0L
          tasks.getOrElseUpdate((te.stageId, te.stageAttemptId),
              mutable.ArrayBuffer.empty)
            .append((m.executorRunTime, sr, rr))
        }
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobsStarted.incrementAndGet(); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobsEnded.incrementAndGet(); ()
      }
    }

    val fn = SparkEntry.queries(qname)
    // warm run (codegen/JIT) WITHOUT the listener: only steady-state
    // task times count as skew evidence
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.sqlContext.clearCache()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // drain: wait (bounded) until every started job's end event arrived,
    // then one settle tick — without this the measured job's tail task
    // events can be silently missed (async bus)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while ((jobsStarted.get() == 0 || jobsEnded.get() < jobsStarted.get()) &&
           System.nanoTime() < deadline) Thread.sleep(20)
    Thread.sleep(200)
    spark.sparkContext.removeSparkListener(listener)

    def pct(xs: Seq[Long], p: Double): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(((xs.size - 1) * p).toInt)
    var worst = 0.0
    tasks.toSeq.sortBy(_._1).foreach { case ((stage, attempt), ts) =>
      val times = ts.map(_._1).toSeq
      val maxT = times.max
      if (ts.size >= 4 && maxT >= 50) {
        val medT = pct(times, 0.5).max(1L)
        val ratio = maxT.toDouble / medT
        worst = worst.max(ratio)
        val srs = ts.map(_._2).toSeq
        val rrs = ts.map(_._3).toSeq
        println(f"""{"probe":"task_skew","query":"$qname","stage":$stage,"attempt":$attempt,"tasks":${ts.size},"med_ms":$medT,"p95_ms":${pct(times, 0.95)},"max_ms":$maxT,"max_over_med":$ratio%.2f,"med_shuffle_mb":${pct(srs, 0.5) / 1048576},"max_shuffle_mb":${srs.max / 1048576},"med_rows":${pct(rrs, 0.5)},"max_rows":${rrs.max}}""")
      }
    }
    println(f"""{"probe":"task_skew_summary","query":"$qname","sf":"$sfDir","wall_sec":$wall%.2f,"worst_max_over_med":$worst%.2f}""")
    spark.stop()
  }
}
