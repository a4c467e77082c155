package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev probe (SCALE.md "bench-trust rule" follow-ups, first used on the
  * r9 h06 spread): runs one registered query for N reps and reports,
  * per rep, the wall time, a SIGNATURE of the AQE-final physical plan
  * (expr/plan ids normalized away), and the worst per-stage
  * max-over-median task-time ratio. Separates the three causes a >2x
  * rep spread can have:
  *   - plan flip      -> differing plan signatures across reps;
  *   - real key skew  -> stable signature, one stage's max/med high in
  *                       the slow rep only;
  *   - box noise      -> stable signature, task times uniformly
  *                       inflated (max/med similar across reps).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_QUERY (default h06_part_profit),
  * SPARK_GRAFT_REPS (default 5), SPARK_GRAFT_CPUS. */
object PlanStabilityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_QUERY", "h06_part_profit")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
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

    // AQE-final executed plan of the last completed action. Both buses
    // are ASYNC (the SkewProbe lesson): the rep loop below drains them
    // with counters — planCount for the execution-listener bus,
    // jobsStarted/jobsEnded for the task bus (JobEnd posts after a job's
    // task events, FIFO per listener) — instead of a fixed sleep, so
    // tail events on a loaded box can't be lost or bleed into the next
    // rep's cleared map.
    val MarkerAlias = "graft_drain_marker"
    val MarkerDesc = "graft-drain-marker"
    @volatile var lastPlan: String = ""
    @volatile var markerPlanSeen = false
    @volatile var markerJobSeen = false
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit = {
        val s = qe.executedPlan.toString
        // the drain marker's own plan must not clobber the probed plan
        if (s.contains(MarkerAlias)) markerPlanSeen = true
        else lastPlan = s
      }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // per-rep task-time spread, keyed by (stageId, stageAttemptId);
    // reads/clears synchronize on `listener` (onTaskEnd locks `this`).
    // Marker-job task events do land in the map, but never survive the
    // reporting filter (1 sub-50ms task vs the >=4-task >=50ms cut).
    val tasks = mutable.Map[(Int, Int), mutable.ArrayBuffer[Long]]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        if (te.taskMetrics != null)
          tasks.getOrElseUpdate((te.stageId, te.stageAttemptId),
            mutable.ArrayBuffer.empty).append(te.taskMetrics.executorRunTime)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            MarkerDesc == js.properties.getProperty("spark.job.description"))
          markerJobSeen = true
    }
    spark.sparkContext.addSparkListener(listener)

    // strip run-varying ids so two structurally identical plans hash equal
    def signature(plan: String): String = {
      val norm = plan
        .replaceAll("#\\d+", "#")
        .replaceAll("plan_id=\\d+", "plan_id=")
        .replaceAll("\\[id=\\d+\\]", "[id=]")
        .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    }

    val fn = SparkEntry.queries(qname)

    // Drain both async buses after an action DETERMINISTICALLY: run a
    // tiny MARKER action (tagged by job description on the task bus and
    // by a recognizable alias in its plan on the execution-listener bus)
    // and wait for both marker events to be DELIVERED. Each listener bus
    // is FIFO per listener, and the marker's events are enqueued after
    // every event of the preceding action (driver-side sequential), so
    // seeing them proves everything earlier has been delivered — no
    // counter snapshots, no quiet-period heuristic to out-stall. This
    // holds for queries whose CONSTRUCTION runs eager driver-side
    // actions (localCheckpoint(eager), auto-threshold count()s), the
    // shape a counter-advance condition can be satisfied by early.
    // Bounded by a 20 s deadline (warn, never hang).
    def drainAfterAction(): Unit = {
      markerPlanSeen = false
      markerJobSeen = false
      spark.sparkContext.setJobDescription(MarkerDesc)
      try spark.range(1).selectExpr(s"id AS $MarkerAlias")
        .write.format("noop").mode("overwrite").save()
      finally spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (!(markerPlanSeen && markerJobSeen) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      if (!(markerPlanSeen && markerJobSeen))
        System.err.println(s"[probe] drain marker not delivered in 20 s " +
          s"(plan=$markerPlanSeen job=$markerJobSeen) — next rep may see stale events")
    }

    // drain the warm run too, so its tail task events can't land after
    // rep 1 clears the map
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    drainAfterAction()
    val sigs = mutable.ArrayBuffer[String]()
    (1 to reps).foreach { rep =>
      graft.datax.Dedup.releaseShingleCaches()
      spark.sqlContext.clearCache()
      listener.synchronized { tasks.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain both buses (FIFO marker, see drainAfterAction)
      drainAfterAction()
      val sig = signature(lastPlan)
      sigs += sig
      def pct(xs: Seq[Long], p: Double): Long =
        if (xs.isEmpty) 0L else xs.sorted.apply(((xs.size - 1) * p).toInt)
      val stageStats = listener.synchronized {
        tasks.toSeq.collect {
          case ((st, at), ts) if ts.size >= 4 && ts.max >= 50 =>
            (st, at, ts.max.toDouble / pct(ts.toSeq, 0.5).max(1L), ts.max)
        }
      }.sortBy(-_._3)
      val worst = stageStats.headOption
      println(f"""{"probe":"plan_stability","query":"$qname","rep":$rep,"sec":$wall%.3f,"plan_sig":"$sig","worst_stage":${worst.map(_._1).getOrElse(-1)},"worst_max_over_med":${worst.map(w => f"${w._3}%.2f").getOrElse("0")},"worst_max_ms":${worst.map(_._4).getOrElse(0L)}}""")
    }
    val stable = sigs.distinct.size == 1
    println(s"""{"probe":"plan_stability_summary","query":"$qname","reps":$reps,"distinct_plans":${sigs.distinct.size},"plan_stable":$stable,"sigs":${sigs.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
