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
    @volatile var lastPlan: String = ""
    @volatile var planCount: Int = 0
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit = {
        lastPlan = qe.executedPlan.toString; planCount += 1
      }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // per-rep task-time spread, keyed by (stageId, stageAttemptId);
    // reads/clears synchronize on `listener` (onTaskEnd locks `this`)
    val tasks = mutable.Map[(Int, Int), mutable.ArrayBuffer[Long]]()
    val jobsStarted = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobsEnded = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        if (te.taskMetrics != null)
          tasks.getOrElseUpdate((te.stageId, te.stageAttemptId),
            mutable.ArrayBuffer.empty).append(te.taskMetrics.executorRunTime)
      }
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobsStarted.incrementAndGet(); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobsEnded.incrementAndGet(); ()
      }
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

    // Drain both async buses after an action: started must have advanced
    // past the pre-action snapshot, ended caught up, the execution
    // listener delivered a plan — AND the counters must then hold still
    // for a quiet period. The quiet period is what makes this correct
    // for queries whose CONSTRUCTION runs eager driver-side actions
    // (localCheckpoint(eager), auto-threshold count()s): those satisfy
    // the three advance conditions while the final noop job is still
    // queued, and a drain that returns at first satisfaction would let
    // that job's tail task events land after the next rep clears the
    // map. Bounded by `deadline`.
    def drainAfterAction(started0: Int, plans0: Int): Unit = {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      val quietNs = 300L * 1000 * 1000
      var snapshot = (jobsStarted.get(), jobsEnded.get(), planCount)
      var lastChange = System.nanoTime()
      while (System.nanoTime() < deadline) {
        val cur = (jobsStarted.get(), jobsEnded.get(), planCount)
        if (cur != snapshot) { snapshot = cur; lastChange = System.nanoTime() }
        val advanced = cur._1 > started0 && cur._2 >= cur._1 && cur._3 > plans0
        if (advanced && System.nanoTime() - lastChange >= quietNs) return
        Thread.sleep(20)
      }
    }

    // drain the warm run too, so its tail task events can't land after
    // rep 1 clears the map
    val warmStarted0 = jobsStarted.get()
    val warmPlans0 = planCount
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    drainAfterAction(warmStarted0, warmPlans0)
    val sigs = mutable.ArrayBuffer[String]()
    (1 to reps).foreach { rep =>
      graft.datax.Dedup.releaseShingleCaches()
      spark.sqlContext.clearCache()
      listener.synchronized { tasks.clear() }
      val started0 = jobsStarted.get()
      val plans0 = planCount
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain both buses (bounded + quiet period, see drainAfterAction)
      drainAfterAction(started0, plans0)
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
