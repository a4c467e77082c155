package graft

import org.apache.spark.sql.functions._

import graft.streaming.{BatchFiles, DedupStream}

/** Dev probe (SCALE.md "d52 machinery floor"): phase- and job-level
  * breakdown of the d52 streaming-ingest drive — BatchFiles source
  * write, per-micro-batch trigger durations split into the engine's
  * own phases (addBatch vs walCommit/planning/offsets), Spark job
  * count and summed in-job wall per phase, and the read-back. This is
  * the measurement that located the r11 9.4 s floor: >95% of each
  * trigger is addBatch (the foreachBatch dedup pipeline's own ~38
  * sequential jobs), not streaming machinery — which is what justified
  * the round-12 concurrency work (parallel index writes, parallel
  * cross-index/within-batch materializations, fused decide+fetch in
  * dupClusters) over any state-store/listing tuning. Env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS. */
object IngestPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobMs = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime()); jobs.incrementAndGet(); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach(t0 =>
          jobMs.addAndGet((System.nanoTime() - t0) / 1000000L)); ()
      }
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val m0 = jobMs.get()
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(${jobs.get() - j0} jobs, ${(jobMs.get() - m0) / 1000.0}%.2f s in-job)"); r
    }
    (0 until 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val tmp = java.nio.file.Files.createTempDirectory("graft-d52-scratch").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      time("batchfiles_write") {
        BatchFiles.write(docs, s"$tmp/src", "doc_id", splits = 4)
      }
      time("stream_drive") {
        DedupStream.ingestAvailableNow(spark, s"$tmp/src", s"$tmp/index",
          s"$tmp/ckpt", "doc_id", "text",
          k = 4, numHashes = 16, bands = 8, threshold = 0.3,
          maxFilesPerTrigger = 2,
          onProgress = ps => ps.foreach(p =>
            println(f"[phase]   batch ${p.batchId}: ${p.durationMs.getOrDefault("triggerExecution", -1L)} ms (addBatch ${p.durationMs.getOrDefault("addBatch", -1L)}, getBatch ${p.durationMs.getOrDefault("getBatch", -1L)}, latestOffset ${p.durationMs.getOrDefault("latestOffset", -1L)}, queryPlanning ${p.durationMs.getOrDefault("queryPlanning", -1L)}, walCommit ${p.durationMs.getOrDefault("walCommit", -1L)}, commitOffsets ${p.durationMs.getOrDefault("commitOffsets", -1L)})"))
        )
      }
      val out = time("readback_sort_ckpt") {
        spark.read.parquet(s"$tmp/index/docs").select("doc_id", "lang")
          .orderBy("doc_id").localCheckpoint(eager = true)
      }
      println(s"[phase] rows=${out.count()}")
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    spark.stop()
  }
}
