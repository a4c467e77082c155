package graft

import org.apache.spark.sql.functions._

import graft.streaming.{BatchFiles, StreamOps}

/** Dev probe (SCALE.md "d53 backfill path"): drives a LARGE events table
  * through `asofJoinStreamFiles` — the file-sink backfill path — and
  * reports per-batch cost, state-store size, and output volume, i.e.
  * the evidence that the path holds when the input is no longer
  * fixture-sized:
  *   - per-batch durationMs should scale with the BATCH, and state rows
  *     should stay far below cumulative input (watermark expiry works);
  *   - the driver never materializes the output (file sink), so the
  *     only driver-side number is the final count() of the read-back.
  * Build a big input first with `graft.ScaleData`
  * (SPARK_GRAFT_SCALE_TABLES=events). Env: SPARK_GRAFT_SF_DIR (default
  * /tmp/graft_scale_30x), SPARK_GRAFT_SPLITS (files per side, default
  * 4), SPARK_GRAFT_CPUS, SPARK_GRAFT_STATE_PARTS (statePartitions for
  * the drive, default session conf — the SCALE.md state-partition
  * sizing measurement), SPARK_GRAFT_PAYLOAD_CODEC (json|binary — the
  * SCALE.md pack-cost comparison). */
object AsofScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_30x")
    val splits = sys.env.getOrElse("SPARK_GRAFT_SPLITS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val stateParts = sys.env.get("SPARK_GRAFT_STATE_PARTS").map(_.toInt)
    val codec = sys.env.getOrElse("SPARK_GRAFT_PAYLOAD_CODEC", "json")
    val provider = sys.env.get("SPARK_GRAFT_STATE_PROVIDER") // hdfs|rocksdb
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

    val tmp = java.nio.file.Files.createTempDirectory("graft-asof-scale").toString
    val e = Tables.load(spark, sfDir, "events")
    val nEvents = e.count()
    import org.apache.spark.sql.expressions.Window
    // Harness-side split assignment: a single-partition global sort per
    // side — computed ONCE (BatchFiles persists its input before the
    // per-split passes). Fine to ~10^7 rows; a probe run at a far
    // larger SF should swap this for approxQuantile ts thresholds +
    // a comparison column, which needs no global sort at all.
    val part = ntile(splits).over(Window.orderBy(col("ts"), col("id"))) - 1
    // SPARK_GRAFT_WIDE_PAYLOAD=1: ride a realistic wide payload (string
    // + double + micros timestamp + array) instead of the single id —
    // the codec-comparison shape, where pack cost is proportional to
    // payload width (id-only payloads render to ~the same bytes under
    // either codec)
    val wide = sys.env.get("SPARK_GRAFT_WIDE_PAYLOAD").contains("1")
    def widen(df: org.apache.spark.sql.DataFrame) =
      if (!wide) df
      else df
        .withColumn("tag", concat(lit("user-tag-"), col("key") % 1000))
        .withColumn("score", col("id") % 997 * 1.5)
        .withColumn("seen", timestamp_micros(col("id") * 1000001L))
        .withColumn("attrs", array(concat(lit("a"), col("id") % 7),
          concat(lit("b"), col("key") % 13), lit("cxxxxxxxxxxxx")))
    val clicks = widen(e.filter(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("id")))
    val views = widen(e.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("id"))
      .select(col("user_id").as("key"), col("ts"), col("id")))
    BatchFiles.write(clicks.withColumn("p", part), s"$tmp/left", "p", splits,
      keepSplitCol = false)
    BatchFiles.write(views.withColumn("p", part), s"$tmp/right", "p", splits,
      keepSplitCol = false)
    val nL = clicks.count(); val nR = views.count()
    println(s"""{"probe":"asof_scale_input","sf":"$sfDir","events":$nEvents,"lefts":$nL,"rights":$nR,"splits":$splits,"codec":"$codec","provider":"${provider.getOrElse("hdfs")}"}""")

    val t0 = System.nanoTime()
    val out = StreamOps.asofJoinStreamFiles(spark, s"$tmp/left", s"$tmp/right",
      s"$tmp/ckpt", s"$tmp/out", delay = "10 minutes",
      maxFilesPerTrigger = 1, payloadCodec = codec, statePartitions = stateParts,
      stateStoreProvider = provider,
      onProgress = ps => ps.foreach { p =>
        val st = p.stateOperators.headOption
        println(s"""{"probe":"asof_scale_batch","batch":${p.batchId},"input_rows":${p.numInputRows},"duration_ms":${p.durationMs.getOrDefault("triggerExecution", -1L)},"state_rows":${st.map(_.numRowsTotal).getOrElse(-1L)},"state_mb":${st.map(_.memoryUsedBytes / 1048576).getOrElse(-1L)},"dropped_by_wm":${st.map(_.numRowsDroppedByWatermark).getOrElse(-1L)},"watermark":"${Option(p.eventTime.get("watermark")).getOrElse("")}"}""")
      })
    val nOut = out.count() // the ONLY driver-side touch of the output
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"asof_scale_drive","wall_sec":$wall%.1f,"out_rows":$nOut}""")

    // reference: the batch asofJoin on the same (full) sides
    val t1 = System.nanoTime()
    val nBatch = StreamOps.asofJoin(
      clicks.withColumnRenamed("id", "left_id"),
      views.withColumnRenamed("id", "right_id"),
      Seq("key"), "ts", "ts", Map("right_id" -> "right_id")).count()
    val wallB = (System.nanoTime() - t1) / 1e9
    println(f"""{"probe":"asof_scale_batch_ref","wall_sec":$wallB%.1f,"rows":$nBatch}""")

    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.stop()
  }
}
