package graft

import org.apache.spark.sql.functions._

/** Dev probe (SCALE.md "streaming ingest at scale"): per-batch wall time
  * of the DedupStream index loop as the index GROWS — the claim under
  * test is the 100 TB design invariant "batch cost scales with the
  * BATCH (plus index probe), not with corpus history". Drives the real
  * `processBatch` over equal-sized slices of a documents table and
  * prints one JSON line per batch: batch id, rows in, index rows
  * before, survivors, seconds. A compaction pass runs at the configured
  * cadence so the probe also shows the with/without-compaction file
  * count effect the runbook's cadence rule is based on.
  *
  * Env: SPARK_GRAFT_SF_DIR (table source, default sf0.1),
  * SPARK_GRAFT_BATCHES (default 8), SPARK_GRAFT_COMPACT_EVERY
  * (default 0 = never), SPARK_GRAFT_CPUS. */
object IngestScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "8").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "0").toInt
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
    import graft.streaming.DedupStream

    val root = java.nio.file.Files.createTempDirectory("graft-ingest-probe")
      .toString + "/index"
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    docs.count()
    (0 until nBatches).foreach { i =>
      val slice = docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
      val nIn = slice.count()
      val idxBefore =
        if (i == 0) 0L
        else DedupStream.visibleIndex(spark, s"$root/docs").count()
      val t0 = System.nanoTime()
      DedupStream.processBatch(slice, i.toLong, root, "doc_id", "text",
        k = 4, numHashes = 16, bands = 8, threshold = 0.3)
      val sec = (System.nanoTime() - t0) / 1e9
      val survivors = spark.read.parquet(s"$root/docs/batch=$i").count()
      println(f"""{"probe":"ingest_scale","batch":$i,"rows_in":$nIn,"index_before":$idxBefore,"survivors":$survivors,"sec":$sec%.2f}""")
      if (compactEvery > 0 && i > 0 && i % compactEvery == 0) {
        val t1 = System.nanoTime()
        val cut = DedupStream.compactIndex(spark, root)
        println(f"""{"probe":"ingest_scale_compact","after_batch":$i,"cutoff":${cut.getOrElse(-1L)},"sec":${(System.nanoTime() - t1) / 1e9}%.2f}""")
      }
    }
    docs.unpersist()
    spark.stop()
  }
}
