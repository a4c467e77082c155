package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.datax.Similarity.ivfIndexSkew]] at the
  * centroid clamp (round 17): the round-16 cut submitted one Spark
  * `count()` job per `centroid_id=N` partition — metadata-cheap each,
  * but K sequential driver round-trips, which at the `centroidsFor`
  * clamp (K = 4096) contradicted the "poll it per append" cost
  * promise. The rewrite reads parquet FOOTER row counts directly off
  * the partition listing (driver-side, ZERO Spark jobs); this probe
  * measures the poll wall at a configurable K and counts the Spark
  * jobs it submits (a SparkListener — the claim "zero jobs" is
  * asserted by measurement, not prose). Round 18 adds the listing
  * strategy A/B (parallel per-dir walk vs bulk recursive listFiles):
  * the scheme-aware pick in [[graft.datax.Similarity.ivfIndexSkew]]
  * rests on these numbers. Round 19 splits cold vs warm: the first
  * poll pays the footer opens once and seeds the per-file row-count
  * cache; the steady-state poll is a pure listing (the probe asserts
  * zero opens on the warm runs), so the O(files) footer term no
  * longer grows with poll count.
  *
  * Env: SPARK_GRAFT_CENTROIDS (default 1024), SPARK_GRAFT_ROWS
  * (default 65536), SPARK_GRAFT_CPUS (default 8). */
object IndexSkewProbe {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_CENTROIDS", "1024").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "65536").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic index layout at K partitions: the skew face reads only
    // the partition dirs + footers, so the row payload can be minimal
    val dir = java.nio.file.Files.createTempDirectory("graft-skewprobe").toString
    try {
      val t0 = System.nanoTime()
      spark.range(rows)
        .select(col("id"), array(lit(1.0)).as("vec"),
          (col("id") % k).as("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/assigned.parquet")
      val buildSec = (System.nanoTime() - t0) / 1e9

      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t1 = System.nanoTime()
      val (skew, coldOpens) = graft.datax.Similarity
        .ivfIndexSkewCounted(spark, dir, bulkListing = false)
      val pollSec = (System.nanoTime() - t1) / 1e9
      // onJobStart fires synchronously enough for this count; give the
      // bus a beat rather than reaching into the private listenerBus
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      // strategy A/B (round 18): the public face picks the listing
      // strategy by FS scheme (parallel per-dir walk on file:, bulk
      // recursive listFiles on remote stores); time both here so the
      // scheme rule rests on a measurement, not prose. Round 19: the
      // first poll seeded the per-file row-count cache, so these runs
      // are WARM — the steady-state poll shape (zero footer opens, a
      // pure listing), which is exactly the shape the scheme rule now
      // has to price
      val t2 = System.nanoTime()
      val (walkSkew, walkOpens) = graft.datax.Similarity
        .ivfIndexSkewCounted(spark, dir, bulkListing = false)
      val walkSec = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val (bulkSkew, bulkOpens) = graft.datax.Similarity
        .ivfIndexSkewCounted(spark, dir, bulkListing = true)
      val bulkSec = (System.nanoTime() - t3) / 1e9
      require(walkSkew == bulkSkew && walkSkew == skew,
        s"listing strategies must agree: walk=$walkSkew bulk=$bulkSkew poll=$skew")
      require(walkOpens == 0 && bulkOpens == 0,
        s"warm polls must be pure listings: walk=$walkOpens bulk=$bulkOpens")
      println(s"""{"probe":"index_skew","k":$k,"rows":$rows,""" +
        s""""skew":${skew.getOrElse(-1.0)},""" +
        f""""buildSec":$buildSec%.2f,"coldPollSec":$pollSec%.2f,""" +
        s""""coldFooterOpens":$coldOpens,""" +
        s""""sparkJobsDuringPoll":${jobs.get()},""" +
        f""""warmWalkSec":$walkSec%.2f,"warmBulkSec":$bulkSec%.2f}""")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    spark.stop()
  }
}
