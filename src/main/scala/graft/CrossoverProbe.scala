package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (SCALE.md "components crossover"): measures where the
  * driver union-find in [[graft.datax.Dedup.dupClusters]] stops beating
  * the distributed min-label loop, instead of trusting the 1M-edge
  * `driverMaxPairs` default.
  *
  * Two measurements:
  *  1. synthetic dup-shaped pair graphs (80% isolated 2-node
  *     components, 20% chained into 4-node/diameter-3 components — the
  *     shallow shape near-dup graphs actually have) at growing edge
  *     counts, each clustered through BOTH paths
  *     (`driverMaxPairs=Long.MaxValue` forces the driver union-find,
  *     `=0` forces distributed label propagation);
  *  2. the real pair graph of the 30x scaled corpus, if
  *     SPARK_GRAFT_SCALE_DIR points at one (ScaleData output), both
  *     paths again.
  *
  * Output: one JSON line per measurement. Env: SPARK_GRAFT_CPUS (16),
  * SPARK_GRAFT_SIZES (comma-separated edge-base counts),
  * SPARK_GRAFT_SCALE_DIR (skip corpus part if unset/missing).
  * Run with SPARK_DRIVER_MEM=24g — the largest driver-path collect
  * holds ~12M boxed pairs. */
object CrossoverProbe {
  def main(args: Array[String]): Unit = {
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // 2-node components from pair i = (2i, 2i+1); every 5th pair also
    // links to the next pair -> 4-node diameter-3 chains. Edge count =
    // 1.2n. cache+count so graph construction never rides the timing.
    def graph(n: Long): DataFrame = {
      val base = spark.range(n)
        .select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
      val chain = spark.range(n / 5)
        .select((col("id") * 10 + 1).as("id_a"), (col("id") * 10 + 2).as("id_b"))
      base.union(chain)
    }
    def run(pairs: DataFrame, label: String, nEdges: Long): Unit = {
      val p = pairs.cache(); p.count()
      val tDriver = time {
        graft.datax.Dedup.dupClusters(p, driverMaxPairs = Long.MaxValue)
          .write.format("noop").mode("overwrite").save()
      }
      val tDist = time {
        graft.datax.Dedup.dupClusters(p, driverMaxPairs = 0L)
          .write.format("noop").mode("overwrite").save()
      }
      p.unpersist()
      println(f"""{"probe":"components_crossover","graph":"$label","edges":$nEdges,"driver_sec":$tDriver%.2f,"distributed_sec":$tDist%.2f,"driver_wins":${tDriver < tDist}}""")
    }

    // warm both code paths once (codegen/JIT) before any timed run
    run(graph(10000L), "warmup", 12000L)

    val sizes = sys.env.getOrElse("SPARK_GRAFT_SIZES",
      "10000,100000,1000000,3000000,10000000")
      .split(",").map(_.trim.toLong)
    sizes.foreach { n => run(graph(n), "synthetic", n + n / 5) }

    sys.env.get("SPARK_GRAFT_SCALE_DIR")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists()).foreach { d =>
        val docs = Tables.load(spark, d, "documents")
        val pairs = graft.datax.Dedup.minhashNearDups(
          docs, "doc_id", "text", 4, 16, 8, 0.3)
        val mat = pairs.select("id_a", "id_b").cache()
        val n = mat.count()
        graft.datax.Dedup.releaseShingleCaches()
        run(mat, "corpus30x", n)
        mat.unpersist()
      }
    spark.stop()
  }
}
