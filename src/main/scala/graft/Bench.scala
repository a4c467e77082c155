package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev knob for contention experiments; defaults to one partition per
    // core (AQE coalesces small shuffles below that anyway)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev loop: SPARK_GRAFT_ONLY=d05_x,d06_y restricts the run
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Per-query warm-up at the SAME SF immediately before the timed run:
    // Janino whole-stage-codegen + JIT + AQE-variant compile dominate
    // cold single-query runs (up to ~2-3s per heavy query; a small-SF
    // warmup never compiles the AQE plan variants of the timed SF).
    // These are one-time costs irrelevant at scale, so the steady-state
    // number is the honest one; the price is ~2x bench wall. Interleaved
    // per query, not a separate fleet pass — Spark's codegen cache holds
    // ~100 generated classes, so a fleet-wide pass self-evicts. Data
    // caches are CLEARED between warm and timed runs (below) so the
    // timed run re-executes the full pipeline.
    // SPARK_GRAFT_WARM_DIR overrides (empty disables).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    def warm(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      if (warmDir.nonEmpty)
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
    // Median-of-N timing: single-shot numbers on a contended box moved
    // sub-second queries 2-4x in both directions between rounds (SCALE.md
    // straggler-compounding measurement); the median of 3 post-warmup runs
    // is stable enough to make round-over-round deltas signal. Total is the
    // sum of per-query medians. SPARK_GRAFT_REPS overrides (1 = old mode).
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // ENVIRONMENT CANARY: a fixed synthetic pipeline (no table reads, one
    // shuffle, a couple of md5-heavy projections — enough to exercise
    // codegen compile + task dispatch, the two paths that stretch 10-50x
    // in this box's intermittent degraded windows; SCALE.md "bench
    // trustworthiness"). Timed before and after the suite; absolute query
    // numbers are only comparable across runs/rounds AFTER dividing out
    // canary drift. Median of 3, same as the queries.
    def canary(): Double = {
      import org.apache.spark.sql.functions._
      val ts = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        spark.range(2000000).toDF("id")
          .select(col("id"), md5(concat(lit(s"c$i:"), col("id").cast("string"))).as("h"))
          .groupBy(substring(col("h"), 1, 2).as("b"))
          .agg(count(lit(1)).as("n"), max("h").as("m"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val canaryStart = canary()
    val results = queries.map { case (name, fn) =>
      warm(name, fn)
      val times = (1 to reps).map { _ =>
        // drop any InMemoryRelations the previous run materialized (several
        // operators .cache() internally): at the same SF the timed plan is
        // canonically identical, so CacheManager would silently substitute
        // the cached subtree and the timed number would measure cache
        // hits, not the pipeline. releaseShingleCaches additionally clears
        // the dedup cache REGISTRY (clearCache unpersists the data but
        // would leave stale registry entries accumulating per rep)
        graft.datax.Dedup.releaseShingleCaches()
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime()
        // noop sink materializes every row/column (a bare count() would let
        // Catalyst prune the query down to a metadata scan)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        // a crashing query must not read as a (fast) pass: sentinel -1
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val good = times.filter(_ >= 0).sorted
      val median = if (good.isEmpty) -1.0 else good(good.size / 2)
      (name, median, good)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query [min, max] across the N runs — the spread the medians hide
    val spread = results.collect { case (k, _, g) if g.nonEmpty =>
      "\"" + k + "\":[" + g.min + "," + g.max + "]"
    }.mkString("{", ",", "}")
    // ANY failed rep marks the query failed — an intermittent crash must
    // not read as a healthy median computed from the surviving runs
    val failed = results.collect { case (k, _, g) if g.size < reps => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val canaryEnd = canary()
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"spread":$spread,"failed":$failed,"canary":[$canaryStart,$canaryEnd],"sf":"$sfDir"}"""
    println(json)
    // sbt decorates stdout ([info]/[success] lines), which can defeat a
    // line-oriented parse downstream — drop a clean copy next to the build
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
