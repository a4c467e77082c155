package graft

import org.apache.spark.sql.functions._

/** Scale probe for the kmeans|| seeding path at quality-quantizer K
  * (round 18): the r17 cut composed one literal squared-L2 fold PER
  * CURRENT CENTER in a single expression — at the `centroidsFor`
  * clamp that is the Janino-blowup growth pattern r5 already hit at
  * the 64-table BandSignatures clamp, so the "full-scale quality
  * seeding" billing was fixture-scale only. The rewrite rides the
  * centers as broadcast DATA (crossJoin + min aggregation — plan size
  * O(1) in |centers|); this probe drives a K >= 1024 seed derivation
  * with `spark.sql.codegen.fallback=false`, so ANY codegen failure is
  * fatal rather than silently interpreted — the run completing IS the
  * no-fallback assertion, and the wall is recorded in SCALE.md.
  *
  * Env: SPARK_GRAFT_CENTROIDS (default 1024), SPARK_GRAFT_ROWS
  * (default 65536), SPARK_GRAFT_DIM (default 64), SPARK_GRAFT_CPUS
  * (default 8). */
object SeedScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_CENTROIDS", "1024").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "65536").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_DIM", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.fallback", "false") // Janino failure = fatal
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic small-integer corpus (no RNG: entries are a pure
    // function of (id, dim) — clustered enough that the cost-chasing
    // rounds have structure to find, exact sums like the spec fixtures)
    val corpus = spark.range(rows).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => pmod(col("id") * lit(31) + i.cast("long") * lit(17), lit(13))
          .cast("float")).as("embedding"))
      .localCheckpoint(eager = true)

    val t0 = System.nanoTime()
    val seeds = graft.datax.Similarity
      .ivfSeedsKMeansParallel(corpus, nCentroids = k, rounds = 2)
    val n = seeds.count()
    val seedSec = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"seed_scale","k":$k,"rows":$rows,"dim":$dim,""" +
      s""""seeds":$n,""" +
      f""""seedSec":$seedSec%.2f,"codegenFallback":"disabled"}""")
    spark.stop()
  }
}
