package graft

import org.apache.spark.sql.functions._

/** Adjudication probe for the banded-LSH candidate load (round 14: the
  * 30x full-suite anchor measured d10b_embedding_neardups_banded_auto
  * at 29x wall for 3x data — far past the linear bound the auto form
  * exists to hold — and this probe decomposes WHY before any code
  * verdict: parameter growth (bandsFor clamped at maxTables inflates L
  * as n grows), bucket skew (sum occ^2 vs the uniform-occupancy
  * expectation), or verify-join volume (distinct candidates x exact
  * cosine).
  *
  * Prints one JSON line per stage:
  *   n, (tables, r), bucket stats per the hottest table (max/p99 occ),
  *   candidatePairRows (sum over buckets of C(occ,2) — the pre-distinct
  *   expansion volume), distinctCandidates, and wall seconds for
  *   signature+group vs verify.
  *
  * Env: SPARK_GRAFT_SF_DIR (a ScaleData output or testdata dir),
  * SPARK_GRAFT_THRESHOLD (default 0.4 — the d10b registry value),
  * SPARK_GRAFT_CPUS. */
object BandedLoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_THRESHOLD", "0.4").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .cache()
    val n = vecs.count()
    val (tables, r) = graft.datax.Dedup.bandsFor(n, threshold)
    val allPlanes: Seq[Seq[Seq[Double]]] = (0 until tables).map { tbl =>
      graft.datax.Dedup.planeSignsSeeded(tbl, r, 64).map(_.toSeq).toSeq
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }

    val bucketRows = vecs.select(col("id"),
      posexplode(graft.functions.BandSignatures.sigs(col("vec"), allPlanes))
        .as(Seq("tbl", "bucket")))
    val occ = bucketRows.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("occ")).filter(col("occ") > 1).cache()
    val (stats, tGroup) = timed {
      occ.agg(
        count(lit(1)).as("buckets"),
        max(col("occ")).as("maxOcc"),
        expr("approx_percentile(occ, 0.99)").as("p99Occ"),
        sum(col("occ") * (col("occ") - 1) / 2).as("pairRows")).head()
    }
    // the operator's real candidate set: distinct sorted in-bucket pairs
    val ids = bucketRows.groupBy("tbl", "bucket")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairCombos = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    val cand = ids.select(explode(pairCombos).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct().cache()
    val (nCand, tCand) = timed(cand.count())
    // verify volume: exact cosine over the distinct candidates
    val withN = vecs.select(col("id"), col("vec"),
      graft.datax.Similarity.norm(col("vec")).as("_n"))
    val (nPass, tVerify) = timed {
      cand
        .join(withN.select(col("id").as("id_a"), col("vec").as("vec_a"),
          col("_n").as("_na")), "id_a")
        .join(withN.select(col("id").as("id_b"), col("vec").as("vec_b"),
          col("_n").as("_nb")), "id_b")
        .filter(graft.datax.Similarity.dot(col("vec_a"), col("vec_b"))
          / (col("_na") * col("_nb")) >= threshold)
        .count()
    }
    println(s"""{"probe":"banded_load","sfDir":"$sfDir","n":$n,""" +
      s""""threshold":$threshold,"tables":$tables,"r":$r,""" +
      s""""buckets":${stats.getAs[Long]("buckets")},""" +
      s""""maxOcc":${stats.getAs[Long]("maxOcc")},""" +
      s""""p99Occ":${stats.getAs[Any]("p99Occ")},""" +
      s""""pairRows":${stats.getAs[java.math.BigDecimal]("pairRows")},""" +
      s""""distinctCandidates":$nCand,"verifiedPairs":$nPass,""" +
      f""""tGroup":$tGroup%.2f,"tCandidates":$tCand%.2f,"tVerify":$tVerify%.2f}""")
    spark.stop()
  }
}
