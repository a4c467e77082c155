package graft

import org.apache.spark.sql.functions._

/** Scale probe for the PQ family (round 15): on one corpus, times
  * (a) the exact brute-force cosine top-k baseline, (b) the one-off PQ
  * build (codebook + encode), and (c) the ADC top-k probe over the
  * code table, and reports ADC's recall@k against the exact baseline.
  * The claim under measurement: the PROBE cost (the per-query,
  * every-batch cost at 100 TB) drops because ADC replaces 64-dim
  * float arithmetic per pair with 8 table lookups over a 32x-smaller
  * scan — while the build cost is paid once per index generation.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 8),
  * SPARK_GRAFT_QUERIES (default 16), SPARK_GRAFT_K (default 5). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nQ = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "16").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "5").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      .select("vec_id", "embedding")
    val n = emb.count()
    val queries = emb.orderBy("vec_id").limit(nQ).cache()
    queries.count()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (exactRows, tBrute) = timed {
      datax.Similarity.bruteForceTopK(emb, queries, k)
        .select("query_id", "id", "cosine", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3)))
    }
    val exact = exactRows.map(t => (t._1, t._2)).toSet
    // queries with a PLANTED partner (exact rank-1 cosine >= 0.9 — the
    // ScaleData planting level): where true signal exists, does ADC
    // find it? Separates quantization noise on near-orthogonal data
    // (rank-5 of cosine ~0.1 pairs is noise either way) from real
    // retrieval quality.
    val plantedTop1 = exactRows.filter(t => t._4 == 1 && t._3 >= 0.9)
      .map(t => (t._1, t._2)).toSet
    val ((book, codes), tBuild) = timed {
      val b = datax.Similarity.pqCentroids(emb)
      // the STORED shape (id, codes array) — what pqIndexWrite persists;
      // the probe pays zero per-call preparation against it
      val c = datax.Similarity.pqEncode(emb, b)
        .groupBy("id")
        .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
          x => x.getField("code")).as("codes"))
        .cache()
      c.count() // materialize: the build cost ends here
      (b, c)
    }
    val (approx, tProbe) = timed {
      datax.Similarity.pqTopK(book, codes, queries, k)
        .select("query_id", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = (exact & approx).size.toDouble / exact.size
    val plantedRecall =
      if (plantedTop1.isEmpty) -1.0
      else (plantedTop1 & approx).size.toDouble / plantedTop1.size
    println(s"""{"probe":"pq","sfDir":"$sfDir","n":$n,"queries":$nQ,"k":$k,""" +
      f""""tBruteSec":$tBrute%.2f,"tBuildSec":$tBuild%.2f,""" +
      f""""tProbeSec":$tProbe%.2f,"recall":$recall%.3f,""" +
      s""""planted":${plantedTop1.size},""" +
      f""""plantedRecall":$plantedRecall%.3f}""")
    spark.stop()
  }
}
