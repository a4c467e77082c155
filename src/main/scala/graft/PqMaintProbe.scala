package graft

import org.apache.spark.sql.functions._

/** Scale probe for the IVF-PQ maintenance family (round 16): on one
  * corpus split 90% base / 10% shard, times
  *   (a) the one-off base index build (`pqIndexWrite`),
  *   (b) the shard APPEND against the stored geometry (`pqIndexAppend`),
  *   (c) the full union REBUILD (`pqIndexWrite` over everything) — the
  *       only option before round 16,
  *   (d) the served probe over the appended index (`ivfPqTopK`), and
  *   (e) the exact-rerank probe (`ivfPqTopKReranked`, top-R=4k ADC
  *       candidates then exact cosine),
  * and reports rerank's recall lift over ADC-only against the exact
  * brute-force baseline. The claims under measurement: append cost
  * tracks the SHARD (not the corpus — the rebuild:append ratio should
  * approach corpus:shard as n grows), and the rerank adds only
  * candidate-sized work to the probe while recovering exact-cosine
  * ordering.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 8),
  * SPARK_GRAFT_QUERIES (default 16), SPARK_GRAFT_K (default 5),
  * SPARK_GRAFT_NPROBE (default 4). */
object PqMaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nQ = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "16").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "5").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "4").toInt
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
    // residue split, never residue 0 (the stride quantizer picks ids
    // divisible by stride): 90% base, 10% appended shard
    val base = emb.filter(col("vec_id") % 10 =!= 3)
    val shard = emb.filter(col("vec_id") % 10 === 3)
    val (nBase, nShard) = (base.count(), shard.count())
    val queries = emb.orderBy("vec_id").limit(nQ).cache()
    queries.count()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-pqmaint").toString
    val dirReb = java.nio.file.Files.createTempDirectory("graft-pqmaint-reb").toString
    val dirWarm = java.nio.file.Files.createTempDirectory("graft-pqmaint-w").toString
    try {
      // throwaway small build+append: codegen/JIT of the whole write
      // path compiles here, not inside the first timed section (at
      // fixture scale the first-call compile otherwise dominates and
      // inverts the base-write vs rebuild comparison)
      val warm = emb.orderBy("vec_id").limit(256).cache()
      datax.Similarity.pqIndexWrite(warm, dirWarm, nCentroids = 16)
      datax.Similarity.pqIndexAppend(spark, dirWarm,
        warm.filter(col("vec_id") % 2 === 0))
      warm.unpersist()
      val (_, tWriteBase) = timed {
        datax.Similarity.pqIndexWrite(base, dir, nCentroids = 16)
      }
      val (_, tAppend) = timed {
        datax.Similarity.pqIndexAppend(spark, dir, shard)
      }
      val (_, tRebuild) = timed {
        datax.Similarity.pqIndexWrite(emb, dirReb, nCentroids = 16)
      }
      val (exactRows, tBrute) = timed {
        datax.Similarity.bruteForceTopK(emb, queries, k)
          .select("query_id", "id", "cosine", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3)))
      }
      val exact = exactRows.map(t => (t._1, t._2)).toSet
      val plantedTop1 = exactRows.filter(t => t._4 == 1 && t._3 >= 0.9)
        .map(t => (t._1, t._2)).toSet
      val (adc, tProbe) = timed {
        datax.Similarity.ivfPqTopK(spark, dir, queries, k, nProbe)
          .select("query_id", "id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val (reranked, tRerank) = timed {
        datax.Similarity.ivfPqTopKReranked(spark, dir, queries, emb,
            k, rerank = math.max(4 * k, 20), nProbe)
          .select("query_id", "id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      def recOf(s: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
        if (truth.isEmpty) -1.0 else (truth & s).size.toDouble / truth.size
      val staleness = datax.Similarity.ivfIndexStaleness(spark, dir)
        .map(s => f"$s%.3f").getOrElse("null")
      val skew = datax.Similarity.ivfIndexSkew(spark, dir)
        .map(s => f"$s%.2f").getOrElse("null")
      println(s"""{"probe":"pq_maint","sfDir":"$sfDir","n":$n,""" +
        s""""nBase":$nBase,"nShard":$nShard,"queries":$nQ,"k":$k,"nProbe":$nProbe,""" +
        f""""tWriteBaseSec":$tWriteBase%.2f,"tAppendSec":$tAppend%.2f,""" +
        f""""tRebuildSec":$tRebuild%.2f,"tBruteSec":$tBrute%.2f,""" +
        f""""tProbeSec":$tProbe%.2f,"tRerankSec":$tRerank%.2f,""" +
        f""""recallAdc":${recOf(adc, exact)}%.3f,""" +
        f""""recallReranked":${recOf(reranked, exact)}%.3f,""" +
        s""""planted":${plantedTop1.size},""" +
        f""""plantedAdc":${recOf(adc, plantedTop1)}%.3f,""" +
        f""""plantedReranked":${recOf(reranked, plantedTop1)}%.3f,""" +
        s""""staleness":$staleness,"skew":$skew}""")
    } finally {
      Seq(dir, dirReb, dirWarm).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      }
    }
    spark.stop()
  }
}
