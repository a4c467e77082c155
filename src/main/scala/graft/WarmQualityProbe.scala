package graft

import org.apache.spark.sql.functions._

/** Warm-vs-cold maintenance QUALITY A/B (round 20 — the round-19
  * verdict's "equal quality is asserted, not measured"): on one corpus
  * split 90% base / 10% appended shard, builds a RECORDED quality
  * index (kmeans||-seeded IVF-PQ, Lloyd iterations >= 1 so the warm
  * path genuinely refines), clones it, and fires the SAME
  * staleness-driven maintenance rebuild twice — once `warmStart =
  * true` (Lloyd seeded from the current centroids), once cold (full
  * recorded kmeans|| construction replay) — then measures what the
  * knob's claim is actually about:
  *   - summed PQ encode error over the full corpus against each
  *     rebuild's stored codebook (the `pqIndexWriteAuto` chooser's own
  *     objective — lower is tighter quantization), and
  *   - probe recall@k of each rebuilt index vs the exact brute-force
  *     top-k over the same corpus (the serving-quality ground truth),
  *   - wall time of each fire (the knob's cost claim).
  * One JSON line out. Run at the fixture SF and again on a
  * [[ScaleData]] 10x embeddings dir for the scale row.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 8),
  * SPARK_GRAFT_QUERIES (default 32), SPARK_GRAFT_K (default 10),
  * SPARK_GRAFT_NPROBE (default 4), SPARK_GRAFT_CENTROIDS (default 16),
  * SPARK_GRAFT_LLOYD (default 2 — the recorded Lloyd count the warm
  * fire re-runs from the stored centroids), SPARK_GRAFT_RESIDUAL=1
  * (build the RESIDUAL record via pqIndexWriteResidual instead — the
  * layout whose codebook genuinely depends on the quantizer, so warm
  * vs cold can differ in encode error, not just recall; the raw
  * layout's codebook trains on raw vectors and is warm/cold-identical
  * by construction). */
object WarmQualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nQ = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "32").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "10").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "4").toInt
    val nC = sys.env.getOrElse("SPARK_GRAFT_CENTROIDS", "16").toInt
    val lloyd = sys.env.getOrElse("SPARK_GRAFT_LLOYD", "2").toInt
    val residual = sys.env.get("SPARK_GRAFT_RESIDUAL").contains("1")
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
    val base = emb.filter(col("vec_id") % 10 =!= 3)
    val shard = emb.filter(col("vec_id") % 10 === 3)
    val n = emb.count()
    val queries = emb.orderBy("vec_id").limit(nQ).cache()
    queries.count()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val conf = spark.sessionState.newHadoopConf()
    def clone(src: String, dst: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
      fs.listStatus(new org.apache.hadoop.fs.Path(src)).foreach { s =>
        org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
          new org.apache.hadoop.fs.Path(dst, s.getPath.getName), false, conf)
      }
    }
    val dirW = java.nio.file.Files.createTempDirectory("graft-warmq-w").toString
    val dirC = java.nio.file.Files.createTempDirectory("graft-warmq-c").toString
    val dirJit = java.nio.file.Files.createTempDirectory("graft-warmq-jit").toString
    try {
      def build(df: org.apache.spark.sql.DataFrame, d: String,
                k: Int): Unit =
        if (residual)
          datax.Similarity.pqIndexWriteResidual(df, d, k,
            kmeansIterations = lloyd)
        else
          datax.Similarity.pqIndexWriteKMeansParallel(df, d, k,
            iterations = lloyd)
      // JIT/codegen warmup outside the timed sections
      val warmup = emb.orderBy("vec_id").limit(256).cache()
      build(warmup, dirJit, 8)
      datax.Similarity.ivfIndexMaintain(spark, dirJit, warmup,
        maxStaleness = 0.0, warmStart = true)
      warmup.unpersist()
      // the recorded quality build + the shard append (staleness ~ 1/9)
      build(base, dirW, nC)
      datax.Similarity.pqIndexAppend(spark, dirW, shard)
      clone(dirW, dirC)
      val (mW, tWarm) = timed {
        datax.Similarity.ivfIndexMaintain(spark, dirW, emb,
          maxStaleness = 0.1, warmStart = true)
      }
      val (mC, tCold) = timed {
        datax.Similarity.ivfIndexMaintain(spark, dirC, emb,
          maxStaleness = 0.1, warmStart = false)
      }
      require(mW.rebuilt && mC.rebuilt && !mW.warmFellBack,
        s"both staleness fires must rebuild (warm=$mW cold=$mC)")
      // the chooser's own objective, against each index's OWN stored
      // geometry: raw layouts quantize raw vectors; residual layouts
      // quantize `vec - assigned centroid` (their codebook trained on
      // residuals — scoring it on raw vectors would be the wrong metric)
      def errOf(d: String): Double = {
        val book = spark.read.parquet(
          datax.Similarity.sidecarPath(spark, d, "pq_codebook.parquet"))
        if (residual) {
          val cents = spark.read.parquet(
              datax.Similarity.sidecarPath(spark, d, "centroids.parquet"))
            .localCheckpoint(eager = true)
          datax.Similarity.encodeErrorSum(
            datax.Similarity.residualRows(emb, cents, "vec_id", "embedding"),
            book, "vec")
        } else datax.Similarity.encodeErrorSum(emb, book, "embedding")
      }
      val exact = datax.Similarity.bruteForceTopK(emb, queries, k)
        .select(col("query_id"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(d: String): Double = {
        val got = datax.Similarity.ivfPqTopK(spark, d, queries, k, nProbe)
          .select(col("query_id"), col("id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got intersect exact).size.toDouble / exact.size
      }
      val (errW, errC) = (errOf(dirW), errOf(dirC))
      // a degenerate corpus can reconstruct exactly (errC == 0); emit a
      // JSON-parseable null rather than a bare NaN/Infinity token
      val errRatio =
        if (errC > 0) f"${errW / errC}%.4f" else "null"
      val (recW, recC) = (recallOf(dirW), recallOf(dirC))
      println(
        s"""{"metric":"warm_quality","n":$n,"residual":$residual,""" +
        s""""centroids":$nC,"lloyd":$lloyd,""" +
        s""""k":$k,"nprobe":$nProbe,"t_warm_sec":${f"$tWarm%.2f"},""" +
        s""""t_cold_sec":${f"$tCold%.2f"},"encode_err_warm":${f"$errW%.4f"},""" +
        s""""encode_err_cold":${f"$errC%.4f"},""" +
        s""""err_ratio_warm_over_cold":$errRatio,""" +
        s""""recall_warm":${f"$recW%.4f"},"recall_cold":${f"$recC%.4f"},""" +
        s""""sf":"$sfDir"}""")
    } finally {
      Seq(dirW, dirC, dirJit).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).delete(p, true)
      }
      spark.stop()
    }
  }
}
