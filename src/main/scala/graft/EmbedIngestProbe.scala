package graft

import org.apache.spark.sql.functions._

/** Scale probe for the EMBEDDING ingest loop (round 16): drives N
  * equal batches of a corpus through [[graft.streaming.EmbedStream]]
  * and prints per-batch wall + survivors — the claim under
  * measurement: per-batch cost stays near-flat as the index grows,
  * because the cross-batch step reads the STORED band sidecar (one
  * columnar scan of (id, tbl, bucket) rows, linear in index size but a
  * fraction of re-signing the vectors) and index VECTORS re-enter only
  * candidate-order. The text twin is IngestScaleProbe.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BATCHES (default 8),
  * SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_THRESHOLD (default 0.9),
  * SPARK_GRAFT_COMPACT_EVERY (0 = never — batches accumulate; N>0 runs
  * EmbedStream.compactIndex after every N batches, measuring the
  * small-file axis too), SPARK_GRAFT_SERVING (1 = wire `servingDir`:
  * batch 0 bootstraps a pqIndexWriteWith base over its survivors with
  * geometry sized from the FULL corpus, batches 1+ append through the
  * replay-idempotent batch face — measuring the round-17 serving
  * composition's per-batch overhead), SPARK_GRAFT_CONSOLIDATE_EVERY
  * (with SERVING: N>0 runs ivfIndexConsolidate every N batches),
  * SPARK_GRAFT_MAINTAIN (with SERVING: 1 polls ivfIndexMaintain after
  * every batch with the default thresholds — measuring the rebuild
  * cadence and cost the re-quantize rule actually produces under
  * continuous ingest), SPARK_GRAFT_QUALITY (with SERVING: "lloyd"
  * bootstraps the serving base through pqIndexWrite's quality knobs —
  * kmeansIterations=2, pqKmeansIterations=2 — so round 18's recorded
  * build quality makes every maintenance fire a LLOYD rebuild,
  * measuring what the quality replay costs per fire vs the stride
  * default; "kmeanspar" bootstraps through
  * pqIndexWriteKMeansParallel so each fire replays the full kmeans||
  * construction — the warm-start A/B cell; unset keeps the
  * given-geometry bootstrap),
  * SPARK_GRAFT_WARMSTART (with MAINTAIN: 1 passes warmStart=true to
  * the poll — each fire seeds Lloyd from the current centroids
  * instead of replaying the full recorded construction; the round-19
  * fire-cost A/B). */
object EmbedIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_THRESHOLD", "0.9").toDouble
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "0").toInt
    val serving = sys.env.getOrElse("SPARK_GRAFT_SERVING", "0") == "1"
    val consolidateEvery =
      sys.env.getOrElse("SPARK_GRAFT_CONSOLIDATE_EVERY", "0").toInt
    val maintain = sys.env.getOrElse("SPARK_GRAFT_MAINTAIN", "0") == "1"
    val quality = sys.env.getOrElse("SPARK_GRAFT_QUALITY", "")
    // round 19: SPARK_GRAFT_WARMSTART=1 seeds each maintenance fire's
    // Lloyd replay from the CURRENT centroids (ivfIndexMaintain's
    // warmStart knob) — the A/B against the full quality replay
    val warmStart = sys.env.getOrElse("SPARK_GRAFT_WARMSTART", "0") == "1"
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
    // (L, r) from the EVENTUAL index size — the production rule: derive
    // once for the corpus the index will grow into, store in the sidecar
    val (tables, r) = graft.datax.Dedup.bandsFor(n, threshold)
    val root = java.nio.file.Files.createTempDirectory("graft-embingest").toString
    try {
      val servingRoot = s"$root/serving"
      val fires = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      val idlePolls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val walls = (0 until nBatches).map { i =>
        val batch = emb.filter(pmod(col("vec_id"), lit(nBatches)) === i)
        val t0 = System.nanoTime()
        graft.streaming.EmbedStream.processBatch(batch, i.toLong,
          s"$root/index", "vec_id", "embedding", tables, r, threshold,
          servingDir = if (serving && i > 0) Some(servingRoot) else None)
        val w = (System.nanoTime() - t0) / 1e9
        if (serving && i == 0) {
          // bootstrap the serving base over the backfill survivors,
          // geometry sized from the FULL corpus (the production
          // stance); outside the timed window — a one-time build, not
          // per-batch cost. QUALITY mode instead routes through the
          // recorded quality knobs (geometry from the survivors — the
          // recorded faces derive their own), so maintenance fires
          // replay the Lloyd build
          val boot = graft.streaming.DedupStream
            .visibleIndex(spark, s"$root/index/vecs")
            .select("vec_id", "embedding")
          if (quality == "lloyd")
            graft.datax.Similarity.pqIndexWrite(boot, servingRoot,
              nCentroids = 64, kmeansIterations = 2, pqKmeansIterations = 2)
          else if (quality == "kmeanspar")
            // the cell where warm-start saves real work: the recorded
            // replay re-runs the kmeans|| SEED CONSTRUCTION (two
            // cost-chasing passes + weights + the greedy reduction)
            // before Lloyd; warm-start goes straight to Lloyd from the
            // current centroids
            graft.datax.Similarity.pqIndexWriteKMeansParallel(boot,
              servingRoot, nCentroids = 64, pqKmeansIterations = 2)
          else
            graft.datax.Similarity.pqIndexWriteWith(boot, servingRoot,
              graft.datax.Similarity.ivfIndex(emb, nCentroids = 64)._1,
              graft.datax.Similarity.pqCentroids(emb))
        }
        if (compactEvery > 0 && (i + 1) % compactEvery == 0)
          graft.streaming.EmbedStream.compactIndex(spark, s"$root/index")
        if (serving && consolidateEvery > 0 && (i + 1) % consolidateEvery == 0)
          graft.datax.Similarity.ivfIndexConsolidate(spark, servingRoot)
        if (serving && maintain && i > 0) {
          val t1 = System.nanoTime()
          val rep = graft.datax.Similarity.ivfIndexMaintain(spark,
            servingRoot,
            graft.streaming.DedupStream
              .visibleIndex(spark, s"$root/index/vecs")
              .select("vec_id", "embedding"),
            warmStart = warmStart)
          val mw = (System.nanoTime() - t1) / 1e9
          if (rep.rebuilt) fires += ((i, mw))
          else idlePolls += mw
        }
        w
      }
      val survivors = graft.streaming.DedupStream
        .visibleIndex(spark, s"$root/index/vecs").count()
      val staleness =
        if (serving)
          graft.datax.Similarity.ivfIndexStaleness(spark, servingRoot)
            .map(s => f"$s%.3f").getOrElse("null")
        else "null"
      println(s"""{"probe":"embed_ingest","sfDir":"$sfDir","n":$n,""" +
        s""""batches":$nBatches,"tables":$tables,"r":$r,""" +
        s""""compactEvery":$compactEvery,"serving":$serving,""" +
        s""""consolidateEvery":$consolidateEvery,"maintain":$maintain,""" +
        s""""quality":"$quality","warmStart":$warmStart,""" +
        s""""maintainFires":[${fires.map { case (b, w) =>
          f"""[$b,$w%.2f]""" }.mkString(",")}],""" +
        s""""idlePollSec":[${idlePolls.map(w => f"$w%.2f").mkString(",")}],""" +
        s""""servingStaleness":$staleness,"survivors":$survivors,""" +
        s""""perBatchSec":[${walls.map(w => f"$w%.2f").mkString(",")}]}""")
    } finally {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    spark.stop()
  }
}
