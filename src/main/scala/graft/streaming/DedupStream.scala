package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.datax.Dedup

/** The STREAMING face of the incremental-dedup loop: each micro-batch of
  * new documents is deduplicated against the standing corpus INDEX, and
  * the accepted survivors are appended to it. Combined with
  * [[graft.datax.Dedup.dedupIncrement]]'s contract this maintains the
  * corpus invariant "no two near-duplicate documents" forever without
  * ever re-pairing corpus × corpus — the continuous-ingest shape a
  * 100 TB crawl pipeline actually runs.
  *
  * The index is THREE tables under one root, each partitioned by
  * micro-batch id (`batch=N` dirs):
  *   - `docs`  — the surviving documents themselves;
  *   - `bands` — the (id, band, bsig, params) table
  *     ([[Dedup.bandSignatures]]), so steady-state batches never
  *     recompute corpus-side MinHash signatures: the batch's bands join
  *     the STORED table, and corpus shingles are rebuilt only for the
  *     candidate-sized slice of colliding docs;
  *   - `fps`   — the (id, fp) fingerprint table, the exact-duplicate
  *     lookup (16 bytes/doc; sub-k docs have no bands, so exact
  *     collisions need their own side).
  *
  * EXACTLY-ONCE-IN-EFFECT without a transaction log: each batch
  * OVERWRITES its own `batch=N` partition in all three tables, and the
  * index is read EXCLUDING the current batch's partitions. A crash
  * between the three writes followed by Structured Streaming's replay
  * of the same batch therefore REWRITES the partial partitions instead
  * of double-appending (plain appends would duplicate docs) or
  * self-deduping against its own partial previous attempt (which would
  * silently drop the whole batch). At-least-once delivery × idempotent
  * per-batch overwrite = the ST2 contract, file-level. Redelivered ROWS
  * inside later batches are additionally dropped by the operator's own
  * rules (fingerprint/near-dup against the index) — pinned in
  * StreamingSpec. On a lakehouse the three writes become one
  * transaction and the partition dance is unnecessary but harmless.
  */
object DedupStream {

  /** Wire a streaming DataFrame of documents into the index loop. The
    * caller starts the returned writer (choosing trigger/checkpoint). */
  def writer(incoming: DataFrame, indexRoot: String, idCol: String,
             textCol: String, k: Int = 4, numHashes: Int = 16,
             bands: Int = 8, threshold: Double = 0.5): DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexRoot, idCol, textCol, k,
          numHashes, bands, threshold)
      }

  /** One micro-batch of the loop — public so the crash-replay contract
    * is directly testable: calling it again with the SAME batchId (the
    * replay case, including after a crash that left only some of the
    * three partitions written) rewrites that batch's partitions and
    * leaves the index exactly as a single clean run would. */
  def processBatch(batch: DataFrame, batchId: Long, indexRoot: String,
                   idCol: String, textCol: String, k: Int = 4,
                   numHashes: Int = 16, bands: Int = 8,
                   threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val (docsDir, bandsDir, fpsDir) =
      (s"$indexRoot/docs", s"$indexRoot/bands", s"$indexRoot/fps")
    // a partition possibly half-written by a crashed attempt of THIS
    // batch must not count as index (the batch would dedup against its
    // own rows and vanish)
    def priorOnly(dir: String): Option[DataFrame] =
      if (hasData(spark, dir))
        Some(spark.read.parquet(dir).filter(col("batch") =!= batchId))
      else None
    // the batch frame re-executes its source per action; the dedup
    // pipeline reads it several times
    val b = batch.persist()
    try {
      val survivors = (priorOnly(docsDir) match {
        case Some(index) =>
          Dedup.dedupIncrement(b,
            index.select(batch.columns.map(col): _*),
            idCol, textCol, k, numHashes, bands, threshold,
            indexBands = priorOnly(bandsDir),
            indexFps = priorOnly(fpsDir))
        case None => // first batch: the index does not exist yet
          Dedup.dedupCorpus(b, idCol, textCol, k, numHashes, bands,
            threshold)
      }).persist()
      try {
        survivors.write.mode("overwrite")
          .parquet(s"$docsDir/batch=$batchId")
        Dedup.bandSignatures(survivors, idCol, textCol, k, numHashes,
          bands).write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
        Dedup.fingerprintTable(survivors, idCol, textCol)
          .write.mode("overwrite").parquet(s"$fpsDir/batch=$batchId")
      } finally { survivors.unpersist(); () }
    } finally { b.unpersist(); () }
    ()
  }

  /** One-shot convenience: drain everything available, then stop. */
  def runAvailableNow(incoming: DataFrame, indexRoot: String, idCol: String,
                      textCol: String, checkpointDir: String, k: Int = 4,
                      numHashes: Int = 16, bands: Int = 8,
                      threshold: Double = 0.5): Unit = {
    val q = writer(incoming, indexRoot, idCol, textCol, k, numHashes, bands,
      threshold)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** True when the table root holds at least one batch partition with a
    * parquet file (spark.read.parquet on a missing or empty dir cannot
    * infer a schema and fails instead of returning an empty frame). */
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(root) && Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "batch=*/*.parquet")))
      .exists(_.nonEmpty)
  }
}
