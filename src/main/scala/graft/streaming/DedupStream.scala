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
  * The index is THREE tables under one root (parquet dirs here; a
  * lakehouse makes the three appends one transaction):
  *   - `docs`  — the surviving documents themselves;
  *   - `bands` — the (id, band, bsig) table ([[Dedup.bandSignatures]]),
  *     so steady-state batches never recompute corpus-side MinHash
  *     signatures: the batch's bands join the STORED table, and corpus
  *     shingles are rebuilt only for the candidate-sized slice of
  *     colliding docs;
  *   - `fps`   — the (id, fp) fingerprint table, the exact-duplicate
  *     lookup (16 bytes/doc; sub-k docs have no bands, so exact
  *     collisions need their own side).
  * Every append is batch-survivor-sized; per-batch corpus-side work is
  * one band join plus a semi-join fetch of touched docs' text.
  *
  * Replay-idempotent WITHOUT a batchId guard, by the operator's OWN
  * semantics: a redelivered batch's rows are either exact copies of docs
  * already appended (dropped by the fingerprint lookup), near-dups of
  * appended docs (dropped by the cross near-dup rule), or rows the
  * original processing dropped — which drop again for the original
  * reason. Pinned in StreamingSpec. Crash-BETWEEN-appends atomicity is
  * the lakehouse transaction's job, exactly as for the batch sinks
  * (SCALE.md).
  */
object DedupStream {

  /** Wire a streaming DataFrame of documents into the index loop. The
    * caller starts the returned writer (choosing trigger/checkpoint). */
  def writer(incoming: DataFrame, indexRoot: String, idCol: String,
             textCol: String, k: Int = 4, numHashes: Int = 16,
             bands: Int = 8, threshold: Double = 0.5): DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val (docsDir, bandsDir, fpsDir) =
          (s"$indexRoot/docs", s"$indexRoot/bands", s"$indexRoot/fps")
        // the batch frame re-executes its source per action; the dedup
        // pipeline reads it several times
        val b = batch.persist()
        try {
          val survivors = (if (hasData(spark, docsDir)) {
            val index = spark.read.parquet(docsDir)
              .select(batch.columns.map(col): _*)
            Dedup.dedupIncrement(b, index, idCol, textCol, k, numHashes,
              bands, threshold,
              indexBands = Some(spark.read.parquet(bandsDir)),
              indexFps = Some(spark.read.parquet(fpsDir)))
          } else { // first batch: the index does not exist yet
            Dedup.dedupCorpus(b, idCol, textCol, k, numHashes, bands,
              threshold)
          }).persist()
          try {
            survivors.write.mode("append").parquet(docsDir)
            Dedup.bandSignatures(survivors, idCol, textCol, k, numHashes,
              bands).write.mode("append").parquet(bandsDir)
            Dedup.fingerprintTable(survivors, idCol, textCol)
              .write.mode("append").parquet(fpsDir)
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

  /** True when the dir exists and holds at least one parquet file
    * (spark.read.parquet on a missing or empty dir cannot infer a
    * schema and fails instead of returning an empty frame). */
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(path) && fs.listStatus(path)
      .exists(_.getPath.getName.endsWith(".parquet"))
  }
}
