package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.datax.Dedup

/** The STREAMING face of the incremental-dedup loop: each micro-batch of
  * new documents is deduplicated against the standing corpus INDEX (a
  * parquet directory here; an Iceberg/Delta table in production — the
  * append below maps to a transactional table append), and the accepted
  * survivors are appended to that same index. Combined with
  * [[graft.datax.Dedup.dedupIncrement]]'s contract this maintains the
  * corpus invariant "no two near-duplicate documents" forever without
  * ever re-pairing corpus × corpus — the continuous-ingest shape a
  * 100 TB crawl pipeline actually runs.
  *
  * Replay-idempotent WITHOUT a batchId guard, by the operator's OWN
  * semantics: a redelivered batch's rows are either exact copies of docs
  * already appended (dropped by the cross fingerprint rule), near-dups
  * of appended docs (dropped by the cross near-dup rule), or rows the
  * original processing dropped — which drop again for the original
  * reason. Pinned in StreamingSpec. The non-transactional plain-dir
  * append is the harness stand-in; crash-DURING-append atomicity is the
  * lakehouse table's job, exactly as for the batch sinks (SCALE.md).
  */
object DedupStream {

  /** Wire a streaming DataFrame of documents into the index loop. The
    * caller starts the returned writer (choosing trigger/checkpoint). */
  def writer(incoming: DataFrame, indexDir: String, idCol: String,
             textCol: String, k: Int = 4, numHashes: Int = 16,
             bands: Int = 8, threshold: Double = 0.5): DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // the batch frame re-executes its source per action; the dedup
        // pipeline reads it several times
        val b = batch.persist()
        try {
          val survivors =
            if (indexHasData(spark, indexDir))
              Dedup.dedupIncrement(b, spark.read.parquet(indexDir)
                  .select(batch.columns.map(org.apache.spark.sql.functions.col): _*),
                idCol, textCol, k, numHashes, bands, threshold)
            else // first batch: the index does not exist yet
              Dedup.dedupCorpus(b, idCol, textCol, k, numHashes, bands,
                threshold)
          survivors.write.mode("append").parquet(indexDir)
        } finally { b.unpersist(); () }
        ()
      }

  /** One-shot convenience: drain everything available, then stop. */
  def runAvailableNow(incoming: DataFrame, indexDir: String, idCol: String,
                      textCol: String, checkpointDir: String, k: Int = 4,
                      numHashes: Int = 16, bands: Int = 8,
                      threshold: Double = 0.5): Unit = {
    val q = writer(incoming, indexDir, idCol, textCol, k, numHashes, bands,
      threshold)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** True when the index dir exists and holds at least one parquet file
    * (spark.read.parquet on a missing or empty dir cannot infer a
    * schema and fails instead of returning an empty frame). */
  private def indexHasData(spark: org.apache.spark.sql.SparkSession,
                           dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(path) && fs.listStatus(path)
      .exists(_.getPath.getName.endsWith(".parquet"))
  }
}
