package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.merge.Upsert

/** ST2 — the streaming face of the merge engine: an incoming stream of
  * movie docs is merged into the catalog state exactly-once-in-effect via
  * `foreachBatch` + the idempotent batch MERGE (at-least-once delivery x
  * idempotent upsert = exactly-once effect, the reference's own contract;
  * reference: app/catalog/upsert.py:99-103).
  *
  * State lives in an in-memory exchangeable cell here (the test harness);
  * production swaps [[StateStore]] for an Iceberg/Delta table whose
  * MERGE INTO has the same plan shape. Checkpointing (ST1) is Structured
  * Streaming's own WAL; the batchId guard makes replayed batches no-ops.
  */
object StreamingUpsert {

  /** Minimal pluggable state: read current, commit merged. */
  trait StateStore {
    def read(): DataFrame
    def commit(merged: DataFrame, batchId: Long): Unit
    /** Highest batchId already applied (replay guard). */
    def lastCommitted: Long
  }

  /** Wire a streaming DataFrame of incoming docs into the merge. The
    * caller starts the returned writer (choosing trigger/checkpoint).
    *
    * `versionCol`: a micro-batch can carry several versions of one key;
    * the reference applies them sequentially so the LAST wins. The merge
    * is a keyed full-outer join — duplicate keys in would mean duplicate
    * rows out — so the batch is deduped first: keep-max of `versionCol`
    * (event time / feed position). Without a versionCol, intra-batch
    * duplicate keys FAIL the batch: silently picking an arbitrary row
    * would make the committed state run-order-dependent, breaking the
    * exactly-once-in-effect contract this file exists for. */
  def writer(incoming: DataFrame, store: StateStore,
             sortBy: Option[String],
             versionCol: Option[String] = None): DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > store.lastCommitted) { // replayed batch -> no-op
          val existing = store.read()
          val keys = Seq("id", "_type")
          import org.apache.spark.sql.functions.{col => c}
          // persisted: the guard count and the merge both read the batch,
          // and foreachBatch frames re-execute their source per action
          val b = batch.persist()
          try {
            val deduped = versionCol match {
              case Some(v) =>
                // keep-max resolves ORDERED versions. Fully-identical
                // rows are the benign artifact of at-least-once delivery
                // — collapse them first (committing one of N identical
                // rows is deterministic by definition). Only rows with
                // the same key, the SAME version value, and DIFFERENT
                // payloads have no defined winner: tie-breaking those
                // arbitrarily would make the committed state
                // run-order-dependent, the exact nondeterminism the None
                // branch fails loudly to prevent.
                val unique = b.dropDuplicates()
                val tied = unique.groupBy((keys :+ v).map(c): _*)
                  .count().filter(c("count") > 1).limit(1).count()
                require(tied == 0,
                  s"micro-batch carries duplicate (id, _type) keys with EQUAL " +
                    s"'$v' values but different payloads; no deterministic winner exists")
                graft.ops.FrameOps.dedupKeepMax(unique, keys, v, Nil)
              case None =>
                val dup = b.groupBy(keys.map(c): _*)
                  .count().filter(c("count") > 1)
                  .limit(1).count()
                require(dup == 0,
                  "micro-batch carries duplicate (id, _type) keys; pass " +
                    "versionCol to define which version wins")
                b
            }
            val incomingAligned = deduped.select(
              existing.columns.map(org.apache.spark.sql.functions.col): _*)
            val res = Upsert.mergeMovies(existing, incomingAligned, sortBy,
              now = org.apache.spark.sql.functions.current_timestamp())
            store.commit(res.merged, batchId)
          } finally { b.unpersist(); () }
        }
        ()
      }

  /** One-shot convenience: drain everything available, then stop. */
  def runAvailableNow(incoming: DataFrame, store: StateStore,
                      sortBy: Option[String], checkpointDir: String,
                      versionCol: Option[String] = None): Unit = {
    val q = writer(incoming, store, sortBy, versionCol)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
