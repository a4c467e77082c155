package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.datax.{Dedup, Similarity}

/** The VECTOR twin of [[DedupStream]] — the continuous-ingest dedup loop
  * for an embedding corpus: each micro-batch of new vectors is
  * deduplicated within itself and against the standing corpus INDEX
  * (banded hyperplane LSH + exact-cosine verify, the d10 family), and
  * the accepted survivors are appended to it. The corpus invariant "no
  * two vectors at cosine >= threshold where the later id survives" is
  * maintained forever without re-pairing corpus x corpus — the
  * embedding-shard shape of the 100 TB ingest pipeline (text twin:
  * [[DedupStream]], same index protocol).
  *
  * The index is TWO tables under one root, each partitioned by
  * micro-batch id (`batch=N` dirs — [[DedupStream]]'s exactly-once
  * protocol, verbatim: per-batch partition OVERWRITE + read-excluding
  * the current batch + the compaction epoch/marker commit):
  *   - `vecs`  — the surviving (id, vector) rows themselves;
  *   - `bands` — the (id, tbl, bucket, params) sidecar
  *     ([[Dedup.embeddingBandSignatures]]), so steady-state batches
  *     never recompute corpus-side signatures: the batch's bands join
  *     the STORED table ([[Dedup.embeddingNearDupsIncrementalPrebanded]]
  *     — corpus VECTORS re-enter only for the candidate-sized colliding
  *     slice), and the params column fails fast on (L, r, dim) drift.
  *
  * Dedup rule (the vector family's standing one, [[Similarity.semanticDedup]]'s):
  * of each near-dup pair the LARGER id drops — within the batch first
  * (pairs over the full batch), then any batch survivor pairing an
  * index survivor drops. No fingerprint side: an exact duplicate IS
  * cosine 1 and always shares every bucket with its twin.
  *
  * The SERVING index ([[Similarity.ivfIndexWrite]] / `pqIndexWrite`
  * layouts) is deliberately NOT written here: parquet append is not
  * replay-idempotent, so the serving increment composes downstream —
  * feed each batch's survivors (this loop's output is exactly the
  * deduplicated shard) to [[Similarity.ivfIndexAppend]] /
  * `pqIndexAppend` under the caller's own at-most-once discipline, and
  * re-quantize on the [[Similarity.ivfIndexStaleness]] /
  * `ivfIndexSkew` triggers.
  *
  * (tables, planesPerTable) have NO default (round-16 review finding):
  * LSH geometry must be sized for the EVENTUAL index, not a fixture —
  * derive it once via [[Dedup.bandsFor]](expected corpus size,
  * threshold) before wiring the stream (a too-small fixed geometry is
  * the d10a-class quadratic trap, and the first batch pins it into the
  * bands sidecar: later corrections fail the params check and need an
  * index rebuild). The default `maxBucketLoad` tripwire converts the
  * mistake into a fail-fast either way.
  */
object EmbedStream {

  /** Wire a streaming DataFrame of vectors into the index loop; the
    * caller starts the returned writer (trigger/checkpoint theirs). */
  def writer(incoming: DataFrame, indexRoot: String, idCol: String,
             vecCol: String, tables: Int, planesPerTable: Int,
             threshold: Double = 0.9,
             maxBucketLoad: Option[Long] = Some(1L << 20),
             validateDim: Option[Int] = None,
             onMalformed: String = "fail",
             quarantineDir: Option[String] = None): DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexRoot, idCol, vecCol, tables,
          planesPerTable, threshold, maxBucketLoad, validateDim,
          onMalformed, quarantineDir)
      }

  /** One micro-batch of the loop — public so the crash-replay contract
    * is directly testable (same contract as
    * [[DedupStream.processBatch]]: replaying a batchId rewrites its
    * partitions, never double-appends or self-dedups).
    *
    * `validateDim` (the [[Similarity.validEmbeddings]] entry contract
    * ON the drive, like [[DedupStream.processBatch]]'s `onMalformed`):
    * `Some(dim)` validates each batch first under `onMalformed`
    * ("fail" default — the vector family's loud posture; "quarantine"
    * dead-letters to `quarantineDir` with reasons, same replay caveat
    * as the text loop: the dead-letter append is at-least-once, dedup
    * it by id downstream); `None` skips validation — ONLY for callers
    * whose upstream already enforces the vector-space contract (a
    * null/ragged vector inside the LSH is undefined behavior, which is
    * why the default here is to validate loudly, not to pass through
    * silently like the null-safe text loop can afford). */
  def processBatch(batch: DataFrame, batchId: Long, indexRoot: String,
                   idCol: String, vecCol: String, tables: Int,
                   planesPerTable: Int, threshold: Double = 0.9,
                   maxBucketLoad: Option[Long] = Some(1L << 20),
                   validateDim: Option[Int] = None,
                   onMalformed: String = "fail",
                   quarantineDir: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val (vecsDir, bandsDir) = (s"$indexRoot/vecs", s"$indexRoot/bands")
    def priorOnly(dir: String): Option[DataFrame] =
      if (DedupStream.hasData(spark, dir))
        Some(DedupStream.visibleIndex(spark, dir)
          .filter(col("batch") =!= batchId))
      else None
    val raw = batch.persist()
    try {
      val b = validateDim match {
        case Some(dim) => Similarity.validEmbeddings(raw, vecCol, dim,
          onMalformed, quarantineDir)
        case None => raw
      }
      // WITHIN-batch: pairs over the full batch, larger id of each
      // pair drops (the semanticDedup rule; pairs are (id_a < id_b))
      val withinDrop = Dedup.embeddingNearDupsBanded(b, idCol, vecCol,
          tables, planesPerTable, threshold, maxOccupancy = None,
          metricSuffix = "ingest_within")
        .select(col("id_b").as(idCol))
      val withinSurvivors = b.join(withinDrop, Seq(idCol), "left_anti")
      // CROSS batch x index: survivors pairing any index row drop.
      // Steady-state: batch bands join the STORED sidecar; index
      // vectors re-enter only for the candidate-sized colliding slice.
      val survivors = (priorOnly(vecsDir) match {
        case Some(indexVecs) =>
          val crossDrop = (priorOnly(bandsDir) match {
            case Some(indexBands) =>
              Dedup.embeddingNearDupsIncrementalPrebanded(withinSurvivors,
                indexVecs.select(batch.columns.map(col): _*),
                indexBands, idCol, vecCol, tables, planesPerTable,
                threshold, maxBucketLoad, metricSuffix = "ingest_cross")
            case None => // bands table missing (manual surgery): direct
              Dedup.embeddingNearDupsIncremental(withinSurvivors,
                indexVecs.select(batch.columns.map(col): _*),
                idCol, vecCol, tables, planesPerTable, threshold,
                maxBucketLoad, metricSuffix = "ingest_cross")
          }).select(col("id_a").as(idCol)).distinct()
          withinSurvivors.join(crossDrop, Seq(idCol), "left_anti")
        case None => withinSurvivors // first batch: no index yet
      }).persist()
      try {
        // materialize before any partition overwrite (the DedupStream
        // cache-eviction rationale, verbatim)
        survivors.count()
        graft.util.Forked.awaitAll[Unit](spark)(Seq(
          () => survivors.write.mode("overwrite")
            .parquet(s"$vecsDir/batch=$batchId"),
          () => Dedup.embeddingBandSignatures(survivors, idCol, vecCol,
              tables, planesPerTable)
            .write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")))
        ()
      } finally { survivors.unpersist(); () }
    } finally { raw.unpersist(); () }
    ()
  }

  /** One-shot drain (the [[DedupStream.runAvailableNow]] face). */
  def runAvailableNow(incoming: DataFrame, indexRoot: String, idCol: String,
                      vecCol: String, checkpointDir: String,
                      tables: Int, planesPerTable: Int,
                      threshold: Double = 0.9,
                      maxBucketLoad: Option[Long] = Some(1L << 20),
                      validateDim: Option[Int] = None,
                      onMalformed: String = "fail",
                      quarantineDir: Option[String] = None,
                      onProgress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] => Unit =
                        _ => ()): Unit = {
    val trace = StreamOps.driveCollectingProgress(
      incoming.sparkSession.streams,
      writer(incoming, indexRoot, idCol, vecCol, tables, planesPerTable,
          threshold, maxBucketLoad, validateDim, onMalformed, quarantineDir)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start())
    onProgress(trace)
  }

  /** Batch-drive face (bench/verify entry + one-shot backfills): stream
    * the parquet files under `sourceDir` through the loop,
    * `maxFilesPerTrigger` per micro-batch, return the surviving index
    * vectors lineage-cut — the caller may delete `indexRoot` and
    * `checkpointDir` on return ([[DedupStream.ingestAvailableNow]]'s
    * contract, for vectors). */
  def ingestAvailableNow(spark: SparkSession, sourceDir: String,
                         indexRoot: String, checkpointDir: String,
                         idCol: String, vecCol: String,
                         tables: Int, planesPerTable: Int,
                         threshold: Double = 0.9,
                         maxFilesPerTrigger: Int = 1,
                         maxBucketLoad: Option[Long] = Some(1L << 20),
                         validateDim: Option[Int] = None,
                         onMalformed: String = "fail",
                         quarantineDir: Option[String] = None): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    runAvailableNow(incoming, indexRoot, idCol, vecCol, checkpointDir,
      tables, planesPerTable, threshold, maxBucketLoad, validateDim,
      onMalformed, quarantineDir)
    DedupStream.visibleIndex(spark, s"$indexRoot/vecs")
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .localCheckpoint(eager = true)
  }

  /** Retention: [[DedupStream.compactIndex]]'s epoch/marker protocol
    * over this loop's two tables. Same single-writer contract. */
  def compactIndex(spark: SparkSession, indexRoot: String,
                   keepLastBatches: Int = 1,
                   targetBytes: Long = 128L * 1024 * 1024): Option[Long] =
    DedupStream.compactIndexTables(spark, indexRoot, Seq("vecs", "bands"),
      keepLastBatches, targetBytes)

  /** Retention: drop the consolidated generation ([[DedupStream.expireIndex]]
    * over (vecs, bands)). */
  def expireIndex(spark: SparkSession, indexRoot: String): Option[Long] =
    DedupStream.expireIndexTables(spark, indexRoot, Seq("vecs", "bands"))
}
