package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
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
  *
  * RETENTION: continuous ingest accumulates one `batch=N` partition per
  * micro-batch per table — thousands of small files at steady state.
  * [[compactIndex]] consolidates old batches without breaking the
  * replay contract (see its doc for the epoch/marker commit protocol).
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
    // own rows and vanish); visibleIndex additionally resolves the
    // compaction marker so consolidated epochs read consistently
    def priorOnly(dir: String): Option[DataFrame] =
      if (hasData(spark, dir))
        Some(visibleIndex(spark, dir).filter(col("batch") =!= batchId))
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
        // MATERIALIZE the persisted survivors before any index partition
        // is overwritten: the three writes below rewrite partitions that
        // survivors' own (lazy) plan reads from — under cache eviction a
        // recompute mid-overwrite would re-list those roots. The batch=N
        // exclusion filter prunes the partition being rewritten either
        // way (the backstop invariant), but an explicit count makes the
        // cache real before the first overwrite instead of relying on
        // the docs write to populate it.
        survivors.count()
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

  // ---- index retention / compaction ----------------------------------
  //
  // Epoch/marker protocol (a file-level stand-in for a lakehouse
  // snapshot commit, like AtomicSwap is for OPTIMIZE): batches
  // 0..cutoff consolidate into ONE partition dir named
  // `batch=-(cutoff+2)` (negative = never collides with a real batch
  // id; +2 keeps cutoff 0 away from -1 and reserves -1), and a tiny
  // `_compact_upto` marker file holds the committed cutoff. Readers
  // resolve visibility FROM THE MARKER: batch == -(cutoff+2) OR
  // batch > cutoff. The marker flip (an atomic rename) is the ONLY
  // commit point, which closes every crash window without parking:
  //   - crash while writing the consolidated dir: it is not yet
  //     visible (old marker), old partitions intact — re-run rewrites;
  //   - crash after the flip, before garbage collection: the old
  //     batch dirs and any previous epoch dir still exist but are
  //     INVISIBLE to readers — no duplicate rows (duplicates would
  //     corrupt the verify pass's shingle counts), no loss; the next
  //     compaction (or gcIndexTable) deletes them.
  // The replay contract survives because compaction never touches the
  // `keepLastBatches` highest batches: the only batch Structured
  // Streaming can replay is the in-flight (highest) one, whose
  // partition remains its own dir, and `batch =!= batchId` keeps
  // excluding it. Single-writer maintenance like ops/Compact: run it
  // from the ingest loop between batches, never concurrently with one.

  private val MarkerName = "_compact_upto" // "_" prefix: invisible to parquet reads

  /** Committed compaction cutoff of one index table, if any. */
  def compactedUpTo(dir: String): Option[Long] = {
    val p = java.nio.file.Paths.get(dir, MarkerName)
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  /** The committed row set of one index table: the consolidated epoch
    * partition plus every batch past the cutoff. Without a marker,
    * plain batch partitions only (negative dirs from an uncommitted
    * compaction attempt stay invisible). Public: this is the read face
    * downstream consumers of the index should use — a raw
    * `read.parquet(dir)` sees invisible dirs during the (crash-safe)
    * compaction windows. */
  def visibleIndex(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(dir)
    compactedUpTo(dir) match {
      case Some(c) => df.filter(col("batch") === lit(-(c + 2)) || col("batch") > c)
      case None    => df.filter(col("batch") >= 0)
    }
  }

  /** Consolidate all three index tables up to (highest batch −
    * `keepLastBatches`): per table, rewrite the visible rows at or
    * below the cutoff into one `coalesce`d epoch partition (sized like
    * [[graft.ops.Compact]] from current bytes), commit via the marker
    * flip, then GC the now-invisible dirs. Idempotent; crash-safe at
    * every step (protocol above); a no-op when nothing is old enough.
    * Returns the new cutoff, or None when nothing was compacted. */
  def compactIndex(spark: SparkSession, indexRoot: String,
                   keepLastBatches: Int = 1,
                   targetBytes: Long = 128L * 1024 * 1024): Option[Long] = {
    require(keepLastBatches >= 1,
      s"keepLastBatches=$keepLastBatches: the in-flight batch is replayable and must stay")
    Seq("docs", "bands", "fps").flatMap { t =>
      compactIndexTable(spark, s"$indexRoot/$t", keepLastBatches, targetBytes)
    }.headOption
  }

  private def batchDirs(dir: String): Seq[(java.nio.file.Path, Long)] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("batch="))
          scala.util.Try(n.stripPrefix("batch=").toLong).toOption.map(p -> _)
        else None
      }.toList
    } finally s.close()
  }

  /** Delete dirs made invisible by the committed marker (old batches at
    * or below the cutoff; stale epoch dirs from superseded or
    * uncommitted compactions). Safe any time: only invisible data. */
  def gcIndexTable(dir: String): Unit = {
    val keepEpoch = compactedUpTo(dir).map(c => -(c + 2))
    val cutoff = compactedUpTo(dir).getOrElse(-1L)
    batchDirs(dir).foreach { case (p, b) =>
      val stale = (b >= 0 && b <= cutoff) || (b < 0 && !keepEpoch.contains(b))
      if (stale) graft.util.AtomicSwap.deleteRec(p)
    }
  }

  private def compactIndexTable(spark: SparkSession, dir: String,
                                keepLastBatches: Int,
                                targetBytes: Long): Option[Long] = {
    gcIndexTable(dir) // heal leftovers from any crashed prior run
    val prev = compactedUpTo(dir)
    val real = batchDirs(dir).map(_._2).filter(_ >= 0)
    if (real.isEmpty) return None
    val cutoff = real.max - keepLastBatches
    val toFold = real.filter(_ <= cutoff)
    if (toFold.isEmpty) return None // nothing old enough
    // visible rows at or below the cutoff = previous epoch + old batches
    val folded = visibleIndex(spark, dir).filter(col("batch") <= cutoff)
      .drop("batch") // partition value lives in the dir name, not the files
    val bytes = toFold.map(b => dirBytes(s"$dir/batch=$b")).sum +
      prev.map(c => dirBytes(s"$dir/batch=${-(c + 2)}")).getOrElse(0L)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = java.nio.file.Paths.get(dir, "_compact_tmp") // "_": invisible
    graft.util.AtomicSwap.deleteRec(tmp) // stale rewrite from a crashed run
    folded.coalesce(nFiles).write.parquet(tmp.toString)
    val epoch = java.nio.file.Paths.get(dir, s"batch=${-(cutoff + 2)}")
    graft.util.AtomicSwap.deleteRec(epoch) // uncommitted partial attempt
    java.nio.file.Files.move(tmp, epoch)
    // COMMIT: atomic marker flip — readers switch epochs here
    val mtmp = java.nio.file.Paths.get(dir, MarkerName + ".tmp")
    java.nio.file.Files.write(mtmp, cutoff.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(mtmp, java.nio.file.Paths.get(dir, MarkerName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    gcIndexTable(dir) // old batches + superseded epoch are now invisible
    Some(cutoff)
  }

  private def dirBytes(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) return 0L
    val s = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f)).map(java.nio.file.Files.size).sum
    } finally s.close()
  }

  /** True when the table root holds at least one committed partition
    * with a parquet file (spark.read.parquet on a missing or empty dir
    * cannot infer a schema and fails instead of returning an empty
    * frame). Epoch dirs (batch=-K) count — after heavy compaction the
    * whole index may live in one. */
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(root) && Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "batch=*/*.parquet")))
      .exists(_.nonEmpty)
  }
}
