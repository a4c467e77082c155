package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction for append-heavy parquet tables — the
  * operational chore every incremental pipeline at scale needs: the
  * cursor log, dead-letter sink, and report streams here all APPEND one
  * small file per batch (by design — appends must not rewrite state),
  * so after 10k sync rounds a scan pays 10k file-open round-trips for
  * megabytes of data. Compaction rewrites the table into
  * ~`targetBytes`-sized files and swaps it in atomically (write-aside +
  * rename, the same commit pattern as [[graft.ingest.SyncJob]]'s state
  * swap; on a real lakehouse this is OPTIMIZE/rewrite_data_files).
  *
  * Sizing comes from the table's CURRENT on-disk bytes — the only
  * honest estimate that needs no sampling pass; `coalesce` (not
  * `repartition`) keeps the rewrite shuffle-free, at the cost of
  * accepting the existing row order. Readers of the swapped path see
  * the old files until the rename (POSIX) — same caveat as the state
  * swap, declared acceptable for the local-FS stand-in.
  */
object Compact {

  /** On-disk bytes + file count of a parquet dir (driver-side walk —
    * metadata only, never data). */
  def stats(path: String): (Long, Int) = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return (0L, 0)
    val files = Files.walk(p).filter(f =>
      f.toString.endsWith(".parquet") && Files.isRegularFile(f))
      .toArray.map(_.asInstanceOf[Path])
    (files.map(Files.size).sum, files.length)
  }

  /** Rewrite `path` into ceil(bytes/targetBytes) files if it currently
    * has more than that many (plus `slack`). Returns (filesBefore,
    * filesAfter); no-op when already compact. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              slack: Int = 4): (Int, Int) = {
    val (bytes, nFiles) = stats(path)
    if (nFiles == 0) return (0, 0)
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (nFiles <= targetFiles + slack) return (nFiles, nFiles)
    val df: DataFrame = spark.read.parquet(path)
    val tmp = path + ".compact"
    df.coalesce(targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = Paths.get(path)
    deleteRec(target)
    Files.move(Paths.get(tmp), target)
    (nFiles, stats(path)._2)
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
