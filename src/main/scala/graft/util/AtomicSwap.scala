package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Local-FS stand-in for a transactional table commit (Iceberg/Delta
  * MERGE/OPTIMIZE commit): install a rewritten directory over a live
  * one such that a crash at ANY point leaves either the old or the new
  * table recoverable — never no table.
  *
  * Two-phase: park target at `<target>.old`, move the rewrite in, drop
  * the parked copy. The one crash window that leaves `target` missing
  * (between park and install) is healed by [[recover]], which readers
  * and re-runs call first. Plain `delete-then-move` (the previous
  * pattern in two call sites) had an unrecoverable window: after the
  * delete, the data existed only at the tmp path and a re-run saw an
  * empty table as success.
  *
  * NOT safe against CONCURRENT writers to `target` — single-writer
  * maintenance semantics, the plain-parquet contract (a lakehouse
  * handles this transactionally). */
object AtomicSwap {

  private def oldPath(target: Path): Path =
    target.resolveSibling(target.getFileName.toString + ".old")

  /** Install `tmp` at `target`. */
  def swapIn(tmp: Path, target: Path): Unit = {
    val old = oldPath(target)
    deleteRec(old) // stale park from an interrupted earlier swap
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target)
    deleteRec(old)
  }

  /** Heal the park-but-not-installed crash window: target missing with
    * a parked copy present -> restore the parked copy. Idempotent. */
  def recover(target: Path): Unit = {
    val old = oldPath(target)
    if (!Files.exists(target) && Files.exists(old))
      Files.move(old, target)
  }

  def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
