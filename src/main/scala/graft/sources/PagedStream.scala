package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Streaming offset = the last page already ingested. The reference's
  * resumable cursor (ST1, `sync_cursors.page`) IS a streaming offset;
  * this face lets Structured Streaming own it — checkpointing, replay,
  * and exactly-once-per-page delivery come from the engine's WAL
  * instead of hand-rolled cursor writes. */
case class PageOffset(lastPage: Long) extends Offset {
  override def json(): String = lastPage.toString
}

/** Micro-batch face of the paged source: each trigger ingests the pages
  * that appeared since the committed offset — `(committed, latest]` —
  * one InputPartition per page through the SAME transports and ST4
  * retry envelope as the batch scan.
  *
  *  - offline (`path=`): `latestOffset` is the highest page of the
  *    CONTIGUOUS prefix `startPage..p` present on disk — dropping new
  *    page files into the feed directory is the arrival of new data. A
  *    paged feed is sequential, so a GAP means the producer hasn't
  *    finished writing the missing page yet: the stream waits at the
  *    gap rather than skipping it (a max-page offset would silently
  *    lose a page that became visible after a higher one — files are
  *    not ordered-visibility). A page file DELETED after commit is
  *    out of contract (the feed is append-only).
  *  - live (`url=`): the window is `startPage .. startPage+maxPages-1`
  *    (bounded, as in batch); a scheduler re-running with a grown
  *    `maxPages` continues from the checkpointed page — the monthly
  *    refresh loop with engine-owned resume.
  *
  * Both faces honor the same `startPage`/`maxPages` window options.
  *
  * A failed-then-restarted query replans the uncommitted batch from the
  * checkpoint: pages re-fetch (at-least-once) and the idempotent merge
  * downstream (ST2) makes the effect exactly-once — the same contract
  * as the reference's cursor + upsert pair. */
class PagedMicroBatchStream(options: Map[String, String]) extends MicroBatchStream {
  private val start = options.getOrElse("startPage", "1").toInt
  private val maxPages = options.getOrElse("maxPages", Int.MaxValue.toString).toInt
  /** Last page of the configured window (inclusive). */
  private def windowEnd: Long =
    math.min(start.toLong + maxPages.toLong, Int.MaxValue.toLong) - 1L

  override def initialOffset(): Offset = PageOffset(start - 1L)

  override def latestOffset(): Offset = options.get("url") match {
    case Some(_) =>
      require(maxPages != Int.MaxValue,
        "live (url=) streaming requires maxPages: the page window is the stream's bound")
      PageOffset(windowEnd)
    case None =>
      // contiguous prefix from startPage, capped by the window
      val present = PagedSource.pageFiles(options("path")).map(_._1).toSet
      var p = start.toLong
      while (p <= windowEnd && present.contains(p.toInt)) p += 1
      PageOffset(p - 1L)
  }

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val from = startOff.asInstanceOf[PageOffset].lastPage + 1
    val to = endOff.asInstanceOf[PageOffset].lastPage
    options.get("url") match {
      case Some(template) =>
        require(template.contains("{page}"),
          s"url template must contain the {page} placeholder: $template")
        (from to to).map(p =>
          PageInputPartition(p.toInt, template.replace("{page}", p.toString)): InputPartition)
          .toArray
      case None =>
        val files = PagedSource.pageFiles(options("path")).toMap
        (from to to).flatMap(p => files.get(p.toInt)
          .map(f => PageInputPartition(p.toInt, f): InputPartition)).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    PagedSource.readerFactory(options)

  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
