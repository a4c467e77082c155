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
  *  - offline (`path=`): `latestOffset` is the highest `page-<n>.json`
  *    present, so dropping new page files into the feed directory IS
  *    the arrival of new data; missing page numbers are skipped.
  *  - live (`url=`): the window is `startPage .. startPage+maxPages-1`
  *    (bounded, as in batch); a scheduler re-running with a grown
  *    `maxPages` continues from the checkpointed page — the monthly
  *    refresh loop with engine-owned resume.
  *
  * A failed-then-restarted query replans the uncommitted batch from the
  * checkpoint: pages re-fetch (at-least-once) and the idempotent merge
  * downstream (ST2) makes the effect exactly-once — the same contract
  * as the reference's cursor + upsert pair. */
class PagedMicroBatchStream(options: Map[String, String]) extends MicroBatchStream {
  private val start = options.getOrElse("startPage", "1").toInt

  override def initialOffset(): Offset = PageOffset(start - 1L)

  override def latestOffset(): Offset = options.get("url") match {
    case Some(_) =>
      val maxPages = options.getOrElse("maxPages", Int.MaxValue.toString).toInt
      require(maxPages != Int.MaxValue,
        "live (url=) streaming requires maxPages: the page window is the stream's bound")
      PageOffset(math.min(start.toLong + maxPages.toLong, Int.MaxValue.toLong) - 1L)
    case None =>
      PagedSource.pageFiles(options("path")).lastOption
        .map(f => PageOffset(f._1.toLong)).getOrElse(PageOffset(start - 1L))
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
