package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Micro-batch face of the paged source: page numbers are streaming
  * offsets, the checkpoint is the resumable cursor (ST1), new page
  * files are new data. */
class PagedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writePages(dir: String, pages: Range, perPage: Int): Unit =
    for (p <- pages) {
      val lines = (1 to perPage).map { i =>
        val id = (p - 1) * perPage + i
        s"""{"id": $id, "title": "Movie $id", "vote_count": ${1000 - id}, "popularity": ${id / 10.0}}"""
      }
      Files.write(Paths.get(dir, s"page-$p.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }

  private def drain(feed: String, checkpoint: String, sink: String): Unit = {
    val q = spark.readStream.format("tmdb-pages").option("path", feed).load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("pages stream as micro-batches; the checkpoint is the resume cursor") {
    val root = Files.createTempDirectory("pagedstream").toString
    val (feed, ckpt, sink) = (s"$root/feed", s"$root/ckpt", s"$root/sink")
    Files.createDirectories(Paths.get(feed))

    writePages(feed, 1 to 3, perPage = 4)
    drain(feed, ckpt, sink)
    val first = spark.read.parquet(sink)
    assert(first.count() == 12)
    assert(first.select("_page").distinct().as[Int].collect().sorted.toSeq == (1 to 3))

    // two new pages arrive; a restarted query ingests ONLY those —
    // the engine-owned analogue of the reference's cursor resume
    writePages(feed, 4 to 5, perPage = 4)
    drain(feed, ckpt, sink)
    val all = spark.read.parquet(sink)
    assert(all.count() == 20, "second drain must not re-ingest pages 1-3")
    assert(all.select("_page").distinct().as[Int].collect().sorted.toSeq == (1 to 5))
    assert(all.select("id").as[Long].collect().sorted.toSeq == (1L to 20L),
      "each id exactly once across both drains")
  }

  test("a gap in page numbers stalls the stream instead of skipping the page") {
    val root = Files.createTempDirectory("pagedstream3").toString
    val (feed, ckpt, sink) = (s"$root/feed", s"$root/ckpt", s"$root/sink")
    Files.createDirectories(Paths.get(feed))
    // page 4 visible before page 3 (files are not ordered-visibility):
    // the offset must stop at the contiguous prefix 1..2
    writePages(feed, 1 to 2, perPage = 4)
    writePages(feed, 4 to 4, perPage = 4)
    drain(feed, ckpt, sink)
    assert(spark.read.parquet(sink).select("_page").distinct()
      .as[Int].collect().sorted.toSeq == Seq(1, 2),
      "page 4 must wait for page 3, not be ingested past the gap")
    // the missing page arrives -> the next drain ingests 3 AND 4
    writePages(feed, 3 to 3, perPage = 4)
    drain(feed, ckpt, sink)
    val all = spark.read.parquet(sink)
    assert(all.select("_page").distinct().as[Int].collect().sorted.toSeq == (1 to 4))
    assert(all.count() == 16, "no page ingested twice")
  }

  test("an empty feed yields no batches and a later drain picks up from page 0") {
    val root = Files.createTempDirectory("pagedstream2").toString
    val (feed, ckpt, sink) = (s"$root/feed", s"$root/ckpt", s"$root/sink")
    Files.createDirectories(Paths.get(feed))
    drain(feed, ckpt, sink) // nothing to ingest; must terminate cleanly
    writePages(feed, 1 to 2, perPage = 3)
    drain(feed, ckpt, sink)
    val rows = spark.read.option("basePath", sink).parquet(sink)
    assert(rows.count() == 6)
  }
}
