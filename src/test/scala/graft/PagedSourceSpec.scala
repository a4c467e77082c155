package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** DataSourceV2 paged-feed source: partition-per-page planning, cursor
  * window options, limit pushdown, malformed-field null handling. */
class PagedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFeed(pages: Int, perPage: Int): String = {
    val dir = Files.createTempDirectory("feed").toString
    var id = 0
    for (p <- 1 to pages) {
      val lines = (1 to perPage).map { _ =>
        id += 1
        if (id == 7) """{"title": "no id at all"}""" // poisoned record
        else s"""{"id": $id, "title": "Movie $id", "vote_count": ${1000 - id}, "popularity": ${id / 10.0}}"""
      }
      Files.write(Paths.get(dir, s"page-$p.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  test("reads all pages with page provenance; one partition per page") {
    val dir = writeFeed(pages = 5, perPage = 4)
    val df = spark.read.format("tmdb-pages").option("path", dir).load()
    assert(df.count() == 20)
    assert(df.select("_page").distinct().as[Int].collect().sorted.toSeq == (1 to 5))
    assert(df.rdd.getNumPartitions == 5)
    // poisoned record surfaces as null id (dead-letter filter's input)
    assert(df.filter($"id".isNull).select("title").as[String].head() == "no id at all")
  }

  test("cursor window: startPage/maxPages read only the resumable slice") {
    val dir = writeFeed(pages = 5, perPage = 4)
    val df = spark.read.format("tmdb-pages").option("path", dir)
      .option("startPage", 3).option("maxPages", 2).load()
    assert(df.select("_page").distinct().as[Int].collect().sorted.toSeq == Seq(3, 4))
  }

  test("limit pushdown plans only ceil(n/pageSize) pages") {
    val dir = writeFeed(pages = 5, perPage = 4)
    val df = spark.read.format("tmdb-pages").option("path", dir)
      .option("pageSize", 4).load().limit(6)
    assert(df.count() == 6)
    val planned = df.queryExecution.executedPlan.toString
    assert(planned.contains("limitPages=2"), s"scan description missing page cap:\n$planned")
  }
}
