package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Reports

/** A1/A3 semantics the oracle's flat form can't cover: the MapType
  * reason histogram and the inclusive window boundaries. */
class ReportsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reportStats: count + reason histogram as a map column") {
    val reports = Seq(
      (1L, "/a.jpg", "image", "blurry"),
      (1L, "/a.jpg", "image", "blurry"),
      (1L, "/a.jpg", "image", "wrong_movie"),
      (2L, "/b.jpg", "image", "nsfw"))
      .toDF("movie_id", "frame_path", "content_type", "reason")
    val out = Reports.reportStats(reports)
      .orderBy("movie_id")
      .as[(Long, String, String, Long, Map[String, Long])].collect()
    assert(out.length == 2)
    assert(out(0)._4 == 3L)
    assert(out(0)._5 == Map("blurry" -> 2L, "wrong_movie" -> 1L))
    assert(out(1)._5 == Map("nsfw" -> 1L))
  }

  test("errorCounts: >= boundary is inclusive (Mongo $gte)") {
    def ts(s: String) = Timestamp.valueOf(s)
    val now = ts("2026-01-01 12:00:00")
    val errors = Seq(
      ts("2026-01-01 11:00:00"), // exactly now-1h -> in last hour ($gte)
      ts("2026-01-01 10:59:59"), // just outside the hour
      ts("2025-12-31 12:00:00"), // exactly now-24h -> in last day
      ts("2025-12-30 00:00:00")) // outside everything
      .toDF("timestamp")
    val r = Reports.errorCounts(errors, lit(now)).head()
    assert(r.getLong(0) == 1L) // errors_last_hour
    assert(r.getLong(1) == 3L) // errors_last_day
    assert(r.getLong(2) == 4L) // errors_total
  }
}
