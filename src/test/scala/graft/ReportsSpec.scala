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

  test("reportStats: FALSY reasons (null, '') stay in the total but leave the " +
       "histogram — and never crash the map build") {
    // reference reports.py:29,37: `$sum: 1` counts every report, the
    // Python Counter filter `[r for r in reasons if r]` drops falsy
    // reasons from the histogram. Review finding: the unfiltered
    // collect_list fed a NULL map key into map_from_entries, crashing
    // the job on the first null-reason report.
    val reports = Seq(
      (1L, "/a.jpg", "image", Some("spam")),
      (1L, "/a.jpg", "image", None),
      (1L, "/a.jpg", "image", Some("")),
      (1L, "/a.jpg", "image", Some("spam")))
      .toDF("movie_id", "frame_path", "content_type", "reason")
    val r = Reports.reportStats(reports).head()
    assert(r.getAs[Long]("count") == 4L, "falsy reasons still count")
    assert(r.getAs[Map[String, Long]]("reasons") == Map("spam" -> 2L),
      "falsy reasons leave the histogram")
    val flat = Reports.reportStatsFlat(reports).collect()
    assert(flat.map(_.getString(3)).toSeq == Seq("spam"),
      "flat rows carry only truthy reasons")
    assert(flat.head.getAs[Long]("n") == 2L && flat.head.getAs[Long]("count") == 4L,
      "flat total spans ALL reports of the group, falsy included")
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
