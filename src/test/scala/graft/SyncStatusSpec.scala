package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MetaSync

/** ST6 — the /sync/status composition: top-votes cursor, parsed year
  * cursors (malformed keys skipped), error windows, field defaulting. */
class SyncStatusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("composes top-votes + years + errors with reference defaulting") {
    val cursors = Seq(
      ("top_vote_count_movie", Some(12), Some(100L), Some(40L)),
      ("years:movie:1999", Some(3), None, Some(5L)), // missing inserted -> 0
      ("years:tv:2010", Some(1), Some(7L), Some(2L)),
      ("years:movie:abc", Some(9), Some(9L), Some(9L)), // malformed -> skipped
      ("unrelated_key", Some(1), Some(1L), Some(1L)))
      .toDF("key", "page", "inserted", "updated")
    val errors = Seq(
      ts("2026-01-01 11:30:00"), ts("2026-01-01 03:00:00"),
      ts("2025-12-25 00:00:00")).toDF("timestamp")

    val st = MetaSync.syncStatus(cursors, errors,
      lit(ts("2026-01-01 12:00:00")))

    val top = st.topVotes.collect()
    assert(top.length == 1)
    assert(top.head.getAs[Int]("page") == 12)

    val years = st.years
      .select("content_type", "year", "page", "inserted")
      .as[(String, Int, Int, Long)].collect().toSeq
    assert(years == Seq(("movie", 1999, 3, 0L), ("tv", 2010, 1, 7L)),
      "malformed and non-years keys skipped; missing fields default to 0")

    val e = st.errors.head()
    assert(e.getLong(0) == 1L && e.getLong(1) == 2L && e.getLong(2) == 3L)
  }
}
