package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Property-based invariants for the event-time window family
  * (PropertiesSpec pattern: seeded generators, ONE DataFrame per
  * property, brute-force Scala references). These are the operators
  * whose correctness rests on frame-boundary arithmetic — exactly where
  * the r8 NTZ drift bit — so each is pinned against an independent
  * reimplementation on randomized streams with microsecond timestamps,
  * duplicate timestamps, and single-event users. */
class WindowPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val baseMicros = 1767225600000000L // 2026-01-01 00:00:00 UTC

  private def tsOf(micros: Long): Timestamp = {
    val t = new Timestamp(micros / 1000)
    t.setNanos(((micros % 1000000L) * 1000L).toInt)
    t
  }

  // (event_id, userId, micros-offset) — offsets span ~6 h with micro
  // precision plus frequent EXACT collisions (gap 0) and exact-boundary
  // gaps (whole minutes), the two tie cases windows must handle
  private val genEvent: Gen[(Long, Long, Long)] = for {
    user <- Gen.choose(1L, 5L)
    kind <- Gen.frequency(
      (3, Gen.choose(0L, 6L * 3600 * 1000000L)),            // arbitrary micros
      (1, Gen.choose(0L, 360L).map(_ * 60L * 1000000L)))    // whole minutes
  } yield (0L, user, kind)

  private def events(n: Int, seed: Long): Seq[(Long, Timestamp, Long, Double)] =
    (0 until n).map { i =>
      val (_, u, off) = genEvent(Gen.Parameters.default, Seed(seed + i)).get
      (i.toLong, tsOf(baseMicros + off), u, (i % 7).toDouble)
    }

  private def df(rows: Seq[(Long, Timestamp, Long, Double)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "value")

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  test("sessionize == brute-force gaps-and-islands on random streams") {
    val rows = events(300, seed = 11L)
    val got = StreamOps.sessionize(df(rows), gapMinutes = 30)
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, String, String, Long)].collect().toSeq.sorted
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expect = rows.groupBy(_._3).toSeq.flatMap { case (user, es) =>
      // floor-seconds gap, matching the oracle's date_diff('second')
      val sorted = es.map(e => micros(e._2)).sorted
      val sessions = sorted.foldLeft(List.empty[List[Long]]) { (acc, m) =>
        acc match {
          case cur :: rest if m / 1000000L - cur.head / 1000000L <= 30L * 60 =>
            (m :: cur) :: rest // cur is reverse-ordered; head = latest
          case _ => List(m) :: acc
        }
      }.reverse
      sessions.zipWithIndex.map { case (ms, i) =>
        (user, (i + 1).toLong, fmt.format(new java.util.Date(ms.min / 1000)),
          fmt.format(new java.util.Date(ms.max / 1000)), ms.size.toLong)
      }
    }.sorted
    assert(got == expect)
  }

  test("trailingStats == brute-force closed-range scan on random streams") {
    val rows = events(300, seed = 23L)
    val got = StreamOps.trailingStats(df(rows), minutes = 30)
      .select("event_id", "n_trailing", "max_value_trailing")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val horizon = 30L * 60 * 1000000L
    val byUser = rows.groupBy(_._3)
    val expect = rows.map { e =>
      val m = micros(e._2)
      val in = byUser(e._3).filter(o => micros(o._2) >= m - horizon && micros(o._2) <= m)
      (e._1, in.size.toLong, in.map(_._4).max)
    }.sortBy(_._1)
    assert(got == expect)
  }

  test("tumblingStats/slidingCounts == brute-force bucket math on random streams") {
    val rows = events(300, seed = 71L)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val typed = rows.map(e => (e._1, e._2, e._3, if (e._3 % 2 == 0) "view" else "click", e._4))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val hourUs = 3600L * 1000000L
    def bucket(m: Long, width: Long): Long = m - java.lang.Math.floorMod(m, width)
    // tumbling: one bucket per event, count/min/max per (bucket, type)
    val gotT = StreamOps.tumblingStats(typed)
      .select("window_start", "event_type", "n_events", "min_value", "max_value")
      .as[(String, String, Long, Double, Double)].collect().toSeq.sorted
    val expT = rows.map(e => (e._1, e._2, e._3, if (e._3 % 2 == 0) "view" else "click", e._4))
      .groupBy(e => (bucket(micros(e._2), hourUs), e._4)).toSeq
      .map { case ((b, ty), es) =>
        (fmt.format(new java.util.Date(b / 1000)), ty, es.size.toLong,
          es.map(_._5).min, es.map(_._5).max)
      }.sorted
    assert(gotT == expT)
    // sliding (1h window, 30m slide): each event lands in the 2 windows
    // whose [start, start+1h) covers it, starts on the 30m grid
    val slideUs = 1800L * 1000000L
    val gotS = StreamOps.slidingCounts(typed)
      .select("window_start", "event_type", "n_events")
      .as[(String, String, Long)].collect().toSeq.sorted
    val expS = rows.map(e => (e._1, e._2, e._3, if (e._3 % 2 == 0) "view" else "click", e._4))
      .flatMap { e =>
        val m = micros(e._2)
        val lastStart = bucket(m, slideUs)
        Seq(lastStart - slideUs, lastStart).filter(s => m < s + hourUs)
          .map(s => (s, e._4))
      }
      .groupBy(identity).toSeq
      .map { case ((s, ty), hits) =>
        (fmt.format(new java.util.Date(s / 1000)), ty, hits.size.toLong)
      }.sorted
    assert(gotS == expS)
  }

  test("intervalJoin == brute-force range scan on random streams") {
    val vrows = events(150, seed = 83L)
    val crows = events(150, seed = 97L)
    val views = vrows.toDF("event_id", "ts", "user_id", "value")
    val clicks = crows.map(e => (e._1 + 10000L, e._2, e._3, e._4))
      .toDF("event_id", "ts", "user_id", "value")
    val got = StreamOps.intervalJoin(views, clicks, withinMinutes = 30)
      .select("view_id", "click_id")
      .as[(Long, Long)].collect().toSeq.sorted
    val horizon = 30L * 60 * 1000000L
    val byUser = vrows.groupBy(_._3)
    val expect = crows.flatMap { c =>
      val m = micros(c._2)
      byUser.getOrElse(c._3, Seq.empty)
        .filter(v => micros(v._2) <= m && micros(v._2) >= m - horizon)
        .map(v => (v._1, c._1 + 10000L))
    }.sorted
    assert(got == expect)
  }

  test("asofJoin == brute-force latest-at-or-before on random streams") {
    val lrows = events(200, seed = 37L)
    // rights unique per (key, ts) — the operator's documented
    // precondition ("the" as-of row is undefined otherwise)
    val rrows = events(200, seed = 53L)
      .groupBy(e => (e._3, micros(e._2))).map(_._2.maxBy(_._1)).toSeq
    val left = lrows.toDF("left_id", "ts", "user_id", "value")
      .select($"user_id", $"left_id", $"ts")
    val right = rrows.toDF("right_id", "ts", "user_id", "value")
      .select($"user_id", $"right_id", $"ts")
    val got = StreamOps.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Map("right_id" -> "right_id"))
      .select("left_id", "right_id")
      .as[(Long, Option[Long])].collect().toSeq.sortBy(_._1)
    val byUser = rrows.groupBy(_._3)
    val expect = lrows.map { l =>
      val m = micros(l._2)
      val best = byUser.getOrElse(l._3, Seq.empty)
        .filter(r => micros(r._2) <= m)
        .sortBy(r => micros(r._2)).lastOption
      (l._1, best.map(_._1))
    }.sortBy(_._1)
    assert(got == expect)
  }
}
