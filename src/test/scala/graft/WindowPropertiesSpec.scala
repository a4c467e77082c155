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
