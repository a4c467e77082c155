package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.SyncJob

/** A frame as fetched (images endpoint shape) — used by the JN3 tests. */
case class SyncFr(path: String, aspect_ratio: Option[Double],
    vote_average: Option[Double], width: Option[Int])

/** End-to-end sync simulation (SURVEY.md §3.2, ST1-ST3): resumable
  * cursor, dead-letter, inner/left enrichment joins, idempotent merge. */
class SyncJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 25 discover rows (5 pages of 5) sorted by vote_count desc =
  // ids 25..1; id=13 is poisoned (null id) -> dead-letter
  private def base = (1 to 25).map { i =>
    (if (i == 13) None else Some(i.toLong), "movie", s"Movie $i", i.toLong)
  }.toDF("id", "_type", "title", "vote_count")

  // details for all but id=7 (JN1 inner join drops it)
  private def details = (1 to 25).filter(_ != 7)
    .map(i => (i.toLong, s"C$i")).toDF("id", "country")

  // ru titles only for even ids (JN2 left join nulls the rest)
  private def ruTitles = (1 to 25).filter(_ % 2 == 0)
    .map(i => (i.toLong, s"RU $i")).toDF("id", "title_ru")

  private def template = Seq.empty[(Long, String, String, Long, String, String)]
    .toDF("id", "_type", "title", "vote_count", "country", "title_ru")

  test("two-batch resumable sync with dead-letter, then idempotent re-run") {
    val dir = Files.createTempDirectory("syncjob").toString
    val (st, cur, dl) = (s"$dir/state", s"$dir/cursors", s"$dir/dead")
    def round() = SyncJob.run(spark, base, details, ruTitles, template,
      st, cur, dl, cursorKey = "top_vote_count_movie",
      orderBy = Seq(col("vote_count").desc, col("id").asc),
      pageSize = 5, nPages = 2)

    // batch 1: pages 1-2 = ids 25..16 by vote_count desc
    val r1 = round()
    assert(r1.attempted == 10 && r1.deadLettered == 0)
    assert(r1.inserted == 10 && r1.updated == 0 && r1.lastPage == 2)

    // batch 2 resumes at page 3: ids 15..6; id=13 dead-letters, id=7
    // dropped by missing details
    val r2 = round()
    assert(r2.attempted == 10 && r2.deadLettered == 1)
    assert(r2.inserted == 8 && r2.updated == 0 && r2.lastPage == 4)

    val state = spark.read.parquet(st)
    assert(state.count() == 18)
    // enrichment joins applied: country everywhere, title_ru evens only
    assert(state.filter($"country".isNull).count() == 0)
    assert(state.filter($"title_ru".isNotNull).count() ==
      state.filter($"id" % 2 === 0).count())
    assert(state.filter($"id" === 13 || $"id" === 7).count() == 0)

    // dead-letter got the poisoned row with context
    val dead = spark.read.parquet(dl)
    assert(dead.count() == 1)
    assert(dead.select("endpoint").as[String].head() == "top_vote_count_movie")

    // explicit re-run of pages 3-4 (resume=false): idempotent — same
    // state, rows now classified update
    val r3 = SyncJob.run(spark, base, details, ruTitles, template,
      st, cur, dl, cursorKey = "top_vote_count_movie",
      orderBy = Seq(col("vote_count").desc, col("id").asc),
      pageSize = 5, nPages = 2, resume = false, startPage = Some(3))
    assert(r3.inserted == 0 && r3.updated == 8)
    assert(spark.read.parquet(st).count() == 18)

    // cursor log: latest wins, history preserved; totals are CUMULATIVE
    // across runs (reference: cur.get("inserted", 0) + inserted) — the
    // Report carries per-run counts, the cursor the running sum
    val c = SyncJob.CursorStore.get(spark, cur, "top_vote_count_movie").get
    assert(c.page == 4)
    assert(c.inserted == 18 && c.updated == 8,
      "cursor accumulates: 10+8 inserted across r1/r2, 8 updated in r3")
    assert(spark.read.parquet(cur).count() == 3)

    // (ST5 composition tests live in their own test below)

    // an explicit startPage OVERRIDES the resume position even with a
    // live cursor (sync_top.py:134: `start_page or (cur+1 if resume...)`)
    val rOverride = SyncJob.run(spark, base, details, ruTitles, template,
      st, cur, dl, cursorKey = "top_vote_count_movie",
      orderBy = Seq(col("vote_count").desc, col("id").asc),
      pageSize = 5, nPages = 2, resume = true, startPage = Some(3))
    assert(rOverride.lastPage == 4, "startPage must beat the stored cursor")
    assert(rOverride.inserted == 0 && rOverride.updated == 8)

    // batch 3 resumes at page 5 (ids 5..1); batch 4 runs past the end:
    // empty page set, zero counters, state untouched, cursor advances
    val r4 = round()
    assert(r4.attempted == 5 && r4.inserted == 5) // page 5 = ids 5..1, page 6 empty
    val before = spark.read.parquet(st).count()
    val r5 = round()
    assert(r5.attempted == 0 && r5.inserted == 0 && r5.updated == 0)
    assert(spark.read.parquet(st).count() == before)
    val c5 = SyncJob.CursorStore.get(spark, cur, "top_vote_count_movie").get
    assert(c5.page == 8)
    assert(c5.inserted == 23 && c5.updated == 16,
      "an empty batch advances the page but leaves the totals intact " +
        "(updated: 8 from r3 + 8 from the override run)")
  }

  test("category sync drops frameless items; top sync keeps them (JN3 variants)") {
    import org.apache.spark.sql.functions.typedLit
    // frames only for even ids; odd ids' lookup returns empty
    val frames = (1 to 25).map { i =>
      (i.toLong,
        if (i % 2 == 0) Seq(SyncFr(s"/f$i.jpg", Some(1.8), Some(5.0), Some(100)))
        else Seq.empty[SyncFr])
    }.toDF("id", "frames")
    val tmpl = template.withColumn("frames",
      typedLit(Seq.empty[SyncFr])).limit(0)
    def go(dir: String, require: Boolean) = SyncJob.run(spark, base, details,
      ruTitles, tmpl, s"$dir/state", s"$dir/cursors", s"$dir/dead",
      cursorKey = "cat", orderBy = Seq(col("vote_count").desc, col("id").asc),
      pageSize = 5, nPages = 1, frames = Some(frames), requireFrames = require)

    val d1 = Files.createTempDirectory("synccat").toString
    val r1 = go(d1, require = true) // page 1 = ids 25..21; evens: 24, 22
    assert(r1.attempted == 5, "attempted counts FETCHED items (reference quirk)")
    assert(r1.inserted == 2, "frameless items skipped in category mode")
    assert(spark.read.parquet(s"$d1/state").count() == 2)

    val d2 = Files.createTempDirectory("synctop").toString
    val r2 = go(d2, require = false)
    assert(r2.inserted == 5, "top/years mode keeps empty-frames items")
  }

  test("ST5 composed jobs: year-range sync, monthly refresh, finalize (main.py:209-223)") {
    // 30 items across three years; popularity inverts vote_count so the
    // two scheduled sort orders are distinguishable
    val yBase = (1 to 30).map { i =>
      val year = 2022 + (i - 1) / 10 // 1-10 -> 2022, 11-20 -> 2023, 21-30 -> 2024
      (Some(i.toLong), "movie", s"Movie $i", i.toLong, (31 - i).toDouble, year)
    }.toDF("id", "_type", "title", "vote_count", "popularity", "year")
    val yDetails = (1 to 30).map(i => (i.toLong, s"C$i")).toDF("id", "country")
    val yRu = Seq.empty[(Long, String)].toDF("id", "title_ru")
    val tmpl = Seq.empty[(Long, String, String, Long, String, String)]
      .toDF("id", "_type", "title", "vote_count", "country", "title_ru")
    val dir = Files.createTempDirectory("syncyears").toString
    val (st, cur, dl) = (s"$dir/state", s"$dir/cursors", s"$dir/dead")

    // range sync with an item budget: 2022 fully (10), then the limit
    // stops the range inside 2023 — 2024 must not start
    val rs = SyncJob.syncYears(spark, yBase, yDetails, yRu, tmpl, st, cur, dl,
      yearCol = $"year", startYear = 2022, endYear = 2024,
      limit = 15, pageSize = 5, sortBy = "popularity.desc")
    assert(rs.map(_.key) == Seq("years:movie:2022", "years:movie:2023"),
      "limit=15 must stop before 2024")
    assert(rs.map(_.attempted) == Seq(10, 5))
    assert(spark.read.parquet(st).count() == 15)
    // popularity.desc order within 2023: pop 20..11 = ids 11..20 asc,
    // first page of 5 = ids 11..15
    assert(spark.read.parquet(st).filter($"id" > 10)
      .select("id").as[Long].collect().sorted.toSeq == (11L to 15L))
    // per-year cursors, independently resumable (cursor is batch-
    // granular: 2022's 15-item budget planned 3 pages, data filled 2)
    assert(SyncJob.CursorStore.get(spark, cur, "years:movie:2022").get.page == 3)
    assert(SyncJob.CursorStore.get(spark, cur, "years:movie:2023").get.page == 1)
    assert(SyncJob.CursorStore.get(spark, cur, "years:movie:2024").isEmpty)

    // monthly refresh resumes 2023's own cursor: next page = ids 16..20
    val rr = SyncJob.refreshCurrentYear(spark, yBase, yDetails, yRu, tmpl,
      st, cur, dl, yearCol = $"year", year = 2023, limit = 5, pageSize = 5)
    assert(rr.map(_.key) == Seq("years:movie:2023"))
    assert(rr.head.inserted == 5)
    assert(spark.read.parquet(st).filter($"id".between(11, 20)).count() == 10)

    // finalize 2024 by vote_count.desc: page 1 = ids 30..26
    val rf = SyncJob.finalizeYear(spark, yBase, yDetails, yRu, tmpl,
      st, cur, dl, yearCol = $"year", year = 2024, limit = 5, pageSize = 5)
    assert(rf.map(_.key) == Seq("years:movie:2024"))
    assert(spark.read.parquet(st).filter($"id" > 20)
      .select("id").as[Long].collect().sorted.toSeq == (26L to 30L))

    // re-running the finalize is idempotent on state (updates, no dups)
    val rf2 = SyncJob.finalizeYear(spark, yBase, yDetails, yRu, tmpl,
      st, cur, dl, yearCol = $"year", year = 2024, limit = 5, pageSize = 5,
      resume = false)
    assert(rf2.head.inserted == 0 && rf2.head.updated == 5)
    assert(spark.read.parquet(st).count() == 25)
  }

  test("duplicate key within one batch resolves last-write-wins (by page)") {
    val dir = Files.createTempDirectory("syncdup").toString
    // id=1 appears on page 1 (v1) and page 2 (v2): sequential upsert
    // semantics => v2 must win, and it counts as ONE insert
    val dupBase = Seq(
      (Some(1L), "movie", "v1", 10L),
      (Some(2L), "movie", "other", 9L),
      (Some(1L), "movie", "v2", 8L))
      .toDF("id", "_type", "title", "vote_count")
    val r = SyncJob.run(spark, dupBase,
      details, ruTitles, template,
      s"$dir/state", s"$dir/cursors", s"$dir/dead",
      cursorKey = "dup", orderBy = Seq(col("vote_count").desc),
      pageSize = 2, nPages = 2)
    assert(r.inserted == 2)
    val state = spark.read.parquet(s"$dir/state")
    assert(state.count() == 2)
    assert(state.filter($"id" === 1L).select("title").as[String].head() == "v2")
  }

  test("startPage=Some(0) is Python-falsy: falls through to the cursor, " +
       "never a zero-based window (sync_top.py:134 `start_page or ...`)") {
    val dir = Files.createTempDirectory("syncjob-sp0").toString
    val (st, cur, dl) = (s"$dir/state", s"$dir/cursors", s"$dir/dead")
    def round(sp: Option[Int]) = SyncJob.run(spark, base, details, ruTitles,
      template, st, cur, dl, cursorKey = "sp0",
      orderBy = Seq(col("vote_count").desc, col("id").asc),
      pageSize = 5, nPages = 2, startPage = sp)
    assert(round(None).lastPage == 2)
    val r2 = round(Some(0)) // falsy: resumes at the cursor (page 3)
    assert(r2.lastPage == 4 && r2.attempted == 10,
      "0 must fall through to the resume position, not start a 0-based window")
  }

  test("maxPage is an ABSOLUTE page-number ceiling: a resumed cursor never " +
       "walks past it, and at the ceiling the call is a cursor-preserving no-op") {
    val dir = Files.createTempDirectory("syncjob-cap").toString
    val (st, cur, dl) = (s"$dir/state", s"$dir/cursors", s"$dir/dead")
    def round(cap: Option[Int]) = SyncJob.run(spark, base, details, ruTitles,
      template, st, cur, dl, cursorKey = "cap",
      orderBy = Seq(col("vote_count").desc, col("id").asc),
      pageSize = 5, nPages = 3, maxPage = cap)
    val r1 = round(Some(2)) // wants pages 1-3; ceiling clips to 1-2
    assert(r1.lastPage == 2 && r1.attempted == 10,
      "window clipped AT the ceiling, not by page count")
    val r2 = round(Some(2)) // cursor at 2 -> from=3 > ceiling: loop guard false
    assert(r2.attempted == 0 && r2.inserted == 0 && r2.lastPage == 2,
      "at the ceiling nothing is fetched and the cursor is untouched")
    val r3 = round(None) // ceiling lifted: resumes at 3 exactly
    assert(r3.lastPage == 5 && r3.attempted == 15)
  }
}
