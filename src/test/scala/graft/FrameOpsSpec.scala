package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FrameOps

/** Pins the Mongo-specific frame-array semantics the DuckDB oracle can't
  * express (SURVEY.md §5.2): pick_backdrop exclusion + null coalescing,
  * normalize dedup keep-max-width with first-on-tie, keep-first dedup,
  * $addToSet idempotence. */
class FrameOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def framesDf(frames: Seq[Row], incorrect: Seq[String]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("frames", ArrayType(Fixtures.frameType)),
      StructField("incorrect_frames", ArrayType(StringType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(frames, incorrect))), schema)
  }

  test("pickBackdrop picks max (vote_average, width) excluding incorrect") {
    // /b.jpg has the best votes but is moderated out -> /a.jpg wins
    val df = framesDf(
      Seq(Row("/a.jpg", 1.78, 8.0, 1280), Row("/b.jpg", 1.78, 9.0, 1920)),
      Seq("/b.jpg"))
    val got = df.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().getString(0)
    assert(got == "/a.jpg")
  }

  test("pickBackdrop treats null vote_average/width as 0 (reference or-coalesce)") {
    val df = framesDf(
      Seq(Row("/x.jpg", 1.78, null, 1920), Row("/y.jpg", 1.78, 0.1, null)),
      Seq())
    // (0.0, 1920) vs (0.1, null->0): 0.1 wins on vote_average
    val got = df.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().getString(0)
    assert(got == "/y.jpg")
  }

  test("pickBackdrop drops falsy (empty-string) paths like the reference's truthiness check") {
    // /"" has the top votes but `f.get("path")` is falsy in the reference
    // (app/utils/frames.py:12) -> skipped; /a.jpg wins
    val df = framesDf(
      Seq(Row("", 1.78, 9.9, 3840), Row("/a.jpg", 1.78, 5.0, 1280)),
      Seq())
    val got = df.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().getString(0)
    assert(got == "/a.jpg")
    // all-falsy -> None, like the reference's empty `valid` branch
    val allFalsy = framesDf(Seq(Row("", 1.78, 9.9, 3840), Row(null, 1.78, 9.0, 1920)), Seq())
    assert(allFalsy.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().isNullAt(0))
  }

  test("pickBackdrop breaks exact (vote_average, width) ties by FIRST occurrence") {
    // Python's stable sort with reverse=True keeps input order among equal
    // keys, so valid[0] is the first-listed of the tied frames — NOT the
    // lexicographically-max path
    val df = framesDf(
      Seq(Row("/a.jpg", 1.78, 7.0, 1920), Row("/z.jpg", 1.78, 7.0, 1920)),
      Seq())
    val got = df.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().getString(0)
    assert(got == "/a.jpg", "tie must keep the first occurrence, not max path")
    // and the tie-break must not outrank the real sort key
    val df2 = framesDf(
      Seq(Row("/z.jpg", 1.78, 7.0, 1920), Row("/a.jpg", 1.78, 7.0, 1921)),
      Seq())
    assert(df2.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().getString(0) == "/a.jpg", "wider frame wins regardless of position")
  }

  test("pickBackdrop returns null when all frames are excluded or absent") {
    val df = framesDf(Seq(Row("/a.jpg", 1.78, 8.0, 1280)), Seq("/a.jpg"))
    assert(df.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().isNullAt(0))
    val empty = framesDf(Seq(), Seq())
    assert(empty.select(FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
      .head().isNullAt(0))
  }

  test("presentPaths/missingPaths: NULL frames reads as `frames or []` — " +
       "present empty, missing all requested (reference frames.py:66-69)") {
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null))),
      StructType(Seq(StructField("id", LongType),
        StructField("frames", ArrayType(Fixtures.frameType)))))
    val r = df.select(
      FrameOps.presentPaths(col("frames"), Seq("/a.jpg")).as("p"),
      FrameOps.missingPaths(col("frames"), Seq("/a.jpg", "/b.jpg")).as("m")).head()
    assert(r.getSeq[String](0) == Seq(), "present = [] on null frames")
    assert(r.getSeq[String](1) == Seq("/a.jpg", "/b.jpg"),
      "missing = every requested path on null frames (was null before the fix)")
  }

  test("normalizeFrames resolves legacy frame_path alias, drops pathless, dedups keep-max-width") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("frames", ArrayType(Fixtures.rawFrameType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(
        Row(null, "/legacy.jpg", 1.7, 5.0, 100),   // legacy alias used
        Row("/dup.jpg", null, 1.7, 5.0, 200),
        Row("/dup.jpg", null, 1.7, 6.0, 500),       // wider -> wins
        Row("/dup.jpg", null, 1.7, 7.0, 500),       // tie width -> first 500 wins
        Row(null, null, 1.7, 5.0, 100))))),         // no path -> dropped
      schema)
    val out = df.select(FrameOps.normalizeFrames(col("frames"), legacyAlias = true).as("f"))
      .selectExpr("inline(f)").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("/legacy.jpg", "/dup.jpg"))
    val dup = out.find(_.getString(0) == "/dup.jpg").get
    assert(dup.getInt(3) == 500)
    assert(dup.getDouble(2) == 6.0, "tie on width keeps FIRST occurrence")
  }

  test("normalizeFrames preserves null fields and treats '' paths as missing") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("frames", ArrayType(Fixtures.rawFrameType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(
        Row("", "/via-alias.jpg", 1.7, 5.0, 100), // '' is falsy -> alias wins
        Row("", null, 1.7, 5.0, 100),             // '' everywhere -> dropped
        Row("/nulls.jpg", null, null, null, null))))), // None values stored AS-IS
      schema)
    val out = df.select(FrameOps.normalizeFrames(col("frames"), legacyAlias = true).as("f"))
      .selectExpr("inline(f)").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("/via-alias.jpg", "/nulls.jpg"),
      "''-path entries resolve via the alias or are dropped, never kept as ''")
    val nulls = out.find(_.getString(0) == "/nulls.jpg").get
    assert(nulls.isNullAt(1) && nulls.isNullAt(2) && nulls.isNullAt(3),
      "the reference stores f.get(...) results verbatim — no zero-coalescing")
  }

  test("filterBackdrops: aspect band, keep-first dedup, (va,width) desc sort") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("frames", ArrayType(Fixtures.frameType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(
        Row("/narrow.jpg", 1.0, 9.9, 2000),          // out of band
        Row("/first.jpg", 1.8, 5.0, 100),
        Row("/first.jpg", 1.8, 9.0, 900),             // dup: FIRST kept (O19)
        Row("/best.jpg", 2.0, 8.0, 500),
        Row("/nullar.jpg", null.asInstanceOf[java.lang.Double], 8.0, 500))))), // null ar -> 0 -> dropped
      schema)
    val out = df.select(FrameOps.filterBackdrops(col("frames")).as("f"))
      .selectExpr("inline(f)").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("/best.jpg", "/first.jpg"))
    assert(out.head.getDouble(2) == 8.0)
  }

  test("filterBackdrops: falsy paths dropped, null va stored as 0, exact ties keep first occurrence") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("frames", ArrayType(Fixtures.frameType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(
        Row("", 1.8, 9.9, 3000),                     // falsy path -> dropped (tmdb_client.py:204)
        Row(null, 1.8, 9.8, 2900),                   // null path -> dropped
        Row("/z.jpg", 1.8, 7.0, 1920),               // tie group, first listed
        Row("/a.jpg", 1.8, 7.0, 1920),               // tie: must NOT jump ahead of /z
        Row("/nullva.jpg", 1.8,
          null.asInstanceOf[java.lang.Double], 10))))),  // va stored as 0, sorts last
      schema)
    val out = df.select(FrameOps.filterBackdrops(col("frames")).as("f"))
      .selectExpr("inline(f)").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("/z.jpg", "/a.jpg", "/nullva.jpg"),
      s"got ${out.map(_.getString(0)).toSeq}")
    assert(out.last.getDouble(2) == 0.0,
      "the reference stores `vote_average or 0`, not null")
  }

  test("addToSet is idempotent and order-preserving; pullAll removes") {
    val df = framesDf(Seq(), Seq("/a.jpg", "/b.jpg"))
    val added = df.select(
      FrameOps.addToSet(col("incorrect_frames"), Seq("/b.jpg", "/c.jpg")).as("x"))
      .head().getSeq[String](0)
    assert(added == Seq("/a.jpg", "/b.jpg", "/c.jpg"))
    val twice = df.select(
      FrameOps.addToSet(FrameOps.addToSet(col("incorrect_frames"), Seq("/c.jpg")), Seq("/c.jpg")).as("x"))
      .head().getSeq[String](0)
    assert(twice == Seq("/a.jpg", "/b.jpg", "/c.jpg"), "$addToSet twice ≡ once")
    val pulled = df.select(
      FrameOps.pullAll(col("incorrect_frames"), Seq("/a.jpg", "/zz.jpg")).as("x"))
      .head().getSeq[String](0)
    assert(pulled == Seq("/b.jpg"))
  }

  test("addToSet on null moderation state starts from empty") {
    val df = framesDf(Seq(), null)
    val added = df.select(
      FrameOps.addToSet(col("incorrect_frames"), Seq("/n.jpg")).as("x"))
      .head().getSeq[String](0)
    assert(added == Seq("/n.jpg"))
  }

  test("moderation round-trip: mark blocks the backdrop, unmark restores it") {
    import graft.ops.Moderation
    val movies = Fixtures.movies(spark)
    // movie 1 frames: /a.jpg (8.0), /b.jpg (9.0); /b.jpg already blocked
    val marked = Moderation.markIncorrect(movies, 1L, "movie", Seq("/a.jpg", "/zz.jpg"))
    val m1 = marked.updated.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1.getAs[scala.collection.Seq[String]]("incorrect_frames").toSeq
      == Seq("/b.jpg", "/a.jpg", "/zz.jpg"), "$addToSet appends, keeps order, dedups")
    assert(m1.isNullAt(m1.fieldIndex("backdrop_path")),
      "all frames blocked -> backdrop null")
    val resp = marked.response.head()
    assert(resp.getAs[scala.collection.Seq[String]]("present_in_frames").toSeq == Seq("/a.jpg"))
    assert(resp.getAs[scala.collection.Seq[String]]("not_in_frames").toSeq == Seq("/zz.jpg"))
    // untouched rows bit-identical
    val others = marked.updated.filter(!(col("id") === 1 && col("_type") === "movie"))
      .orderBy("id", "_type").collect().toSeq
    val before = movies.filter(!(col("id") === 1 && col("_type") === "movie"))
      .orderBy("id", "_type").collect().toSeq
    assert(others == before)
    // unmark the best frame: backdrop comes back as the top valid frame
    val unmarked = Moderation.unmarkIncorrect(marked.updated, 1L, "movie", Seq("/b.jpg"))
    val m1b = unmarked.updated.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1b.getAs[scala.collection.Seq[String]]("incorrect_frames").toSeq
      == Seq("/a.jpg", "/zz.jpg"))
    assert(m1b.getAs[String]("backdrop_path") == "/b.jpg")
    // 404 guard: absent movie -> empty response, table unchanged
    val miss = Moderation.markIncorrect(movies, 999L, "movie", Seq("/x.jpg"))
    assert(miss.response.isEmpty)
    assert(miss.updated.orderBy("id", "_type").collect().toSeq ==
      movies.orderBy("id", "_type").collect().toSeq)
  }

  test("table-level dedupKeepFirst / dedupKeepMax") {
    import spark.implicits._
    val df = Seq(
      ("p1", 1, 10, 100.0), ("p1", 2, 99, 100.0), ("p2", 3, 50, 100.0),
      ("p1", 4, 99, 100.0)).toDF("path", "pos", "width", "x")
    val first = FrameOps.dedupKeepFirst(df, Seq("path"), Seq("pos"))
      .orderBy("path").collect()
    assert(first.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("p1", 1), ("p2", 3)))
    val widest = FrameOps.dedupKeepMax(df, Seq("path"), "width", Seq("pos"))
      .orderBy("path").collect()
    assert(widest.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("p1", 2), ("p2", 3)),
      "max width, first-on-tie (pos 2 beats pos 4)")
  }
}
