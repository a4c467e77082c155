package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.merge.Upsert

/** Merge semantics per reference app/catalog/upsert.py:50-103 — the risk
  * register items of SURVEY.md §7.3: created_at insert-only,
  * incorrect_frames preserved, backdrop recomputed after the merge,
  * conditional last_*_sync_at stamping, idempotence. */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def base = Fixtures.movies(spark)

  // incoming: re-sync of id=1 movie with fresh frames and no moderation
  private def incoming = base
    .filter(col("id") === 1 && col("_type") === "movie")
    .withColumn("title", lit("The Matrix (resync)"))
    .withColumn("incorrect_frames", lit(null).cast("array<string>"))
    .withColumn("created_at", lit("2030-01-01 00:00:00").cast("timestamp"))
    .withColumn("backdrop_path", lit(null).cast("string"))

  private val now = lit("2026-08-12 00:00:00").cast("timestamp")

  test("incoming wins ordinary columns; created_at is insert-only; incorrect_frames preserved") {
    val r = Upsert.mergeMovies(base, incoming, None, now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1.getAs[String]("title") == "The Matrix (resync)")
    assert(m1.getAs[java.sql.Timestamp]("created_at").toString == "2024-01-01 00:00:00.0",
      "$setOnInsert: existing created_at survives")
    assert(m1.getAs[scala.collection.Seq[String]]("incorrect_frames").toSeq == Seq("/b.jpg"),
      "moderation state survives the re-sync")
  }

  test("backdrop_path recomputed AFTER merging existing moderation state") {
    val r = Upsert.mergeMovies(base, incoming, None, now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    // incoming frames contain /b.jpg (better) but preserved moderation blocks it
    assert(m1.getAs[String]("backdrop_path") == "/a.jpg")
  }

  test("untouched rows keep their values; counters classify insert vs update") {
    val fresh = incoming.withColumn("id", lit(999L))
    val r = Upsert.mergeMovies(base, incoming.union(fresh), None, now)
    assert(r.merged.count() == base.count() + 1)
    val tv = r.merged.filter(col("id") === 1 && col("_type") === "tv").head()
    assert(tv.getAs[String]("name") == "Some Show")
    val c = r.counters.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(c == Map("insert" -> 1L, "update" -> 1L))
  }

  test("last_*_sync_at stamped only for the matching sort mode") {
    val r = Upsert.mergeMovies(base, incoming, Some("popularity.desc"), now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1.getAs[java.sql.Timestamp]("last_popularity_sync_at").toString
      == "2026-08-12 00:00:00.0")
    val r2 = Upsert.mergeMovies(base, incoming, None, now)
    val m2 = r2.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m2.getAs[java.sql.Timestamp]("synced_at").toString == "2026-08-12 00:00:00.0")
  }

  test("non-matching sync stamp survives an update (only the matching field is $set)") {
    // a vote_count.desc sync updates id=1; its existing popularity stamp
    // (2024-06-01) must survive — the reference never puts the other
    // stamp in $set (app/catalog/upsert.py:94-97)
    val r = Upsert.mergeMovies(base, incoming, Some("vote_count.desc"), now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1.getAs[java.sql.Timestamp]("last_vote_count_sync_at").toString
      == "2026-08-12 00:00:00.0")
    assert(m1.getAs[java.sql.Timestamp]("last_popularity_sync_at").toString
      == "2024-06-01 00:00:00.0",
      "vote_count sync must not clobber last_popularity_sync_at")
    // and with NO sort mode, both stamps survive untouched
    val r2 = Upsert.mergeMovies(base, incoming, None, now)
    val m2 = r2.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m2.getAs[java.sql.Timestamp]("last_popularity_sync_at").toString
      == "2024-06-01 00:00:00.0")
    assert(m2.getAs[java.sql.Timestamp]("last_vote_count_sync_at") == null)
  }

  test("keep rows are untouched: stored backdrop_path is NOT recomputed") {
    // stored backdrop diverges from pickBackdrop(frames) (older writer /
    // manual fix); a sync of OTHER documents must not rewrite it
    val divergent = base.withColumn("backdrop_path",
      when(col("id") === 4, lit("/manual-fix.jpg")).otherwise(col("backdrop_path")))
    val r = Upsert.mergeMovies(divergent, incoming, None, now)
    val m4 = r.merged.filter(col("id") === 4 && col("_type") === "movie").head()
    assert(m4.getAs[String]("backdrop_path") == "/manual-fix.jpg")
    // while the UPDATED row's backdrop IS recomputed
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1.getAs[String]("backdrop_path") == "/a.jpg")
  }

  test("merge is idempotent: applying the same batch twice ≡ once") {
    val r1 = Upsert.mergeMovies(base, incoming, None, now)
    val r2 = Upsert.mergeMovies(r1.merged, incoming, None, now)
    val a = r1.merged.orderBy("id", "_type").collect().toSeq
    val b = r2.merged.orderBy("id", "_type").collect().toSeq
    assert(a == b)
  }

  test("derived columns re-derived on the incoming doc before merge") {
    // stale year/is_animated ride in; the merge must recompute them from
    // release_date / genre_ids (reference: app/catalog/upsert.py:61-66)
    val stale = incoming
      .withColumn("release_date", lit("2005-06-01"))
      .withColumn("year", lit(1900))
      .withColumn("genre_ids", lit(Array(16, 35)))
      .withColumn("is_animated", lit(false))
    val r = Upsert.mergeMovies(base, stale, None, now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    assert(m1.getAs[Int]("year") == 2005, "year derived from release_date, not trusted")
    assert(m1.getAs[Boolean]("is_animated"), "genre 16 -> animated")
    // keep rows never re-derive
    val m4 = r.merged.filter(col("id") === 4 && col("_type") === "movie").head()
    assert(m4.getAs[Int]("year") == 1999)
  }

  test("incoming frames are normalized (dup path keeps max width) before merge") {
    val dupFrames = incoming.withColumn("frames", expr(
      """array(named_struct('path','/dup.jpg','aspect_ratio',1.78d,'vote_average',5.0d,'width',200),
               named_struct('path','/dup.jpg','aspect_ratio',1.78d,'vote_average',6.0d,'width',900))"""))
    val r = Upsert.mergeMovies(base, dupFrames, None, now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    val frames = m1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("frames")
    assert(frames.length == 1 && frames.head.getInt(3) == 900)
  }

  test("mergeMovies accepts a PURE-LEGACY frames batch: only frame_path in " +
       "the struct, every other field read as the schemaless None") {
    // the exact shape the alias exists for — and the review-finding
    // crash: the old detection set legacyAlias=true but normalizeFrames
    // still dereferenced the nonexistent `path` field (AnalysisException)
    val legacy = incoming.withColumn("frames", expr(
      """array(named_struct('frame_path', '/legacy.jpg'),
               named_struct('frame_path', cast(null as string)))"""))
    val r = Upsert.mergeMovies(base, legacy, None, now)
    val m1 = r.merged.filter(col("id") === 1 && col("_type") === "movie").head()
    val frames = m1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("frames")
    assert(frames.map(_.getString(0)).toSeq == Seq("/legacy.jpg"),
      "alias resolves; the pathless entry drops")
    assert(frames.head.isNullAt(1) && frames.head.isNullAt(2) && frames.head.isNullAt(3),
      "fields absent from the batch schema store as null, like f.get(...)")
  }

  test("observedCounts == the counters frame, read from the caller's own action") {
    val fresh = incoming.withColumn("id", lit(999L))
    val r = Upsert.mergeMovies(base, incoming.union(fresh), None, now)
    val viaPlan = r.counters.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.merged.write.format("noop").mode("overwrite").save() // the ONE pass
    assert(r.observedCounts() == viaPlan)
    assert(viaPlan == Map("insert" -> 1L, "update" -> 1L))
    // all-keep batch: zero entries omitted in both forms, no NPE
    val noop = Upsert.mergeMovies(base, base.limit(0), None, now)
    noop.merged.write.format("noop").mode("overwrite").save()
    assert(noop.observedCounts() == Map.empty)
  }
}
