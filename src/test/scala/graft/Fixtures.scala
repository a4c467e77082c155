package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Domain fixtures per FIXTURES.md §A — deterministic movies/frame rows
  * exercising the reference's edge cases (duplicate frame paths, legacy
  * `frame_path` alias, moderation state, malformed release dates, shared
  * (id) across _type, null vote_average/width).
  */
object Fixtures {

  val frameType: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("aspect_ratio", DoubleType),
    StructField("vote_average", DoubleType),
    StructField("width", IntegerType)))

  // raw frames as fetched (with legacy alias column, pre-normalization)
  val rawFrameType: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("frame_path", StringType),
    StructField("aspect_ratio", DoubleType),
    StructField("vote_average", DoubleType),
    StructField("width", IntegerType)))

  val movieSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("_type", StringType),
    StructField("title", StringType),
    StructField("title_ru", StringType),
    StructField("name", StringType),
    StructField("popularity", DoubleType),
    StructField("vote_average", DoubleType),
    StructField("vote_count", LongType),
    StructField("genre_ids", ArrayType(IntegerType)),
    StructField("release_date", StringType),
    StructField("year", IntegerType),
    StructField("is_animated", BooleanType),
    StructField("country_codes", ArrayType(StringType)),
    StructField("frames", ArrayType(frameType)),
    StructField("incorrect_frames", ArrayType(StringType)),
    StructField("backdrop_path", StringType),
    StructField("created_at", TimestampType),
    StructField("synced_at", TimestampType),
    StructField("last_popularity_sync_at", TimestampType),
    StructField("last_vote_count_sync_at", TimestampType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def f(path: String, ar: Double, va: java.lang.Double, w: java.lang.Integer) =
    Row(path, ar, va, w)

  def movies(spark: SparkSession): DataFrame = {
    val rows = Seq(
      // plain movie, two frames, one blocked by moderation
      Row(1L, "movie", "The Matrix", "Матрица", null, 85.0, 8.7, 25000L,
        Seq(28, 878), "1999-03-31", 1999, false, Seq("US"),
        Seq(f("/a.jpg", 1.78, 8.0, 1280), f("/b.jpg", 1.78, 9.0, 1920)),
        Seq("/b.jpg"), "/a.jpg",
        ts("2024-01-01 00:00:00"), ts("2024-06-01 00:00:00"),
        ts("2024-06-01 00:00:00"), null),
      // animated (genre 16), null vote_average in a frame (or-coalesce F7)
      Row(2L, "movie", "Spirited Away", null, null, 60.0, 8.5, 16000L,
        Seq(16, 14), "2001-07-20", 2001, true, Seq("JP"),
        Seq(f("/c.jpg", 1.78, null, 1920), f("/d.jpg", 1.78, 5.0, null)),
        null, "/c.jpg",
        ts("2024-01-02 00:00:00"), ts("2024-06-01 00:00:00"),
        null, ts("2024-06-02 00:00:00")),
      // tv row sharing id=1 (compound key), no frames
      Row(1L, "tv", null, null, "Some Show", 12.0, 7.1, 800L,
        Seq(18), "2011-04-17", 2011, false, Seq("US", "GB"),
        Seq(), null, null,
        ts("2024-01-03 00:00:00"), ts("2024-06-01 00:00:00"), null, null),
      // malformed release_date, null frames, empty countries
      Row(3L, "movie", "Broken Date", null, null, 1.0, null, 10L,
        Seq(), "19xx", null, false, Seq(),
        null, null, null,
        ts("2024-01-04 00:00:00"), ts("2024-06-01 00:00:00"), null, null),
      // case-insensitive regex target (title vs title_ru)
      Row(4L, "movie", "GREEN mile", "Зелёная миля", null, 40.0, 8.6, 12000L,
        Seq(18, 80), "1999-12-10", 1999, false, Seq("US"),
        Seq(f("/e.jpg", 1.78, 7.0, 1280)), Seq(), "/e.jpg",
        ts("2024-01-05 00:00:00"), ts("2024-06-01 00:00:00"),
        ts("2024-06-03 00:00:00"), ts("2024-06-03 00:00:00")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), movieSchema)
  }
}
