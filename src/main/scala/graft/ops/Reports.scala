package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Report aggregations (SURVEY.md §2.5).
  *
  * A1 (reference: app/endpoints/reports.py:20-46) is a two-stage
  * aggregation in the reference: Mongo `$group` with `$sum/$push` server
  * side, then a Python `Counter` per group. On Spark both stages are one
  * shuffle: groupBy with partial (map-side) aggregation, the histogram
  * built from a second groupBy on (group, reason) — never `collect_list`
  * of unbounded arrays on the hot path at scale.
  */
object Reports {

  /** A1 — per (movie_id, frame_path, content_type): report count + reason
    * histogram as a map column. FALSY reasons (null, "") are excluded
    * from the histogram but still counted in the total — the
    * reference's `[r for r in reasons if r]` filter feeding Counter
    * while `$sum: 1` counts every report (reports.py:29,37). Review
    * finding: the unfiltered collect_list fed a null map KEY into
    * map_from_entries, which crashes the job (NULL_MAP_KEY) on the
    * first null-reason report instead of histogramming around it. */
  def reportStats(reports: DataFrame): DataFrame = {
    val perReason = reports
      .groupBy("movie_id", "frame_path", "content_type", "reason")
      .agg(count(lit(1)).as("_n"))
    perReason
      .groupBy("movie_id", "frame_path", "content_type")
      .agg(
        sum("_n").cast("long").as("count"),
        map_from_entries(array_sort(collect_list(
          when(col("reason").isNotNull && col("reason") =!= "",
            struct(col("reason"), col("_n")))))).as("reasons"))
  }

  /** A1 (flat form) — the same stats with the reason histogram exploded to
    * rows; used by the oracle harness (maps don't hash portably).
    *
    * The group total comes from a second (tiny, partially-aggregated)
    * groupBy joined back null-safely, NOT a window: a window over the
    * 3-key partition re-sorts and holds whole partitions in memory with
    * no partial aggregation, while the re-agg's shuffle carries one row
    * per reason group. AQE broadcasts the totals side when it fits. */
  def reportStatsFlat(reports: DataFrame): DataFrame = {
    val perReason = reports
      .groupBy("movie_id", "frame_path", "content_type", "reason")
      .agg(count(lit(1)).cast("long").as("n"))
    // perReason is referenced twice (rows + totals), so its subtree —
    // including the source scan — executes twice. Measured here, a
    // memory-store cache of the aggregate costs MORE than the rescan;
    // at source sizes where that flips, persist perReason first.
    val totals = perReason
      .groupBy("movie_id", "frame_path", "content_type")
      .agg(sum("n").cast("long").as("count"))
      .withColumnsRenamed(Map("movie_id" -> "_m", "frame_path" -> "_f",
        "content_type" -> "_c"))
    perReason
      .join(totals,
        col("movie_id") <=> col("_m") && col("frame_path") <=> col("_f") &&
          col("content_type") <=> col("_c"))
      // falsy reasons drop from the per-reason ROWS but were already
      // summed into `count` — the flat rendering of reportStats'
      // filtered-histogram-over-full-total contract
      .filter(col("reason").isNotNull && col("reason") =!= "")
      .select("movie_id", "frame_path", "content_type", "reason", "n", "count")
  }

  /** A3/P10 — windowed error counts relative to `now`
    * (reference: app/main.py:121-126). */
  def errorCounts(errors: DataFrame, now: Column): DataFrame = {
    errors.agg(
      count(when(col("timestamp") >= now - expr("INTERVAL 1 HOUR"), 1)).as("errors_last_hour"),
      count(when(col("timestamp") >= now - expr("INTERVAL 24 HOURS"), 1)).as("errors_last_day"),
      count(lit(1)).as("errors_total"))
  }
}
