package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready transforms over the `events` stream table.
  *
  * Each transform is written once and applied to BOTH the batch DataFrame
  * (oracle-verified) and a `readStream` DataFrame (spec-verified via
  * MemoryStream) — the Structured Streaming contract: the same declarative
  * plan, incrementalized by the engine.
  *
  * The reference itself has no event-time processing (SURVEY.md §2.10);
  * its incremental mechanics (resumable cursors ST1, idempotent upsert
  * ST2, dead-letter ST3) are covered by [[graft.ingest.SyncJob]]. These
  * window ops are the scale-pipeline extension over `events`.
  */
object StreamOps {

  /** Tumbling event-time window stats per event_type. Order-independent
    * aggregates only (count/min/max) — sums of doubles are not
    * reproducible across engines/retries at scale.
    * Streaming: apply after `withWatermark("ts", ...)`. */
  def tumblingStats(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("approx_users"),
        col("min_value"), col("max_value"))

  /** Sliding-window event counts (window/slide), the hopping variant. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))

  /** Per-user session windows: events within `gapMinutes` of the previous
    * event share a session (classic gaps-and-islands via a lag + running
    * sum — one shuffle on user_id). Batch analogue of
    * `session_window(ts, gap)`; kept explicit so the semantics are
    * oracle-checkable in ANSI SQL. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val newSession = when(
      col("ts").cast("long") -
        lag(col("ts"), 1).over(byUser).cast("long") > gapMinutes * 60L, 1)
      .otherwise(0)
    events
      .withColumn("_new", newSession)
      .withColumn("session_id",
        sum(when(lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(col("_new")))
          .over(byUser))
      .groupBy("user_id", "session_id")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
