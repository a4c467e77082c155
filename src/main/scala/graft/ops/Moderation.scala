package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The frame-moderation endpoints end-to-end (SURVEY.md §2.8 SO1-SO3,
  * §2.4 JN6; reference: app/endpoints/frames.py:39-106): add/remove
  * paths on ONE document's `incorrect_frames` ($addToSet / $pull), then
  * recompute that document's backdrop from the updated moderation state.
  * Untouched rows pass through bit-identically.
  *
  * Scale note: expressed as a whole-table projection here (copy-on-write
  * UPDATE); on a real deployment the same expressions ride a row-level
  * MERGE keyed on (id,_type) — e.g. [[graft.merge.BucketedUpsert]] with a
  * one-row incoming batch — so only the target's bucket rewrites.
  */
object Moderation {

  /** Updated table + the endpoint's response row (empty when the movie
    * is absent — the 404 guard, JN6). */
  final case class Result(updated: DataFrame, response: DataFrame)

  private def apply(movies: DataFrame, movieId: Long, tpe: String,
                    newIncorrect: Column => Column, paths: Seq[String]): Result = {
    val hit = col("id") === lit(movieId) && col("_type") === lit(tpe)
    val updated = movies
      .withColumn("incorrect_frames",
        when(hit, newIncorrect(col("incorrect_frames")))
          .otherwise(col("incorrect_frames")))
      // recompute AFTER the moderation update, from the updated column
      .withColumn("backdrop_path",
        when(hit, FrameOps.pickBackdrop(col("frames"), col("incorrect_frames")))
          .otherwise(col("backdrop_path")))
    val response = updated.filter(hit).select(
      col("backdrop_path"),
      lit(paths.toArray).as("requested"),
      FrameOps.presentPaths(col("frames"), paths).as("present_in_frames"),
      FrameOps.missingPaths(col("frames"), paths).as("not_in_frames"))
    Result(updated, response)
  }

  /** POST /movies/{id}/incorrect — idempotent multi-add + recompute. */
  def markIncorrect(movies: DataFrame, movieId: Long, tpe: String,
                    paths: Seq[String]): Result =
    apply(movies, movieId, tpe, FrameOps.addToSet(_, paths), paths)

  /** POST /movies/{id}/unmark-incorrect — multi-remove + recompute. */
  def unmarkIncorrect(movies: DataFrame, movieId: Long, tpe: String,
                      paths: Seq[String]): Result =
    apply(movies, movieId, tpe, FrameOps.pullAll(_, paths), paths)
}
