package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Try}

import org.apache.spark.sql.SparkSession

/** Fork-join for CONCURRENT SPARK ACTIONS (the round-12 unserialized
  * job chains in dedupIncrement / DedupStream.processBatch).
  *
  * Two properties a bare `Await.result(Future.sequence(...))` lacks,
  * both review findings:
  *   - JOIN-ALL ON FAILURE: `Future.sequence` rethrows on the FIRST
  *     failure while sibling futures keep running — under a streaming
  *     foreachBatch the batch then fails and REPLAYS while a zombie
  *     writer from the failed attempt is still committing part-files
  *     into the same partition dirs, breaking the replay-overwrite
  *     contract. Here every thunk is awaited to COMPLETION (success or
  *     failure) before the first failure is rethrown.
  *   - JOB-GROUP INHERITANCE: pool threads don't carry the caller's
  *     Spark localProperties, so jobs launched from them escape the
  *     caller's job group and a StreamingQuery.stop()/cancelJobGroup
  *     cannot reach them. Each thunk re-establishes the caller's group
  *     on its pool thread (and clears it after — pool threads are
  *     reused).
  */
object Forked {

  def awaitAll[T](spark: SparkSession)(thunks: Seq[() => T]): Seq[T] = {
    require(thunks.nonEmpty, "Forked.awaitAll needs at least one thunk")
    implicit val ec: ExecutionContext = ExecutionContext.global
    val sc = spark.sparkContext
    val group = sc.getLocalProperty("spark.jobGroup.id")
    val desc = sc.getLocalProperty("spark.job.description")
    val interrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    val fs = thunks.map(t => Future {
      if (group != null)
        sc.setJobGroup(group, desc, interruptOnCancel = interrupt == "true")
      try t()
      finally if (group != null) sc.clearJobGroup()
    })
    // join EVERY future before surfacing anything — no zombies
    val tried: Seq[Try[T]] = fs.map(f => Try(Await.result(f, Duration.Inf)))
    tried.collectFirst { case Failure(e) => throw e }
    tried.map(_.get)
  }
}
