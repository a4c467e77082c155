package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Deterministic multi-file drive for the streaming batch faces
  * ([[DedupStream.ingestAvailableNow]], [[StreamOps.asofJoinStreamFiles]]):
  * materialize a DataFrame as N single-file parquet "micro-batches" whose
  * replay ORDER is pinned, so an AvailableNow read with
  * `maxFilesPerTrigger=1` processes split 0, then split 1, ... —
  * repeatably, across runs and filesystems.
  *
  * FileStreamSource orders new files by MODIFICATION TIME (ties broken
  * by listing order, which is not guaranteed), so each file gets a
  * strictly increasing mtime, 2 s apart — above the 1 s mtime
  * granularity of coarse filesystems. Split membership is
  * `pmod(splitCol, splits)` — a pure function of the row, independent of
  * input partitioning.
  *
  * This is harness plumbing for bench/verify determinism, not the 100 TB
  * shape: a production backfill feeds whatever files exist and accepts
  * arrival-order nondeterminism (the operators' contracts — index
  * earlier-batch-wins, as-of watermark ripeness — are order-sensitive by
  * design, exactly like any at-least-once ingest).
  */
object BatchFiles {

  /** Write `df` into `dir/bNN.parquet`, one file per split, mtimes
    * increasing in split order. Returns `dir`.
    *
    * `keepSplitCol=false` drops the split column from the written files
    * — for callers whose split key is a synthetic harness column (the
    * ntile pattern) that must not leak into the downstream schema (the
    * generic-payload as-of drive takes EVERY non-key/ts column as
    * payload).
    *
    * The input plan is computed ONCE (persist + the null-guard count
    * materializes it); the null check and every per-split filter then
    * read the cache. Without this, a `splits`-way write evaluates the
    * plan splits+1 times — ruinous when the split column comes from a
    * global window (the ntile harness pattern), whose single-task sort
    * would otherwise re-run per split. */
  def write(df: DataFrame, dir: String, splitCol: String, splits: Int,
            keepSplitCol: Boolean = true): String = {
    require(splits >= 1 && splits <= 99, s"splits out of range: $splits")
    val cached = df.persist()
    try {
      // a null splitCol row fails EVERY pmod(...) === i filter and would
      // silently vanish from the drive — refuse instead of dropping
      val nulls = cached.filter(col(splitCol).isNull).count()
      require(nulls == 0L,
        s"BatchFiles.write: $nulls rows have null $splitCol and would be dropped from every split")
      val spark = cached.sparkSession
      val conf = spark.sessionState.newHadoopConf()
      val fs = new Path(dir).getFileSystem(conf)
      fs.mkdirs(new Path(dir))
      // clear EVERY prior bNN.parquet, not just the ones this call
      // overwrites: a re-run with fewer splits would otherwise leave
      // stale higher-numbered files that an AvailableNow drive ingests
      // as extra batches — with NEWER mtimes than the fresh splits, so
      // they'd even replay LAST (review finding)
      fs.globStatus(new Path(s"$dir/b[0-9][0-9].parquet"))
        .foreach(st => fs.delete(st.getPath, false))
      val base = System.currentTimeMillis() - splits * 2000L
      (0 until splits).foreach { i =>
        val tmp = s"$dir/_tmp_split_$i"
        val split = cached.filter(pmod(col(splitCol), lit(splits)) === i)
        (if (keepSplitCol) split else split.drop(splitCol))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))
        require(part.length == 1, s"expected one part file in $tmp")
        val dest = new Path(f"$dir/b$i%02d.parquet")
        fs.delete(dest, false)
        fs.rename(part(0).getPath, dest)
        fs.delete(new Path(tmp), true)
        // mtime is the replay-order key (see scaladoc)
        fs.setTimes(dest, base + i * 2000L, -1)
      }
      dir
    } finally { cached.unpersist(); () }
  }
}
