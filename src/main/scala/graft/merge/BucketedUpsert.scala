package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The MERGE target as a BUCKETED catalog table (SURVEY.md §2.1 S11 at
  * scale; SCALE.md "storage layout"): the catalog side of the merge's
  * full-outer join is stored bucketed (+ sorted) by the merge key, so
  * its scan arrives pre-partitioned — ONLY the incoming batch shuffles.
  * At 100 TB that is the difference between re-shuffling the whole
  * catalog per sync batch and shuffling ~a page of rows.
  *
  * Commit protocol: versioned tables `<name>_v0/_v1` alternate as the
  * physical target; `<name>` is a view repointed after a successful
  * write (the metastore-free stand-in for Iceberg/Delta's atomic MERGE
  * INTO snapshot swap — same plan shape, same reader contract). The
  * write end re-buckets the merged output, which is itself the bucketed
  * write's shuffle — there is no free lunch on the write side, but the
  * READ side (the catalog, orders of magnitude larger than a batch)
  * never moves.
  */
object BucketedUpsert {

  private def vname(name: String, v: Int) = s"${name}_v$v"

  /** Current physical version, read from the VIEW definition — the view
    * repoint IS the commit, so it is the source of truth. Bare table
    * existence would mis-resolve after a crash between the view flip and
    * the old version's DROP (both tables present): the next merge would
    * resurrect the stale version and overwrite the committed one. */
  private def currentVersion(spark: SparkSession, name: String): Int = {
    val viewText = spark.sql(s"SHOW CREATE TABLE $name")
      .head().getString(0)
    val v = Seq(0, 1).filter(i => viewText.contains(vname(name, i)))
    require(v.size == 1, s"cannot resolve current version of $name from: $viewText")
    v.head
  }

  private def writeVersion(df: DataFrame, name: String, v: Int, dir: String,
                           keys: Seq[String], nBuckets: Int): Unit =
    df.write
      // external-table DROP leaves files behind; the next flip back onto
      // this version slot must replace them
      .mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", s"$dir/${vname(name, v)}")
      .saveAsTable(vname(name, v))

  /** Create the empty bucketed state table + the `<name>` view. */
  def init(spark: SparkSession, name: String, dir: String, template: DataFrame,
           keys: Seq[String] = Seq("id", "_type"), nBuckets: Int = 8): Unit = {
    require(!spark.catalog.tableExists(vname(name, 0)) &&
      !spark.catalog.tableExists(vname(name, 1)), s"$name already initialized")
    writeVersion(template.limit(0), name, 0, dir, keys, nBuckets)
    spark.sql(s"CREATE OR REPLACE VIEW $name AS SELECT * FROM ${vname(name, 0)}")
  }

  /** One MERGE batch: read the current version (bucketed scan, no
    * shuffle), merge, write the next version, flip the view, drop the
    * old version. Returns the (inserted, updated) counters. */
  def merge(spark: SparkSession, name: String, dir: String, incoming: DataFrame,
            sortBy: Option[String], now: Column,
            keys: Seq[String] = Seq("id", "_type"), nBuckets: Int = 8): Map[String, Long] = {
    val cur = currentVersion(spark, name)
    val next = 1 - cur
    val existing = spark.table(vname(name, cur))
    val res = Upsert.mergeMovies(existing, incoming, sortBy, now, keys)
    writeVersion(res.merged, name, next, dir, keys, nBuckets)
    // counters observed during the version write itself — one pass
    // over the OLD version, read before dropping it (a collect() here
    // re-executed the merge — review finding)
    val counters = res.observedCounts()
    spark.sql(s"CREATE OR REPLACE VIEW $name AS SELECT * FROM ${vname(name, next)}")
    spark.sql(s"DROP TABLE ${vname(name, cur)}")
    counters
  }
}
