package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Enrich, FrameOps}

/** The reference's merge-preserving upsert (SURVEY.md §2.1 S11, §2.4
  * JN4/JN5, §2.5 A5; reference: app/catalog/upsert.py:50-103) as a batch
  * MERGE: a single full-outer join on the compound key, with per-column
  * precedence rules.
  *
  * Column precedence (reference: app/catalog/upsert.py:71-96):
  *  - ordinary columns: incoming row wins wholesale (Mongo `$set` of the
  *    whole doc) — including incoming NULLs;
  *  - `created_at`: insert-only (`$setOnInsert`) — existing wins;
  *  - `incorrect_frames`: moderation state, preserved from existing;
  *  - `frames`: incoming frames are normalized (legacy alias, dedup
  *    keep-max-width) before the merge;
  *  - `year` / `is_animated` / `country_codes`: re-derived on the
  *    incoming doc (from release_date / genre_ids /
  *    production_countries) before the merge, as the reference does on
  *    every upsert;
  *  - `backdrop_path`: recomputed AFTER the merge from the merged frames
  *    minus the merged (= preserved) incorrect_frames;
  *  - `last_popularity_sync_at` / `last_vote_count_sync_at`: stamped to
  *    `now` only when the sync's sort mode matches, else preserved.
  *
  * Scale: both sides shuffle on the key — at the real 100 TB deployment
  * this is the storage layer's MERGE INTO (Iceberg/Delta); the plan shape
  * (hash-partitioned full-outer + projections) is identical. Incoming
  * batches are small relative to the catalog, so AQE broadcasts the
  * incoming side when it fits.
  */
object Upsert {

  /** Merged table + (inserted, updated) counters (A5). Counters come from
    * the same join (JN4's existence probe), not a second scan — and for
    * the WRITE paths, from the same EXECUTION: [[MergeResult.observedCounts]]
    * reads observe() metrics collected during the caller's own action
    * on `merged` (the state write), where `counters.collect()` would
    * re-execute the whole merge plan a second time (review finding —
    * the doc's "not a second scan" was true of the expression, not the
    * execution). `counters` stays for consumers whose ONLY output is
    * the counters (the m02 verify entry, specs) — there it already is
    * the single pass. */
  final case class MergeResult(merged: DataFrame, counters: DataFrame,
      observed: Option[org.apache.spark.sql.Observation] = None) {
    /** (insert/update -> n, zero entries omitted like the collect form)
      * from the FIRST action the caller ran on [[merged]]. Call only
      * AFTER such an action — blocks until one completes. */
    def observedCounts(): Map[String, Long] = observed match {
      case Some(o) =>
        o.get.collect { case (k, v: Long) if v > 0 => k -> v }.toMap
      case None =>
        counters.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
  }

  val InsertOnlyCols = Set("created_at")
  val PreservedCols = Set("incorrect_frames")

  /** Generic merge on `keys`, returning per-row `action`
    * (insert|update|keep). Both inputs must share a schema.
    * `preserved` columns always keep the existing side's value (the
    * reference never puts them in `$set`). */
  def mergeWithAction(existing: DataFrame, incoming: DataFrame,
                      keys: Seq[String] = Seq("id", "_type"),
                      preserved: Set[String] = PreservedCols): DataFrame = {
    require(existing.columns.sameElements(incoming.columns),
      "existing and incoming must share a schema")
    val dataCols = existing.columns.toSeq.filterNot(keys.contains)
    val ex = existing.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("_ex"): _*)
    val in = incoming.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("_in"): _*)
    val joined = ex.join(in, keys, "full_outer")
    val hasIncoming = col("_in").isNotNull
    val hasExisting = col("_ex").isNotNull
    def pick(c: String): Column = {
      val e = col(s"_ex.$c"); val i = col(s"_in.$c")
      val v =
        if (InsertOnlyCols(c)) when(hasExisting, e).otherwise(i)
        else if (preserved(c)) e
        else when(hasIncoming, i).otherwise(e)
      v.as(c)
    }
    joined.select(
      (keys.map(col) ++ dataCols.map(pick)) :+
        when(!hasIncoming, "keep")
          .when(!hasExisting, "insert")
          .otherwise("update").as("action"): _*)
  }

  /** The full movies-upsert pipeline: frames normalization, merge with
    * precedence rules, post-merge derived columns, and sync counters. */
  def mergeMovies(existing: DataFrame, incoming: DataFrame,
                  sortBy: Option[String], now: Column,
                  keys: Seq[String] = Seq("id", "_type")): MergeResult = {
    val cols = existing.columns.toSeq

    // the reference re-derives year / is_animated / country_codes on
    // every incoming doc before the $set (app/catalog/upsert.py:61-66).
    // Guarded on the SOURCE column existing in the schema: a table that
    // carries country_codes without production_countries pre-derived
    // them upstream — recomputing from a missing source would wipe data
    // the reference derives from a present (possibly empty) field.
    var incDerived = incoming
    if (cols.contains("year") && cols.contains("release_date"))
      incDerived = incDerived.withColumn("year",
        Enrich.extractYear(col("release_date")))
    if (cols.contains("is_animated") && cols.contains("genre_ids"))
      incDerived = incDerived.withColumn("is_animated",
        Enrich.isAnimated(col("genre_ids")))
    if (cols.contains("country_codes") && cols.contains("production_countries"))
      incDerived = incDerived.withColumn("country_codes",
        Enrich.countryCodes(col("production_countries")))
    val incoming2 = incDerived
    val incNorm =
      if (cols.contains("frames")) {
        incoming.schema("frames").dataType match {
          case org.apache.spark.sql.types.ArrayType(
              st: org.apache.spark.sql.types.StructType, _) =>
            // Mongo docs are SCHEMALESS: any field the reference probes
            // with f.get(...) can be absent from a batch's inferred
            // struct — a pure-legacy batch has ONLY frame_path, and a
            // sparse one may lack width. normalizeFrames' getField
            // calls fail ANALYSIS on a missing field (review finding:
            // the old frame_path-presence flag still assumed `path`
            // exists), so project to the canonical shape first, typed
            // nulls for missing fields — exactly the reference's
            // "absent key reads as None". With frame_path always
            // materialized (null when absent), legacyAlias=true is the
            // reference's unconditional two-name probe, and a null
            // alias can never win a coalesce.
            val has = st.fieldNames.toSet
            def fld(f: Column, name: String, t: String): Column =
              (if (has(name)) f.getField(name) else lit(null).cast(t)).as(name)
            val canon = transform(col("frames"), f => struct(
              fld(f, "path", "string"), fld(f, "frame_path", "string"),
              fld(f, "aspect_ratio", "double"), fld(f, "vote_average", "double"),
              fld(f, "width", "int")))
            incoming2.withColumn("frames",
              FrameOps.normalizeFrames(canon, legacyAlias = true))
          case _ =>
            incoming2.withColumn("frames",
              FrameOps.normalizeFrames(col("frames"), legacyAlias = false))
        }
      } else incoming2

    // Sync stamps are NOT ordinary columns: the reference only ever adds
    // the sort-mode-matching stamp to `$set` (app/catalog/upsert.py:94-97),
    // so the other stamp must survive the merge untouched — otherwise a
    // vote_count sync would null out last_popularity_sync_at on every
    // updated row. Preserve both here; re-stamp the matching one below.
    val syncStampCols = Seq("last_popularity_sync_at", "last_vote_count_sync_at")
      .filter(cols.contains).toSet
    var merged = mergeWithAction(existing, incNorm, keys,
      PreservedCols ++ syncStampCols)
    val touched = col("action") =!= "keep"

    if (cols.contains("backdrop_path") && cols.contains("frames"))
      // recompute only for rows present in the batch — the reference never
      // rewrites documents it didn't fetch (app/catalog/upsert.py:88-91)
      merged = merged.withColumn("backdrop_path",
        when(touched, FrameOps.pickBackdrop(col("frames"),
          if (cols.contains("incorrect_frames")) col("incorrect_frames")
          else lit(null).cast("array<string>")))
          .otherwise(col("backdrop_path")))
    if (cols.contains("synced_at"))
      merged = merged.withColumn("synced_at",
        when(touched, now).otherwise(col("synced_at")))
    if (cols.contains("last_popularity_sync_at") && sortBy.contains("popularity.desc"))
      merged = merged.withColumn("last_popularity_sync_at",
        when(touched, now).otherwise(col("last_popularity_sync_at")))
    if (cols.contains("last_vote_count_sync_at") && sortBy.contains("vote_count.desc"))
      merged = merged.withColumn("last_vote_count_sync_at",
        when(touched, now).otherwise(col("last_vote_count_sync_at")))

    val counters = merged
      .filter(touched)
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n"))

    // coalesce: observe's sum over an all-keep (or empty) batch is
    // NULL, and observedCounts must read 0, not NPE
    val obs = new org.apache.spark.sql.Observation()
    val observedMerged = merged.observe(obs,
      coalesce(sum(when(col("action") === "insert", 1L)), lit(0L)).as("insert"),
      coalesce(sum(when(col("action") === "update", 1L)), lit(0L)).as("update"))
    MergeResult(observedMerged.drop("action"), counters, Some(obs))
  }
}
