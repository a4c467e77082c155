package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops._

/** SURVEY.md §2 operator inventory, re-expressed over the driver testdata
  * tables (TESTDATA.md) so the DuckDB oracle can verify each operator on
  * shared parquet. Each QueryDef's scaladoc names the SURVEY.md §2 IDs it
  * covers; the Mongo-fidelity edge cases the oracle can't express are
  * additionally pinned by ScalaTest specs on domain fixtures (FIXTURES.md).
  *
  * Conventions for oracle parity (hash compare is exact):
  *  - every aggregate/computed column is aliased identically on both sides;
  *  - DuckDB counts/sums over integers are CAST to BIGINT (DuckDB widens to
  *    HUGEINT, Spark stays LongType);
  *  - money aggregations go through DECIMAL (exact, associative) and are
  *    CAST back to DOUBLE on both sides — float summation order would
  *    otherwise differ between engines;
  *  - results are fully ordered by a unique key (Mongo's tie order is
  *    unspecified; determinism is required for the compare).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------
    // Catalog read path (SURVEY §2.2 P1-P8, §2.3 J1-J2, §2.7 R1-R2)
    // ---------------------------------------------------------------

    /* P4+P5 filters, R1 sort, R2 skip/limit, J1 projection — the
     * /movies/search shape (reference: app/endpoints/movies.py:21-67). */
    QueryDef("c01_catalog_search",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" &&
          col("o_orderdate").between(lit("1995-01-01"), lit("1995-12-31")))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(10).limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10""")),

    /* P6 — IN-list by-ids lookup (reference: app/endpoints/movies.py:74). */
    QueryDef("c02_by_ids",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_custkey").isin(1L, 5L, 7L, 11L, 42L, 99L))
        .orderBy("c_custkey")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
      Some("""SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
        WHERE c_custkey IN (1, 5, 7, 11, 42, 99) ORDER BY c_custkey""")),

    /* P7 — point lookup on a compound key; key taken from the data so the
     * query is scale-factor independent (reference: app/endpoints/movies.py:84-87). */
    QueryDef("c03_point_lookup",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val k = li.agg(min("l_orderkey").as("_k"))
        val order = li.join(broadcast(k), col("l_orderkey") === col("_k"))
        val k2 = order.agg(min("l_linenumber").as("_k2"))
        order.join(broadcast(k2), col("l_linenumber") === col("_k2"))
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
          AND l_linenumber = (SELECT min(l_linenumber) FROM lineitem
                              WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem))""")),

    /* P8 — unanchored case-insensitive regex OR across two columns, the
     * Mongo $regex/$options semantics (reference: app/endpoints/catalog.py:49-53). */
    QueryDef("c04_regex_search",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_name").rlike("(?i)widget") || col("p_type").rlike("(?i)^econ"))
        .orderBy("p_partkey")
        .select("p_partkey", "p_name", "p_type"),
      Some("""SELECT p_partkey, p_name, p_type FROM part
        WHERE regexp_matches(p_name, '(?i)widget') OR regexp_matches(p_type, '(?i)^econ')
        ORDER BY p_partkey""")),

    /* P11 prefix match + J2 column-pruned projection
     * (reference: app/main.py:98; app/endpoints/movies.py:98). */
    QueryDef("c05_prefix_projection",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_type").startsWith("PROMO"))
        .orderBy("p_partkey")
        .select("p_partkey", "p_type", "p_size"),
      Some("""SELECT p_partkey, p_type, p_size FROM part
        WHERE p_type LIKE 'PROMO%' ORDER BY p_partkey""")),

    /* P9 — anchored regex on a key column (reference: app/main.py:201-202). */
    QueryDef("c06_anchored_regex",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_brand").rlike("^Brand#[0-9]$"))
        .orderBy("p_partkey")
        .select("p_partkey", "p_brand"),
      Some("""SELECT p_partkey, p_brand FROM part
        WHERE regexp_matches(p_brand, '^Brand#[0-9]$') ORDER BY p_partkey""")),

    /* F2/F3/F4 — cursor-key build + parse round-trip
     * (reference: app/sync_years.py:18-20, app/main.py:100-105,196). */
    QueryDef("c07_key_build_parse",
      (s, dir) => t(s, dir, "orders")
        .select(concat_ws(":", lit("years"), lower(col("o_orderstatus")),
          year(col("o_orderdate"))).as("key"))
        .distinct()
        .withColumn("content_type", Enrich.parseKeyContentType(col("key")))
        .withColumn("year", Enrich.parseKeyYear(col("key")))
        .orderBy("key"),
      Some("""WITH keys AS (
          SELECT DISTINCT 'years:' || lower(o_orderstatus) || ':' || CAST(year(o_orderdate) AS INT) AS key
          FROM orders)
        SELECT key, string_split(key, ':')[2] AS content_type,
               CAST(string_split(key, ':')[-1] AS INT) AS year
        FROM keys ORDER BY key""")),

    /* SO4 + F2 + F12 — year-cursor status with zero-backfill for missing
     * years (reference: app/main.py:176-206). Orders only span 1995-2001,
     * so 2002/2003 exercise the backfill. */
    QueryDef("c08_year_sync_status",
      (s, dir) => {
        val cursors = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .groupBy(year(col("o_orderdate")).as("_y"))
          .agg(
            count(lit(1)).cast("int").as("page"),
            count(when(col("o_orderpriority") === "1-URGENT", 1)).as("inserted"),
            count(when(col("o_orderpriority") =!= "1-URGENT", 1)).as("updated"))
          .select(Enrich.buildYearKey(lit("movie"), col("_y")).as("key"),
            col("page"), col("inserted"), col("updated"))
        MetaSync.yearSyncStatus(s, cursors, "movie", 1995, 2003)
      },
      Some("""WITH cursors AS (
          SELECT 'years:movie:' || CAST(year(o_orderdate) AS INT) AS key,
                 CAST(count(*) AS INT) AS page,
                 CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS inserted,
                 CAST(count(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 END) AS BIGINT) AS updated
          FROM orders WHERE o_orderstatus = 'F' GROUP BY year(o_orderdate)),
        expected AS (SELECT CAST(generate_series AS INT) AS year FROM generate_series(1995, 2003))
        SELECT 'years:movie:' || e.year AS key, e.year AS year,
               coalesce(c.page, 0) AS page,
               CAST(coalesce(c.inserted, 0) AS BIGINT) AS inserted,
               CAST(coalesce(c.updated, 0) AS BIGINT) AS updated
        FROM expected e LEFT JOIN cursors c ON c.key = 'years:movie:' || e.year
        ORDER BY year""")),

    // ---------------------------------------------------------------
    // Joins (SURVEY §2.4)
    // ---------------------------------------------------------------

    /* JN1 inner enrichment join + JN2 left-outer + F7 coalesce; small dims
     * broadcast (reference: app/sync.py:118-124). */
    QueryDef("j01_enrich_join",
      (s, dir) => t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"), "inner")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"), "left_outer")
        .select(col("o_orderkey"), col("c_name"),
          coalesce(col("n_name"), lit("UNKNOWN")).as("nation"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, c_name, coalesce(n_name, 'UNKNOWN') AS nation
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        ORDER BY o_orderkey""")),

    /* JN6 — existence guard as a left-semi join
     * (reference: app/endpoints/frames.py:47-49). */
    QueryDef("j02_exists_guard",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .orderBy("c_custkey")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------------
    // Aggregations (SURVEY §2.5)
    // ---------------------------------------------------------------

    /* A1 — reports/stats: group + count + reason histogram (flat form;
     * reference: app/endpoints/reports.py:20-46). */
    QueryDef("a01_reports_stats",
      (s, dir) => {
        val reports = t(s, dir, "events").select(
          col("user_id").as("movie_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("frame_path"),
          lit("event").as("content_type"),
          col("event_type").as("reason"))
        Reports.reportStatsFlat(reports)
          .orderBy("movie_id", "frame_path", "reason")
      },
      Some("""WITH reports AS (
          SELECT user_id AS movie_id, strftime(ts, '%Y-%m-%d') AS frame_path,
                 'event' AS content_type, event_type AS reason FROM events),
        g AS (
          SELECT movie_id, frame_path, content_type, reason,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(count(*)) OVER (PARTITION BY movie_id, frame_path, content_type) AS BIGINT) AS "count"
          FROM reports GROUP BY movie_id, frame_path, content_type, reason)
        -- falsy reasons leave the rows but stay in the total (the
        -- reference's Counter filter over a $sum of every report)
        SELECT * FROM g WHERE reason IS NOT NULL AND reason <> ''
        ORDER BY movie_id, frame_path, reason""")),

    /* A2 — per-year coverage pipeline: count(col) null-skip ≡ Mongo
     * $sum($cond($ifNull)), guarded ratio, sort
     * (reference: app/endpoints/meta_sync.py:22-57). */
    QueryDef("a02_sync_coverage",
      (s, dir) => {
        val movies = t(s, dir, "orders").select(
          col("o_orderkey").as("id"),
          lit("movie").as("_type"),
          year(col("o_orderdate")).as("year"),
          when(col("o_orderpriority") === "1-URGENT", col("o_orderdate"))
            .as("last_popularity_sync_at"),
          when(col("o_orderstatus") === "F", col("o_orderdate"))
            .as("last_vote_count_sync_at"))
        MetaSync.coverage(movies, "movie", 1995, 2000)
      },
      Some("""WITH movies AS (
          SELECT o_orderkey AS id, 'movie' AS _type, CAST(year(o_orderdate) AS INT) AS year,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END AS last_popularity_sync_at,
                 CASE WHEN o_orderstatus = 'F' THEN o_orderdate END AS last_vote_count_sync_at
          FROM orders)
        SELECT year, CAST(count(*) AS BIGINT) AS total,
               CAST(count(last_popularity_sync_at) AS BIGINT) AS with_popularity,
               CAST(count(last_vote_count_sync_at) AS BIGINT) AS with_vote_count,
               max(last_popularity_sync_at) AS last_popularity_sync_at,
               max(last_vote_count_sync_at) AS last_vote_count_sync_at,
               CASE WHEN count(*) > 0 THEN CAST(count(last_popularity_sync_at) AS DOUBLE) / count(*) ELSE 0.0 END AS popularity_coverage,
               CASE WHEN count(*) > 0 THEN CAST(count(last_vote_count_sync_at) AS DOUBLE) / count(*) ELSE 0.0 END AS vote_count_coverage
        FROM movies WHERE _type = 'movie' AND year BETWEEN 1995 AND 2000
        GROUP BY year ORDER BY year""")),

    /* A3 + P10 + F8 — windowed counts relative to a data-derived "now"
     * (reference: app/main.py:121-127). */
    QueryDef("a03_error_window_counts",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("ts").as("timestamp"))
        val now = e.agg(max("timestamp").as("_now"))
        Reports.errorCounts(e.crossJoin(broadcast(now)), col("_now"))
      },
      Some("""SELECT
          CAST(count(CASE WHEN ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR THEN 1 END) AS BIGINT) AS errors_last_hour,
          CAST(count(CASE WHEN ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS THEN 1 END) AS BIGINT) AS errors_last_day,
          CAST(count(*) AS BIGINT) AS errors_total
        FROM events""")),

    // ---------------------------------------------------------------
    // Window / top-k / dedup (SURVEY §2.6)
    // ---------------------------------------------------------------

    /* O17 — argmax per group via max_by(struct): one shuffle with partial
     * aggregation (reference: app/utils/frames.py:4-19). */
    QueryDef("w01_argmax_backdrop",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(max_by(col("l_partkey"),
          struct(col("l_extendedprice"), col("l_quantity"),
            (-col("l_linenumber")).as("_np"))).as("backdrop_partkey"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, l_partkey AS backdrop_partkey FROM (
          SELECT l_orderkey, l_partkey,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_quantity DESC, l_linenumber ASC) AS rn
          FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""")),

    /* O19 — dedup keeping the FIRST occurrence
     * (reference: app/tmdb_client.py:199-206). */
    QueryDef("w02_dedup_keep_first",
      (s, dir) => FrameOps.dedupKeepFirst(t(s, dir, "lineitem"),
          Seq("l_partkey"), Seq("l_orderkey", "l_linenumber"))
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_partkey"),
      Some("""SELECT l_partkey, l_orderkey, l_linenumber, l_quantity FROM (
          SELECT *, row_number() OVER (PARTITION BY l_partkey
            ORDER BY l_orderkey ASC, l_linenumber ASC) AS rn
          FROM lineitem) WHERE rn = 1 ORDER BY l_partkey""")),

    /* O20 — dedup keeping the max-valued row, first-on-tie
     * (reference: app/catalog/upsert.py:26-34). */
    QueryDef("w03_dedup_keep_max",
      (s, dir) => FrameOps.dedupKeepMax(t(s, dir, "lineitem"),
          Seq("l_partkey"), "l_quantity", Seq("l_orderkey", "l_linenumber"))
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_partkey"),
      Some("""SELECT l_partkey, l_orderkey, l_linenumber, l_quantity FROM (
          SELECT *, row_number() OVER (PARTITION BY l_partkey
            ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC) AS rn
          FROM lineitem) WHERE rn = 1 ORDER BY l_partkey""")),

    // ---------------------------------------------------------------
    // Array set-ops + higher-order filters (SURVEY §2.8, P13)
    // ---------------------------------------------------------------

    /* SO1 $addToSet / SO2 $pull as array_union/array_except
     * (reference: app/endpoints/frames.py:52-55,93-96). */
    QueryDef("s01_array_set_ops",
      (s, dir) => t(s, dir, "part").select(
          col("p_partkey"),
          concat_ws(",", array_sort(array_union(split(col("p_name"), " "),
            lit(Array("extra", "cold"))))).as("added"),
          concat_ws(",", array_sort(array_except(split(col("p_name"), " "),
            lit(Array("widget", "bolt"))))).as("removed"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
          array_to_string(list_sort(list_distinct(list_cat(string_split(p_name, ' '), ['extra','cold']))), ',') AS added,
          array_to_string(list_sort(list_filter(list_distinct(string_split(p_name, ' ')), x -> NOT list_contains(['widget','bolt'], x))), ',') AS removed
        FROM part ORDER BY p_partkey""")),

    /* P12+O18+O19+F11 — the full frames array pipeline under oracle:
     * aspect-ratio band filter, keep-FIRST dedup by path, sort by
     * (vote_average desc, width desc) — array-level, zero shuffle beyond
     * the frames assembly (reference: app/tmdb_client.py:169-282).
     * Frames are synthesized per order from lineitem integer columns
     * (float-derived values would cast-round differently across
     * engines); duplicate l_partkey within an order exercises dedup. */
    QueryDef("s03_frames_pipeline",
      (s, dir) => {
        val frame = struct(
          concat(lit("/"), col("l_partkey"), lit(".jpg")).as("path"),
          (lit(1.4) + (col("l_partkey") % 8) / lit(10.0)).as("aspect_ratio"),
          (((col("l_partkey") * 7 + col("l_linenumber")) % 97) / lit(10.0)).as("vote_average"),
          (col("l_suppkey") % 4000).cast("int").as("width"))
        // 10% order sample: this query exists to oracle-verify the
        // ARRAY-level ops (the table-level scale path is w02/w03);
        // per-array interpreted lambdas are not the 100 TB plan shape
        val perOrder = t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 10 === 0)
          .groupBy("l_orderkey")
          .agg(transform(
            array_sort(collect_list(struct(col("l_linenumber").as("pos"), frame.as("f")))),
            x => x.getField("f")).as("frames"))
        perOrder.select(col("l_orderkey"),
            posexplode(FrameOps.filterBackdrops(col("frames"))).as(Seq("pos", "f")))
          .select(col("l_orderkey"), col("pos"),
            col("f.path").as("path"), col("f.vote_average").as("va"),
            col("f.width").as("width"))
          .orderBy("l_orderkey", "pos")
      },
      Some("""WITH fr AS (
          SELECT l_orderkey, l_linenumber AS lpos,
                 '/' || CAST(l_partkey AS VARCHAR) || '.jpg' AS path,
                 1.4 + (l_partkey % 8) / 10.0 AS ar,
                 ((l_partkey * 7 + l_linenumber) % 97) / 10.0 AS va,
                 CAST(l_suppkey % 4000 AS INT) AS width
          FROM lineitem WHERE l_orderkey % 10 = 0),
        banded AS (SELECT * FROM fr
          WHERE ar BETWEEN 1.5 AND 2.2
            AND path IS NOT NULL AND path <> '' AND va >= 0),
        dedup AS (
          -- l_linenumber is NOT unique per order in this testdata; the
          -- full (lpos, frame) tuple mirrors Spark's struct tie-break
          SELECT * FROM (SELECT *, row_number() OVER (
              PARTITION BY l_orderkey, path
              ORDER BY lpos, ar, va, width) AS _rn FROM banded)
          WHERE _rn = 1)
        SELECT l_orderkey,
               -- exact (va, width) ties keep FIRST-APPEARANCE order
               -- (reference stable reverse sort): the kept row's lpos is
               -- the path's first appearance; path breaks equal-lpos
               -- appearances (the frames array is sorted (lpos, frame)
               -- and the frame struct leads with path)
               CAST(row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY va DESC, width DESC, lpos, path) - 1 AS INT) AS pos,
               path, va, width
        FROM dedup ORDER BY l_orderkey, pos""")),

    /* F5+F6+SO3 — genre/country derivations + present/missing partition
     * of a request list vs the document's codes (reference:
     * app/sync.py:104-107, app/catalog/upsert.py:65-66,
     * app/endpoints/frames.py:67-69). Every 5th supplier has a NULL iso
     * code (F6 must drop it, not propagate). */
    QueryDef("s04_country_codes",
      (s, dir) => {
        val country = struct(
          when(col("l_suppkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("C"), col("l_suppkey") % 25)).as("iso_3166_1"),
          concat(lit("Country "), col("l_suppkey")).as("name"))
        val req = Seq("C1", "C2", "C3")
        val perOrder = t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 10 === 0)
          .groupBy("l_orderkey")
          .agg(transform(
            array_sort(collect_list(struct(col("l_linenumber").as("pos"), country.as("c")))),
            x => x.getField("c")).as("production_countries"))
        perOrder.select(col("l_orderkey"),
            Enrich.countryCodes(col("production_countries")).as("_codes"))
          .select(col("l_orderkey"),
            concat_ws(",", col("_codes")).as("codes"),
            array_contains(col("_codes"), "C7").as("has_c7"),
            concat_ws(",", array_intersect(lit(req.toArray), col("_codes"))).as("present"),
            concat_ws(",", array_except(lit(req.toArray), col("_codes"))).as("missing"))
          .orderBy("l_orderkey")
      },
      Some("""WITH pc AS (
          SELECT l_orderkey,
                 list(CASE WHEN l_suppkey % 5 = 0 THEN NULL
                           ELSE 'C' || CAST(l_suppkey % 25 AS VARCHAR) END
                      ORDER BY l_linenumber,
                        CASE WHEN l_suppkey % 5 = 0 THEN NULL
                             ELSE 'C' || CAST(l_suppkey % 25 AS VARCHAR) END
                          ASC NULLS FIRST,
                        'Country ' || CAST(l_suppkey AS VARCHAR)) AS isos
          FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY 1),
        codes AS (
          SELECT l_orderkey, list_filter(isos, x -> x IS NOT NULL) AS cs FROM pc)
        SELECT l_orderkey,
               -- array_to_string([]) is NULL in DuckDB, '' in Spark
               coalesce(array_to_string(cs, ','), '') AS codes,
               list_contains(cs, 'C7') AS has_c7,
               coalesce(array_to_string(list_filter(['C1','C2','C3'], x -> list_contains(cs, x)), ','), '') AS present,
               coalesce(array_to_string(list_filter(['C1','C2','C3'], x -> NOT list_contains(cs, x)), ','), '') AS missing
        FROM codes ORDER BY l_orderkey""")),

    /* P13 — anti-membership higher-order filter
     * (reference: app/utils/frames.py:11-12). */
    QueryDef("s02_anti_membership",
      (s, dir) => t(s, dir, "part").select(
          col("p_partkey"),
          size(filter(split(col("p_name"), " "),
            x => !array_contains(lit(Array("cold", "small")), x))).as("n_valid"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
          CAST(len(list_filter(string_split(p_name, ' '), x -> NOT list_contains(['cold','small'], x))) AS INT) AS n_valid
        FROM part ORDER BY p_partkey""")),

    // ---------------------------------------------------------------
    // Merge / upsert (SURVEY §2.1 S11, §2.4 JN4-JN5, §2.5 A5)
    // ---------------------------------------------------------------

    /* S11+JN4+JN5 — merge-preserving upsert: incoming wins ($set), but
     * created_at is insert-only ($setOnInsert); per-row action
     * classification from the same join
     * (reference: app/catalog/upsert.py:50-103). */
    QueryDef("m01_merge_upsert",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val existing = o.filter(col("o_orderkey") % 3 =!= 0).select(
          col("o_orderkey").as("id"), lit("movie").as("_type"),
          col("o_orderpriority").as("title"),
          col("o_totalprice").cast("decimal(18,2)").as("price"),
          col("o_orderdate").as("created_at"))
        val incoming = o.filter(col("o_orderkey") % 2 === 0).select(
          col("o_orderkey").as("id"), lit("movie").as("_type"),
          concat(lit("upd "), col("o_orderpriority")).as("title"),
          (col("o_totalprice").cast("decimal(18,2)") * 2).as("price"),
          // driver parquet timestamps read as TIMESTAMP_NTZ; literals must
          // match or Spark coerces the merged column to the tz-aware type
          lit("2026-01-01").cast("timestamp_ntz").as("created_at"))
        graft.merge.Upsert.mergeWithAction(
            existing, incoming.select(existing.columns.map(col): _*))
          .withColumn("price", col("price").cast("double"))
          .orderBy("id")
      },
      Some("""WITH existing AS (
          SELECT o_orderkey AS id, 'movie' AS _type, o_orderpriority AS title,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderdate AS created_at
          FROM orders WHERE o_orderkey % 3 <> 0),
        incoming AS (
          SELECT o_orderkey AS id, 'movie' AS _type, 'upd ' || o_orderpriority AS title,
                 CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS price,
                 TIMESTAMP '2026-01-01' AS created_at
          FROM orders WHERE o_orderkey % 2 = 0)
        SELECT coalesce(i.id, e.id) AS id, coalesce(i._type, e._type) AS _type,
               CASE WHEN i.id IS NOT NULL THEN i.title ELSE e.title END AS title,
               CAST(CASE WHEN i.id IS NOT NULL THEN i.price ELSE e.price END AS DOUBLE) AS price,
               CASE WHEN e.id IS NOT NULL THEN e.created_at ELSE i.created_at END AS created_at,
               CASE WHEN i.id IS NULL THEN 'keep' WHEN e.id IS NULL THEN 'insert' ELSE 'update' END AS action
        FROM existing e FULL OUTER JOIN incoming i ON e.id = i.id AND e._type = i._type
        ORDER BY id""")),

    /* A5 — inserted/updated sync counters from the merge's existence
     * probe (reference: app/sync_top.py:210-221). */
    QueryDef("m02_merge_counters",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val existing = o.filter(col("o_orderkey") % 3 =!= 0).select(
          col("o_orderkey").as("id"), lit("movie").as("_type"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        val incoming = o.filter(col("o_orderkey") % 2 === 0).select(
          col("o_orderkey").as("id"), lit("movie").as("_type"),
          (col("o_totalprice").cast("decimal(18,2)") * 2).as("price"))
        graft.merge.Upsert.mergeWithAction(existing, incoming)
          .filter(col("action") =!= "keep")
          .groupBy("action").agg(count(lit(1)).as("n"))
          .orderBy("action")
      },
      Some("""WITH existing AS (
          SELECT o_orderkey AS id FROM orders WHERE o_orderkey % 3 <> 0),
        incoming AS (
          SELECT o_orderkey AS id FROM orders WHERE o_orderkey % 2 = 0)
        SELECT CASE WHEN e.id IS NULL THEN 'insert' ELSE 'update' END AS action,
               CAST(count(*) AS BIGINT) AS n
        FROM existing e FULL OUTER JOIN incoming i ON e.id = i.id
        WHERE i.id IS NOT NULL GROUP BY 1 ORDER BY action""")),

    // ---------------------------------------------------------------
    // Sorts / scalar functions (SURVEY §2.7 R1, §2.9 F1/F7/F12, §2.5 A4)
    // ---------------------------------------------------------------

    /* R1 — Mongo sorts missing/null first on asc (≡ Spark asc_nulls_first
     * default); DuckDB defaults NULLS LAST, so the oracle spells it out
     * (reference: app/endpoints/movies.py:53-66). */
    QueryDef("r01_sort_nulls",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).as("p"))
        .orderBy(col("p").asc, col("o_orderkey").asc)
        .limit(100),
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS p
        FROM orders ORDER BY p ASC NULLS FIRST, o_orderkey LIMIT 100""")),

    /* R1 desc — Mongo sorts missing/null LAST on desc ≡ Spark's default
     * desc_nulls_last; DuckDB defaults NULLS FIRST on DESC, so the
     * oracle spells it out (reference: app/endpoints/movies.py:53-66). */
    QueryDef("r02_sort_nulls_desc",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).as("p"))
        .orderBy(col("p").desc, col("o_orderkey").asc)
        .limit(100),
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS p
        FROM orders ORDER BY p DESC NULLS LAST, o_orderkey LIMIT 100""")),

    /* F1 + P5 — year extraction from a release_date STRING (null on
     * malformed) + lexicographic string-date range filter
     * (reference: app/catalog/upsert.py:37-43; app/endpoints/movies.py:46-51). */
    QueryDef("f01_year_extract",
      (s, dir) => {
        val rd = date_format(col("o_orderdate"), "yyyy-MM-dd")
        t(s, dir, "orders")
          .select(col("o_orderkey").as("id"), rd.as("release_date"),
            when(col("o_orderkey") % 7 === 0, lit("19xx-bad")).otherwise(rd).as("rd_dirty"))
          .filter(col("release_date") >= "1996-01-01" && col("release_date") <= "1997-12-31")
          .withColumn("year", graft.ops.Enrich.extractYear(col("rd_dirty")))
          .orderBy("id")
      },
      Some("""WITH m AS (
          SELECT o_orderkey AS id, strftime(o_orderdate, '%Y-%m-%d') AS release_date,
                 CASE WHEN o_orderkey % 7 = 0 THEN '19xx-bad'
                      ELSE strftime(o_orderdate, '%Y-%m-%d') END AS rd_dirty
          FROM orders)
        SELECT id, release_date, rd_dirty, TRY_CAST(substr(rd_dirty, 1, 4) AS INT) AS year
        FROM m WHERE release_date >= '1996-01-01' AND release_date <= '1997-12-31'
        ORDER BY id""")),

    /* F7/F12 — defaulting after a left join (cursor defaults, or-coalesce)
     * (reference: app/sync_top.py:24, app/main.py:181,194). */
    QueryDef("f02_coalesce_defaults",
      (s, dir) => {
        val agg = t(s, dir, "orders").groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        t(s, dir, "customer")
          .join(agg, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend").cast("double"), lit(0.0)).as("spend"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
               CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
               coalesce(CAST(spend AS DOUBLE), 0.0) AS spend
        FROM customer LEFT JOIN (
          SELECT o_custkey, count(*) AS n_orders,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
          FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
        ORDER BY c_custkey""")),

    /* A4 — total row count (the estimated_document_count analogue; Spark
     * serves it from parquet footers) (reference: app/main.py:127). */
    QueryDef("a04_total_count",
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem")),

    // ---------------------------------------------------------------
    // Headline analytics (bench anchors; SURVEY §6)
    // ---------------------------------------------------------------

    /* TPC-H Q1 shape: scan-heavy partial-agg pipeline. The money columns
     * are exact 2-decimal values, so they are cast to DECIMAL *before* any
     * arithmetic: every intermediate is exact, the sums are associative,
     * and Spark and DuckDB agree bit-for-bit after the final cast to
     * DOUBLE. (Casting a computed double to decimal instead rounds via
     * shortest-string in Spark vs exact binary in DuckDB — boundary cells
     * differ.) */
    QueryDef("h01_pricing_summary",
      (s, dir) => {
        val ep = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(4,2)")
        val tax = col("l_tax").cast("decimal(4,2)")
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(ep).cast("double").as("sum_base_price"),
            sum(ep * (lit(1) - disc)).cast("double").as("sum_disc_price"),
            sum(ep * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          sum(l_quantity) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
          CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    /* Salted two-phase aggregation — identical results to the direct
     * GROUP BY (the oracle runs the direct form), with hot keys spread
     * over 16 reducer buckets. The skew tool for keys AQE can't split. */
    QueryDef("k01_salted_agg",
      (s, dir) => SkewOps.saltedAgg(t(s, dir, "lineitem"), Seq("l_returnflag"),
          saltBy = col("l_orderkey"), buckets = 16,
          aggs = Seq(
            ("sum_qty", (c: Column) => sum(c.cast("decimal(18,2)")),
              (p: String) => sum(col(p))),
            ("n", (_: Column) => count(lit(1)),
              (p: String) => sum(col(p)))),
          valueCol = "l_quantity")
        .select(col("l_returnflag"),
          col("sum_qty").cast("double").as("sum_qty"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    /* TPC-H Q3 shape: selective dim filter -> broadcast customer ->
     * shuffle join orders⋈lineitem -> partial/final agg -> global top-10
     * (TakeOrderedAndProject — no full sort at scale). The bench anchor
     * for join strategy. */
    QueryDef("h02_top_revenue",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01"))
        val li = t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("1997-01-01"))
        val rev = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
        ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(sum(rev).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    /* A4+ — distinct aggregation (count(DISTINCT) per group): plans as
     * a two-phase expand/aggregate; the per-group distinct-customer
     * count every analytics surface needs. */
    QueryDef("a05_distinct_counts",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    /* Rollup subtotals: (flag, status) -> (flag) -> grand total.
     * sum/count are algebraic, so we pre-aggregate the fact table to its
     * ~6 (flag, status) groups FIRST and rollup only that tiny aggregate:
     * a bare `rollup` on lineitem makes Expand emit 3 rows per RAW input
     * row before the partial aggregate (3x pre-shuffle work at any
     * scale). Decimal partial sums re-sum exactly, so results are
     * bit-identical to the single-pass form. GROUPING() markers make
     * subtotal rows (NULL keys) sortable deterministically. */
    QueryDef("h05_rollup_summary",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("part_qty"),
          count(lit(1)).as("part_n"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(col("part_qty")).cast("double").as("sum_qty"),
          sum(col("part_n")).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST,
                 l_linestatus ASC NULLS FIRST""")),

    /* TPC-H Q5 shape: five-table join — selective region filter walks
     * down broadcast dims (region -> nation -> supplier/customer), the
     * fact join stays on lineitem⋈orders, same-nation predicate couples
     * the two dim paths. The multi-join planning anchor; exercises the
     * region/supplier tables. */
    QueryDef("h04_local_supplier_revenue",
      (s, dir) => {
        val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val rev = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1998-01-01")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "customer")),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region.select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(rev).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      Some("""SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    /* TPC-H Q9 shape: product-line profit by nation and year — the
     * OTHER canonical multi-join anchor (h04's Q5 walks dims down to
     * one fact shuffle; Q9's selective part filter broadcasts into the
     * fact BEFORE the orders join, so the expensive fact⋈fact join sees
     * only matching lines). */
    QueryDef("h06_part_profit",
      (s, dir) => {
        val rev = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .filter(col("p_name").contains("widget"))
            .select("p_partkey")), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(sum(rev).cast("double").as("profit"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name").asc, col("o_year").desc)
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS profit,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, o_year
        ORDER BY n_name ASC, o_year DESC""")),

    /* TPC-H Q17 shape: revenue lost to small-quantity orders of one
     * brand — the CORRELATED SCALAR SUBQUERY (per-part avg quantity)
     * decorrelated by hand into an aggregate + join, which is exactly
     * what Catalyst's RewriteCorrelatedScalarSubquery produces. The
     * comparison `qty < 0.2 * avg` is restated as `5*qty*cnt < sum`:
     * l_quantity is integer-valued, so every product and partial sum is
     * an exact double — no engine-order float divergence. Both the
     * brand prune and the per-part aggregate are data-PROPORTIONAL
     * (|part|/brands), so neither is hint-broadcast; AQE decides.
     * Lineitem is scanned twice (probe + aggregate) — the canonical
     * Q17 plan. */
    QueryDef("h07_small_qty_revenue",
      (s, dir) => {
        val pk = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#1").select("p_partkey")
        val li = t(s, dir, "lineitem")
          .join(pk, col("l_partkey") === col("p_partkey"))
        val perPart = li.groupBy(col("l_partkey").as("pk"))
          .agg(sum("l_quantity").as("s"), count(lit(1)).as("c"))
        li.join(perPart, col("l_partkey") === col("pk"))
          .filter(lit(5) * col("l_quantity") * col("c") < col("s"))
          .agg(
            (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              / 7.0).as("avg_yearly"),
            count(lit(1)).as("n_items"))
      },
      Some("""WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
        a AS (
          SELECT l_partkey AS pk, sum(l_quantity) AS s, count(*) AS c
          FROM lineitem JOIN p ON l_partkey = p_partkey GROUP BY 1)
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN p ON l_partkey = p_partkey
        JOIN a ON l_partkey = pk
        WHERE 5 * l_quantity * c < s""")),

    /* TPC-H Q18 shape: customers with very large orders — a HAVING-
     * filtered aggregate used as a semi-join prune on orders, then the
     * customer enrichment, then a top-100 by order value. The final
     * sort+limit plans as TakeOrderedAndProject (per-partition top-k,
     * single driver merge of 100-row heaps — never a global sort).
     * sum(l_quantity) is exact in double (integer-valued), so the
     * HAVING threshold cannot flip across engines; ties on o_totalprice
     * break by unique o_orderkey. */
    QueryDef("h08_large_orders",
      (s, dir) => {
        val sums = t(s, dir, "lineitem").groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 250)
        t(s, dir, "orders")
          .join(sums, col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"),
            col("o_totalprice").cast("double").as("o_totalprice"),
            col("sum_qty").cast("double").as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(sum_qty AS DOUBLE) AS sum_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) s
          ON o_orderkey = s.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100""")),

    /* Headline window-function shape: per-customer running totals and
     * order ranks — one shuffle on the partition key, sort within
     * partitions, no global sort. DECIMAL keeps the running sum exact
     * and associative across engines. */
    QueryDef("h03_running_totals",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .filter(col("o_custkey") % 10 === 0)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            row_number().over(w).as("order_seq"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double").as("running_spend"))
          .orderBy("o_custkey", "order_seq")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(row_number() OVER w AS INT) AS order_seq,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend
        FROM orders WHERE o_custkey % 10 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, order_seq""")),

    /* TPC-H Q13 shape: order-count distribution per customer through a
     * PREDICATED left outer join (the predicate lives in the join
     * condition, not a WHERE — customers with zero surviving orders must
     * survive with c_count = 0). Two-phase aggregation: custkey shuffle
     * for the per-customer count, then a tiny c_count-domain shuffle for
     * the distribution. */
    QueryDef("h09_custdist",
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
          SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    /* TPC-H Q21-SHAPE anchor (adapted to this schema: "returned" stands
     * in for "late"): per returned lineitem of supplier s in a finished
     * order, EXISTS another supplier in the order and NOT EXISTS another
     * supplier with a returned item. The classic double-correlated-
     * subquery stressor — and the Spark-first point: BOTH subqueries
     * decorrelate into ONE aggregate over lineitem (distinct-supplier
     * count, distinct returning-supplier count, the sole returner, its
     * returned-row count), so the plan is semi join + one aggregation
     * pass — no self-joins at all. The oracle keeps the faithful
     * EXISTS/NOT-EXISTS form; the hash compare proves the
     * decorrelation equivalent. */
    QueryDef("h10_sole_return_supplier",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val fOrders = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")
        val perOrder = li
          .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_orderkey")
          .agg(
            countDistinct(col("l_suppkey")).as("_ns"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("_nrs"),
            min(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("_rsupp"),
            count(when(col("l_returnflag") === "R", lit(1))).as("_rrows"))
          .filter(col("_ns") >= 2 && col("_nrs") === 1)
        val byS = perOrder.groupBy(col("_rsupp").as("s_suppkey"))
          .agg(sum("_rrows").as("_w"))
        t(s, dir, "supplier").join(byS, "s_suppkey")
          .groupBy("s_name").agg(sum("_w").cast("long").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""))
  )
}
