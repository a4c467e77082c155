package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops._
import graft.queries.{CoreQueries, DataxQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver testdata tables (TESTDATA.md), paired with
  * ANSI SQL that DuckDB runs on the same parquet for the hash-compare.
  * EVERY query carries a full oracle — hash-bearing ops are built on md5
  * so the whole pipeline replays in SQL; the auto-LSH (d10b) and the
  * stateful streaming drives (d52, d53) replay as closed-form SQL, and
  * the two sketch aggregates (d19a, d28a) gate through the
  * tolerance-claim shape (deterministic exact columns + a boolean claim
  * the estimate sits inside its published guarantee — see the d19a/d28a
  * QueryDef header).
  *
  * The query definitions live in [[graft.queries.CoreQueries]] (reference
  * surface, SURVEY.md §2) and [[graft.queries.DataxQueries]] (scale
  * extensions: dedup / similarity / text analysis / multimodal).
  */
object SparkEntry {

  /** Flagship: the reference's catalog search shape (filter -> sort ->
    * paginate -> project) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs.find(_.name == "c01_catalog_search").get
      .fn(spark, "/root/testdata/sf0.001")

  def allDefs: Seq[QueryDef] = CoreQueries.defs ++ DataxQueries.defs

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

/** One verified operator: Spark implementation + DuckDB oracle SQL.
  * `oracle=None` -> rows-only check (non-SQL-expressible).  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
