package graft.datax

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline QA: per-column row/non-null/distinct
  * counts in ONE scan (wide aggregate, then `stack` to long form).
  *
  * `exact=true` uses count(DISTINCT) — required for the oracle compare
  * and fine up to moderate cardinality; at 100 TB set `exact=false` for
  * HyperLogLog (approx_count_distinct), one pass, no expand. */
object Profile {

  // stack() is the one string-built SQL here: the col_name literal gets
  // backslash doubling (the parser treats \ as an escape — a trailing
  // one would swallow the closing quote) then '' doubling, and alias
  // references get backtick escaping, so a column name carrying
  // quotes/backslashes/backticks/commas cannot break the parse or
  // splice expressions into the projection (review findings)
  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
  private def bt(s: String): String = "`" + s.replace("`", "``") + "`"
  // col() PARSES its argument (dots split, backticks quote) — wrap the
  // raw name in escaped backticks so it resolves as ONE literal part
  private def qcol(c: String): Column = col(bt(c))

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    def distinctAgg(c: String): Column =
      if (exact) countDistinct(qcol(c)) else approx_count_distinct(qcol(c))
    val aggs = cols.flatMap(c => Seq(
      count(qcol(c)).as(s"_nn_$c"),
      distinctAgg(c).as(s"_nd_$c")))
    val wide = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val stackArgs = cols
      .map(c => s"${sqlStr(c)}, _total, ${bt(s"_nn_$c")}, ${bt(s"_nd_$c")}")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_rows, n_nonnull, n_distinct)"))
  }

  /** [[profile]] with the HLL estimate ORACLE-GATED: one wide aggregate
    * computes BOTH the exact distinct count and the HyperLogLog
    * estimate per column (still one scan of `df`), and emits the exact
    * counts plus a `hll_within_tol` claim — |est − exact| ≤ tol·exact.
    *
    * The shape is what makes a sketch checkable by an EXACT replay
    * (DuckDB knows nothing of Spark's HLL): every emitted value is
    * deterministic — col_name / n_rows / n_nonnull / n_distinct are
    * exact and hash-compared against the oracle's own exact counts,
    * and the claim column is `true` on both sides. Transitively the
    * oracle then certifies the estimate itself: the claim was computed
    * against a Spark-side exact count the oracle independently
    * verified, so a green row proves the HLL landed within `tol` of
    * the TRUE cardinality. `tol` = 0.1 is generous against
    * approx_count_distinct's default 5% standard error (RSD 0.05);
    * the claim holds for ANY correct merge order, and a real estimator
    * bug (10%+ off) fails the hash loudly. */
  def profileWithHllGate(df: DataFrame, cols: Seq[String],
                         tol: Double = 0.1): DataFrame = {
    require(cols.nonEmpty)
    require(tol > 0.0, s"tol=$tol must be positive")
    val aggs = cols.flatMap(c => Seq(
      count(qcol(c)).as(s"_nn_$c"),
      countDistinct(qcol(c)).as(s"_nd_$c"),
      approx_count_distinct(qcol(c)).as(s"_est_$c")))
    val wide = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val stackArgs = cols
      .map(c => s"${sqlStr(c)}, _total, ${bt(s"_nn_$c")}, ${bt(s"_nd_$c")}, " +
        s"abs(${bt(s"_est_$c")} - ${bt(s"_nd_$c")}) <= $tol * ${bt(s"_nd_$c")}")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) as " +
        "(col_name, n_rows, n_nonnull, n_distinct, hll_within_tol)"))
  }
}
