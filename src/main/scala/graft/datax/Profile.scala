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

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    def distinctAgg(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"_nn_$c"),
      distinctAgg(c).as(s"_nd_$c")))
    val wide = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', _total, `_nn_$c`, `_nd_$c`")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_rows, n_nonnull, n_distinct)"))
  }
}
