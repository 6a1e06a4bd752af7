package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-QA pass a pipeline runs before training on
  * a new table/source: per column, row count, non-null count, distinct
  * count, and min/max. Engine extension (DuckDB's SUMMARIZE shape); no
  * reference-repo equivalent.
  *
  * One aggregation pass: all per-column measures ride a single `agg` (the
  * exact distinct counts plan as one Expand of rows × columns + one
  * shuffle with partial aggregation). `exact = false` swaps in
  * `approx_count_distinct` (HLL++) — the 100 TB shape, where an Expand
  * carrying every row per profiled column is the wrong plan and ±2% on
  * distinct counts is fine (accuracy pinned by gate q18). The single
  * aggregated row is reshaped to tidy per-column rows by `stack` —
  * driver-side nothing.
  */
object Profile {

  def profileTable(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileTable: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         // rsd 2%: the accuracy regime gate q18 pins for HLL++
         else approx_count_distinct(col(c), 0.02)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val agg = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __n_rows, `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    agg.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_rows, n_non_null, n_distinct, min_value, max_value)"))
  }
}
