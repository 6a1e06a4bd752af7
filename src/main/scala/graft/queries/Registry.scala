package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One gate-visible query: a Spark DataFrame program plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB SQL oracle over the same
  * parquet tables. Numeric results route through exact decimal arithmetic and
  * are cast to double only at the end, so Spark and DuckDB agree bit-for-bit
  * regardless of partial-aggregation order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    stagedFn: Option[(SparkSession, String) => () => DataFrame] = None,
    // true = the query (or staged thunk) is a pure read with no commit /
    // fixture side effects, so Bench may evaluate it more than once to
    // separate cold (first-run codegen/GC) cost from steady-state cost
    repeatable: Boolean = false)

object QueryDef {
  /** Two-phase gate: `prep` builds the fixture (throwaway tables, embedded
    * services, checkpoints) and returns the query as a thunk. Bench runs
    * `prep` untimed and times only the thunk + its evaluation, so fixture
    * ETL no longer pollutes the perf signal; correctness paths are
    * unchanged — `fn` runs both phases.
    */
  def staged(name: String,
             prep: (SparkSession, String) => () => DataFrame,
             oracle: Option[String],
             repeatable: Boolean = false): QueryDef =
    QueryDef(name, (s, d) => prep(s, d)(), oracle, Some(prep), repeatable)
}

object Q {
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS): Spark is µs-only, so read ns as long
      // (SURVEY §1.2) and convert explicitly where needed.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact 2-dp money/ratio arithmetic: the testdata doubles carry <=2dp. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def d(c: Column): Column = c.cast(DoubleType)
}
