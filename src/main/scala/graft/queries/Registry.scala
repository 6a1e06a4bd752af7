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
      // events.ts convention: every query (and every DuckDB oracle, via
      // epoch_ns(ts)) treats ts as an epoch-NANOSECOND long. The parquet
      // has shipped it both as TIMESTAMP(NANOS) (readable only as ns-long,
      // Spark being µs-only) and as TIMESTAMP(MICROS); normalize either
      // encoding to the ns-long convention here so query code never cares.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, unix_micros}
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case TimestampNTZType | TimestampType =>
          // NTZ→LTZ cast interprets in the session zone; it is only a
          // naive-UTC epoch (what DuckDB's epoch_ns(ts) yields) when the
          // session zone is UTC. Every entry point (Verify/Bench/tests)
          // pins it — assert, so an entry point that forgets fails loudly
          // instead of silently shifting every events timestamp.
          require(s.conf.get("spark.sql.session.timeZone") == "UTC",
            "events.ts normalization requires spark.sql.session.timeZone=UTC; " +
              s"got ${s.conf.get("spark.sql.session.timeZone")}")
          raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
        case _ => raw // already the ns-long encoding
      }
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact 2-dp money/ratio arithmetic: the testdata doubles carry <=2dp. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def d(c: Column): Column = c.cast(DoubleType)
}
