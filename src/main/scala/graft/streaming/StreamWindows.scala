package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation for continuous ingestion: the
  * standard telemetry/metrics rollup a training-data pipeline runs next to
  * its corpus tables (events per source per hour, bytes ingested per step).
  *
  * Spark-first: this is the built-in watermark + `window()` state machine —
  * state shards by (window, keys) across executors, late data inside the
  * watermark horizon merges into open windows, and in append output mode a
  * window row is emitted exactly once, when the watermark (max observed
  * event time minus `delay`) passes the window end. Only closed windows
  * leave the state store, so state size is bounded by the horizon, not the
  * stream length — the property that matters at 100 TB/day ingest.
  */
object StreamWindows {

  /** Tumbling windows of `width` over `timeCol` (a timestamp column),
    * grouped by `keys`, with a `delay` lateness horizon. The window struct
    * is flattened to `window_start`/`window_end` (naive UTC) so results are
    * stable columns for downstream sinks and SQL oracles.
    */
  def tumblingAgg(df: DataFrame, timeCol: String, delay: String,
      width: String, keys: Seq[String])(
      aggHead: Column, aggTail: Column*): DataFrame =
    df.withWatermark(timeCol, delay)
      .groupBy(window(col(timeCol), width) +: keys.map(col): _*)
      .agg(aggHead, aggTail: _*)
      .withColumn("window_start", col("window.start").cast("timestamp_ntz"))
      .withColumn("window_end", col("window.end").cast("timestamp_ntz"))
      .drop("window")
}
