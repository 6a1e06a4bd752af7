package graft.llm

import org.apache.spark.sql.DataFrame

/** Shared conditional fan-out (guide §2.5 input skew / §4 keeping UDF
  * stages wide): repartition to the session's parallelism ONLY when the
  * input arrives narrower — a no-op at real corpus widths, where scans
  * already carry ≥ defaultParallelism partitions. Use immediately before
  * interpreted/UDF-heavy map work on scan-adjacent frames; never before
  * codegen'd arithmetic (the added exchange costs more than it buys —
  * measured rule from round 16).
  */
object Fanout {
  def fanOutSmall(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
