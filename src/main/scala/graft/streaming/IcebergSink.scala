package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.catalog.Catalog
import graft.table.{Inspect, Table, Writer}

/** Structured Streaming → Iceberg sink: a `foreachBatch` function that
  * commits each microbatch as one fast-append snapshot.
  *
  * Exactly-once appends: every commit records its batch id in the snapshot
  * summary (`streaming-batch-id`); after a restart, Spark redelivers the
  * last uncommitted-to-sink batch, and any batch id at or below the
  * high-water mark on the current ancestry is skipped instead of
  * double-appended — the same idempotence contract the Iceberg Spark sink
  * implements with its own summary property.
  *
  * Usage:
  * {{{
  * stream.writeStream
  *   .foreachBatch(IcebergSink.append(catalog, "events"))
  *   .start()
  * }}}
  */
object IcebergSink {

  val BatchIdSummaryKey = "streaming-batch-id"

  def append(catalog: Catalog, tableName: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appendBatch(catalog, tableName, batch, batchId)

  def appendBatch(catalog: Catalog, tableName: String, batch: DataFrame,
      batchId: Long): Unit = {
    val table = catalog.loadTable(tableName)
    if (lastCommittedBatch(table).exists(_ >= batchId)) return // replay
    val spark = batch.sparkSession
    val files = Writer.writeDataFiles(spark, table, batch)
    if (files.isEmpty) return
    Writer.commitSnapshot(table, "append", addedFiles = files,
      removedPaths = Set.empty, addedDeleteFiles = Nil,
      extraSummary = Map(BatchIdSummaryKey -> batchId.toString))
    ()
  }

  /** Highest streaming batch id committed on the current ancestry. */
  def lastCommittedBatch(table: Table): Option[Long] =
    Inspect.ancestorsOfCurrent(table)
      .flatMap(_.summary.get(BatchIdSummaryKey).flatMap(_.toLongOption))
      .maxOption
}
