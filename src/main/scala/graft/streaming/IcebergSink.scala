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
  val QueryIdSummaryKey = "streaming-query-id"

  def append(catalog: Catalog, tableName: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appendBatch(catalog, tableName, batch, batchId)

  /** Streaming MERGE: each micro-batch upserts by `keyCols` — one atomic
    * row-delta snapshot (equality deletes for the batch's keys + the new
    * rows), so the table always holds the LATEST row per key. Same
    * batch-id/query-id idempotence discipline as [[appendBatch]]: a
    * replayed batch is a no-op, which together with the atomic snapshot
    * gives exactly-once table state. A batch carrying several rows for one
    * key keeps all of them — dedupe upstream (the source's event order is
    * not visible to the sink).
    */
  def upsertBatch(catalog: Catalog, tableName: String, batch: DataFrame,
      batchId: Long, keyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val queryId = Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("default")
    val table = catalog.loadTable(tableName)
    if (lastCommittedBatch(table, queryId).exists(_ >= batchId)) return // replay
    if (batch.isEmpty) return
    Writer.upsert(spark, table, batch, keyCols,
      extraSummary = Map(BatchIdSummaryKey -> batchId.toString,
        QueryIdSummaryKey -> queryId))
    ()
  }

  def appendBatch(catalog: Catalog, tableName: String, batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // the STREAMING QUERY id (stable across restarts of the same checkpoint,
    // fresh for a new checkpoint) scopes idempotence: without it, a brand-new
    // query whose batch ids restart at 0 would silently drop its first
    // batches against an old high-water mark
    val queryId = Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("default")
    val table = catalog.loadTable(tableName)
    if (lastCommittedBatch(table, queryId).exists(_ >= batchId)) return // replay
    val files = Writer.writeDataFiles(spark, table, batch)
    if (files.isEmpty) return
    Writer.commitSnapshot(table, "append", addedFiles = files,
      removedPaths = Set.empty, addedDeleteFiles = Nil,
      extraSummary = Map(BatchIdSummaryKey -> batchId.toString,
        QueryIdSummaryKey -> queryId))
    ()
  }

  /** Highest batch id THIS query committed on the current ancestry.
    * Snapshots written before query-id scoping existed (batch id but no
    * query id in the summary) count for every query — the conservative
    * reading that keeps exactly-once across the upgrade.
    */
  def lastCommittedBatch(table: Table, queryId: String): Option[Long] =
    Inspect.ancestorsOfCurrent(table)
      .filter(_.summary.get(QueryIdSummaryKey).forall(_ == queryId))
      .flatMap(_.summary.get(BatchIdSummaryKey).flatMap(_.toLongOption))
      .maxOption
}
