package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.catalog.{Catalog, Catalogs}
import graft.core.SchemaBridge
import graft.table.{Incremental, Inspect, SparkRead}

/** Offset for the Iceberg micro-batch source: a position on the snapshot
  * ancestry line (the reference's incremental basis, `table/snapshot_
  * ancestry.go:37-150`). Snapshot ids are opaque — ordering comes from the
  * ancestry walk, equality is all the engine needs.
  */
final case class SnapshotOffset(snapshotId: Long) extends Offset {
  override def json: String = s"""{"snapshot-id":${snapshotId}}"""
}

object SnapshotOffset {
  /** "Nothing consumed yet" sentinel (the engine needs a concrete
    * `initialOffset`; the v1 `getBatch` start side stays `None`).
    */
  val Initial: Long = Long.MinValue

  private val P = """\{\s*"snapshot-id"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(s: String): SnapshotOffset = s match {
    case P(id) => SnapshotOffset(id.toLong)
    case j => throw new IllegalArgumentException(s"not a snapshot offset: $j")
  }
  def parse(o: OffsetV2): Long =
    o match {
      case SnapshotOffset(id) => id
      case other => fromJson(other.json).snapshotId
    }
}

/** Structured Streaming SOURCE over an Iceberg table: each micro-batch is
  * the append-delta between two snapshots on the current ancestry
  * (SURVEY §2.8; reference basis `table/snapshot_ancestry.go:103`
  * `AncestorsBetween`). The first batch is the full table at the
  * then-current snapshot (or the delta from `starting-snapshot-id` when
  * given), subsequent batches are `Incremental.readAppends` slices — so the
  * whole MoR read path (delete application, schema reconciliation, residual
  * filters) is reused unchanged.
  *
  * Admission control follows the `FileStreamSource` hybrid pattern: the
  * engine paces through `latestOffset(start, limit)` (stateless — the start
  * offset comes from the checkpoint), and `Trigger.AvailableNow` latches the
  * current snapshot in `prepareForTriggerAvailableNow` so a capped drain
  * runs multiple batches to a FIXED endpoint even while writers keep
  * committing.
  *
  * Options:
  *   - `catalog`  (required) catalog URI for `Catalogs.load`
  *   - `table`    (required) table name within the catalog
  *   - `starting-snapshot-id` (optional) EXCLUSIVE starting point; when
  *     absent the first batch loads the entire current table state
  *   - `max-snapshots-per-trigger` (optional) cap on ancestry steps per
  *     micro-batch; the initial full-state batch is inherently one scan and
  *     is not paced
  *   - `mode` (optional, default `append`): `append` streams only rows
  *     ADDED by append snapshots ([[Incremental.readAppends]]);
  *     `changelog` streams full CDC micro-batches — each batch is
  *     [[Incremental.changelogBetween]] over the offset range, rows tagged
  *     with a `_change_type` column (`INSERT`/`DELETE`, multiset
  *     semantics), so CoW rewrites, MoR deletes, and compaction surface
  *     correctly (a compaction-only range yields an empty batch). The
  *     initial batch is the full table state tagged `INSERT`. Cost per
  *     batch is O(changed files) via the file-signature pruning in
  *     `changedTasksBetween` — exactly the incremental-consumption cost a
  *     CDC consumer expects.
  */
final class IcebergStreamSource(
    spark: SparkSession,
    catalog: Catalog,
    tableName: String,
    startingSnapshotId: Option[Long],
    maxSnapshotsPerTrigger: Option[Int],
    changelog: Boolean = false) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override val schema: StructType = {
    val base = SchemaBridge.toSpark(catalog.loadTable(tableName).schema)
    if (changelog) base.add("_change_type", org.apache.spark.sql.types.StringType,
      nullable = false)
    else base
  }

  /** AvailableNow endpoint, latched once per run: `Some(headAtPrepare)`.
    * `None` = continuous trigger, follow the live current snapshot.
    */
  @volatile private var preparedHead: Option[Option[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    preparedHead = Some(catalog.loadTable(tableName).metadata.currentSnapshotId)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): OffsetV2 = SnapshotOffset(SnapshotOffset.Initial)

  override def deserializeOffset(json: String): OffsetV2 =
    SnapshotOffset.fromJson(json)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val table = catalog.loadTable(tableName)
    val headOpt = preparedHead.getOrElse(table.metadata.currentSnapshotId)
    headOpt match {
      case None =>
        // table has no snapshot yet: nothing available (engine treats a
        // null/unchanged offset as "no batch")
        if (start == null) SnapshotOffset(SnapshotOffset.Initial) else start
      case Some(head) =>
        // the engine passes null (not initialOffset) before the first batch
        val startId =
          if (start == null) SnapshotOffset.Initial else SnapshotOffset.parse(start)
        val from =
          if (startId == SnapshotOffset.Initial) startingSnapshotId
          else Some(startId)
        val target = (from, maxSnapshotsPerTrigger) match {
          case (Some(f), Some(cap)) if f != head =>
            val ancestry = Inspect.ancestorsOf(table, head) // newest first
            val idx = ancestry.indexWhere(_.snapshotId == f)
            // `from` off the ancestry (rolled back / expired): jump to head
            // and let getBatch fail loudly if the delta is unreadable
            if (idx < 0) head
            else ancestry(math.max(0, idx - cap)).snapshotId
          case _ => head
        }
        SnapshotOffset(target)
    }
  }

  /** The engine uses `latestOffset` when `SupportsAdmissionControl` is
    * present (same contract as `FileStreamSource`).
    */
  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "getOffset is replaced by latestOffset (SupportsAdmissionControl)")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = SnapshotOffset.parse(end)
    val table = catalog.loadTable(tableName)
    val fromId = start.map(SnapshotOffset.parse)
      .filter(_ != SnapshotOffset.Initial)
      .orElse(startingSnapshotId)
    import org.apache.spark.sql.functions.lit
    val batch = fromId match {
      case Some(f) if f == endId =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(f) =>
        if (changelog) Incremental.changelogBetween(spark, table, f, endId)
        else Incremental.readAppends(spark, table, f, endId)
      case None if endId == SnapshotOffset.Initial =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case None =>
        val full = SparkRead.read(spark, table.newScan.useSnapshot(endId))
        if (changelog) full.withColumn("_change_type", lit("INSERT")) else full
    }
    GraftSqlShim.asStreamingFrame(batch)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"IcebergStreamSource[$tableName]"
}

/** V1 sink adapter so `writeStream.format("graft-iceberg")` works
  * symmetrically; delegates to the idempotent [[IcebergSink]] commit
  * (batch-id high-water mark in the snapshot summary). `upsertKeys`
  * non-empty switches each batch from append to a keyed row-delta MERGE.
  */
final class IcebergStreamSink(catalog: Catalog, tableName: String,
    upsertKeys: Seq[String] = Nil)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    if (upsertKeys.isEmpty)
      IcebergSink.appendBatch(catalog, tableName,
        GraftSqlShim.asBatchFrame(data), batchId)
    else
      IcebergSink.upsertBatch(catalog, tableName,
        GraftSqlShim.asBatchFrame(data), batchId, upsertKeys)
  override def toString: String = s"IcebergStreamSink[$tableName]"
}

/** `spark.readStream.format("graft-iceberg")` /
  * `writeStream.format("graft-iceberg")` provider.
  */
final class IcebergSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def required(parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new IllegalArgumentException(s"graft-iceberg requires option '$key'"))

  private def changelogMode(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("mode", "append") match {
      case "append"    => false
      case "changelog" => true
      case other => throw new IllegalArgumentException(
        s"graft-iceberg: unknown mode '$other' (expected append|changelog)")
    }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val cat = Catalogs.load(required(parameters, "catalog"))
    val name = required(parameters, "table")
    val base = SchemaBridge.toSpark(cat.loadTable(name).schema)
    val out = if (changelogMode(parameters))
      base.add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
    else base
    (s"graft-iceberg:$name", out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(
      sqlContext.sparkSession,
      Catalogs.load(required(parameters, "catalog")),
      required(parameters, "table"),
      parameters.get("starting-snapshot-id").map(_.toLong),
      parameters.get("max-snapshots-per-trigger").map(_.toInt),
      changelogMode(parameters))

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    // sink-side mode: `append` (default) or `upsert` with `keys=a,b` —
    // each micro-batch becomes one atomic keyed row-delta snapshot
    val keys = parameters.getOrElse("sink-mode", "append") match {
      case "append" => Nil
      case "upsert" =>
        val ks = parameters.getOrElse("keys",
          throw new IllegalArgumentException(
            "graft-iceberg sink-mode=upsert requires option 'keys'"))
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        if (ks.isEmpty) throw new IllegalArgumentException(
          "graft-iceberg sink-mode=upsert requires a non-empty 'keys' list")
        ks
      case other => throw new IllegalArgumentException(
        s"graft-iceberg: unknown sink-mode '$other' (expected append|upsert)")
    }
    new IcebergStreamSink(
      Catalogs.load(required(parameters, "catalog")),
      required(parameters, "table"), keys)
  }
}
