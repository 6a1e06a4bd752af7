package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.format._

/** Metadata tables as a first-class API (reference `table/inspect.go:44-310`):
  * each returns a small driver-built DataFrame over the table's metadata —
  * snapshots, history, manifests, entries, files, partitions, refs.
  */
object Inspect {

  def snapshots(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    table.metadata.snapshots.map(s =>
      (s.timestampMs, s.snapshotId, s.parentSnapshotId, s.sequenceNumber,
        s.summary.getOrElse("operation", ""), s.manifestList))
      .toDF("committed_at_ms", "snapshot_id", "parent_id", "sequence_number",
        "operation", "manifest_list")
  }

  /** Snapshot log with the is-current-ancestor flag (reference
    * `table/inspect.go:87` / `snapshot_ancestry.go:37-150`).
    */
  def history(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    val ancestorIds = ancestorsOfCurrent(table).map(_.snapshotId).toSet
    table.metadata.snapshotLog.map(e =>
      (e.timestampMs, e.snapshotId,
        table.metadata.snapshotById(e.snapshotId).flatMap(_.parentSnapshotId),
        ancestorIds.contains(e.snapshotId)))
      .toDF("made_current_at_ms", "snapshot_id", "parent_id", "is_current_ancestor")
  }

  def manifests(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    currentManifests(table).map(m =>
      (m.path, m.length, m.specId, m.content, m.sequenceNumber,
        m.addedSnapshotId, m.addedFilesCount, m.existingFilesCount,
        m.deletedFilesCount, m.addedRowsCount, m.existingRowsCount))
      .toDF("path", "length", "partition_spec_id", "content", "sequence_number",
        "added_snapshot_id", "added_files_count", "existing_files_count",
        "deleted_files_count", "added_rows_count", "existing_rows_count")
  }

  def entries(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    currentManifests(table).flatMap { m =>
      val (es, _) = Manifests.readManifest(m.path)
      es.map(e => (e.status, e.snapshotId, e.dataSequence.getOrElse(m.sequenceNumber),
        e.file.content, e.file.path, e.file.recordCount, e.file.fileSize))
    }.toDF("status", "snapshot_id", "sequence_number", "content", "file_path",
      "record_count", "file_size_in_bytes")
  }

  def files(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    table.newScan.planFiles().map { t =>
      (t.file.content, t.file.path, t.file.format,
        t.file.partition.map(String.valueOf).mkString("/"),
        t.file.recordCount, t.file.fileSize, t.dataSequence,
        t.posDeletes.size + t.eqDeletes.size)
    }.toDF("content", "file_path", "file_format", "partition", "record_count",
      "file_size_in_bytes", "sequence_number", "delete_file_count")
  }

  /** Per-partition rollup over live data files (reference inspect.partitions). */
  def partitions(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    table.newScan.planFiles()
      .groupBy(t => (t.specId, t.file.partition.map(String.valueOf).mkString("/")))
      .map { case ((specId, part), ts) =>
        (part, specId, ts.size.toLong, ts.map(_.file.recordCount).sum,
          ts.map(_.file.fileSize).sum)
      }.toSeq
      .toDF("partition", "spec_id", "file_count", "record_count", "total_size_in_bytes")
  }

  def refs(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    table.metadata.refs.toSeq.map { case (name, r) =>
      (name, r.refType, r.snapshotId)
    }.toDF("name", "type", "snapshot_id")
  }

  /** Live DELETE artifacts of the current snapshot (Iceberg
    * `delete_files` metadata table): positional-delete parquets, DV
    * puffins, equality-delete files — straight from the delete manifests,
    * metadata-scale.
    */
  def deleteFiles(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    currentManifests(table).filter(_.content == 1).flatMap { m =>
      Manifests.readManifest(m.path)._1
        .filter(e => e.status != ManifestEntryStatus.Deleted &&
          e.file.content != DataFileContent.Data)
        .map(e => (e.file.content, e.file.path, e.file.format,
          e.file.partition.map(String.valueOf).mkString("/"),
          e.file.recordCount, e.file.fileSize,
          e.file.equalityIds.mkString(","),
          e.file.referencedDataFile.orNull,
          e.dataSequence.getOrElse(m.sequenceNumber)))
    }.toDF("content", "file_path", "file_format", "partition", "record_count",
      "file_size_in_bytes", "equality_ids", "referenced_data_file",
      "sequence_number")
  }

  /** Manifests of EVERY snapshot (Iceberg `all_manifests`), deduplicated
    * by path — lineage-wide inventory for audits and orphan triage.
    */
  def allManifests(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    table.metadata.snapshots
      .flatMap(s => Manifests.readManifestList(s.manifestList)
        .map(m => (s.snapshotId, m)))
      .groupBy(_._2.path).map(_._2.head).toSeq
      .map { case (snapId, m) =>
        (m.path, m.length, m.specId, m.content, m.sequenceNumber,
          m.addedSnapshotId, snapId)
      }.toDF("path", "length", "partition_spec_id", "content",
        "sequence_number", "added_snapshot_id", "reference_snapshot_id")
  }

  /** Distinct manifests across the WHOLE lineage — driver-side, but only
    * the manifest LISTS are read here (one small avro per snapshot); the
    * manifests themselves are parsed by the distributed walkers below.
    */
  private def lineageManifests(table: Table): Seq[ManifestFile] =
    table.metadata.snapshots
      .flatMap(s => Manifests.readManifestList(s.manifestList))
      .groupBy(_.path).map(_._2.head).toSeq

  /** Parse a lineage's manifests DISTRIBUTED: at 100 TB a long-lived
    * table's history spans thousands of manifests × thousands of entries —
    * a driver-side walk would hold millions of rows; here each executor
    * task parses a slice of manifest files (same FileIO the delete-file
    * readers already use executor-side) and only the projected columns
    * flow. Current-snapshot frames (`files`, `entries`, ...) stay
    * driver-built: planning parses those manifests anyway.
    */
  private def distributedEntries[T: org.apache.spark.sql.Encoder: scala.reflect.ClassTag](
      spark: SparkSession, manifests: Seq[ManifestFile],
      project: (Long, ManifestEntry) => Iterator[T]): org.apache.spark.sql.Dataset[T] = {
    val slices = math.max(1, math.min(64, manifests.size))
    val metas = manifests.map(m => (m.path, m.sequenceNumber))
    spark.createDataset(spark.sparkContext.parallelize(metas, slices)
      .flatMap { case (path, seq) =>
        Manifests.readManifest(path)._1.iterator.flatMap(e => project(seq, e))
      })
  }

  /** Data files referenced by ANY snapshot (Iceberg `all_data_files`),
    * deduplicated by path — the full historical footprint (expired-but-
    * referenced files included; orphan cleanup's complement).
    */
  def allDataFiles(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    val dataManifests = lineageManifests(table).filter(_.content == ManifestContent.Data)
    distributedEntries(spark, dataManifests, (_, e) =>
      if (e.status != ManifestEntryStatus.Deleted &&
          e.file.content == DataFileContent.Data)
        Iterator.single((e.file.path, e.file.format,
          e.file.partition.map(String.valueOf).mkString("/"),
          e.file.recordCount, e.file.fileSize))
      else Iterator.empty)
      .toDF("file_path", "file_format", "partition", "record_count",
        "file_size_in_bytes")
      .dropDuplicates("file_path")
  }

  /** DELETE files referenced by ANY snapshot (Iceberg `all_delete_files`),
    * deduplicated by (path, offset) so distinct DV blobs sharing a puffin
    * file each surface — lineage-wide MoR-state inventory.
    */
  def allDeleteFiles(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    val delManifests = lineageManifests(table).filter(_.content == ManifestContent.Deletes)
    distributedEntries(spark, delManifests, (_, e) =>
      if (e.status != ManifestEntryStatus.Deleted &&
          e.file.content != DataFileContent.Data)
        Iterator.single((e.file.content, e.file.path, e.file.format,
          e.file.partition.map(String.valueOf).mkString("/"),
          e.file.recordCount, e.file.fileSize,
          e.file.equalityIds.mkString(","),
          e.file.referencedDataFile.orNull))
      else Iterator.empty)
      .toDF("content", "file_path", "file_format", "partition",
        "record_count", "file_size_in_bytes", "equality_ids",
        "referenced_data_file")
      .dropDuplicates("file_path", "referenced_data_file")
  }

  /** Manifest entries of EVERY snapshot's manifests (Iceberg
    * `all_entries`), manifest-deduplicated — the raw add/existing/delete
    * ledger across the whole lineage.
    */
  def allEntries(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    distributedEntries(spark, lineageManifests(table), (seq, e) =>
      Iterator.single((e.status, e.snapshotId, e.dataSequence.getOrElse(seq),
        e.file.content, e.file.path, e.file.recordCount, e.file.fileSize)))
      .toDF("status", "snapshot_id", "sequence_number", "content",
        "file_path", "record_count", "file_size_in_bytes")
  }

  /** Data AND delete files of every snapshot (Iceberg `all_files`). */
  def allFiles(spark: SparkSession, table: Table): DataFrame = {
    import org.apache.spark.sql.functions.lit
    allDataFiles(spark, table)
      .withColumn("content", lit(DataFileContent.Data))
      .select("content", "file_path", "file_format", "partition",
        "record_count", "file_size_in_bytes")
      .unionByName(allDeleteFiles(spark, table)
        .select("content", "file_path", "file_format", "partition",
          "record_count", "file_size_in_bytes"))
  }

  /** The table-metadata version history (Iceberg `metadata_log_entries`):
    * one row per previous metadata file plus the current one, with the
    * snapshot that was current when each was written.
    */
  def metadataLogEntries(spark: SparkSession, table: Table): DataFrame = {
    import spark.implicits._
    val meta = table.metadata
    def latestAt(tsMs: Long): (Option[Long], Option[Int]) = {
      val snap = meta.snapshotLog.filter(_.timestampMs <= tsMs)
        .lastOption.flatMap(e => meta.snapshotById(e.snapshotId))
      (snap.map(_.snapshotId), snap.flatMap(_.schemaId))
    }
    val prior = meta.metadataLog.map { e =>
      val (snapId, schemaId) = latestAt(e.timestampMs)
      (e.timestampMs, e.metadataFile, snapId, schemaId)
    }
    val current = (meta.lastUpdatedMs, table.metadataPath,
      meta.currentSnapshotId, meta.currentSnapshot.flatMap(_.schemaId))
    (prior :+ current)
      .toDF("timestamp_ms", "file", "latest_snapshot_id", "latest_schema_id")
  }

  /** Reverse-chronological ancestors of the current snapshot (reference
    * `table/snapshot_ancestry.go:37-150`); cycle-safe.
    */
  def ancestorsOfCurrent(table: Table): Seq[Snapshot] =
    table.metadata.currentSnapshotId.map(id => ancestorsOf(table, id)).getOrElse(Nil)

  def ancestorsOf(table: Table, snapshotId: Long): Seq[Snapshot] = {
    val out = Seq.newBuilder[Snapshot]
    val seen = scala.collection.mutable.Set.empty[Long]
    var cur: Option[Long] = Some(snapshotId)
    while (cur.isDefined && seen.add(cur.get)) {
      table.metadata.snapshotById(cur.get) match {
        case Some(s) => out += s; cur = s.parentSnapshotId
        case None => cur = None
      }
    }
    out.result()
  }

  private def currentManifests(table: Table): Seq[ManifestFile] =
    table.metadata.currentSnapshot
      .map(s => Manifests.readManifestList(s.manifestList)).getOrElse(Nil)
}
