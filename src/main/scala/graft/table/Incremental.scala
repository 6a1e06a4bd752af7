package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SchemaBridge
import graft.format._

/** Incremental (CDC-style) consumption between snapshots: the metadata basis
  * is the snapshot ancestry walk (reference `table/snapshot_ancestry.go:
  * 37-150`); the scan surfaces exactly the data files ADDED by snapshots in
  * `(fromSnapshotId, toSnapshotId]` along the current lineage — the
  * incremental-append contract.
  */
object Incremental {

  /** FileScanTasks for files appended in (fromExclusive, toInclusive].
    * Throws if `fromSnapshotId` is not an ancestor of `toSnapshotId` (a
    * truncated walk would silently under-read — fail instead, mirroring the
    * reference's baseFound=false contract).
    */
  def appendsBetween(table: Table, fromSnapshotId: Long,
      toSnapshotId: Long): Seq[FileScanTask] = {
    val ancestors = Inspect.ancestorsOf(table, toSnapshotId)
    require(ancestors.exists(_.snapshotId == fromSnapshotId),
      s"snapshot $fromSnapshotId is not an ancestor of $toSnapshotId")
    val range = ancestors.takeWhile(_.snapshotId != fromSnapshotId)
      // incremental-APPEND contract: snapshots that REMOVED data files
      // (CoW deletes, compaction) re-add pre-existing rows as new files —
      // not appends. Snapshots that only added files (fast-append, and
      // rowDelta upserts whose op is "overwrite" but removed nothing)
      // contribute genuinely new rows.
      .filter { s =>
        val op = s.summary.get("operation")
        // spec key; pre-round-7 snapshots wrote "removed-data-files"
        val removed = s.summary.get("deleted-data-files")
          .orElse(s.summary.get("removed-data-files"))
          .flatMap(_.toLongOption).getOrElse(0L)
        op.contains("append") || (op.contains("overwrite") && removed == 0L)
      }

    range.flatMap { s =>
      Manifests.readManifestList(s.manifestList)
        .filter(m => m.content == ManifestContent.Data &&
          m.addedSnapshotId == s.snapshotId)
        .flatMap { m =>
          val (entries, specId) = Manifests.readManifest(m.path)
          entries
            .filter(e => e.status == ManifestEntryStatus.Added &&
              e.snapshotId.contains(s.snapshotId) &&
              e.file.content == DataFileContent.Data)
            .map(e => FileScanTask(e.file,
              e.dataSequence.getOrElse(m.sequenceNumber), Nil, Nil, specId))
        }
    }.distinctBy(_.file.path)
  }

  /** Read the incremental append set as a DataFrame. */
  def readAppends(spark: SparkSession, table: Table, fromSnapshotId: Long,
      toSnapshotId: Long): DataFrame = {
    val tasks = appendsBetween(table, fromSnapshotId, toSnapshotId)
    if (tasks.isEmpty) {
      val schema = SchemaBridge.toSpark(table.schema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else SparkRead.readTasks(spark, tasks, table.schema, table.nameMapping)
  }
}
