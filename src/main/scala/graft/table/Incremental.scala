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

  /** Row-level changelog between two snapshots on the same lineage: every
    * row of the `to` snapshot absent from `from` tagged `_change_type =
    * 'INSERT'`, every row of `from` absent from `to` tagged `'DELETE'` —
    * multiset semantics (a row appearing twice and deleted once emits one
    * DELETE), the net-changes contract of a CDC changelog scan. Unlike
    * `readAppends` this sees through CoW rewrites, equality/position
    * deletes, and compaction, because it diffs the RESOLVED row sets of the
    * two snapshots rather than walking manifest adds.
    *
    * Scale shape: two snapshot scans feeding one `exceptAll` per direction —
    * each is a single hash shuffle on the full row (Spark plans except-all
    * as an aggregate over a tagged union, partial map-side), no broadcast,
    * no driver materialization. Compaction-only history (same rows, new
    * files) correctly yields an empty changelog, where a manifest walk
    * would re-emit every rewritten row.
    */
  def changelogBetween(spark: SparkSession, table: Table, fromSnapshotId: Long,
      toSnapshotId: Long): DataFrame = {
    val ancestors = Inspect.ancestorsOf(table, toSnapshotId)
    require(ancestors.exists(_.snapshotId == fromSnapshotId),
      s"snapshot $fromSnapshotId is not an ancestor of $toSnapshotId")
    import org.apache.spark.sql.functions.lit
    val before = SparkRead.read(spark, table.newScan.useSnapshot(fromSnapshotId))
    val after = SparkRead.read(spark, table.newScan.useSnapshot(toSnapshotId))
    after.exceptAll(before).withColumn("_change_type", lit("INSERT"))
      .unionByName(before.exceptAll(after).withColumn("_change_type", lit("DELETE")))
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
