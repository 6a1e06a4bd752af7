package graft.table

import graft.core._
import graft.format._

/** A loaded Iceberg table: immutable metadata + location + catalog handle
  * (reference `table/table.go:101-141`).
  */
final class Table(
    val name: String,
    val metadata: TableMetadata,
    val metadataPath: String,
    val catalog: graft.catalog.HadoopCatalog) {

  def schema: IcebergSchema = metadata.schema
  def spec: PartitionSpec = metadata.spec
  def location: String = metadata.location

  def newScan: Scan = Scan(this)

  /** Name mapping for ID-less imported files, if add_files ever ran. */
  def nameMapping: Option[NameMapping] =
    metadata.properties.get(NameMapping.PropertyKey).map(NameMapping.fromJson)

  def refresh(): Table = catalog.loadTable(name)

  /** The catalog version THIS metadata was loaded from — the CAS base for
    * commits. Derived from metadataPath, never re-read from the catalog: a
    * hint-file re-read at commit time would race a concurrent committer and
    * silently build on its version while carrying stale metadata (lost
    * update). Parsed from `v<N>.metadata.json`.
    */
  val currentVersion: Int = {
    val fn = metadataPath.substring(metadataPath.lastIndexOf('/') + 1)
    fn.stripPrefix("v").stripSuffix(".metadata.json").toInt
  }
}

/** One unit of read work: a data file + the delete artifacts that apply to it
  * (reference `table/scanner.go:976-996`).
  */
final case class FileScanTask(
    file: DataFile,
    dataSequence: Long,
    posDeletes: Seq[DataFile],
    eqDeletes: Seq[(DataFile, Long)], // (delete file, its sequence number)
    specId: Int)

/** Immutable scan builder (reference `table/scanner.go:226-330`). */
final case class Scan(
    table: Table,
    filter: Expr = Expr.AlwaysTrue,
    selected: Seq[String] = Nil, // empty = all columns
    snapshotId: Option[Long] = None,
    asOfTimestampMs: Option[Long] = None,
    ref: Option[String] = None,
    limit: Option[Long] = None,
    caseSensitive: Boolean = true) {

  def withFilter(e: Expr): Scan = copy(filter = e)
  def select(cols: String*): Scan = copy(selected = cols)
  def useSnapshot(id: Long): Scan = copy(snapshotId = Some(id))
  def asOf(tsMs: Long): Scan = copy(asOfTimestampMs = Some(tsMs))
  def useRef(r: String): Scan = copy(ref = Some(r))
  def withLimit(n: Long): Scan = copy(limit = Some(n))

  /** Snapshot resolution: explicit id > as-of timestamp > ref > current. */
  def snapshot: Option[Snapshot] = {
    snapshotId.map(id => table.metadata.snapshotById(id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id")))
      .orElse(asOfTimestampMs.flatMap(table.metadata.snapshotAsOf))
      .orElse(ref.map(r => table.metadata.snapshotByRef(r).getOrElse(
        throw new IllegalArgumentException(s"no ref $r"))))
      .orElse(table.metadata.currentSnapshot)
  }

  /** Plan files: manifest-list fetch, manifest pruning (partition summaries),
    * per-entry partition + metrics pruning, delete matching
    * (reference `table/scanner.go:640-950`). Driver-side only.
    */
  def planFiles(): Seq[FileScanTask] = {
    val snap = snapshot.getOrElse(return Nil)
    val meta = table.metadata
    val schema = meta.schemaById(snap.schemaId.getOrElse(meta.currentSchemaId))
      .getOrElse(meta.schema)
    val boundFilter = Expr.rewriteNot(filter)

    val manifests = Manifests.readManifestList(snap.manifestList)

    // partition-space filters per spec id, built lazily
    val partExprCache = scala.collection.mutable.Map.empty[Int, Expr]
    def partExpr(specId: Int): Expr = partExprCache.getOrElseUpdate(specId, {
      val spec = meta.specById(specId).getOrElse(PartitionSpec.Unpartitioned)
      Evaluators.inclusiveProjection(schema, spec)(boundFilter)
    })

    // 1. manifest pruning via partition field summaries
    val (dataManifests, deleteManifests) = manifests.partition(_.content == ManifestContent.Data)
    def keepManifest(m: ManifestFile): Boolean = {
      val spec = meta.specById(m.specId).getOrElse(PartitionSpec.Unpartitioned)
      Evaluators.manifestMightMatch(schema, spec, partExpr(m.specId), m)
    }
    val liveDataManifests = dataManifests.filter(keepManifest)

    // 2. collect delete entries (all of them; small) with resolved sequences
    val deleteEntries: Seq[(ManifestEntry, Long, Int)] = deleteManifests.flatMap { m =>
      val (entries, specId) = Manifests.readManifest(m.path)
      entries.filter(_.status != ManifestEntryStatus.Deleted).map { e =>
        (e, e.dataSequence.getOrElse(m.sequenceNumber), specId)
      }
    }
    val posDeleteEntries = deleteEntries.filter(_._1.file.content == DataFileContent.PositionDeletes)
    val eqDeleteEntries = deleteEntries.filter(_._1.file.content == DataFileContent.EqualityDeletes)

    // 3. per-entry pruning + delete matching (manifests could be read in
    //    parallel here; at 100 TB this is a driver thread pool, not Spark)
    val tasks = liveDataManifests.flatMap { m =>
      val spec = meta.specById(m.specId).getOrElse(PartitionSpec.Unpartitioned)
      val pExpr = partExpr(m.specId)
      val (entries, _) = Manifests.readManifest(m.path)
      entries
        .filter(_.status != ManifestEntryStatus.Deleted)
        .filter(e => e.file.content == DataFileContent.Data)
        .filter(e => Evaluators.partitionMatches(schema, spec, pExpr, e.file))
        .filter(e => Evaluators.fileMightMatch(schema, boundFilter, e.file))
        .map { e =>
          val dataSeq = e.dataSequence.getOrElse(m.sequenceNumber)
          // pos-deletes apply when delSeq >= dataSeq; eq-deletes strictly >
          // (reference table/scanner.go:555-636), partition-scoped when the
          // delete spec is partitioned; a DV references one data file and
          // supersedes parquet pos-deletes for it
          val pos = posDeleteEntries.collect {
            case (de, delSeq, dSpecId) if delSeq >= dataSeq &&
              de.file.referencedDataFile.forall(_ == e.file.path) &&
              samePartition(meta, dSpecId, de.file, m.specId, e.file) => de.file
          }
          val (dvs, parquetPos) = pos.partition(_.format == "PUFFIN")
          // <=1 DV per data file: keep the newest (commit order == manifest order)
      val effectivePos = if (dvs.nonEmpty) Seq(dvs.last) else parquetPos
          val eq = eqDeleteEntries.collect {
            case (de, delSeq, dSpecId) if delSeq > dataSeq &&
              samePartition(meta, dSpecId, de.file, m.specId, e.file) => (de.file, delSeq)
          }
          FileScanTask(e.file, dataSeq, effectivePos, eq, m.specId)
        }
    }
    tasks
  }

  private def samePartition(meta: TableMetadata, deleteSpecId: Int, deleteFile: DataFile,
      dataSpecId: Int, dataFile: DataFile): Boolean = {
    val dspec = meta.specById(deleteSpecId).getOrElse(PartitionSpec.Unpartitioned)
    if (dspec.isUnpartitioned) true // global delete
    else deleteSpecId == dataSpecId &&
      deleteFile.partition.map(norm) == dataFile.partition.map(norm)
  }

  private def norm(v: Any): Any = v match {
    case i: Int => i.toLong
    case other => other
  }
}
