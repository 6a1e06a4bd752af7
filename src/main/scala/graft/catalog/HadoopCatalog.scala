package graft.catalog

import graft.core.IcebergSchema
import graft.format._
import graft.io.FileIO
import graft.table.Table

/** Filesystem catalog following the Hadoop-catalog layout (reference
  * `catalog/hadoop/hadoop.go`): `<table>/metadata/v<N>.metadata.json` plus
  * `version-hint.text`, committed by atomic create-no-replace — the CAS that
  * gives optimistic concurrency on a filesystem.
  *
  * All IO routes through [[graft.io.FileIO]] (Hadoop FileSystem), so the
  * same protocol runs over file://, hdfs://, or an object store with
  * conditional put.
  */
final class HadoopCatalog(warehouseRaw: String) extends TransactionalCatalog {

  // file:-scheme and plain spellings of the same storage must produce
  // identical recorded paths (delete matching and DV keys compare strings)
  private val warehouse: String = FileIO.canonical(warehouseRaw)

  override lazy val viewStore: Option[MetaObjects] = Some(new MetaObjects(warehouse))

  /** Where a table named `name` lives; used by staged (atomic) CTAS/RTAS
    * to write data files into the final location before the CAS publish.
    */
  def tableLocation(name: String): String = tableDir(name)

  /** Publish staged metadata as this table's next version in one CAS:
    * version 0 → create (visible only after the hint lands), version N →
    * atomic replace. The staged files were already written under
    * [[tableLocation]]; nothing references them until this pointer swing.
    */
  def registerStagedMetadata(name: String, meta: TableMetadata,
      expectedVersion: Int): Unit = {
    // a staged REPLACE is an INTENTIONAL new incarnation (fresh uuid over
    // the old pointer) — the drop+recreate commit guard doesn't apply; the
    // version CAS alone arbitrates against concurrent committers. Signaled
    // by a base with no uuid, which disables the guard.
    commit(name, meta.copy(tableUuid = ""), meta, expectedVersion)
    ()
  }

  private def tableDir(name: String): String = s"$warehouse/$name"
  private def metadataDir(name: String): String = s"${tableDir(name)}/metadata"
  private def hintFile(name: String): String = s"${metadataDir(name)}/version-hint.text"

  /** Write-side name: codec extension from `write.metadata.compression-codec`
    * (reference `locations.go:55-82`). Version files always live under the
    * catalog-managed `<table>/metadata` dir — the version-listing fallback
    * and CAS both depend on that layout; `write.metadata.path` relocates
    * auxiliary metadata (manifests, stats), not the catalog pointer chain.
    */
  private def metadataFile(name: String, v: Int,
      props: Map[String, String]): String =
    s"${metadataDir(name)}/${graft.table.Locations.metadataFileName(v, props)}"

  /** Codec-independent version reservation: exactly one `v<N>.commit`
    * marker can be created per version (create-no-replace), arbitrating
    * racers whose DIFFERENT codecs reserve different metadata file names.
    * Content = the winning spelling, so readers resolve it directly.
    */
  private def markerFile(name: String, v: Int): String =
    s"${metadataDir(name)}/v$v.commit"

  /** Read-side resolve: prefer the spelling recorded by the version's
    * commit marker (the arbitration winner); fall back to sniffing the
    * three spellings for versions committed before markers existed.
    */
  private def resolveMetadataFile(name: String, v: Int): Option[String] = {
    val recorded =
      try {
        if (!FileIO.exists(markerFile(name, v))) None
        else Some(s"${metadataDir(name)}/${FileIO.readString(markerFile(name, v)).trim}")
          .filter(FileIO.exists)
      } catch { case _: Exception => None } // torn marker read: fall back to sniff
    recorded.orElse(
      Seq(s"v$v.metadata.json", s"v$v.gz.metadata.json", s"v$v.zstd.metadata.json")
        .map(fn => s"${metadataDir(name)}/$fn").find(FileIO.exists))
  }

  /** The hint vanishes for an instant during a concurrent commit's
    * delete+rename replace — existence falls back to the versioned
    * metadata files so a mid-commit table never reads as dropped.
    */
  def tableExists(name: String): Boolean =
    FileIO.exists(hintFile(name)) ||
      FileIO.listFilesRecursive(metadataDir(name))
        .exists(f => graft.table.Locations.metadataVersionOf(f.path).isDefined)

  def listTables(): Seq[String] =
    FileIO.listDirNames(warehouse).filter(tableExists).sorted

  def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): Table = {
    require(!tableExists(name), s"table $name already exists")
    val meta = TableMetadata.empty(tableDir(name), schema, spec, sortOrder, properties)
    commitVersion(name, 1, meta)
    new Table(name, meta, metadataFile(name, 1, meta.properties), this)
  }

  def loadTable(name: String): Table = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val path = resolveMetadataFile(name, v).getOrElse(
      throw new IllegalArgumentException(s"missing metadata v$v for $name"))
    val meta = TableMetadata.fromJson(graft.table.Locations.readMetadataJson(path))
    new Table(name, meta, path, this)
  }

  def dropTable(name: String): Unit = {
    FileIO.deleteTree(tableDir(name))
    ()
  }

  /** Drop with purge (reference `catalog/hadoop/hadoop.go:901-921`
    * PurgeTable): purge the referenced-file union FIRST (the walk must run
    * before the directory root goes), then remove the directory — but only
    * the metadata directory when `gc.enabled=false`, so referenced data
    * files survive the drop as the property promises.
    */
  def purgeTable(name: String): Seq[String] = {
    val t = loadTable(name)
    val purged = graft.table.Maintenance.purgeFiles(t)
    val gcEnabled = t.metadata.properties.getOrElse("gc.enabled", "true").toBoolean
    FileIO.deleteTree(if (gcEnabled) tableDir(name) else s"${tableDir(name)}/metadata")
    purged
  }

  def currentVersion(name: String): Option[Int] = {
    val fromHint =
      try {
        if (!FileIO.exists(hintFile(name))) None
        else FileIO.readString(hintFile(name)).trim
          .toIntOption // empty/torn read during a concurrent hint replace
      } catch {
        // the hint can VANISH between the exists check and the read:
        // replaceAtomic degrades to delete+rename on rename-no-replace
        // backends, so a reader in that window treats the hint as
        // advisory-absent (same as a torn read), never as an error
        case _: java.io.FileNotFoundException => None
        case _: java.nio.file.NoSuchFileException => None
      }
    // the hint is advisory (reference hadoop catalog semantics): fall back
    // to listing vN.metadata.json files for the true max version
    fromHint.orElse {
      FileIO.listFilesRecursive(metadataDir(name))
        .flatMap(f => graft.table.Locations.metadataVersionOf(f.path))
        .maxOption
    }
  }

  /** CAS commit: vN file must not exist yet (create-no-replace). Returns
    * the new metadata path. Throws CommitConflict on a lost race.
    */
  def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int): String = {
    val cur = currentVersion(name).getOrElse(0)
    if (cur != expectedVersion)
      throw new CommitConflict(s"expected version $expectedVersion but found $cur")
    // version numbers collide across drop+recreate incarnations; uuids don't
    requireSameIncarnation(name, base, resolveMetadataFile(name, cur))
    commitVersion(name, expectedVersion + 1, updated)
    metadataFile(name, expectedVersion + 1, updated.properties)
  }

  /** All-or-nothing commit across tables: reserve every table's next
    * version file by create-no-replace FIRST (readers resolve through the
    * version hint, so reserved-but-unpublished files are invisible), then
    * publish all hints. A lost CAS on any table deletes the already-reserved
    * files and raises CommitConflict with nothing applied.
    *
    * The unpublishable window (crash between reserve and publish) leaves
    * orphan vN files that the next committer's CAS surfaces as a conflict —
    * the same failure surface as the reference's single-table Hadoop commit,
    * extended across the set.
    */
  def commitTransaction(commits: Seq[StagedCommit]): Unit = {
    require(commits.map(_.name).distinct.size == commits.size,
      "duplicate table in multi-table transaction")
    // cheap pre-validation: every CAS base must still be current
    commits.foreach { c =>
      val cur = currentVersion(c.name).getOrElse(0)
      if (cur != c.expectedVersion)
        throw new CommitConflict(
          s"${c.name}: expected version ${c.expectedVersion} but found $cur")
    }
    val placed = Seq.newBuilder[String]
    def rollbackAll(msg: String): Nothing = {
      placed.result().foreach { p =>
        try { FileIO.delete(p); () } catch { case _: Exception => () }
      }
      throw new CommitConflict(msg)
    }
    try {
      commits.foreach { c =>
        val v = c.expectedVersion + 1
        val path = metadataFile(c.name, v, c.updated.properties)
        FileIO.createNoReplace(path, graft.table.Locations.encodeMetadata(
          TableMetadata.toJson(c.updated), c.updated.properties))
        placed += path
        // same cross-codec arbitration as commitVersion, per table
        val other = Seq(s"v$v.metadata.json", s"v$v.gz.metadata.json",
            s"v$v.zstd.metadata.json")
          .map(fn => s"${metadataDir(c.name)}/$fn")
          .find(p2 => p2 != path && FileIO.exists(p2))
        if (other.isDefined)
          rollbackAll(s"${c.name}: version $v lost a cross-codec race to ${other.get}; " +
            "all reservations rolled back")
        val baseName = path.substring(path.lastIndexOf('/') + 1)
        FileIO.createNoReplace(markerFile(c.name, v),
          baseName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        placed += markerFile(c.name, v)
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        rollbackAll(
          "multi-table transaction lost a concurrent race; all reservations rolled back")
    }
    commits.foreach { c =>
      FileIO.replaceAtomic(hintFile(c.name),
        (c.expectedVersion + 1).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  private def commitVersion(name: String, version: Int, meta: TableMetadata): Unit = {
    val bytes = graft.table.Locations.encodeMetadata(
      TableMetadata.toJson(meta), meta.properties)
    val mine = metadataFile(name, version, meta.properties)
    try FileIO.createNoReplace(mine, bytes)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new CommitConflict(s"version $version already exists")
    }
    // Cross-codec CAS: two racers whose metadata carries DIFFERENT
    // compression codecs reserve different file names for the same
    // version, so the codec-file create-no-replace alone can't arbitrate
    // (each sees only its own spelling succeed). Two-step arbitration:
    // (1) a pre-existing OTHER spelling means an earlier reservation
    // already holds this version — back off; (2) otherwise claim the
    // single codec-independent v<N>.commit marker — exactly one
    // create-no-replace wins, the loser rolls its codec file back. Both
    // racers backing off at (1) is safe (retry rebases); two winners is
    // impossible.
    reserveVersionMarker(name, version, mine)
    // atomic hint replace: a plain truncating write lets concurrent readers
    // observe an empty file mid-update
    FileIO.replaceAtomic(hintFile(name),
      version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Arbitrate version ownership after `mine` was placed; rolls `mine`
    * back and raises CommitConflict on loss. See commitVersion for the
    * interleaving argument.
    */
  private def reserveVersionMarker(name: String, version: Int, mine: String): Unit = {
    def rollback(reason: String): Nothing = {
      try { FileIO.delete(mine); () } catch { case _: Exception => () }
      throw new CommitConflict(s"version $version $reason")
    }
    val otherSpelling =
      Seq(s"v$version.metadata.json", s"v$version.gz.metadata.json",
          s"v$version.zstd.metadata.json")
        .map(fn => s"${metadataDir(name)}/$fn")
        .find(p => p != mine && FileIO.exists(p))
    otherSpelling.foreach(w => rollback(s"lost a cross-codec race to $w"))
    val baseName = mine.substring(mine.lastIndexOf('/') + 1)
    try FileIO.createNoReplace(markerFile(name, version),
      baseName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        rollback("lost the commit-marker race")
    }
  }
}

final class CommitConflict(msg: String) extends RuntimeException(msg)

/** Commit outcome could not be determined (e.g. the metastore RPC failed
  * AFTER it may have applied). NOT a [[CommitConflict]]: retrying could
  * double-apply, so the retry loop must surface it to the operator
  * (reference `hive.go:612-615` — alter failure is a plain failure, never
  * mapped to the retryable conflict class).
  */
final class CommitStateUnknown(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
