package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.core.IcebergSchema
import graft.format._
import graft.table.Table

/** Filesystem catalog following the Hadoop-catalog layout (reference
  * `catalog/hadoop/hadoop.go`): `<table>/metadata/v<N>.metadata.json` plus
  * `version-hint.text`, committed by write-temp + atomic rename-no-replace —
  * the CAS that gives optimistic concurrency on a filesystem.
  *
  * Local-FS java.nio implementation; on HDFS/S3A the same protocol runs over
  * `org.apache.hadoop.fs.FileSystem` (rename-no-replace / conditional put).
  */
final class HadoopCatalog(warehouse: String) extends Catalog {

  private def tableDir(name: String): String = s"$warehouse/$name"
  private def metadataDir(name: String): String = s"${tableDir(name)}/metadata"
  private def hintFile(name: String): String = s"${metadataDir(name)}/version-hint.text"
  private def metadataFile(name: String, v: Int): String =
    s"${metadataDir(name)}/v$v.metadata.json"

  def tableExists(name: String): Boolean = Files.exists(Paths.get(hintFile(name)))

  def listTables(): Seq[String] = {
    val dir = new File(warehouse)
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory && Files.exists(Paths.get(hintFile(f.getName))))
      .map(_.getName).sorted
  }

  def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): Table = {
    require(!tableExists(name), s"table $name already exists")
    val meta = TableMetadata.empty(tableDir(name), schema, spec, sortOrder, properties)
    commitVersion(name, 1, meta)
    new Table(name, meta, metadataFile(name, 1), this)
  }

  def loadTable(name: String): Table = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val path = metadataFile(name, v)
    val meta = TableMetadata.fromJson(
      new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
    new Table(name, meta, path, this)
  }

  def dropTable(name: String): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new File(tableDir(name)))
  }

  def currentVersion(name: String): Option[Int] = {
    val hint = Paths.get(hintFile(name))
    val fromHint =
      if (!Files.exists(hint)) None
      else new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim
        .toIntOption // empty/torn read during a concurrent hint replace
    // the hint is advisory (reference hadoop catalog semantics): fall back
    // to listing vN.metadata.json files for the true max version
    fromHint.orElse {
      val dir = new File(metadataDir(name))
      val versions = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
        .map(_.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
        .flatMap(n => n.stripPrefix("v").stripSuffix(".metadata.json").toIntOption)
      versions.maxOption
    }
  }

  /** CAS commit: vN file must not exist yet (rename-no-replace). Returns
    * the new metadata path. Throws CommitConflict on a lost race.
    */
  def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int): String = {
    val cur = currentVersion(name).getOrElse(0)
    if (cur != expectedVersion)
      throw new CommitConflict(s"expected version $expectedVersion but found $cur")
    commitVersion(name, expectedVersion + 1, updated)
    metadataFile(name, expectedVersion + 1)
  }

  private def commitVersion(name: String, version: Int, meta: TableMetadata): Unit = {
    val dir = Paths.get(metadataDir(name))
    Files.createDirectories(dir)
    val target = Paths.get(metadataFile(name, version))
    val tmp = dir.resolve(s".v$version.metadata.json.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, TableMetadata.toJson(meta).getBytes(StandardCharsets.UTF_8))
    try {
      // link(2) is atomic create-no-replace: exactly one of two racing
      // committers wins; the loser sees FileAlreadyExists -> CommitConflict.
      // (POSIX rename() silently replaces, so ATOMIC_MOVE alone can't CAS.)
      Files.createLink(target, tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflict(s"version $version already exists")
    } finally Files.deleteIfExists(tmp)
    // atomic hint replace: a plain truncating write lets concurrent readers
    // observe an empty file mid-update
    val hintTmp = dir.resolve(s".hint.${java.util.UUID.randomUUID()}.tmp")
    Files.write(hintTmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(hintTmp, Paths.get(hintFile(name)),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}

final class CommitConflict(msg: String) extends RuntimeException(msg)
