package graft.catalog

import java.nio.charset.StandardCharsets

import graft.io.FileIO

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** View + UDF catalog objects (reference `view/view.go:35-57`,
  * `view/metadata.go`, `udf/udf.go:29-60`): versioned SQL-text declarations
  * stored as catalog metadata — never evaluated by the engine itself. The
  * same version-hint CAS protocol as tables guards concurrent replaces.
  */
/** One view version (reference `view/metadata.go` version entries): the SQL
  * representation plus the name-resolution context it was authored under
  * (`default-catalog` / `default-namespace`) and the analyzed output schema
  * (Spark StructType JSON) with the query→view column mapping — everything
  * an engine needs to re-resolve the text years later.
  */
final case class ViewVersion(versionId: Int, timestampMs: Long, sql: String,
    dialect: String = "spark",
    defaultCatalog: Option[String] = None,
    defaultNamespace: Seq[String] = Nil,
    schemaJson: Option[String] = None,
    queryColumnNames: Seq[String] = Nil,
    columnAliases: Seq[String] = Nil,
    columnComments: Seq[String] = Nil)

final case class ViewMetadata(name: String, location: String,
    versions: Seq[ViewVersion], currentVersionId: Int,
    properties: Map[String, String] = Map.empty,
    metadataSeq: Int = 0) {
  def currentVersion: ViewVersion =
    versions.find(_.versionId == currentVersionId).get
}

final case class UdfDef(name: String, returnType: String, definition: String,
    parameters: Seq[(String, String)] = Nil, comment: Option[String] = None)

/** Filesystem-backed views + UDF declarations alongside the table catalog. */
final class MetaObjects(warehouse: String) {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------------ views

  private def viewDir(name: String) = s"$warehouse/_views/$name"

  def createView(name: String, sql: String,
      properties: Map[String, String] = Map.empty): ViewMetadata =
    createViewVersioned(name,
      ViewVersion(1, System.currentTimeMillis(), sql), properties)

  def createViewVersioned(name: String, version: ViewVersion,
      properties: Map[String, String] = Map.empty): ViewMetadata = {
    require(!viewExists(name), s"view $name already exists")
    val v = ViewMetadata(name, viewDir(name),
      Seq(version.copy(versionId = 1)), 1, properties, metadataSeq = 1)
    writeView(v)
    v
  }

  def replaceView(name: String, sql: String): ViewMetadata =
    replaceViewVersioned(name, ViewVersion(0, System.currentTimeMillis(), sql))

  /** Appends a new current version (version history preserved, the
    * reference's view-metadata-builder semantics, `view/metadata_builder.go`).
    */
  def replaceViewVersioned(name: String, version: ViewVersion): ViewMetadata = {
    val cur = loadView(name)
    val nextId = cur.versions.map(_.versionId).max + 1
    val v = cur.copy(
      versions = cur.versions :+ version.copy(versionId = nextId),
      currentVersionId = nextId,
      metadataSeq = cur.metadataSeq + 1)
    writeView(v)
    v
  }

  /** Property-only metadata update — no new view version. */
  def updateViewProperties(name: String, set: Map[String, String],
      remove: Seq[String] = Nil): ViewMetadata = {
    val cur = loadView(name)
    val v = cur.copy(properties = cur.properties -- remove ++ set,
      metadataSeq = cur.metadataSeq + 1)
    writeView(v)
    v
  }

  /** Rename = CAS-create under the new name, then drop the old one. Not a
    * single atomic step on a filesystem catalog (the reference's hadoop
    * catalog rejects renames for the same reason); a racing creator of the
    * target name loses via the create-no-replace CAS.
    */
  def renameView(from: String, to: String): ViewMetadata = {
    val cur = loadView(from)
    require(!viewExists(to), s"view $to already exists")
    val v = cur.copy(name = to, location = viewDir(to), metadataSeq = 1)
    writeView(v)
    dropView(from)
    v
  }

  def viewExists(name: String): Boolean =
    FileIO.exists(s"${viewDir(name)}/view.json")

  def loadView(name: String): ViewMetadata = {
    val p = s"${viewDir(name)}/view.json"
    require(FileIO.exists(p), s"no such view: $name")
    val root = mapper.readTree(FileIO.readString(p))
    def strSeq(n: com.fasterxml.jackson.databind.JsonNode, f: String): Seq[String] =
      Option(n.get(f)).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
    val versions = root.get("versions").elements().asScala.map(v => ViewVersion(
      v.get("version-id").asInt, v.get("timestamp-ms").asLong,
      v.get("sql").asText, v.get("dialect").asText,
      Option(v.get("default-catalog")).map(_.asText),
      strSeq(v, "default-namespace"),
      Option(v.get("schema")).map(_.asText),
      strSeq(v, "query-column-names"),
      strSeq(v, "column-aliases"),
      strSeq(v, "column-comments"))).toSeq
    ViewMetadata(
      root.get("name").asText, root.get("location").asText,
      versions,
      root.get("current-version-id").asInt,
      Option(root.get("properties")).map(p2 =>
        p2.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      // older files predate metadata-seq: versions.size reproduces the
      // CAS file sequence they were written under
      Option(root.get("metadata-seq")).map(_.asInt).getOrElse(versions.size))
  }

  def dropView(name: String): Unit = {
    FileIO.deleteTree(viewDir(name))
    ()
  }

  def listViews(): Seq[String] =
    FileIO.listDirNames(s"$warehouse/_views").sorted

  private def writeView(v: ViewMetadata): Unit = {
    val root = mapper.createObjectNode()
    root.put("name", v.name)
    root.put("location", v.location)
    root.put("current-version-id", v.currentVersionId)
    root.put("metadata-seq", v.metadataSeq)
    val vs = root.putArray("versions")
    v.versions.foreach { ver =>
      val o = vs.addObject()
      o.put("version-id", ver.versionId)
      o.put("timestamp-ms", ver.timestampMs)
      o.put("sql", ver.sql)
      o.put("dialect", ver.dialect)
      ver.defaultCatalog.foreach(o.put("default-catalog", _))
      if (ver.defaultNamespace.nonEmpty) {
        val a = o.putArray("default-namespace"); ver.defaultNamespace.foreach(a.add)
      }
      ver.schemaJson.foreach(o.put("schema", _))
      if (ver.queryColumnNames.nonEmpty) {
        val a = o.putArray("query-column-names"); ver.queryColumnNames.foreach(a.add)
      }
      if (ver.columnAliases.nonEmpty) {
        val a = o.putArray("column-aliases"); ver.columnAliases.foreach(a.add)
      }
      if (ver.columnComments.nonEmpty) {
        val a = o.putArray("column-comments"); ver.columnComments.foreach(a.add)
      }
    }
    val props = root.putObject("properties")
    v.properties.foreach { case (k, vv) => props.put(k, vv) }
    val bytes = mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
    // CAS via create-no-replace, same protocol as table commits
    val target = s"${viewDir(v.name)}/v${v.metadataSeq}.view.json"
    try FileIO.createNoReplace(target, bytes)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new CommitConflict(s"view ${v.name} metadata seq ${v.metadataSeq} exists")
    }
    // atomic pointer update: a plain truncating write would let a concurrent
    // loadView read torn JSON
    FileIO.replaceAtomic(s"${viewDir(v.name)}/view.json", bytes)
    ()
  }

  // ------------------------------------------------------------------- udfs

  private def udfPath(name: String) = s"$warehouse/_udfs/$name.json"

  def createFunction(udf: UdfDef): Unit = {
    require(!functionExists(udf.name), s"function ${udf.name} already exists")
    val root = mapper.createObjectNode()
    root.put("name", udf.name)
    root.put("return-type", udf.returnType)
    root.put("definition", udf.definition)
    udf.comment.foreach(root.put("comment", _))
    val ps = root.putArray("parameters")
    udf.parameters.foreach { case (n, t) =>
      val o = ps.addObject(); o.put("name", n); o.put("type", t); ()
    }
    FileIO.write(udfPath(udf.name),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    ()
  }

  def functionExists(name: String): Boolean = FileIO.exists(udfPath(name))

  def loadFunction(name: String): UdfDef = {
    val p = udfPath(name)
    require(FileIO.exists(p), s"no such function: $name")
    val root = mapper.readTree(FileIO.readString(p))
    UdfDef(
      root.get("name").asText, root.get("return-type").asText,
      root.get("definition").asText,
      Option(root.get("parameters")).map(_.elements().asScala.map(o =>
        (o.get("name").asText, o.get("type").asText)).toSeq).getOrElse(Nil),
      Option(root.get("comment")).map(_.asText))
  }

  def dropFunction(name: String): Unit = {
    FileIO.delete(udfPath(name))
    ()
  }

  def listFunctions(): Seq[String] =
    FileIO.listFilesRecursive(s"$warehouse/_udfs")
      .map(f => f.path.substring(f.path.lastIndexOf('/') + 1))
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
}
