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
final case class ViewVersion(versionId: Int, timestampMs: Long, sql: String,
    dialect: String = "spark")

final case class ViewMetadata(name: String, location: String,
    versions: Seq[ViewVersion], currentVersionId: Int,
    properties: Map[String, String] = Map.empty) {
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
      properties: Map[String, String] = Map.empty): ViewMetadata = {
    require(!viewExists(name), s"view $name already exists")
    val v = ViewMetadata(name, viewDir(name),
      Seq(ViewVersion(1, System.currentTimeMillis(), sql)), 1, properties)
    writeView(v, expectedVersion = 0)
    v
  }

  def replaceView(name: String, sql: String): ViewMetadata = {
    val cur = loadView(name)
    val nextId = cur.versions.map(_.versionId).max + 1
    val v = cur.copy(
      versions = cur.versions :+ ViewVersion(nextId, System.currentTimeMillis(), sql),
      currentVersionId = nextId)
    writeView(v, expectedVersion = cur.versions.size)
    v
  }

  def viewExists(name: String): Boolean =
    FileIO.exists(s"${viewDir(name)}/view.json")

  def loadView(name: String): ViewMetadata = {
    val p = s"${viewDir(name)}/view.json"
    require(FileIO.exists(p), s"no such view: $name")
    val root = mapper.readTree(FileIO.readString(p))
    ViewMetadata(
      root.get("name").asText, root.get("location").asText,
      root.get("versions").elements().asScala.map(v => ViewVersion(
        v.get("version-id").asInt, v.get("timestamp-ms").asLong,
        v.get("sql").asText, v.get("dialect").asText)).toSeq,
      root.get("current-version-id").asInt,
      Option(root.get("properties")).map(p2 =>
        p2.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty))
  }

  def dropView(name: String): Unit = {
    FileIO.deleteTree(viewDir(name))
    ()
  }

  def listViews(): Seq[String] =
    FileIO.listDirNames(s"$warehouse/_views").sorted

  private def writeView(v: ViewMetadata, expectedVersion: Int): Unit = {
    val root = mapper.createObjectNode()
    root.put("name", v.name)
    root.put("location", v.location)
    root.put("current-version-id", v.currentVersionId)
    val vs = root.putArray("versions")
    v.versions.foreach { ver =>
      val o = vs.addObject()
      o.put("version-id", ver.versionId)
      o.put("timestamp-ms", ver.timestampMs)
      o.put("sql", ver.sql)
      o.put("dialect", ver.dialect)
    }
    val props = root.putObject("properties")
    v.properties.foreach { case (k, vv) => props.put(k, vv) }
    val bytes = mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
    // CAS via create-no-replace, same protocol as table commits
    val target = s"${viewDir(v.name)}/v${expectedVersion + 1}.view.json"
    try FileIO.createNoReplace(target, bytes)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new CommitConflict(s"view ${v.name} version ${expectedVersion + 1} exists")
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
