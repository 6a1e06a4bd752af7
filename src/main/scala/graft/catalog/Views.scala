package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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
    Files.exists(Paths.get(s"${viewDir(name)}/view.json"))

  def loadView(name: String): ViewMetadata = {
    val p = Paths.get(s"${viewDir(name)}/view.json")
    require(Files.exists(p), s"no such view: $name")
    val root = mapper.readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
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
    val dir = new java.io.File(viewDir(name))
    Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    dir.delete()
    ()
  }

  def listViews(): Seq[String] = {
    val dir = new java.io.File(s"$warehouse/_views")
    Option(dir.listFiles()).map(_.filter(_.isDirectory).map(_.getName).toSeq.sorted)
      .getOrElse(Nil)
  }

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
    val dir = Paths.get(viewDir(v.name))
    Files.createDirectories(dir)
    // CAS via link(2), same protocol as table commits
    val target = dir.resolve(s"v${expectedVersion + 1}.view.json")
    val tmp = dir.resolve(s".view.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflict(s"view ${v.name} version ${expectedVersion + 1} exists")
    } finally Files.deleteIfExists(tmp)
    // atomic pointer update: a plain copy truncates view.json mid-replace
    // and a concurrent loadView would read torn JSON
    val ptrTmp = dir.resolve(s".ptr.${java.util.UUID.randomUUID()}.tmp")
    try {
      Files.copy(target, ptrTmp)
      Files.move(ptrTmp, dir.resolve("view.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(ptrTmp)
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
    val p = Paths.get(udfPath(udf.name))
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    ()
  }

  def functionExists(name: String): Boolean = Files.exists(Paths.get(udfPath(name)))

  def loadFunction(name: String): UdfDef = {
    val p = Paths.get(udfPath(name))
    require(Files.exists(p), s"no such function: $name")
    val root = mapper.readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    UdfDef(
      root.get("name").asText, root.get("return-type").asText,
      root.get("definition").asText,
      Option(root.get("parameters")).map(_.elements().asScala.map(o =>
        (o.get("name").asText, o.get("type").asText)).toSeq).getOrElse(Nil),
      Option(root.get("comment")).map(_.asText))
  }

  def dropFunction(name: String): Unit = {
    Files.deleteIfExists(Paths.get(udfPath(name)))
    ()
  }

  def listFunctions(): Seq[String] = {
    val dir = new java.io.File(s"$warehouse/_udfs")
    Option(dir.listFiles()).map(_.filter(_.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json")).toSeq.sorted).getOrElse(Nil)
  }
}
