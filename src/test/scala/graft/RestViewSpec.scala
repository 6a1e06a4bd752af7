package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{HadoopCatalog, ViewVersion}
import graft.rest.{RestCatalog, RestCatalogServer}

/** Views over the REST wire (reference `catalog/rest/rest.go:2013-2380`
  * ListViews/CreateView/UpdateView/LoadView/DropView/CheckViewExists/
  * RenameView): the client's ViewStore speaks the view endpoints, the
  * server applies them against its backing store, and the SQL view surface
  * composes on top unchanged — a `CREATE VIEW` issued against a
  * REST-backed Spark catalog lands on the server.
  */
class RestViewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-restview").toString
  private lazy val backing = new HadoopCatalog(warehouse)
  private lazy val server = new RestCatalogServer(backing).start()
  private lazy val client = new RestCatalog(server.uri)
  private lazy val store = client.viewStore.get

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.gr", classOf[graft.sources.GraftSpjCatalog].getName)
    s.conf.set("spark.sql.catalog.gr.uri", s"rest:${server.uri}")
    s
  }

  override def afterAll(): Unit = {
    spark.stop()
    server.stop()
  }

  test("create + load round-trips every version field over the wire") {
    val v = ViewVersion(0, 12345L, "SELECT 1 AS one", "spark",
      defaultCatalog = Some("gr"), defaultNamespace = Seq("default"),
      schemaJson = Some("""{"type":"struct","fields":[]}"""),
      queryColumnNames = Seq("one"), columnAliases = Seq("uno"),
      columnComments = Seq("the one"))
    store.createViewVersioned("wire_v", v, Map("team" -> "data"))
    val loaded = store.loadView("wire_v")
    assert(loaded.currentVersion === v.copy(versionId = 1))
    assert(loaded.properties === Map("team" -> "data"))
    assert(store.viewExists("wire_v"))
    assert(!store.viewExists("nope"))
    // the server wrote it into the BACKING store — one source of truth
    assert(backing.viewStore.get.loadView("wire_v").currentVersion.sql ===
      "SELECT 1 AS one")
  }

  test("replace appends a version; property update mutates only properties") {
    store.createView("wire_r", "SELECT 1 AS a")
    store.replaceView("wire_r", "SELECT 2 AS a")
    val m = store.loadView("wire_r")
    assert(m.versions.length === 2 && m.currentVersion.sql === "SELECT 2 AS a")
    store.updateViewProperties("wire_r", Map("x" -> "1"), Nil)
    val m2 = store.loadView("wire_r")
    assert(m2.versions.length === 2 && m2.properties === Map("x" -> "1"))
    store.updateViewProperties("wire_r", Map.empty, Seq("x"))
    assert(store.loadView("wire_r").properties === Map.empty)
  }

  test("duplicate create conflicts; rename moves; drop removes; list sorts") {
    store.createView("wire_a", "SELECT 1 AS a")
    intercept[Exception](store.createView("wire_a", "SELECT 2 AS b"))
    store.renameView("wire_a", "wire_z")
    assert(!store.viewExists("wire_a") && store.viewExists("wire_z"))
    assert(store.listViews().contains("wire_z"))
    store.dropView("wire_z")
    assert(!store.viewExists("wire_z"))
  }

  test("SQL view DDL + reads work against a REST-backed catalog") {
    spark.sql("CREATE TABLE gr.nums (n BIGINT)")
    spark.sql("INSERT INTO gr.nums VALUES (1), (2), (3), (4)")
    spark.sql("CREATE VIEW gr.evens AS SELECT n FROM gr.nums WHERE n % 2 = 0")
    assert(spark.sql("SELECT sum(n) FROM gr.evens").head.getLong(0) === 6L)
    spark.sql("CREATE OR REPLACE VIEW gr.evens AS SELECT n FROM gr.nums WHERE n % 2 = 1")
    assert(spark.sql("SELECT sum(n) FROM gr.evens").head.getLong(0) === 4L)
    // the view metadata lives server-side with full history
    assert(backing.viewStore.get.loadView("evens").versions.length === 2)
    val shown = spark.sql("SHOW VIEWS IN gr").collect().map(_.getString(1)).toSeq
    assert(shown.contains("evens"))
    spark.sql("DROP VIEW gr.evens")
    assert(!backing.viewStore.get.viewExists("evens"))
  }
}
