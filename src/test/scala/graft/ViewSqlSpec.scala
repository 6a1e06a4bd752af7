package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog

/** SQL views over the V2 catalog: CREATE [OR REPLACE] VIEW, reads with
  * alias projection and nested-view expansion, ALTER VIEW properties,
  * SHOW VIEWS, DROP VIEW, cycle detection — all through spark.sql against
  * graft's versioned view store.
  */
class ViewSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("graft-viewsql").toString
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.g", classOf[graft.sources.GraftSpjCatalog].getName)
    s.conf.set("spark.sql.catalog.g.uri", wh)
    s.sql("CREATE TABLE g.base (k BIGINT, seg STRING, v DOUBLE)")
    s.sql("""INSERT INTO g.base VALUES
      (1, 'A', 10.0), (2, 'B', 20.0), (3, 'A', 30.0), (4, 'C', 40.0)""")
    s
  }
  private lazy val store = new HadoopCatalog(wh).viewStore.get

  override def afterAll(): Unit = spark.stop()

  test("CREATE VIEW + SELECT round-trips through stored SQL text") {
    spark.sql("CREATE VIEW g.v_a AS SELECT k, v FROM g.base WHERE seg = 'A'")
    val rows = spark.sql("SELECT * FROM g.v_a ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((1L, 10.0), (3L, 30.0)))
    // it is a view, not a table: stored as SQL text, no data files
    assert(store.viewExists("v_a"))
    assert(store.loadView("v_a").currentVersion.sql.contains("seg = 'A'"))
  }

  test("column aliases and comments project over the query output") {
    spark.sql("""CREATE VIEW g.v_alias (doubled COMMENT 'v times two', tag)
      AS SELECT v * 2, seg FROM g.base WHERE k = 2""")
    val df = spark.sql("SELECT doubled, tag FROM g.v_alias")
    assert(df.columns.toSeq === Seq("doubled", "tag"))
    assert(df.collect().map(r => (r.getDouble(0), r.getString(1))).toSeq ===
      Seq((40.0, "B")))
  }

  test("views compose: a view over a view expands recursively") {
    spark.sql("CREATE VIEW g.v_b AS SELECT k, v FROM g.v_a WHERE k > 1")
    assert(spark.sql("SELECT sum(v) AS s FROM g.v_b").head.getDouble(0) === 30.0)
  }

  test("single-part names inside a view bind to the view's default catalog") {
    spark.sql("USE g")
    try {
      spark.sql("CREATE VIEW v_ctx AS SELECT count(*) AS n FROM base")
    } finally spark.sql("USE spark_catalog")
    // read from OUTSIDE the g catalog: stored default catalog must qualify
    // the bare `base` reference
    assert(spark.sql("SELECT n FROM g.v_ctx").head.getLong(0) === 4L)
  }

  test("CREATE OR REPLACE appends a version, history preserved") {
    spark.sql("CREATE VIEW g.v_hist AS SELECT 1 AS one")
    spark.sql("CREATE OR REPLACE VIEW g.v_hist AS SELECT 2 AS two")
    assert(spark.sql("SELECT two FROM g.v_hist").head.getInt(0) === 2)
    val meta = store.loadView("v_hist")
    assert(meta.versions.length === 2)
    assert(meta.versions.head.sql.contains("SELECT 1"))
    assert(meta.currentVersion.sql.contains("SELECT 2"))
  }

  test("ALTER VIEW AS replaces the query with a new version") {
    spark.sql("CREATE VIEW g.v_alter AS SELECT 10 AS x")
    spark.sql("ALTER VIEW g.v_alter AS SELECT 20 AS x")
    assert(spark.sql("SELECT x FROM g.v_alter").head.getInt(0) === 20)
    assert(store.loadView("v_alter").versions.length === 2)
    val e = intercept[Exception](
      spark.sql("ALTER VIEW g.v_missing AS SELECT 1 AS x"))
    assert(e.getMessage.toLowerCase.contains("view"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES") {
    spark.sql("CREATE VIEW g.v_props AS SELECT 1 AS x")
    spark.sql("ALTER VIEW g.v_props SET TBLPROPERTIES ('team' = 'data', 'tier' = 'gold')")
    assert(store.loadView("v_props").properties ===
      Map("team" -> "data", "tier" -> "gold"))
    spark.sql("ALTER VIEW g.v_props UNSET TBLPROPERTIES ('tier')")
    assert(store.loadView("v_props").properties === Map("team" -> "data"))
  }

  test("SHOW VIEWS lists catalog views, pattern filters") {
    val all = spark.sql("SHOW VIEWS IN g").collect().map(_.getString(1)).toSeq
    assert(all.contains("v_a") && all.contains("v_b"))
    val patd = spark.sql("SHOW VIEWS IN g LIKE 'v_a*'")
      .collect().map(_.getString(1)).toSeq
    assert(patd.contains("v_a") && patd.contains("v_alias") && !patd.contains("v_b"))
  }

  test("DROP VIEW removes it; IF EXISTS tolerates absence") {
    spark.sql("CREATE VIEW g.v_drop AS SELECT 1 AS x")
    spark.sql("DROP VIEW g.v_drop")
    assert(!store.viewExists("v_drop"))
    spark.sql("DROP VIEW IF EXISTS g.v_drop") // no throw
    val e = intercept[Exception](spark.sql("DROP VIEW g.v_drop"))
    assert(e.getMessage.toLowerCase.contains("view"))
  }

  test("recursive view reference fails loudly, not by hanging") {
    // v_cyc references itself via OR REPLACE: at replace time the old
    // version inlines, but the STORED text still says v_cyc
    spark.sql("CREATE VIEW g.v_cyc AS SELECT 1 AS x")
    spark.sql("CREATE OR REPLACE VIEW g.v_cyc AS SELECT x FROM g.v_cyc")
    val e = intercept[Exception](spark.sql("SELECT * FROM g.v_cyc").collect())
    assert(e.getMessage.toLowerCase.contains("recursive"))
  }

  test("DESCRIBE shows view columns; EXTENDED adds the view text") {
    spark.sql("""CREATE VIEW g.v_desc (total COMMENT 'sum of v')
      AS SELECT sum(v) FROM g.base""")
    val basic = spark.sql("DESCRIBE g.v_desc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(basic === Seq(("total", "double", "sum of v")))
    val ext = spark.sql("DESCRIBE EXTENDED g.v_desc").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("View Text").contains("SELECT sum(v)"))
    // the resolution context recorded at CREATE time (session default here)
    assert(ext("Default Catalog") === "spark_catalog")
  }

  test("ALTER VIEW RENAME TO moves metadata, old name gone") {
    spark.sql("CREATE VIEW g.v_old AS SELECT 42 AS answer")
    spark.sql("ALTER VIEW g.v_old RENAME TO g.v_new")
    assert(!store.viewExists("v_old") && store.viewExists("v_new"))
    assert(spark.sql("SELECT answer FROM g.v_new").head.getInt(0) === 42)
  }

  test("replacing an inner view cannot silently change an outer view's type") {
    spark.sql("CREATE VIEW g.v_inner AS SELECT CAST(5 AS INT) AS num")
    spark.sql("CREATE VIEW g.v_outer AS SELECT num FROM g.v_inner")
    assert(spark.sql("SELECT num FROM g.v_outer").schema.head.dataType ===
      org.apache.spark.sql.types.IntegerType)
    // widen the inner column: outer view's recorded schema upcasts INT→...
    spark.sql("CREATE OR REPLACE VIEW g.v_inner AS SELECT CAST(7 AS INT) AS num")
    assert(spark.sql("SELECT num FROM g.v_outer").head.getInt(0) === 7)
  }
}
