package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{HadoopCatalog, MetaObjects, UdfDef}
import graft.core._
import graft.format.PartitionSpec
import graft.table.{Incremental, Inspect, Writer}

/** Views/UDF metadata CRUD + metadata tables + incremental read. */
class MetaObjectsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = Files.createTempDirectory("graft-meta").toString
  private lazy val catalog = new HadoopCatalog(wh)
  private lazy val objects = new MetaObjects(wh)

  override def afterAll(): Unit = spark.stop()

  test("view CRUD with version history") {
    val v1 = objects.createView("top_nations",
      "SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 5")
    assert(v1.currentVersion.versionId === 1)
    val v2 = objects.replaceView("top_nations",
      "SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 10")
    assert(v2.currentVersion.versionId === 2)
    assert(v2.versions.size === 2)
    val loaded = objects.loadView("top_nations")
    assert(loaded.currentVersion.sql.contains("LIMIT 10"))
    assert(loaded.versions.head.sql.contains("LIMIT 5"))
    assert(objects.listViews() === Seq("top_nations"))
    intercept[IllegalArgumentException](objects.createView("top_nations", "SELECT 1"))
    objects.dropView("top_nations")
    assert(!objects.viewExists("top_nations"))
  }

  // reference `view/metadata_builder.go` semantics: identical-definition
  // dedup (TestAddVersion_Deduplication), the dialect-drop guard
  // (TestDroppingDialectFailsByDefault / DoesNotFailWhenAllowed), and
  // version-history retention with the current version never expired
  // (TestViewVersionHistoryIsCorrectlyRetained).
  test("view replace: dedup, dialect-drop guard, history retention") {
    import graft.catalog.ViewVersion
    objects.createView("vb", "SELECT 1 AS a")

    // replace with a NEW definition appends; replacing BACK with the
    // original definition reuses version 1 instead of appending a third
    objects.replaceView("vb", "SELECT 2 AS a")
    val deduped = objects.replaceView("vb", "SELECT 1 AS a")
    assert(deduped.versions.map(_.versionId) === Seq(1, 2))
    assert(deduped.currentVersionId === 1)

    // dropping the spark dialect for trino fails by default...
    val err = intercept[IllegalArgumentException](
      objects.replaceViewVersioned("vb",
        ViewVersion(0, 1L, "SELECT 3 AS a", dialect = "trino")))
    assert(err.getMessage.contains("replace.drop-dialect.allowed"))
    // ...and is allowed once the property opts in
    objects.updateViewProperties("vb", Map("replace.drop-dialect.allowed" -> "true"))
    val trino = objects.replaceViewVersioned("vb",
      ViewVersion(0, 1L, "SELECT 3 AS a", dialect = "trino"))
    assert(trino.currentVersion.dialect === "trino")

    // retention: with num-entries=3, old versions expire; current survives
    objects.updateViewProperties("vb",
      Map("version.history.num-entries" -> "3"))
    var last = trino
    for (i <- 10 to 15)
      last = objects.replaceViewVersioned("vb",
        ViewVersion(0, 1L, s"SELECT $i AS a", dialect = "trino"))
    assert(last.versions.size === 3)
    assert(last.versions.map(_.versionId).max === last.currentVersionId)
    assert(last.currentVersion.sql === "SELECT 15 AS a")

    // invalid retention rejects
    objects.updateViewProperties("vb", Map("version.history.num-entries" -> "0"))
    intercept[IllegalArgumentException](objects.replaceViewVersioned("vb",
      ViewVersion(0, 1L, "SELECT 99 AS a", dialect = "trino")))
    objects.dropView("vb")
  }

  test("view declarations are runnable through spark.sql") {
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .createOrReplaceTempView("nation")
    objects.createView("nations_in_region_0",
      "SELECT n_name FROM nation WHERE n_regionkey = 0")
    val v = objects.loadView("nations_in_region_0")
    assert(spark.sql(v.currentVersion.sql).count() > 0)
  }

  test("udf declaration CRUD (stored, never evaluated)") {
    objects.createFunction(UdfDef("tax", "double", "price * 0.07",
      Seq(("price", "double")), Some("7% flat tax")))
    val f = objects.loadFunction("tax")
    assert(f.returnType === "double")
    assert(f.parameters === Seq(("price", "double")))
    assert(f.comment === Some("7% flat tax"))
    assert(objects.listFunctions() === Seq("tax"))
    objects.dropFunction("tax")
    assert(!objects.functionExists("tax"))
  }

  test("metadata tables cover snapshots/history/manifests/entries/partitions/refs") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t1 = Writer.append(spark,
      catalog.createTable("meta_t", schema, PartitionSpec.Unpartitioned),
      nation.filter(col("n_nationkey") < 10))
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 10))

    assert(Inspect.snapshots(spark, t2).count() === 2)
    val hist = Inspect.history(spark, t2).collect()
    assert(hist.length === 2 && hist.forall(_.getAs[Boolean]("is_current_ancestor")))
    assert(Inspect.manifests(spark, t2).count() === 2)
    assert(Inspect.entries(spark, t2).count() >= 2)
    assert(Inspect.files(spark, t2)
      .agg(sum(col("record_count"))).first().getLong(0) === 25)
    val parts = Inspect.partitions(spark, t2).collect()
    assert(parts.length === 1 && parts.head.getAs[Long]("record_count") === 25)
    assert(Inspect.refs(spark, t2).filter(col("name") === "main").count() === 1)
  }

  test("incremental read surfaces appends only, never rewrites") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t1 = Writer.append(spark,
      catalog.createTable("inc_rw", schema, PartitionSpec.Unpartitioned),
      nation.filter(col("n_nationkey") < 10))
    val from = t1.metadata.currentSnapshotId.get
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 10))
    // CoW delete rewrites t1's files — those re-added rows are NOT appends
    val t3 = Writer.deleteWhere(spark, t2, Expr.eq("n_nationkey", 3))
    val inc = Incremental.readAppends(spark, t3, from,
      t3.metadata.currentSnapshotId.get)
    assert(inc.count() === 15) // only the second append's rows
  }

  test("incremental read rejects a non-ancestor base") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t1 = Writer.append(spark,
      catalog.createTable("inc_t", schema, PartitionSpec.Unpartitioned), nation)
    intercept[IllegalArgumentException] {
      Incremental.appendsBetween(t1, 12345L, t1.metadata.currentSnapshotId.get)
    }
  }
}
