package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{Catalog, CommitConflict, HadoopCatalog, SqlCatalog}
import graft.core._
import graft.format._
import graft.rest.{RestCatalog, RestCatalogServer}
import graft.table.{SparkRead, Writer}

/** One conformance battery run against EVERY catalog backend — the
  * analogue of the reference's shared `catalog/catalogtest` kit: a
  * behavior proven for one backend must hold for all of them, because
  * the write/commit protocol is backend-agnostic (CAS on a version,
  * whatever implements it).
  *
  * Battery per backend: create/exists/list/load round-trip; duplicate
  * create refused; a full append + hash-stable read-back; stale-base CAS
  * conflict surfaced as CommitConflict AND resolved by the writer's
  * retry loop; drop removes; view store presence where declared.
  */
class CatalogConformanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("catalog-conformance")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val restBackingWh = Files.createTempDirectory("graft-conf-rest").toString
  private lazy val restServer =
    new RestCatalogServer(new HadoopCatalog(restBackingWh)).start()

  private lazy val backends: Seq[(String, Catalog)] = Seq(
    "hadoop" -> new HadoopCatalog(
      Files.createTempDirectory("graft-conf-hadoop").toString),
    "sql" -> new SqlCatalog(
      s"jdbc:derby:${Files.createTempDirectory("graft-conf-sql")}/db;create=true",
      Files.createTempDirectory("graft-conf-sqlwh").toString),
    "rest" -> new RestCatalog(restServer.uri))

  override def afterAll(): Unit = {
    restServer.stop()
    spark.stop()
  }

  private def battery(label: String, cat: Catalog): Unit = {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val tbl = s"conf_$label"

    // lifecycle
    assert(!cat.tableExists(tbl))
    val t0 = cat.createTable(tbl, schema, PartitionSpec.Unpartitioned)
    assert(t0.currentVersion === 1)
    assert(cat.tableExists(tbl))
    assert(cat.listTables().contains(tbl))
    assert(intercept[Exception](
      cat.createTable(tbl, schema, PartitionSpec.Unpartitioned))
      .getMessage.toLowerCase.contains("exist"))
    val loaded = cat.loadTable(tbl)
    assert(loaded.schema.fields.map(_.name) === schema.fields.map(_.name))
    assert(cat.currentVersion(tbl) === Some(1))

    // write + read-back through the shared funnel
    val t1 = Writer.append(spark, loaded, nation)
    assert(cat.currentVersion(tbl) === Some(2))
    assert(SparkRead.read(spark, cat.loadTable(tbl).newScan).count() === 25L)

    // raw CAS on a stale base must conflict...
    intercept[CommitConflict] {
      cat.commit(tbl, t0.metadata, t1.metadata, expectedVersion = 1)
    }
    // ...and the writer's retry loop must absorb the same staleness
    val t2 = Writer.append(spark, t0, nation.limit(5))
    assert(t2.metadata.snapshots.size === 2)
    assert(SparkRead.read(spark, cat.loadTable(tbl).newScan).count() === 30L)

    // drop
    cat.dropTable(tbl)
    assert(!cat.tableExists(tbl))
    assert(!cat.listTables().contains(tbl))
  }

  for ((label, catThunk) <- Seq[(String, () => Catalog)](
    "hadoop" -> (() => backends(0)._2),
    "sql" -> (() => backends(1)._2),
    "rest" -> (() => backends(2)._2)))
    test(s"conformance battery: $label") { battery(label, catThunk()) }
}
