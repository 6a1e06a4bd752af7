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
    "rest" -> new RestCatalog(restServer.uri),
    "hive" -> graft.catalog.HiveCatalog.embedded(hiveMsDir,
      Files.createTempDirectory("graft-conf-hivewh").toString))

  private lazy val hiveMsDir =
    Files.createTempDirectory("graft-conf-hivems").toString

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
    "rest" -> (() => backends(2)._2),
    "hive" -> (() => backends(3)._2)))
    test(s"conformance battery: $label") { battery(label, catThunk()) }

  test("hive: racing appends serialize on the metastore lock, both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cat = backends(3)._2
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = cat.createTable("hive_race", schema, PartitionSpec.Unpartitioned)
    val f1 = Future(Writer.append(spark, t0, nation.filter(col("n_nationkey") % 2 === 0)))
    val f2 = Future(Writer.append(spark, t0, nation.filter(col("n_nationkey") % 2 =!= 0)))
    Await.result(f1, 2.minutes); Await.result(f2, 2.minutes)
    val t = cat.loadTable("hive_race")
    assert(t.metadata.snapshots.size === 2)
    assert(SparkRead.read(spark, t.newScan).count() === 25L)
    cat.dropTable("hive_race")
  }

  test("hive: views project into HMS VIRTUAL_VIEW objects") {
    val cat = backends(3)._2.asInstanceOf[graft.catalog.HiveCatalog]
    val store = cat.viewStore.get
    store.createView("hv_view", "SELECT 1 AS one", Map("comment" -> "c"))
    // the HMS projection external tooling sees (reference schema.go:101-138)
    val params = cat.hmsParameters("default", "hv_view").get
    assert(params("table_type") === "ICEBERG_VIEW")
    assert(params("metadata_location").endsWith("v1.view.json"))
    assert(params.get("comment") === Some("c"))
    // views are not Iceberg TABLES: the table surface must not list them
    assert(!cat.tableExists("hv_view"))
    // replace records the previous pointer from the unmodified parameters
    store.replaceView("hv_view", "SELECT 2 AS one")
    val p2 = cat.hmsParameters("default", "hv_view").get
    assert(p2("metadata_location").endsWith("v2.view.json"))
    assert(p2("previous_metadata_location").endsWith("v1.view.json"))
    assert(store.loadView("hv_view").currentVersion.sql === "SELECT 2 AS one")
    // rename moves the projection; drop removes it
    store.renameView("hv_view", "hv_view2")
    assert(cat.hmsParameters("default", "hv_view").isEmpty)
    assert(cat.hmsParameters("default", "hv_view2").isDefined)
    store.dropView("hv_view2")
    assert(cat.hmsParameters("default", "hv_view2").isEmpty)
    // a view may not shadow an existing table name in the shared namespace
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    cat.createTable("hv_tbl", schema, PartitionSpec.Unpartitioned)
    intercept[IllegalArgumentException](store.createView("hv_tbl", "SELECT 1"))
    cat.dropTable("hv_tbl")
    // a namespaced view projects into its OWN database, not a dotted name
    // inside default
    store.createView("hvns.nv", "SELECT 3 AS three")
    assert(cat.hmsParameters("hvns", "nv").exists(
      _("table_type") == "ICEBERG_VIEW"))
    assert(cat.hmsParameters("default", "hvns.nv").isEmpty)
    store.dropView("hvns.nv")
    assert(cat.hmsParameters("hvns", "nv").isEmpty)
  }

  test("hive: battery over the thrift:// wire route") {
    // the remote branch of HiveCatalog.fromUri — a real thrift round-trip
    // through an in-process HMS server over the same Derby store (static
    // PMF: one embedded metastore per JVM, so same metastoreDir)
    backends(3)._2 // force the embedded catalog (and its Derby) up first
    val msDir = hiveMsDir
    val port = graft.catalog.HiveCatalog.startThriftServer(
      msDir, Files.createTempDirectory("graft-conf-thriftwh").toString)
    val cat = graft.catalog.HiveCatalog.fromUri(
      s"thrift://localhost:$port|${Files.createTempDirectory("graft-conf-thriftwh2")}")
    battery("thrift", cat)
  }

  test("hive: location-string CAS catches a same-version pointer swap") {
    val cat = backends(3)._2.asInstanceOf[graft.catalog.HiveCatalog]
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = cat.createTable("hive_swap", schema, PartitionSpec.Unpartitioned)
    // an external tool swaps the pointer to a BYTE-IDENTICAL copy at a
    // different location — same parsed version, so a version-number CAS
    // cannot see it; the location-string CAS must
    val swapDir = Files.createTempDirectory("graft-swap").toString
    val swapPath = s"$swapDir/v1.metadata.json"
    graft.io.FileIO.write(swapPath, graft.io.FileIO.readAllBytes(t0.metadataPath))
    cat.forceSetPointer("default", "hive_swap", swapPath)
    val ex = intercept[CommitConflict] {
      cat.commit("hive_swap", t0.metadata, t0.metadata, expectedVersion = 1,
        expectedLocation = Some(t0.metadataPath))
    }
    assert(ex.getMessage.contains("metadata_location changed"))
    // the fallback version CAS is blind to the swap — proving the string
    // compare is strictly stronger (this commit legitimately lands as v2)
    cat.commit("hive_swap", t0.metadata, t0.metadata, expectedVersion = 1)
    assert(cat.currentVersion("hive_swap") === Some(2))
    cat.dropTable("hive_swap")
  }

  test("hive: unknown-outcome alter_table reconciles to success/retry/unknown") {
    val cat = backends(3)._2.asInstanceOf[graft.catalog.HiveCatalog]
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = cat.createTable("hive_rec", schema, PartitionSpec.Unpartitioned)
    try {
      // 1. lost response AFTER apply: the rpc runs, the answer is lost —
      //    reconciliation observes pointer == new path → commit SUCCEEDED
      cat.commitAlterHook = { f =>
        f(); throw new RuntimeException("connection reset by peer")
      }
      val p2 = cat.commit("hive_rec", t0.metadata, t0.metadata,
        expectedVersion = 1, expectedLocation = Some(t0.metadataPath))
      assert(cat.currentVersion("hive_rec") === Some(2))
      assert(cat.hmsParameters("default", "hive_rec")
        .flatMap(_.get("metadata_location")) === Some(p2))

      // 2. failure BEFORE apply: pointer observed at the base → retryable
      //    CommitConflict, and a plain retry at the SAME version lands over
      //    the staged leftover file
      cat.commitAlterHook = { _ => throw new RuntimeException("socket timeout") }
      val t2 = cat.loadTable("hive_rec")
      val e = intercept[CommitConflict] {
        cat.commit("hive_rec", t2.metadata, t2.metadata,
          expectedVersion = 2, expectedLocation = Some(t2.metadataPath))
      }
      assert(e.getMessage.contains("before applying"))
      assert(cat.currentVersion("hive_rec") === Some(2), "pointer unmoved")
      cat.commitAlterHook = f => f()
      cat.commit("hive_rec", t2.metadata, t2.metadata,
        expectedVersion = 2, expectedLocation = Some(t2.metadataPath))
      assert(cat.currentVersion("hive_rec") === Some(3))

      // 3. pointer observed at a THIRD location (tampered between apply
      //    and observation) → genuinely unknown
      val t3 = cat.loadTable("hive_rec")
      val elsewhere = s"${t3.metadataPath}.elsewhere"
      cat.commitAlterHook = { f =>
        f()
        cat.forceSetPointer("default", "hive_rec", elsewhere)
        throw new RuntimeException("connection reset by peer")
      }
      val e2 = intercept[graft.catalog.CommitStateUnknown] {
        cat.commit("hive_rec", t3.metadata, t3.metadata,
          expectedVersion = 3, expectedLocation = Some(t3.metadataPath))
      }
      assert(e2.getMessage.contains("state unknown"))
    } finally {
      cat.commitAlterHook = f => f()
      cat.dropTable("hive_rec")
    }
  }

  test("hive: concurrent renames into one destination — exactly one wins") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cat = backends(3)._2.asInstanceOf[graft.catalog.HiveCatalog]
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    cat.createTable("rn_src1", schema, PartitionSpec.Unpartitioned)
    cat.createTable("rn_src2", schema, PartitionSpec.Unpartitioned)
    def tryRename(from: String): Either[Throwable, Unit] =
      try { cat.renameTable(from, "rn_dst"); Right(()) }
      catch { case e: Throwable => Left(e) }
    val fs = Seq("rn_src1", "rn_src2").map(f => Future(tryRename(f)))
    val results = fs.map(Await.result(_, 2.minutes))
    val (losers, winners) = results.partition(_.isLeft)
    assert(winners.size === 1, s"exactly one rename must win, got $results")
    assert(losers.size === 1)
    // the loser surfaces the TYPED already-exists error, not a raw HMS fault
    losers.head.left.foreach { e =>
      assert(e.isInstanceOf[IllegalArgumentException] ||
        e.isInstanceOf[graft.catalog.CommitConflict],
        s"loser must get a typed error, got ${e.getClass}: ${e.getMessage}")
      assert(e.getMessage.toLowerCase.contains("exist") ||
        e.getMessage.toLowerCase.contains("conflict"))
    }
    assert(cat.tableExists("rn_dst"))
    // exactly one source remains (the loser's)
    assert(Seq("rn_src1", "rn_src2").count(cat.tableExists) === 1)
    cat.dropTable("rn_dst")
    Seq("rn_src1", "rn_src2").filter(cat.tableExists).foreach(cat.dropTable)
  }

  test("hive: rename keeps storage, register points at existing metadata") {
    val cat = backends(3)._2.asInstanceOf[graft.catalog.HiveCatalog]
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = cat.createTable("hive_rn", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation)
    val loc0 = t1.metadata.location
    val renamed = cat.renameTable("hive_rn", "hive_rn2")
    assert(!cat.tableExists("hive_rn") && cat.tableExists("hive_rn2"))
    assert(renamed.metadata.location === loc0, "rename must not move storage")
    assert(SparkRead.read(spark, renamed.newScan).count() === 25L)
    // a commit AFTER rename uses the recorded location, not a name-derived one
    val t2 = Writer.append(spark, cat.loadTable("hive_rn2"), nation.limit(3))
    assert(SparkRead.read(spark, cat.loadTable("hive_rn2").newScan).count() === 28L)
    val reg = cat.registerTable("hive_reg", t2.metadataPath)
    assert(SparkRead.read(spark, cat.loadTable("hive_reg").newScan).count() === 28L)
    cat.dropTable("hive_rn2")
  }

  test("hadoop: a vanished version hint (mid-replace window) falls back to listing") {
    // replaceAtomic degrades to delete+rename on rename-no-replace
    // backends, so a reader can land in the instant where the hint file
    // does not exist. The hint is ADVISORY: version resolution, existence,
    // and load must all fall back to the vN.metadata.json listing instead
    // of crashing or reporting the table dropped (caught live by
    // ConcurrencyFuzz's 8-appender race).
    val wh = Files.createTempDirectory("graft-hintless").toString
    val cat = new HadoopCatalog(wh)
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val t0 = cat.createTable("hintless",
      SchemaBridge.fromSpark(nation.schema), PartitionSpec.Unpartitioned)
    Writer.append(spark, t0, nation)
    graft.io.FileIO.delete(s"$wh/hintless/metadata/version-hint.text")
    assert(cat.currentVersion("hintless") === Some(2),
      "version must resolve from the metadata-file listing")
    assert(cat.tableExists("hintless"), "mid-replace table must not read as dropped")
    assert(cat.listTables() === Seq("hintless"))
    assert(SparkRead.read(spark, cat.loadTable("hintless").newScan).count() === 25L)
    // and the NEXT commit re-publishes the hint
    Writer.append(spark, cat.loadTable("hintless"), nation.limit(2))
    assert(graft.io.FileIO.exists(s"$wh/hintless/metadata/version-hint.text"))
    assert(cat.currentVersion("hintless") === Some(3))
  }
}
