package graft

import java.nio.file.Files
import java.util.UUID
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{Catalogs, CommitConflict, MultiTableTransaction, SqlCatalog, StagedCommit}
import graft.core._
import graft.core.IcebergTypes._
import graft.format.{PartitionSpec, TableMetadata}

/** JDBC catalog (reference `catalog/sql/sql.go`): pointer rows in
  * `iceberg_tables`, CAS via conditional UPDATE, namespace properties, and
  * the single-database-transaction multi-table commit. Runs on embedded
  * Derby (in-memory).
  */
class SqlCatalogSpec extends AnyFunSuite {

  private def newCatalog(): SqlCatalog = {
    val db = s"memory:cat_${UUID.randomUUID().toString.take(8)}"
    val wh = Files.createTempDirectory("sqlcat-wh").toString
    new SqlCatalog(s"jdbc:derby:$db;create=true", wh)
  }

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "v", StringT, required = false)))

  private def bumpProps(meta: TableMetadata, k: String, v: String): TableMetadata =
    meta.copy(properties = meta.properties + (k -> v))

  test("create, load, list, exists, drop") {
    val cat = newCatalog()
    assert(!cat.tableExists("t1"))
    val t = cat.createTable("t1", schema, PartitionSpec.Unpartitioned)
    assert(t.currentVersion === 1)
    assert(cat.tableExists("t1"))
    assert(cat.listTables() === Seq("t1"))
    val loaded = cat.loadTable("t1")
    assert(loaded.schema.fields.map(_.name) === Seq("id", "v"))
    intercept[IllegalArgumentException](
      cat.createTable("t1", schema, PartitionSpec.Unpartitioned))
    cat.dropTable("t1")
    assert(!cat.tableExists("t1"))
    assert(cat.listTables() === Nil)
  }

  test("namespaced table names populate table_namespace") {
    val cat = newCatalog()
    cat.createTable("analytics.events", schema, PartitionSpec.Unpartitioned)
    cat.createTable("bare", schema, PartitionSpec.Unpartitioned)
    assert(cat.listTables().toSet === Set("analytics.events", "bare"))
    assert(cat.listNamespaces().contains("analytics"))
    assert(cat.loadTable("analytics.events").name === "analytics.events")
  }

  test("commit advances the pointer; stale CAS base loses") {
    val cat = newCatalog()
    val t = cat.createTable("t2", schema, PartitionSpec.Unpartitioned)
    val m2 = bumpProps(t.metadata, "step", "1")
    cat.commit("t2", t.metadata, m2, expectedVersion = 1)
    assert(cat.currentVersion("t2") === Some(2))
    assert(cat.loadTable("t2").metadata.properties("step") === "1")
    // the same stale base (version 1) must now conflict
    intercept[CommitConflict](
      cat.commit("t2", t.metadata, bumpProps(t.metadata, "step", "X"), expectedVersion = 1))
    assert(cat.loadTable("t2").metadata.properties("step") === "1")
  }

  test("two racing commits: exactly one wins") {
    val cat = newCatalog()
    val t = cat.createTable("t3", schema, PartitionSpec.Unpartitioned)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val results = (1 to 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          start.await()
          try {
            cat.commit("t3", t.metadata, bumpProps(t.metadata, "who", s"w$i"),
              expectedVersion = 1)
            true
          } catch { case _: CommitConflict => false }
        }
      })
    }
    start.countDown()
    val wins = results.map(_.get(30, TimeUnit.SECONDS)).count(identity)
    pool.shutdown()
    assert(wins === 1)
    assert(cat.currentVersion("t3") === Some(2))
  }

  test("multi-table transaction commits atomically in one db txn") {
    val cat = newCatalog()
    val a = cat.createTable("txa", schema, PartitionSpec.Unpartitioned)
    val b = cat.createTable("txb", schema, PartitionSpec.Unpartitioned)
    cat.commitTransaction(Seq(
      StagedCommit("txa", a.metadata, bumpProps(a.metadata, "k", "a"), 1),
      StagedCommit("txb", b.metadata, bumpProps(b.metadata, "k", "b"), 1)))
    assert(cat.currentVersion("txa") === Some(2))
    assert(cat.currentVersion("txb") === Some(2))

    // inject a conflict on table B: its pointer moved after staging
    val a2 = cat.loadTable("txa")
    val b2 = cat.loadTable("txb")
    cat.commit("txb", b2.metadata, bumpProps(b2.metadata, "k", "sneak"), 2)
    intercept[CommitConflict](cat.commitTransaction(Seq(
      StagedCommit("txa", a2.metadata, bumpProps(a2.metadata, "k", "a2"), 2),
      StagedCommit("txb", b2.metadata, bumpProps(b2.metadata, "k", "b2"), 2))))
    // table A must be untouched
    assert(cat.currentVersion("txa") === Some(2))
    assert(cat.loadTable("txa").metadata.properties("k") === "a")
    assert(cat.loadTable("txb").metadata.properties("k") === "sneak")
    // and the aborted transaction must not poison A's next version slot:
    // the sneak commit made staging txb's v3 throw mid-loop, so txa's
    // already-staged v3 file must have been cleaned up — a plain retry of
    // txa at version 2 has to succeed
    val a3 = cat.loadTable("txa")
    cat.commit("txa", a3.metadata, bumpProps(a3.metadata, "k", "retry"), 2)
    assert(cat.currentVersion("txa") === Some(3))
    assert(cat.loadTable("txa").metadata.properties("k") === "retry")
  }

  test("MultiTableTransaction runs against SqlCatalog") {
    val cat = newCatalog()
    val a = cat.createTable("mta", schema, PartitionSpec.Unpartitioned)
    val b = cat.createTable("mtb", schema, PartitionSpec.Unpartitioned)
    val txn = new MultiTableTransaction(cat)
    txn.run(a)(t => { // metadata-only op through the staging catalog
      val updated = bumpProps(t.metadata, "via", "txn")
      t.catalog.commit(t.name, t.metadata, updated, t.currentVersion)
      cat.loadTable(t.name) // not used; return value irrelevant for staging
      t
    })
    txn.run(b)(t => {
      val updated = bumpProps(t.metadata, "via", "txn")
      t.catalog.commit(t.name, t.metadata, updated, t.currentVersion)
      t
    })
    txn.commit()
    assert(cat.loadTable("mta").metadata.properties("via") === "txn")
    assert(cat.loadTable("mtb").metadata.properties("via") === "txn")
  }

  test("namespace properties CRUD") {
    val cat = newCatalog()
    cat.createNamespace("raw", Map("owner" -> "ops"))
    assert(cat.namespaceExists("raw"))
    assert(cat.loadNamespaceProperties("raw")("owner") === "ops")
    intercept[IllegalArgumentException](cat.createNamespace("raw"))
    cat.updateNamespaceProperties("raw", removals = Set("owner"),
      updates = Map("retention" -> "30d"))
    val props = cat.loadNamespaceProperties("raw")
    assert(!props.contains("owner"))
    assert(props("retention") === "30d")
    intercept[IllegalArgumentException](
      cat.updateNamespaceProperties("raw", Set("x"), Map("x" -> "1")))
    cat.createTable("raw.t", schema, PartitionSpec.Unpartitioned)
    intercept[IllegalArgumentException](cat.dropNamespace("raw"))
    cat.dropTable("raw.t")
    cat.dropNamespace("raw")
    assert(!cat.namespaceExists("raw"))
  }

  test("scheme registry resolves sql:<jdbc>|<warehouse>") {
    val wh = Files.createTempDirectory("sqlcat-uri").toString
    val db = s"memory:cat_${UUID.randomUUID().toString.take(8)}"
    val cat = Catalogs.load(s"sql:jdbc:derby:$db;create=true|$wh")
    assert(cat.isInstanceOf[SqlCatalog])
    cat.createTable("u", schema, PartitionSpec.Unpartitioned)
    assert(cat.tableExists("u"))
  }

  test("renameTable moves the catalog identity; storage and commits keep working") {
    val cat = newCatalog()
    val t = cat.createTable("ra", schema, PartitionSpec.Unpartitioned)
    cat.commit("ra", t.metadata, bumpProps(t.metadata, "step", "1"), expectedVersion = 1)
    val renamed = cat.renameTable("ra", "rb")
    assert(renamed.metadata.properties("step") === "1")
    assert(!cat.tableExists("ra") && cat.tableExists("rb"))
    assert(cat.listTables() === Seq("rb"))
    // the metadata location still lives under the ORIGINAL directory
    assert(renamed.metadataPath.contains("/ra/"))
    // a commit under the NEW identity must succeed — the CAS compares the
    // actual recorded location, not a name-derived path
    cat.commit("rb", renamed.metadata, bumpProps(renamed.metadata, "step", "2"),
      expectedVersion = renamed.currentVersion)
    assert(cat.loadTable("rb").metadata.properties("step") === "2")
    // error paths: missing source, existing destination
    intercept[IllegalArgumentException](cat.renameTable("ra", "rc"))
    cat.createTable("rc", schema, PartitionSpec.Unpartitioned)
    intercept[IllegalArgumentException](cat.renameTable("rb", "rc"))
  }

  test("registerTable points a new name at existing metadata; pointers diverge") {
    val cat = newCatalog()
    val t = cat.createTable("src_t", schema, PartitionSpec.Unpartitioned)
    val reg = cat.registerTable("reg_t", t.metadataPath)
    assert(reg.metadata.tableUuid === t.metadata.tableUuid)
    assert(cat.loadTable("reg_t").metadataPath === t.metadataPath)
    // registering over an existing name fails; bogus location fails to parse
    intercept[IllegalArgumentException](cat.registerTable("reg_t", t.metadataPath))
    intercept[Exception](cat.registerTable("reg2", "/no/such/file.metadata.json"))
    // each pointer commits independently from the shared history
    cat.commit("reg_t", reg.metadata, bumpProps(reg.metadata, "who", "reg"),
      expectedVersion = reg.currentVersion)
    cat.commit("src_t", t.metadata, bumpProps(t.metadata, "who", "src"),
      expectedVersion = t.currentVersion)
    assert(cat.loadTable("reg_t").metadata.properties("who") === "reg")
    assert(cat.loadTable("src_t").metadata.properties("who") === "src")
  }

  test("registerTable rejects unversioned metadata names BEFORE inserting the row") {
    val cat = newCatalog()
    val t = cat.createTable("vr_src", schema, PartitionSpec.Unpartitioned)
    // Apache-convention filename (reference table/locations.go:79): parseable
    // metadata, but not this catalog's v<N> scheme — must fail up front
    val apacheStyle = Files.createTempDirectory("reg-apache")
      .resolve("00003-deadbeef-1234.metadata.json")
    Files.copy(java.nio.file.Paths.get(t.metadataPath), apacheStyle)
    val e = intercept[IllegalArgumentException](
      cat.registerTable("vr_reg", apacheStyle.toString))
    assert(e.getMessage.contains("unsupported metadata file name"))
    // the catalog row was NEVER inserted: the same name registers cleanly
    // with a valid location (a poisoned row would fail 'already exists')
    val reg = cat.registerTable("vr_reg", t.metadataPath)
    assert(reg.metadata.tableUuid === t.metadata.tableUuid)
  }

  test("rename and register demand an existing destination namespace") {
    val cat = newCatalog()
    cat.createTable("nst", schema, PartitionSpec.Unpartitioned)
    val t = cat.loadTable("nst")
    intercept[NoSuchElementException](cat.renameTable("nst", "ghost.nst2"))
    assert(cat.tableExists("nst")) // rename rolled back
    intercept[NoSuchElementException](cat.registerTable("ghost.reg", t.metadataPath))
    cat.createNamespace("ghost")
    assert(cat.renameTable("nst", "ghost.nst2").metadata.tableUuid === t.metadata.tableUuid)
    assert(cat.registerTable("ghost.reg", t.metadataPath) != null)
  }
}
