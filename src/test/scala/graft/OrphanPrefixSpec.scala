package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core.SchemaBridge
import graft.format.PartitionSpec
import graft.io.{FileIO, GatedFileSystem}
import graft.table.{Maintenance, SparkRead, Writer}
import graft.table.Maintenance.PrefixMismatchMode

/** Orphan-cleanup prefix-mismatch modes (reference
  * `table/orphan_cleanup.go:40-60,920-955`): a table whose metadata
  * references files under `gated://ha/...` while the filesystem listing
  * renders the same files authority-less (`gated:/...`) — the exact shape
  * of a storage-endpoint migration. Error must fail, Ignore must keep,
  * Delete must orphan, and an authority equivalence must neutralize the
  * mismatch entirely.
  */
class OrphanPrefixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    FileIO.unregisterCredentials("gated://")
    spark.stop()
  }

  test("prefix-mismatch modes: error fails, ignore keeps, delete orphans, equivalence resolves") {
    val wh = java.nio.file.Files.createTempDirectory("orphan-prefix").toString
    val tok = GatedFileSystem.issueToken(3600 * 1000L)
    val creds = GatedFileSystem.implOptions + (GatedFileSystem.TokenKey -> tok)
    FileIO.registerCredentials("gated://", creds)
    val hc = spark.sparkContext.hadoopConfiguration
    creds.foreach { case (k, v) => hc.set(k, v) }
    try {
      // authority 'ha' in the location: referenced paths carry it, but the
      // filesystem listing is authority-less — a built-in prefix mismatch
      val cat = new HadoopCatalog(s"gated://ha$wh")
      import spark.implicits._
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "seg")
      val t = Writer.append(spark,
        cat.createTable("t", SchemaBridge.fromSpark(df.schema),
          PartitionSpec.Unpartitioned), df)
      assert(t.newScan.planFiles().nonEmpty)
      assert(t.newScan.planFiles().forall(_.file.path.startsWith("gated://ha/")))
      assert(SparkRead.read(spark, t.newScan).count() === 3)

      // a genuine orphan: present on storage, referenced nowhere
      val junk = s"$wh/t/data/junk-not-referenced.bin"
      java.nio.file.Files.write(java.nio.file.Paths.get(junk), Array[Byte](1, 2, 3))
      val horizon = System.currentTimeMillis() + 600 * 1000L

      // the migration: the table's location now names the same storage
      // through a different authority, but every referenced file still
      // carries the old spelling — the classic prefix-mismatch setup
      val migrated = new graft.table.Table(t.name,
        t.metadata.copy(location = s"gated://hb$wh/t"), t.metadataPath, cat)

      // ERROR (default): refuse to guess
      val ex = intercept[IllegalStateException] {
        Maintenance.removeOrphanFiles(migrated, horizon, dryRun = true)
      }
      assert(ex.getMessage.contains("prefix mismatch"))
      assert(ex.getMessage.contains("ha"))

      // DELETE (dry run): the mismatched data files become orphan candidates
      val del = Maintenance.removeOrphanFiles(migrated, horizon, dryRun = true,
        prefixMismatchMode = PrefixMismatchMode.Delete)
      assert(del.exists(_.endsWith(".parquet"))) // live data would go — by explicit choice
      assert(del.exists(_.endsWith("junk-not-referenced.bin")))

      // authority equivalence neutralizes the mismatch: only real junk left
      val eq = Maintenance.removeOrphanFiles(migrated, horizon, dryRun = true,
        equalAuthorities = Map("ha,hb" -> "canon"))
      assert(eq.map(p => p.substring(p.lastIndexOf('/') + 1)) ===
        Seq("junk-not-referenced.bin"))

      // IGNORE: mismatched files survive, junk deletes; table stays readable
      val ign = Maintenance.removeOrphanFiles(migrated, horizon,
        prefixMismatchMode = PrefixMismatchMode.Ignore)
      assert(ign.map(p => p.substring(p.lastIndexOf('/') + 1)) ===
        Seq("junk-not-referenced.bin"))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(junk)))
      assert(SparkRead.read(spark, t.newScan).count() === 3)
    } finally {
      FileIO.unregisterCredentials("gated://")
      hc.unset(GatedFileSystem.TokenKey)
      GatedFileSystem.revoke(tok)
    }
  }

  test("orphan scan covers a write.data.path override root") {
    val wh = java.nio.file.Files.createTempDirectory("orphan-override").toString
    val cat = new HadoopCatalog(wh)
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "seg")
    val shared = s"$wh/_shared/t2data"
    val t = Writer.append(spark,
      cat.createTable("t2", SchemaBridge.fromSpark(df.schema),
        PartitionSpec.Unpartitioned,
        properties = Map("write.data.path" -> shared)), df)
    // live data sits OUTSIDE <table>/data; drop a stray next to it
    assert(t.newScan.planFiles().forall(_.file.path.startsWith(shared)))
    val stray = s"$shared/stray-not-referenced.parquet"
    FileIO.writeString(stray, "junk")
    val removed = Maintenance.removeOrphanFiles(
      cat.loadTable("t2"), olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.map(p => p.substring(p.lastIndexOf('/') + 1)) ===
      Seq("stray-not-referenced.parquet"))
    assert(!FileIO.exists(stray))
    // referenced files under the override root survive, reads stay whole
    assert(SparkRead.read(spark, cat.loadTable("t2").newScan).count() === 2)
  }
}
