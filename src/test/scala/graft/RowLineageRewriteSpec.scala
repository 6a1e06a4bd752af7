package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.format.{ManifestContent, Manifests}

/** v3 row-lineage preservation through manifest REWRITE paths.
  *
  * The spec requires existing entries to preserve `first_row_id` across
  * commits. Manifests written by engines that rely on manifest-list-level
  * inheritance carry NULL per-file ids — a rewrite that re-reads such a
  * manifest without materializing the inherited ids (and then emits a list
  * row with no `first_row_id`) permanently destroys the lineage of every
  * surviving row. Exercised seams: Writer.commitSnapshotOnce's
  * carry-forward filter (delete commits) and Maintenance.rewriteManifests.
  * Reference: manifest inheritance `table/manifest.go` first-row-id
  * assignment; spec "existing entries keep first_row_id".
  */
class RowLineageRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("graft-rowlin").toString
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.g", classOf[graft.sources.GraftSpjCatalog].getName)
    s.conf.set("spark.sql.catalog.g.uri", wh)
    s
  }
  private lazy val catalog = new HadoopCatalog(wh)

  override def afterAll(): Unit = spark.stop()

  /** Rewrite the current snapshot's data manifests dropping every per-file
    * `first_row_id`, leaving only list-level inheritance — the form another
    * engine's inheriting writer produces. Paths are overwritten in place so
    * no metadata commit is needed; only manifests whose LIST row carries a
    * block start are touched (stripping an explicit-only manifest would
    * destroy ids outright, which no engine does).
    */
  private def stripPerFileIds(name: String): Unit = {
    val t = catalog.loadTable(name)
    val meta = t.metadata
    val snap = meta.currentSnapshot.get
    Manifests.readManifestList(snap.manifestList)
      .filter(m => m.content == ManifestContent.Data && m.firstRowId.isDefined)
      .foreach { m =>
        val (entries, specId) = Manifests.readManifest(m.path)
        val spec = meta.specById(specId).getOrElse(
          graft.format.PartitionSpec.Unpartitioned)
        val stripped = entries.map(e =>
          e.copy(file = e.file.copy(firstRowId = None),
            dataSequence = Some(e.dataSequence.getOrElse(m.sequenceNumber))))
        Manifests.writeManifest(m.path, stripped, meta.schema, spec,
          m.addedSnapshotId, formatVersion = meta.formatVersion)
      }
  }

  private def rowIds(where: String = "true"): Map[Long, Long] = {
    val t = catalog.loadTable("rl")
    graft.table.SparkRead.read(spark, t.newScan.withRowLineage)
      .where(where).selectExpr("k", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("scan inherits list-level ids after stripping (baseline sanity)") {
    spark.sql("CREATE TABLE g.rl (k BIGINT, p INT) PARTITIONED BY (p)")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rl"), 3)
    spark.sql("INSERT INTO g.rl SELECT id, CAST(id % 2 AS INT) FROM range(100)")
    val explicit = rowIds()
    assert(explicit.values.toSet.size === 100, "row ids are unique")
    stripPerFileIds("rl")
    assert(rowIds() === explicit,
      "list-level inheritance reconstructs the same assignment")
  }

  test("delete commit materializes inherited ids for surviving entries") {
    val before = rowIds("p = 1")
    // whole-partition delete → metadata-only removedPaths → the
    // carry-forward filter rewrites the (inheritance-form) manifest
    spark.sql("DELETE FROM g.rl WHERE p = 0")
    assert(spark.sql("SELECT count(*) FROM g.rl").head.getLong(0) === 50)
    assert(rowIds() === before,
      "surviving rows keep their pre-delete row ids")
    // and the ids are now EXPLICIT per-file (no list row to inherit from)
    val t = catalog.loadTable("rl")
    val snap = t.metadata.currentSnapshot.get
    val dataMs = Manifests.readManifestList(snap.manifestList)
      .filter(_.content == ManifestContent.Data)
    val rewritten = dataMs.filter(_.firstRowId.isEmpty)
    assert(rewritten.nonEmpty, "the filtered manifest was rewritten")
    rewritten.foreach { m =>
      val (entries, _) = Manifests.readManifest(m.path)
      assert(entries.forall(_.file.firstRowId.isDefined),
        s"rewritten manifest ${m.path} must carry explicit per-file ids")
    }
  }

  test("rewriteManifests preserves ids and writes a spec-legal v3 snapshot") {
    spark.sql("INSERT INTO g.rl SELECT id + 100, CAST(id % 2 AS INT) FROM range(50)")
    stripPerFileIds("rl") // the fresh manifest back to inheritance form
    val before = rowIds()
    val nextRowIdBefore = catalog.loadTable("rl").metadata.nextRowId

    val t2 = graft.table.Maintenance.rewriteManifests(
      catalog.loadTable("rl"), targetCount = 1)

    assert(rowIds() === before, "row ids survive manifest regrouping")
    val snap = t2.metadata.currentSnapshot.get
    assert(snap.firstRowId === Some(nextRowIdBefore),
      "v3 replace snapshot records first-row-id at the cursor")
    assert(snap.addedRows === Some(0L), "replace commit adds no rows")
    // regrouped manifests carry explicit ids and stamp format-version 3
    Manifests.readManifestList(snap.manifestList)
      .filter(m => m.content == ManifestContent.Data &&
        m.addedSnapshotId == snap.snapshotId)
      .foreach { m =>
        val (entries, _) = Manifests.readManifest(m.path)
        assert(entries.forall(_.file.firstRowId.isDefined))
        val rd = new org.apache.avro.file.DataFileReader(
          new java.io.File(new java.net.URI(m.path).getPath),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try assert(rd.getMetaString("format-version") === "3")
        finally rd.close()
      }
  }
}
