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

  // reference `rewrite_data_files.go:330-390` + TestRewriteDataFiles
  // PreservesRowIDThroughDeletionVector: when every file in the rewrite
  // scope carries lineage, compaction materializes each surviving row's
  // ORIGINAL _row_id as an explicit parquet column in the new files; the
  // fresh first_row_id blocks the commit assigns are ignored row-wise
  // because the read rule is explicit-column-wins
  test("rewriteDataFiles preserves row ids (explicit columns win synthesis)") {
    spark.sql("""CREATE TABLE g.rlc (k BIGINT, p INT) PARTITIONED BY (p)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlc"), 3)
    spark.sql("INSERT INTO g.rlc SELECT id, CAST(id % 2 AS INT) FROM range(100)")
    spark.sql("INSERT INTO g.rlc SELECT id + 100, CAST(id % 2 AS INT) FROM range(100)")
    // a DV so compaction has deletes to fold (the reference test's shape)
    spark.sql("DELETE FROM g.rlc WHERE k % 10 = 3")

    def ids(): Map[Long, Long] = graft.table.SparkRead.read(spark,
        catalog.loadTable("rlc").newScan.withRowLineage)
      .selectExpr("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = ids()
    assert(before.size === 180 && before.values.toSet.size === 180)

    val res = graft.table.Maintenance.rewriteDataFiles(spark,
      catalog.loadTable("rlc"), rewriteAll = true)
    assert(res.rewrittenDataFiles > 0)

    val after = ids()
    assert(after === before, "every surviving row keeps its original _row_id")
    // the new files materialize the lineage columns under the reserved ids
    val newFile = res.table.newScan.planFiles().head.file.path
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(newFile))
    val cols = footer.getFileMetaData.getSchema.getFields
    import scala.jdk.CollectionConverters._
    val rowIdField = cols.asScala.find(_.getName == "_row_id")
    assert(rowIdField.isDefined, "_row_id is a real parquet column")
    assert(rowIdField.get.getId.intValue === 2147483540)
    // and manifest stats ignore the reserved ids (no bounds for 2147483540)
    assert(!res.table.newScan.planFiles().head.file.lowerBounds.contains(2147483540))

    // a SECOND compaction still preserves (outputs carry firstRowId blocks
    // + explicit columns, so the all-files-have-lineage check keeps passing)
    spark.sql("INSERT INTO g.rlc SELECT id + 200, CAST(id % 2 AS INT) FROM range(20)")
    val afterInsert = ids()
    val res2 = graft.table.Maintenance.rewriteDataFiles(spark,
      catalog.loadTable("rlc"), rewriteAll = true)
    assert(res2.rewrittenDataFiles > 0)
    assert(ids() === afterInsert, "second-generation compaction preserves too")
  }

  // reference `table/row_lineage_prune_delete_test.go`: _row_id synthesis is
  // first_row_id + PHYSICAL position. A scan whose filter prunes a leading
  // parquet row group (and whose MoR deletes knock out rows) emits
  // non-contiguous survivors — a dense position counter would stamp the
  // wrong ids. Our __pos comes from `_metadata.row_index` (footer
  // row-group offsets), pinned here end to end for BOTH delete shapes.
  test("_row_id synthesis targets physical positions across pruned row groups") {
    spark.sql("""CREATE TABLE g.rlp (k BIGINT, pad STRING)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read',
                     'write.parquet.row-group-size-bytes' = '4096')""")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlp"), 3)
    // sorted single file → tight per-row-group k ranges → stats prune
    spark.sql("""INSERT INTO g.rlp
      SELECT /*+ COALESCE(1) */ id, repeat('x', 64) FROM range(8000) ORDER BY id""")
    val t0 = catalog.loadTable("rlp")
    val files = t0.newScan.planFiles().map(_.file)
    assert(files.size === 1 && files.head.firstRowId === Some(0L))
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(files.head.path))
    assert(footer.getBlocks.size() > 1,
      s"test needs >1 row groups, got ${footer.getBlocks.size()}")

    // v3 SQL DELETE → deletion vector; direct MoR delete → parquet
    // pos-delete file: both shapes live on the one data file at once
    spark.sql("DELETE FROM g.rlp WHERE k = 7997")
    // the MoR mode was honored: the original file survives under a DV
    locally {
      val after = catalog.loadTable("rlp").newScan.planFiles()
      assert(after.map(_.file.path) === files.map(_.path),
        "merge-on-read DELETE must not rewrite the data file")
      assert(after.head.posDeletes.exists(_.format == "PUFFIN"), "v3 DELETE wrote a DV")
    }
    graft.table.Writer.deleteWhereMoR(spark, catalog.loadTable("rlp"),
      graft.core.Expr.eq("k", 7995L))

    // the filter prunes every leading row group; sorted single-file insert
    // means the correct _row_id IS k — any dense-counter drift shows up as
    // a mismatch
    val rows = graft.table.SparkRead.read(spark, catalog.loadTable("rlp")
        .newScan.withFilter(graft.core.Expr.gtEq("k", 7000L)).withRowLineage)
      .selectExpr("k", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 998, s"expected 998 survivors, got ${rows.length}")
    assert(!rows.exists(r => r._1 == 7995L || r._1 == 7997L), "deleted rows gone")
    val bad = rows.filter(r => r._1 != r._2)
    assert(bad.isEmpty,
      s"survivors must keep _row_id = physical ordinal under pruned groups; " +
        s"${bad.length} mismatches, first 10: ${bad.take(10).mkString(",")}")
  }

  // the lineage columns are SQL metadata columns on v3 tables (Iceberg
  // convention: SELECT _row_id, _last_updated_sequence_number FROM t) —
  // synthesized executor-side from first_row_id + physical position,
  // explicit file columns winning after a lineage-preserving rewrite
  test("_row_id / _last_updated_sequence_number are queryable metadata columns") {
    spark.sql("CREATE TABLE g.rlmc (k BIGINT)")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlmc"), 3)
    spark.sql("INSERT INTO g.rlmc SELECT id FROM range(30)")
    spark.sql("INSERT INTO g.rlmc SELECT id + 30 FROM range(30)")
    def sqlIds(): Map[Long, (Long, Long)] = spark.sql(
      "SELECT k, _row_id, _last_updated_sequence_number FROM g.rlmc")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ids = sqlIds()
    assert(ids.size === 60)
    assert(ids.values.map(_._1).toSet.size === 60, "row ids unique")
    // second insert's rows carry a later last-updated sequence
    val seqByInsert = ids.groupBy(_._1 < 30).map { case (first, m) =>
      first -> m.values.map(_._2).toSet }
    assert(seqByInsert(true).size === 1 && seqByInsert(false).size === 1)
    assert(seqByInsert(true).head < seqByInsert(false).head)
    // agreement with the V1 route's synthesis
    val v1 = graft.table.SparkRead.read(spark,
        catalog.loadTable("rlmc").newScan.withRowLineage)
      .selectExpr("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.map { case (k, (id, _)) => k -> id } === v1)
    // filters + MoR deletes compose: delete one row, filter past it
    spark.sql("ALTER TABLE g.rlmc SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql("DELETE FROM g.rlmc WHERE k = 40")
    val after = spark.sql(
      "SELECT k, _row_id FROM g.rlmc WHERE k >= 30")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size === 29 && !after.contains(40L))
    assert(after === ids.collect { case (k, (id, _)) if k >= 30 && k != 40 => k -> id },
      "survivors keep their ids through the DSv2 route under filter + DV")
    // explicit columns win after a lineage-preserving compaction
    graft.table.Maintenance.rewriteDataFiles(spark, catalog.loadTable("rlmc"),
      rewriteAll = true)
    val compacted = sqlIds()
    assert(compacted.map { case (k, (id, _)) => k -> id } ===
      ids.collect { case (k, (id, _)) if k != 40 => k -> id },
      "compaction-preserved explicit ids surface through SQL")
    // a v2 table does not advertise the columns
    spark.sql("CREATE TABLE g.rlmc2 (k BIGINT)")
    spark.sql("INSERT INTO g.rlmc2 VALUES (1)")
    val e = intercept[Exception](
      spark.sql("SELECT _row_id FROM g.rlmc2").collect())
    assert(e.getMessage.contains("_row_id"))
  }

  // the SQL surface on a DEFAULT-mode (copy-on-write) v3 table: the
  // partial-file DELETE rewrites survivors with their ids carried through
  test("SQL DELETE on a CoW v3 table preserves surviving rows' _row_id") {
    spark.sql("CREATE TABLE g.rlsql (k BIGINT)")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlsql"), 3)
    spark.sql("INSERT INTO g.rlsql SELECT id FROM range(80)")
    def ids(): Map[Long, Long] = graft.table.SparkRead.read(spark,
        catalog.loadTable("rlsql").newScan.withRowLineage)
      .selectExpr("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = ids()
    // translatable partial predicate → Spark's metadata-delete rule calls
    // deleteWhere, the lineage-carrying CoW path. (A predicate the filter
    // bridge can't translate, e.g. `k % 7 = 3`, builds the group-based
    // rewrite plan — which ALSO carries lineage since r16, via the
    // preserve-flagged metadata projection; see the group-UPDATE pin
    // below and gate i121.)
    spark.sql("DELETE FROM g.rlsql WHERE k < 10")
    val after = ids()
    assert(after.size === before.size - 10)
    assert(after === before.filter(_._1 >= 10),
      "SQL CoW DELETE keeps every survivor's original _row_id")
  }

  // CoW DELETE is a rewrite of the surviving rows — the spec's lineage
  // promise (existing rows keep _row_id) applies exactly as it does to
  // compaction, and the same explicit-column carry delivers it
  test("CoW deleteWhere preserves surviving rows' _row_id on v3") {
    spark.sql("CREATE TABLE g.rlcow (k BIGINT)")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlcow"), 3)
    spark.sql("INSERT INTO g.rlcow SELECT id FROM range(100)")
    def ids(): Map[Long, Long] = graft.table.SparkRead.read(spark,
        catalog.loadTable("rlcow").newScan.withRowLineage)
      .selectExpr("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = ids()
    assert(before.size === 100)
    // partial-file match → real rewrite, not metadata-only
    val t1 = graft.table.Writer.deleteWhere(spark, catalog.loadTable("rlcow"),
      graft.core.Expr.lt("k", 10L))
    assert(t1.metadata.currentSnapshot.get.summary.get("operation")
      .contains("overwrite"))
    val after = ids()
    assert(after.size === 90)
    assert(after === before.filter(_._1 >= 10L),
      "every surviving row keeps its original _row_id through a CoW delete")
  }

  // the r15 boundary, closed: group-based row-level plans (the route
  // UPDATE and untranslatable DELETEs take) carry lineage through the
  // ReplaceData metadata projection. Composed here with the two hard
  // dimensions at once — a MULTI-ROW-GROUP file (physical positions, not
  // dense counters) carrying a DV (survivors only, no resurrection) —
  // then stacked with a delta-path (merge-on-read) UPDATE whose
  // delete+reinsert split must keep the same ids.
  test("group UPDATE carries _row_id: multi-row-group file + DV, both write modes") {
    spark.sql("""CREATE TABLE g.rlg (k BIGINT, pad STRING)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read',
                     'write.parquet.row-group-size-bytes' = '4096')""")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlg"), 3)
    // sorted single file starting at block 0 → correct _row_id IS k
    spark.sql("""INSERT INTO g.rlg
      SELECT /*+ COALESCE(1) */ id, repeat('x', 64) FROM range(8000) ORDER BY id""")
    val f0 = catalog.loadTable("rlg").newScan.planFiles().map(_.file)
    assert(f0.size === 1 && f0.head.firstRowId === Some(0L))
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(f0.head.path))
    assert(footer.getBlocks.size() > 1,
      s"test needs >1 row groups, got ${footer.getBlocks.size()}")
    // DV on the file (merge-on-read DELETE), then a GROUP-BASED CoW
    // UPDATE: `k % 1000 = 7` is untranslatable to a source Filter, so the
    // row-level plan (not the metadata-delete rule) runs the rewrite
    spark.sql("DELETE FROM g.rlg WHERE k = 4000")
    spark.sql("UPDATE g.rlg SET pad = 'u' WHERE k % 1000 = 7")
    def check(tag: String, updated: Long => Boolean, mark: String): Unit = {
      val rows = spark.sql("SELECT k, _row_id, pad FROM g.rlg").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.length === 7999, s"$tag: ${rows.length} rows")
      assert(!rows.exists(_._1 == 4000L), s"$tag: DV row resurrected")
      val bad = rows.filter(r => r._1 != r._2)
      assert(bad.isEmpty,
        s"$tag: survivors must keep _row_id = original physical ordinal; " +
          s"${bad.length} drifted, first 5: ${bad.take(5).mkString(",")}")
      assert(rows.filter(r => updated(r._1)).forall(_._3 == mark),
        s"$tag: update content applied")
    }
    check("group-CoW", k => k % 1000 == 7, "u")
    // the CoW rewrite folded the file's DV away with it
    assert(catalog.loadTable("rlg").newScan.planFiles()
      .forall(_.posDeletes.isEmpty), "rewrite folds the covered DV")
    // same invariant through the DELTA (merge-on-read) UPDATE split
    spark.sql("ALTER TABLE g.rlg SET TBLPROPERTIES ('write.update.mode'='merge-on-read')")
    spark.sql("UPDATE g.rlg SET pad = 'm' WHERE k % 1000 = 13")
    check("delta-MoR", k => k % 1000 == 13, "m")
    // and the updated rows re-stamped their sequence in both passes
    val seqs = spark.sql(
      """SELECT k % 1000 AS b, MIN(_last_updated_sequence_number) AS lo,
                MAX(_last_updated_sequence_number) AS hi
         FROM g.rlg WHERE k % 1000 IN (7, 13, 21) GROUP BY 1""").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(seqs(21L)._2 < seqs(7L)._1, "CoW-updated rows re-stamped past untouched")
    assert(seqs(7L)._2 < seqs(13L)._1, "MoR-updated rows re-stamped past CoW pass")
    // EQUALITY deletes compose: the group rewrite reads through the
    // eq-key route (schema widened with the key column beside the lineage
    // request), drops the deleted row for good, and still carries every
    // survivor's id
    graft.table.Writer.equalityDelete(spark, catalog.loadTable("rlg"),
      spark.range(1).selectExpr("CAST(6000 AS BIGINT) AS k"), Seq("k"))
    spark.sql("ALTER TABLE g.rlg SET TBLPROPERTIES ('write.update.mode'='copy-on-write')")
    spark.sql("UPDATE g.rlg SET pad = 'e' WHERE k % 1000 = 21")
    val rows3 = spark.sql("SELECT k, _row_id FROM g.rlg").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows3.length === 7998, s"eq-composition: ${rows3.length} rows")
    assert(!rows3.exists(_._1 == 6000L), "eq-deleted row resurrected by the rewrite")
    val bad3 = rows3.filter(r => r._1 != r._2)
    assert(bad3.isEmpty,
      s"eq-composition: ids drifted, first 5: ${bad3.take(5).mkString(",")}")
  }

  // a PRE-UPGRADE file's rows take their ids from upgrade-time block
  // assignment (inheritance — no explicit column in the file); the group
  // rewrite's metadata projection reads those SYNTHESIZED ids and must
  // carry them exactly like explicit ones — a rewrite that only preserved
  // physically-stored ids would silently re-block the whole migrated fleet
  test("group UPDATE preserves ids inherited by a pre-upgrade file") {
    spark.sql("CREATE TABLE g.rlpre (k BIGINT, p STRING)")
    spark.sql("INSERT INTO g.rlpre SELECT id, 'a' FROM range(50)")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlpre"), 3)
    val before = spark.sql("SELECT k, _row_id FROM g.rlpre").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.size === 50 && before.values.toSeq.distinct.size === 50,
      "upgrade-time inheritance assigns unique ids")
    // untranslatable predicate → group-based rewrite of the whole file
    spark.sql("UPDATE g.rlpre SET p = 'u' WHERE k % 7 = 3")
    val after = spark.sql("SELECT k, _row_id, p FROM g.rlpre").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(after.length === 50)
    assert(after.map(x => x._1 -> x._2).toMap === before,
      "inherited ids must survive the rewrite unchanged")
    assert(after.filter(_._1 % 7 == 3).forall(_._3 == "u"), "update applied")
  }

  // mixed scope: a file with NO lineage anywhere (the form a foreign
  // pre-lineage manifest takes — no field 142, no list-level 520, e.g. rows
  // awaiting lazy id assignment after a v1/v2→v3 migration) beside a
  // lineage-carrying one — the scope SPLITS into two output groups: the
  // lineage subset rewrites with its ids preserved 1:1 (the spec promise
  // for rows that have ids, reference rewrite_data_files.go:330-390), the
  // legacy subset without (fresh blocks at commit). One mixed output file
  // would put nulls beside real ids, violating per-file uniqueness.
  test("rewriteDataFiles splits mixed pre/post-upgrade scopes, preserving carried ids") {
    spark.sql("CREATE TABLE g.rlm (k BIGINT)")
    graft.table.Evolve.upgradeFormatVersion(catalog.loadTable("rlm"), 3)
    spark.sql("INSERT INTO g.rlm SELECT id FROM range(50)")
    // strip BOTH the per-file ids and the list-level block from the first
    // commit's manifest: firstRowId resolves to None at plan time
    locally {
      val t0 = catalog.loadTable("rlm")
      val meta = t0.metadata
      val snap = meta.currentSnapshot.get
      val rows = Manifests.readManifestList(snap.manifestList)
      val updated = rows.map { m =>
        if (m.content != ManifestContent.Data) m
        else {
          val (entries, specId) = Manifests.readManifest(m.path)
          val spec = meta.specById(specId).getOrElse(
            graft.format.PartitionSpec.Unpartitioned)
          Manifests.writeManifest(m.path, entries.map(e =>
            e.copy(file = e.file.copy(firstRowId = None),
              dataSequence = Some(e.dataSequence.getOrElse(m.sequenceNumber)))),
            meta.schema, spec, m.addedSnapshotId,
            formatVersion = meta.formatVersion)
          m.copy(firstRowId = None)
        }
      }
      Manifests.writeManifestList(snap.manifestList, updated, snap.snapshotId,
        snap.parentSnapshotId, snap.sequenceNumber, formatVersion = 3)
    }
    spark.sql("INSERT INTO g.rlm SELECT id + 50 FROM range(50)") // lineage
    val t = catalog.loadTable("rlm")
    val files = t.newScan.planFiles().map(_.file)
    assert(files.exists(_.firstRowId.isEmpty) && files.exists(_.firstRowId.isDefined),
      "scope is genuinely mixed")
    // the lineage-carrying subset's ids BEFORE the rewrite (k = 50..99);
    // legacy rows read _row_id as NULL (no block to synthesize from)
    def idMap(): Map[Long, Option[Long]] = graft.table.SparkRead.read(spark,
        catalog.loadTable("rlm").newScan.withRowLineage)
      .selectExpr("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val before = idMap()
    val carriedBefore = before.filter(_._1 >= 50)
    assert(carriedBefore.size === 50 && carriedBefore.values.forall(_.isDefined))

    val res = graft.table.Maintenance.rewriteDataFiles(spark, t, rewriteAll = true)
    assert(res.rewrittenDataFiles > 0)
    val after = idMap()
    assert(after.size === 100)
    assert(after.values.forall(_.isDefined),
      "every row has an id after the rewrite (legacy group took fresh blocks)")
    assert(after.values.flatten.toSet.size === 100, "ids unique across both groups")
    // carried subset: ids preserved 1:1; legacy subset: fresh synthesized
    assert(after.filter(_._1 >= 50) === carriedBefore,
      "lineage-carrying rows keep their original _row_id through a mixed rewrite")
    // the output groups are physically distinct: the lineage group's files
    // carry the explicit _row_id parquet column, the legacy group's don't
    import scala.jdk.CollectionConverters._
    def hasRowIdCol(path: String): Boolean =
      org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        new org.apache.hadoop.conf.Configuration(),
        new org.apache.hadoop.fs.Path(path))
        .getFileMetaData.getSchema.getFields.asScala.exists(_.getName == "_row_id")
    val outPaths = res.table.newScan.planFiles().map(_.file.path).distinct
    assert(outPaths.exists(hasRowIdCol) && outPaths.exists(!hasRowIdCol(_)),
      "split rewrite emits one lineage-columned group and one plain group")
  }
}
