package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core.Expr
import graft.format.{DataFileContent, ManifestContent, ManifestEntryStatus, Manifests, PartitionSpec}
import graft.table.{Maintenance, Writer}

/** Equality-delete collection during compaction beyond the full-rewrite
  * gate (i114): the empty/no-selection table cases and PARTIAL-scope
  * compaction, where deletes attached to untouched files must survive
  * while folded and dead ones are collected — the survivor-survey
  * semantics of the reference's `compaction/eq_delete_decision.go`.
  */
class DeadDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("graft-deaddel").toString
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private lazy val catalog = new HadoopCatalog(wh)

  override def afterAll(): Unit = spark.stop()

  private def eqDeletePaths(t: graft.table.Table): Set[String] =
    t.metadata.currentSnapshot
      .map(s => Manifests.readManifestList(s.manifestList)).getOrElse(Nil)
      .filter(_.content == ManifestContent.Deletes)
      .flatMap(m => Manifests.readManifest(m.path)._1
        .filter(_.status != ManifestEntryStatus.Deleted).map(_.file))
      .filter(_.content == DataFileContent.EqualityDeletes)
      .map(_.path).toSet

  private def schemaOf(cols: (String, String)*) = {
    import org.apache.spark.sql.types._
    graft.core.SchemaBridge.fromSpark(StructType(cols.map {
      case (n, "bigint") => StructField(n, LongType)
      case (n, "int") => StructField(n, IntegerType)
      case (n, _) => StructField(n, StringType)
    }))
  }

  test("empty table: dead eq-delete backlog is collected without any scan tasks") {
    import spark.implicits._
    var t = catalog.createTable("dd_empty", schemaOf("k" -> "bigint"),
      PartitionSpec.Unpartitioned)
    // CDC drain shape: deletes committed against a table that never had
    // (or no longer has) any data — zero scan tasks, nonzero backlog
    t = Writer.equalityDelete(spark, t, Seq(1L, 2L).toDF("k"), Seq("k"))
    t = Writer.equalityDelete(spark, t, Seq(3L).toDF("k"), Seq("k"))
    val backlog = eqDeletePaths(t).size
    assert(backlog >= 2)
    assert(t.newScan.planFiles().isEmpty)

    val res = Maintenance.rewriteDataFiles(spark, t)
    assert(res.removedDeleteFiles === backlog)
    assert(res.rewrittenDataFiles === 0 && res.addedDataFiles === 0)
    assert(eqDeletePaths(res.table).isEmpty)
    assert(res.table.metadata.currentSnapshot.get.summary("operation") === "replace")
  }

  test("no group selected: dead delete still collected, live data untouched") {
    import spark.implicits._
    var t = catalog.createTable("dd_nosel", schemaOf("k" -> "bigint"),
      PartitionSpec.Unpartitioned)
    // dead on arrival: sequences BELOW the data that follows
    t = Writer.equalityDelete(spark, t, Seq(999L).toDF("k"), Seq("k"))
    t = Writer.append(spark, t, spark.range(100).toDF("k"))
    val dataPaths = t.newScan.planFiles().map(_.file.path).toSet

    // one healthy file, no deletes attached → no group selected
    val res = Maintenance.rewriteDataFiles(spark, t, minInputFiles = 99)
    assert(res.removedDeleteFiles === 1)
    assert(res.rewrittenDataFiles === 0)
    assert(eqDeletePaths(res.table).isEmpty)
    assert(res.table.newScan.planFiles().map(_.file.path).toSet === dataPaths,
      "data files untouched by the delete-only commit")
    assert(graft.table.SparkRead.read(spark, res.table.newScan).count() === 100)
  }

  test("partial-scope compaction: deletes on untouched partitions survive") {
    import spark.implicits._
    val schema = schemaOf("k" -> "bigint", "p" -> "int")
    val pspec = PartitionSpec.builder(schema).add("p", graft.core.Transforms.Identity).build()
    var t = catalog.createTable("dd_part", schema, pspec)
    // dead on arrival (below all data)
    t = Writer.equalityDelete(spark, t, Seq(999L).toDF("k"), Seq("k"))
    // sequence-confined attachment: D1 lands between the two appends, so
    // it reaches only p=0 files; D2 lands after both, reaching all files
    t = Writer.append(spark, t,
      spark.range(50).toDF("k").withColumn("p", org.apache.spark.sql.functions.lit(0)))
    t = Writer.equalityDelete(spark, t, Seq(5L).toDF("k"), Seq("k"))
    t = Writer.append(spark, t,
      spark.range(50, 100).toDF("k").withColumn("p", org.apache.spark.sql.functions.lit(1)))
    t = Writer.equalityDelete(spark, t, Seq(55L).toDF("k"), Seq("k"))
    assert(eqDeletePaths(t).size === 3)

    // verify the planner's attachment matches the intent
    val attach = t.newScan.planFiles().flatMap(ft =>
      ft.eqDeletes.map(e => e._1.path -> ft.file.partition.head)).distinct
    val attachedParts = attach.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(attachedParts.values.toSet === Set(Set(0), Set(0, 1)),
      s"D1 reaches only p=0, D2 reaches both: $attachedParts")

    // compact ONLY partition 0
    val res = Maintenance.rewriteDataFiles(spark, t, rewriteAll = true,
      filter = Expr.eq("p", 0))
    val remaining = eqDeletePaths(res.table)
    // dead one + the p=0-confined D1 collected; D2 (attached to the
    // untouched p=1 file as well) SURVIVES
    assert(res.removedDeleteFiles === 2, s"collected 2, kept ${remaining.size}")
    assert(remaining.size === 1)
    assert(attachedParts(remaining.head) === Set(0, 1),
      "the survivor is the delete still applicable to the untouched partition")
    // and it still applies on read: k=55 stays deleted, k=5 stays deleted
    // (folded into the rewritten p=0 files)
    val ks = graft.table.SparkRead.read(spark, res.table.newScan)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(5L) && !ks.contains(55L) && ks.size === 98)
    // only p=0 was rewritten
    val partsRewritten = res.table.newScan.planFiles()
      .filter(ft => ft.file.partition.head == 1).map(_.file.path).toSet
    val before = t.newScan.planFiles()
      .filter(ft => ft.file.partition.head == 1).map(_.file.path).toSet
    assert(partsRewritten === before, "p=1 files untouched")
  }

  // reference `table/dv_rewrite_test.go`
  // TestRewriteDataFilesPreservesSiblingDeletionVector: a partial rewrite
  // folds the in-scope files' DVs and drops them, but a DV attached to an
  // out-of-scope sibling file must survive the commit and keep applying.
  test("partial-scope compaction preserves sibling deletion vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val schema = schemaOf("k" -> "bigint", "p" -> "int")
    val pspec = PartitionSpec.builder(schema).add("p", graft.core.Transforms.Identity).build()
    var t = catalog.createTable("dd_dv", schema, pspec)
    t = graft.table.Evolve.upgradeFormatVersion(t, 3)
    t = Writer.append(spark, t, spark.range(50).toDF("k").withColumn("p", lit(0)))
    t = Writer.append(spark, t, spark.range(50, 100).toDF("k").withColumn("p", lit(1)))
    // one DV per partition's file
    t = Writer.deleteWhereDV(spark, t, Expr.eq("k", 5L))
    t = Writer.deleteWhereDV(spark, t, Expr.eq("k", 55L))
    def dvs(x: graft.table.Table): Map[String, Set[String]] =
      x.newScan.planFiles()
        .flatMap(ft => ft.posDeletes.filter(_.format == "PUFFIN")
          .map(d => d.path -> ft.file.partition.head.toString))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(dvs(t).nonEmpty && dvs(t).values.flatten.toSet === Set("0", "1"))
    val p1Dvs = dvs(t).collect { case (p, parts) if parts == Set("1") => p }.toSet
    assert(p1Dvs.nonEmpty, "a DV attached to the p=1 sibling exists")

    val res = Maintenance.rewriteDataFiles(spark, t, rewriteAll = true,
      filter = Expr.eq("p", 0))
    val after = dvs(res.table)
    assert(after.keySet === p1Dvs, s"only the sibling DV survives: $after")
    // both deletes still hold: p=0's was folded into the rewrite, p=1's
    // still applies through its surviving DV
    val ks = graft.table.SparkRead.read(spark, res.table.newScan)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(5L) && !ks.contains(55L) && ks.size === 98)
  }

  // partial progress (iceberg partial-progress.max-commits): the rewrite
  // splits into independent commits along bin-pack group boundaries, so
  // each commit's conflict window covers one batch, not the whole rewrite.
  // Semantics pinned: one snapshot per batch, contents and v3 row ids
  // unchanged, and a delete file shared across batches drops only with the
  // LAST batch that completes its attachment set.
  test("partial progress: maxCommits splits the rewrite into independent commits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val schema = schemaOf("k" -> "bigint", "p" -> "int")
    val pspec = PartitionSpec.builder(schema)
      .add("p", graft.core.Transforms.Identity).build()
    var t = catalog.createTable("dd_pp", schema, pspec)
    t = graft.table.Evolve.upgradeFormatVersion(t, 3)
    // 4 partitions × 2 files (two appends)
    (0 until 2).foreach { r =>
      t = Writer.append(spark, t, spark.range(r * 100L, r * 100L + 100L).toDF("k")
        .withColumn("p", (col("k") % 4).cast("int")))
    }
    // a global eq-delete whose bounds overlap EVERY data file: its
    // attachment set spans all batches, so it must survive until the last
    t = Writer.equalityDelete(spark, t, Seq(3L, 107L).toDF("k"), Seq("k"))
    assert(t.newScan.planFiles().forall(_.eqDeletes.nonEmpty),
      "precondition: the eq-delete attaches to every file")
    def contents(tt: graft.table.Table) =
      graft.table.SparkRead.read(spark, tt.newScan)
        .select(col("k"), col("p")).as[(Long, Int)].collect().sortBy(_._1).toSeq
    def ids(tt: graft.table.Table) =
      graft.table.SparkRead.read(spark, tt.newScan.withRowLineage)
        .selectExpr("k", "_row_id").as[(Long, Long)].collect().toMap
    val before = contents(t)
    val beforeIds = ids(t)
    val snapsBefore = t.metadata.snapshots.size
    val res = Maintenance.rewriteDataFiles(spark, t, rewriteAll = true,
      maxCommits = 3)
    val t2 = res.table
    // 4 bin-pack groups into 3 batches → exactly 3 replace commits
    assert(t2.metadata.snapshots.size === snapsBefore + 3,
      s"expected 3 partial commits, got ${t2.metadata.snapshots.size - snapsBefore}")
    assert(t2.metadata.snapshots.takeRight(3)
      .forall(_.summary.get("operation").contains("replace")))
    // contents and v3 lineage byte-identical to the single-commit semantics
    assert(contents(t2) === before)
    assert(ids(t2) === beforeIds, "row ids must survive every batch")
    // the cross-batch delete dropped with the last covering batch; nothing
    // dangles and nothing re-applies
    assert(eqDeletePaths(t2).isEmpty, "shared eq-delete collected at the end")
    assert(t2.newScan.planFiles().forall(ft =>
      ft.eqDeletes.isEmpty && ft.posDeletes.isEmpty))
    assert(res.rewrittenDataFiles === 8)
    // EVERY intermediate partial state is a correct table: rewritten files
    // out-sequence the surviving eq-delete (no re-application), untouched
    // files still apply it (no resurrection)
    t2.metadata.snapshots.takeRight(3).foreach { s =>
      val mid = graft.table.SparkRead.read(spark,
          t2.newScan.useSnapshot(s.snapshotId))
        .select(col("k"), col("p")).as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(mid === before, s"partial state ${s.snapshotId} diverged")
    }
  }
}
