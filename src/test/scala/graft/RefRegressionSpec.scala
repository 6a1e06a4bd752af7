package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.{ManifestContent, Manifests, PartitionSpec}
import graft.table.{SparkRead, Writer}

/** Mirrors of reference regression tests whose scenarios weren't yet pinned
  * by name — each one encodes a REAL bug the reference shipped and fixed,
  * so the scenario (not the Go mechanics) is what must stay green here:
  *
  *  - `table/addfiles_merge_regression_test.go`: AddFiles() bypassed the
  *    merge-append producer, ignoring `commit.manifest-merge.enabled`.
  *    Structurally impossible here (one commit path), pinned anyway.
  *  - `table/empty_scan_task_regression_test.go`: a task whose row groups
  *    are ALL statistics-pruned stalled the sequenced reader and silently
  *    dropped every later task's rows.
  *  - `table/variant_shredded_posdelete_test.go`: positional deletes run
  *    before variant reassembly; survivors must reassemble correct values.
  */
class RefRegressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Write df as exactly one foreign parquet file; return its path. */
  private def oneParquet(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.parquet(dir)
    new java.io.File(dir).listFiles()
      .map(_.getAbsolutePath).filter(_.endsWith(".parquet")).head
  }

  private def dataManifestCount(t: graft.table.Table): Int =
    Manifests.readManifestList(t.metadata.currentSnapshot.get.manifestList)
      .count(_.content == ManifestContent.Data)

  test("addFiles respects commit.manifest-merge.enabled (merge regression)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-afm").toString
    val foreign = Files.createTempDirectory("graft-afm-src").toString
    val cat = new HadoopCatalog(wh)
    val df = Seq((1L, "a")).toDF("id", "seg")
    val schema = SchemaBridge.fromSpark(df.schema)

    // merge on, minCountToMerge=2: the 2nd/3rd commits must bin-pack the
    // accumulated small manifests down to one
    var t = cat.createTable("afm_on", schema, PartitionSpec.Unpartitioned,
      properties = Map(
        "commit.manifest-merge.enabled" -> "true",
        "commit.manifest.min-count-to-merge" -> "2"))
    (0 until 3).foreach { i =>
      t = Writer.addFiles(spark, t,
        Seq(oneParquet(s"$foreign/on$i", Seq((i.toLong, s"v$i")).toDF("id", "seg"))))
    }
    assert(dataManifestCount(t) === 1,
      "addFiles must route through the merge-append producer")
    assert(SparkRead.read(spark, t.newScan).count() === 3)

    // control: merge disabled → one manifest per commit survives
    var c = cat.createTable("afm_off", schema, PartitionSpec.Unpartitioned,
      properties = Map("commit.manifest-merge.enabled" -> "false"))
    (0 until 3).foreach { i =>
      c = Writer.addFiles(spark, c,
        Seq(oneParquet(s"$foreign/off$i", Seq((i.toLong, s"v$i")).toDF("id", "seg"))))
    }
    assert(dataManifestCount(c) === 3)
  }

  test("scan survives a file whose row groups are all stats-pruned") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-esk").toString
    val cat = new HadoopCatalog(wh)
    val low = (0L until 100L).map(i => (i, s"low$i")).toDF("id", "seg")
    val high = (1000L until 1100L).map(i => (i, s"high$i")).toDF("id", "seg")
    // metrics mode none = the AddDataFiles shape that triggered the
    // reference bug: no manifest bounds, so file-level pruning keeps the
    // file and only parquet row-group statistics can drop its rows
    var t = cat.createTable("esk", SchemaBridge.fromSpark(low.schema),
      PartitionSpec.Unpartitioned,
      properties = Map("write.metadata.metrics.default" -> "none"))
    t = Writer.append(spark, t, low.coalesce(1))
    t = Writer.append(spark, t, high.coalesce(1))

    val scan = t.newScan.withFilter(Expr.gtEq("id", 1000L))
    // both files survive planning (no bounds to prune on)…
    assert(scan.planFiles().size === 2)
    // …and the fully-pruned first file must not swallow the second's rows
    val rows = SparkRead.read(spark, scan)
    assert(rows.count() === 100)
    assert(rows.agg(min(col("id"))).first().getLong(0) === 1000L)
  }

  test("shredded variant survives positional deletes (MoR and DV)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-vpd").toString
    val cat = new HadoopCatalog(wh)
    val df = (0 until 200).map { i =>
      (i.toLong, s"""{"k":$i,"city":"NYC"}""")
    }.toDF("id", "j").select(col("id"), parse_json(col("j")).as("props"))
    val schema = SchemaBridge.fromSpark(df.schema)

    def survivors(t: graft.table.Table): Seq[(Long, Long)] =
      SparkRead.read(spark, t.newScan)
        .select(col("id"),
          variant_get(col("props"), "$.k", "long").as("k"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq

    // v2 route: parquet positional deletes applied before reassembly
    val mor = Writer.deleteWhereMoR(spark,
      Writer.append(spark, cat.createTable("vpd_mor", schema,
        PartitionSpec.Unpartitioned,
        properties = Map("write.variant.shredding.enabled" -> "true")), df),
      Expr.lt("id", 50L))
    val mrows = survivors(mor)
    assert(mrows.size === 150)
    assert(mrows.forall { case (id, k) => id >= 50L && k === id })

    // v3 route: puffin deletion vector applied before reassembly
    val dv = Writer.deleteWhereDV(spark,
      Writer.append(spark, cat.createTable("vpd_dv", schema,
        PartitionSpec.Unpartitioned,
        properties = Map(
          "format-version" -> "3",
          "write.variant.shredding.enabled" -> "true")), df),
      Expr.gtEq("id", 150L))
    val drows = survivors(dv)
    assert(drows.size === 150)
    assert(drows.forall { case (id, k) => id < 150L && k === id })
  }

  // `table/refresh_uuid_test.go`: a DIFFERENT table-uuid under the same
  // name is a drop+recreate race. Version numbers and deterministic vN
  // metadata paths COLLIDE across incarnations (recreate + advance reaches
  // the stale writer's expected version), so BOTH seams must refuse on
  // uuid: the refresh the retry loop rebases through, and the catalog CAS
  // itself. The swap is simulated by replacing the current pointer's
  // metadata with a same-shape copy under a new uuid — exactly the
  // observable a stale writer sees after drop+recreate+advance (a real
  // drop also deletes the old manifests, which fails loudly for a
  // different, earlier reason). Missing uuid on either side (legacy v1
  // metadata) disables the check.
  test("refresh and commit refuse a changed table uuid, tolerate missing ones") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-ruid").toString)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val schema = SchemaBridge.fromSpark(df.schema)
    val t0 = Writer.append(spark,
      cat.createTable("ruid", schema, PartitionSpec.Unpartitioned), df)

    // same incarnation: refresh picks up new state fine
    Writer.append(spark, cat.loadTable("ruid"), df.limit(1))
    val refreshed = t0.refresh()
    assert(refreshed.metadata.tableUuid === t0.metadata.tableUuid)
    assert(SparkRead.read(spark, refreshed.newScan).count() === 3)

    // swap the current pointer's metadata for a new-incarnation copy
    val live = cat.loadTable("ruid")
    val swapped = live.metadata.copy(
      tableUuid = java.util.UUID.randomUUID().toString)
    graft.io.FileIO.write(live.metadataPath,
      graft.format.TableMetadata.toJson(swapped).getBytes("UTF-8"))

    // refresh refuses (the retry loop's rebase path)
    val e = intercept[IllegalStateException](t0.refresh())
    assert(e.getMessage.contains("uuid changed"))
    assert(e.getMessage.contains("dropped and recreated"))
    // the CAS refuses directly — the stale writer's expected version
    // MATCHES (no conflict, no refresh), so only the uuid stands between
    // it and clobbering the new incarnation
    val vBefore = cat.currentVersion("ruid")
    val e2 = intercept[IllegalStateException](Writer.append(spark, refreshed, df))
    assert(e2.getMessage.contains("uuid changed"))
    assert(cat.currentVersion("ruid") === vBefore,
      "the refused commit must not advance the pointer")

    // legacy metadata without a uuid: check disabled on either side
    val legacy = new graft.table.Table("ruid",
      refreshed.metadata.copy(tableUuid = ""), refreshed.metadataPath, cat)
    assert(legacy.refresh().metadata.tableUuid === swapped.tableUuid)
  }
}
