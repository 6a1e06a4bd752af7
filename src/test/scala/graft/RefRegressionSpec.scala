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
}
