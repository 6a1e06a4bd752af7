package graft

import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core.{Expr, SchemaBridge}
import graft.format.PartitionSpec
import graft.sources.PosDeleteCache
import graft.table.Writer

/** The pos-delete parse cache: a positional-delete parquet referenced by K
  * data files must parse ONCE per executor (into the per-referenced-file
  * position map), not K times — the same one-read guarantee the DV and
  * eq-key caches already carry.
  */
class PosDeleteCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("shared pos-delete parquet parses once per executor, not once per data file") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = s"/root/repo/target/graft-wh/pdc_${UUID.randomUUID().toString.take(8)}"
    val cat = new HadoopCatalog(wh)
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    val schema = SchemaBridge.fromSpark(df.schema)
    val t1 = Writer.append(spark,
      cat.createTable("t", schema, PartitionSpec.Unpartitioned), df.repartition(4))
    // one shuffle partition → ONE delete parquet referencing all 4 data files
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val t2 = try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      Writer.deleteWhereMoR(spark, t1, Expr.lt("id", 100L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)

    val tasks = t2.newScan.planFiles()
    val delPaths = tasks.flatMap(_.posDeletes.filter(_.format != "PUFFIN").map(_.path)).distinct
    assert(delPaths.length === 1, "fixture must share ONE delete parquet")
    val referencing = tasks.count(_.posDeletes.exists(_.format != "PUFFIN"))
    assert(referencing === 4, "all 4 data files must reference the delete file")

    val ctl = s"gpdc_${UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$ctl",
      classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$ctl.uri", wh)
    PosDeleteCache.clear()
    val rows = spark.table(s"$ctl.t").filter(col("id") >= 0).collect()
    assert(rows.length === 900)
    assert(PosDeleteCache.loads.get() === 1L,
      s"delete parquet parsed ${PosDeleteCache.loads.get()} times for 4 referencing data files")
  }

  // reference TestReadDeletesRejectsNullPos / RejectsMissingFilePath: a
  // null file_path or pos row in a delete parquet is corruption; skipping
  // it would RESURRECT the row it should delete — both read routes must
  // fail closed instead
  test("corrupt pos-delete rows (null pos) fail the read, never no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = s"/root/repo/target/graft-wh/pdn_${UUID.randomUUID().toString.take(8)}"
    val cat = new HadoopCatalog(wh)
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val schema = SchemaBridge.fromSpark(df.schema)
    val t1 = Writer.append(spark,
      cat.createTable("t", schema, PartitionSpec.Unpartitioned), df.coalesce(1))
    val dataPath = t1.newScan.planFiles().head.file.path

    // hand-craft a delete parquet with a NULL pos row
    val delDir = s"$wh/corrupt-del"
    Seq((dataPath, Some(3L)), (dataPath, None))
      .toDF("file_path", "pos")
      .coalesce(1).write.parquet(delDir)
    val delFile = graft.io.FileIO.listFilesRecursive(delDir)
      .map(_.path).filter(_.endsWith(".parquet")).head
    val del = graft.format.DataFile(graft.format.DataFileContent.PositionDeletes,
      delFile, "PARQUET", Nil, 2L, graft.io.FileIO.size(delFile))
    val t2 = Writer.commitSnapshot(t1, "overwrite", addedFiles = Nil,
      removedPaths = Set.empty, addedDeleteFiles = Seq(del))

    // V1 route (anti-join)
    val e1 = intercept[Exception](
      graft.table.SparkRead.read(spark, t2.newScan).count())
    assert(e1.toString.contains("corrupt positional delete") ||
      Option(e1.getCause).exists(_.toString.contains("corrupt positional delete")),
      s"unexpected: $e1")

    // DSv2 executor route (PosDeleteCache parse)
    val ctl = s"gpdn_${UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$ctl",
      classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$ctl.uri", wh)
    PosDeleteCache.clear()
    val e2 = intercept[Exception](
      spark.table(s"$ctl.t").filter(col("id") >= 0).collect())
    assert(e2.toString.contains("corrupt positional delete") ||
      Option(e2.getCause).exists(_.toString.contains("corrupt positional delete")),
      s"unexpected: $e2")
  }
}
