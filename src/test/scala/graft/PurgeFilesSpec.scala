package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core.SchemaBridge
import graft.format.PartitionSpec
import graft.table.{Maintenance, Writer}

/** Drop-with-purge (reference `PurgeFiles`, `orphan_cleanup.go:957-1057`):
  * deletes the location walk UNIONED with referenced files — imported data
  * outside the location root must go too — while `gc.enabled=false`
  * protects data files and removes only metadata.
  */
class PurgeFilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def exists(p: String) =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  test("purge deletes location walk plus imported files outside the root") {
    val wh = java.nio.file.Files.createTempDirectory("purge").toString
    val foreign = java.nio.file.Files.createTempDirectory("purge-foreign").toString
    val cat = new HadoopCatalog(wh)
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "seg")
    // a foreign parquet file imported by reference (lives OUTSIDE wh)
    df.coalesce(1).write.parquet(s"$foreign/p")
    val foreignFile = new java.io.File(s"$foreign/p").listFiles()
      .map(_.getAbsolutePath).filter(_.endsWith(".parquet")).head
    val t0 = Writer.append(spark,
      cat.createTable("t", SchemaBridge.fromSpark(df.schema),
        PartitionSpec.Unpartitioned), df)
    val t = Writer.addFiles(spark, t0, Seq(foreignFile))
    assert(exists(foreignFile))

    val purged = Maintenance.purgeFiles(t)
    assert(purged.exists(_.endsWith(".parquet")))
    assert(!exists(foreignFile)) // referenced outside the root: still purged
    assert(graft.io.FileIO.listFilesRecursive(s"$wh/t").isEmpty)
  }

  test("gc.enabled=false purges metadata only, data files survive") {
    val wh = java.nio.file.Files.createTempDirectory("purge-nogc").toString
    val cat = new HadoopCatalog(wh)
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "seg")
    val t = Writer.append(spark,
      cat.createTable("t", SchemaBridge.fromSpark(df.schema),
        PartitionSpec.Unpartitioned, properties = Map("gc.enabled" -> "false")), df)
    val dataFiles = t.newScan.planFiles().map(_.file.path)
    assert(dataFiles.nonEmpty)

    val purged = Maintenance.purgeFiles(t)
    assert(!purged.exists(p => dataFiles.contains(p)))
    dataFiles.foreach(p => assert(exists(p))) // protected
    assert(!exists(t.metadataPath)) // metadata gone
  }
}
