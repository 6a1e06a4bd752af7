package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.table.Writer

/** Rolling target-file-size: a small write.target-file-size-bytes must
  * split a large append into multiple bounded files instead of one fat
  * task emitting one fat file.
  */
class RollingWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("target-file-size bounds written file sizes") {
    val catalog = new HadoopCatalog(Files.createTempDirectory("graft-roll").toString)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").coalesce(1)
    val schema = SchemaBridge.fromSpark(li.schema)
    val target = 64L * 1024
    val t0 = catalog.createTable("roll", schema, PartitionSpec.Unpartitioned,
      properties = Map("write.target-file-size-bytes" -> target.toString))
    val t1 = Writer.append(spark, t0, li)
    val files = t1.newScan.planFiles().map(_.file)
    // one coalesced input split into many files despite a single write task
    assert(files.size > 3, s"expected a rolled write, got ${files.size} file(s)")
    // row-width estimate errs toward under-target; allow 4x slack for
    // parquet metadata + encoding variance, catch the order-of-magnitude
    assert(files.forall(_.fileSize < target * 4),
      s"oversized file: ${files.map(_.fileSize).max}")
  }
}
