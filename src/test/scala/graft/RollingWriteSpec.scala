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

  test("calibrated rolling lands files within 10% of target on skewed widths") {
    import spark.implicits._
    val catalog = new HadoopCatalog(Files.createTempDirectory("graft-rollb").toString)
    // skewed row widths: 10B .. ~1KB payloads, high-entropy so the encoded
    // width tracks the logical width (dictionary can't collapse them),
    // interleaved so any row range mixes widths
    val rnd = new scala.util.Random(11)
    def payload(i: Int): String = {
      val len = if (i % 10 == 0) 1000 else 10 + (i % 7) * 40
      val sb = new StringBuilder(len)
      (0 until len).foreach(_ => sb.append((33 + rnd.nextInt(94)).toChar))
      sb.toString
    }
    val df = (0 until 60000).map(i => (i.toLong, payload(i))).toDF("id", "body")
      .coalesce(1)
    val schema = SchemaBridge.fromSpark(df.schema)
    val target = 512L * 1024
    val t0 = catalog.createTable("rollb", schema, PartitionSpec.Unpartitioned,
      properties = Map("write.target-file-size-bytes" -> target.toString))
    // first append calibrates (schema-estimate sizing, under target)
    val t1 = Writer.append(spark, t0, df)
    // second append rolls on the OBSERVED encoded bytes/row
    val t2 = Writer.append(spark, t1, df)
    val snap = t2.metadata.currentSnapshot.get
    val secondAppend = graft.format.Manifests.readManifestList(snap.manifestList)
      .filter(_.addedSnapshotId == snap.snapshotId)
      .flatMap(m => graft.format.Manifests.readManifest(m.path)._1)
      .filter(e => e.snapshotId.contains(snap.snapshotId))
      .map(_.file)
    assert(secondAppend.size >= 3, s"expected rolled files, got ${secondAppend.size}")
    // every full file (all but the last remainder) within +/-10% of target
    val full = secondAppend.sortBy(-_.fileSize).dropRight(1)
    full.foreach { f =>
      val ratio = f.fileSize.toDouble / target
      assert(ratio > 0.9 && ratio < 1.1,
        s"file ${f.path} is ${f.fileSize}B = ${ratio}x of target")
    }
  }

  test("DSv2 CoW rewrite rolls on the calibrated width for wide-string rows") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-rollc").toString
    val catalog = new HadoopCatalog(wh)
    val rnd = new scala.util.Random(13)
    def payload(i: Int): String = {
      val len = if (i % 10 == 0) 1000 else 10 + (i % 7) * 40
      val sb = new StringBuilder(len)
      (0 until len).foreach(_ => sb.append((33 + rnd.nextInt(94)).toChar))
      sb.toString
    }
    val df = (0 until 60000).map(i => (i.toLong, payload(i))).toDF("id", "body")
      .coalesce(1)
    val schema = SchemaBridge.fromSpark(df.schema)
    val target = 512L * 1024
    val t0 = catalog.createTable("rollc", schema, PartitionSpec.Unpartitioned,
      properties = Map("write.target-file-size-bytes" -> target.toString))
    // the FIRST append sizes off the schema estimate (28 B/row vs ~220 B
    // encoded) and lands fat ~8x-over files — and records the observed
    // width. The SQL UPDATE (CoW rewrite through the DSv2 fanout writers)
    // must roll those fat tasks at the CALIBRATED count, not repeat the
    // schema-estimate overshoot.
    Writer.append(spark, t0, df)
    val ctl = "groll_cal"
    spark.conf.set(s"spark.sql.catalog.$ctl",
      classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$ctl.uri", wh)
    spark.sql(s"UPDATE $ctl.rollc SET id = id + 1")
    val files = catalog.loadTable("rollc").newScan.planFiles().map(_.file)
    assert(files.size >= 3, s"expected rolled rewrite files, got ${files.size}")
    // every full file (drop the per-task remainders) within 2x of target
    val full = files.map(_.fileSize).sorted.reverse.dropRight(files.size / 2)
    full.foreach { sz =>
      val ratio = sz.toDouble / target
      assert(ratio > 0.4 && ratio < 2.0,
        s"rewritten file is ${sz}B = ${ratio}x of target — calibration not applied")
    }
  }
}
