package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.io.FileIO
import graft.table.{Evolve, SparkRead, Writer}

/** Metadata-log retention: every commit appends the previous metadata
  * file trimmed to `write.metadata.previous-versions-max`, and
  * `write.metadata.delete-after-commit.enabled` deletes the trimmed-off
  * files (unless gc is disabled) — reference `table/metadata.go:1031-1037`,
  * `table/properties.go:82-86`.
  */
class MetadataLogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = Files.createTempDirectory("graft-mlog").toString
  private lazy val catalog = new HadoopCatalog(wh)

  override def afterAll(): Unit = spark.stop()

  private def nation = spark.read.parquet(s"$sf/nation.parquet")

  // reference TestSnapshotAsOfWithOutOfOrderSnapshotLog + equal-timestamps
  // variant: commit clock skew can leave the snapshot log out of
  // chronological order; as-of resolution must take the greatest eligible
  // TIMESTAMP (first entry winning ties), not the last list position
  test("snapshotAsOf handles out-of-order and equal-timestamp log entries") {
    import graft.format.{Snapshot, SnapshotLogEntry, TableMetadata}
    def snap(id: Long, ts: Long) = Snapshot(id, None, id, ts, s"/ml$id.avro",
      Map("operation" -> "append"), schemaId = Some(0))
    val schema = IcebergSchema(Seq(NestedField(1, "k", IcebergTypes.LongT, required = false)))
    val base = TableMetadata.empty("/tmp/asof", schema, PartitionSpec.Unpartitioned)
    val meta = base.copy(
      snapshots = Seq(snap(1, 1000L), snap(2, 3000L), snap(3, 2000L)),
      // out of chronological order: ts 3000 sits before ts 2000
      snapshotLog = Seq(SnapshotLogEntry(1, 1000L), SnapshotLogEntry(2, 3000L),
        SnapshotLogEntry(3, 2000L)))
    assert(meta.snapshotAsOf(2500L).map(_.snapshotId) === Some(3L))
    assert(meta.snapshotAsOf(5000L).map(_.snapshotId) === Some(2L),
      "greatest eligible timestamp wins, not last log position")
    assert(meta.snapshotAsOf(999L).isEmpty)
    // equal timestamps: the FIRST log entry wins
    val tied = base.copy(
      snapshots = Seq(snap(7, 1000L), snap(8, 1000L)),
      snapshotLog = Seq(SnapshotLogEntry(7, 1000L), SnapshotLogEntry(8, 1000L)))
    assert(tied.snapshotAsOf(1000L).map(_.snapshotId) === Some(7L))
  }

  test("metadata log trims to previous-versions-max and deletes trimmed files") {
    val schema = SchemaBridge.fromSpark(nation.schema)
    var t = catalog.createTable("mlog_trim", schema, PartitionSpec.Unpartitioned,
      properties = Map(
        "write.metadata.previous-versions-max" -> "2",
        "write.metadata.delete-after-commit.enabled" -> "true"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 5).foreach { i =>
      seen += t.metadataPath
      t = Writer.append(spark, t, nation.filter(col("n_nationkey") % 5 === i))
    }
    assert(t.metadata.metadataLog.size === 2)
    // the log keeps the two NEWEST previous versions
    assert(t.metadata.metadataLog.map(_.metadataFile) === seen.takeRight(2).toSeq)
    // trimmed-off versions are gone from disk, kept ones remain
    seen.dropRight(2).foreach(p => assert(!FileIO.exists(p), s"expected deleted: $p"))
    seen.takeRight(2).foreach(p => assert(FileIO.exists(p), s"expected kept: $p"))
    // the table itself is intact
    assert(SparkRead.read(spark, t.newScan).count() === 25)
  }

  test("default keeps history; gc.enabled=false blocks the delete") {
    val schema = SchemaBridge.fromSpark(nation.schema)
    var t = catalog.createTable("mlog_keep", schema, PartitionSpec.Unpartitioned)
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 3).foreach { i =>
      paths += t.metadataPath
      t = Writer.append(spark, t, nation.filter(col("n_nationkey") % 3 === i))
    }
    // default max is 100 — nothing trimmed, nothing deleted
    assert(t.metadata.metadataLog.size === 3)
    paths.foreach(p => assert(FileIO.exists(p)))

    var g = catalog.createTable("mlog_gc", schema, PartitionSpec.Unpartitioned,
      properties = Map(
        "write.metadata.previous-versions-max" -> "1",
        "write.metadata.delete-after-commit.enabled" -> "true",
        "gc.enabled" -> "false"))
    val gPaths = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 3).foreach { i =>
      gPaths += g.metadataPath
      g = Writer.append(spark, g, nation.filter(col("n_nationkey") % 3 === i))
    }
    // log still trims (bounded metadata.json) but files survive on disk
    assert(g.metadata.metadataLog.size === 1)
    gPaths.foreach(p => assert(FileIO.exists(p), s"gc-disabled must keep $p"))
  }

  test("metadata-only commits (Evolve) also append to the log") {
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("mlog_evolve", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation)
    val before = t1.metadata.metadataLog.size
    val t2 = Evolve.setProperties(t1, Map("k" -> "v"))
    assert(t2.metadata.metadataLog.size === before + 1)
    assert(t2.metadata.metadataLog.last.metadataFile === t1.metadataPath)
  }
}
