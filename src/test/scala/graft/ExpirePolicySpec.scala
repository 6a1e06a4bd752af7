package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.table.{Evolve, Maintenance, Writer}

/** Retention-policy snapshot expiry: ref max-ref-age-ms, branch
  * min-snapshots-to-keep, and the history.expire.* table defaults.
  */
class ExpirePolicySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ref aging and branch ancestry retention") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-exp").toString)
    val df = Seq((1L, "a")).toDF("id", "v")
    val schema = SchemaBridge.fromSpark(df.schema)
    var t = cat.createTable("exp", schema, PartitionSpec.Unpartitioned,
      properties = Map("history.expire.max-snapshot-age-ms" -> "5000"))
    t = Writer.append(spark, t, df) // s1
    val s1 = t.metadata.currentSnapshotId.get
    t = Writer.append(spark, t, df) // s2
    t = Writer.append(spark, t, df) // s3
    val s3 = t.metadata.currentSnapshotId.get
    t = Writer.append(spark, t, df) // s4
    val s4 = t.metadata.currentSnapshotId.get
    // a tag that ages out in 1ms, and a branch protecting 2 ancestors
    t = Evolve.setRef(t, "old-tag", s1, "tag", maxRefAgeMs = Some(1L))
    t = Evolve.setRef(t, "dev", s3, "branch", minSnapshotsToKeep = Some(2))

    val res = Maintenance.expireSnapshotsByPolicy(t,
      nowMs = System.currentTimeMillis() + 60000)
    val meta = res.table.metadata
    // aged tag is gone; dev + main survive
    assert(!meta.refs.contains("old-tag"))
    assert(meta.refs.contains("dev") && meta.refs.contains("main"))
    // dev protects s3 + its parent s2; main protects s4; s1 expires
    assert(res.expiredSnapshots === Seq(s1))
    assert(meta.snapshots.map(_.snapshotId).toSet === Set(s3, s4,
      meta.snapshotById(s3).get.parentSnapshotId.get))
    // s1's manifest list is gone from storage, data files stay (still
    // referenced by the surviving snapshots' cumulative manifests)
    assert(res.deletedFiles.exists(_.contains("snap-")))
    // tags only accept ref-age retention
    intercept[IllegalArgumentException] {
      Evolve.setRef(res.table, "t2", s4, "tag", minSnapshotsToKeep = Some(1))
    }
    // idempotent second run: nothing left to expire
    val res2 = Maintenance.expireSnapshotsByPolicy(res.table,
      nowMs = System.currentTimeMillis() + 60000)
    assert(res2.expiredSnapshots.isEmpty)
  }
}
