package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.table.{Evolve, Inspect, SparkRead, Writer}

/** Branch-targeted commits + fast-forward publish (the WAP workflow):
  * parentage, ref isolation, retention preservation, and the
  * diverged/rewind guards the publish step depends on.
  */
class BranchWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val catalog = new HadoopCatalog(Files.createTempDirectory("graft-br").toString)

  override def afterAll(): Unit = spark.stop()

  private def freshNation(name: String) = {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    (Writer.append(spark, catalog.createTable(name, schema, PartitionSpec.Unpartitioned),
      nation.filter(col("n_nationkey") < 10)), nation)
  }

  test("branch append: parent is the branch head, main pointer frozen") {
    val (t1, nation) = freshNation("br_parent")
    val mainHead = t1.metadata.currentSnapshotId.get
    val t2 = Evolve.setRef(t1, "audit", mainHead, "branch")
    val t3 = Writer.append(spark, t2, nation.filter(col("n_nationkey") >= 10),
      toBranch = Some("audit"))
    val auditHead = t3.metadata.refs("audit").snapshotId
    assert(auditHead !== mainHead)
    assert(t3.metadata.snapshotById(auditHead).get.parentSnapshotId === Some(mainHead))
    assert(t3.metadata.currentSnapshotId === Some(mainHead))
    // reads: main = staged-free, audit = everything
    assert(SparkRead.read(spark, t3.newScan).count() === 10)
    assert(SparkRead.read(spark, t3.newScan.useRef("audit")).count() === 25)
  }

  test("append to a nonexistent branch creates it from current state") {
    val (t1, nation) = freshNation("br_create")
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 10),
      toBranch = Some("wip"))
    assert(t2.metadata.refs.contains("wip"))
    assert(t2.metadata.snapshotById(t2.metadata.refs("wip").snapshotId).get.parentSnapshotId ===
      t1.metadata.currentSnapshotId)
    assert(SparkRead.read(spark, t2.newScan.useRef("wip")).count() === 25)
    assert(SparkRead.read(spark, t2.newScan).count() === 10)
  }

  test("branch commits preserve ref retention settings") {
    val (t1, nation) = freshNation("br_retain")
    val t2 = Evolve.setRef(t1, "audit", t1.metadata.currentSnapshotId.get, "branch",
      minSnapshotsToKeep = Some(3), maxSnapshotAgeMs = Some(12345L))
    val t3 = Writer.append(spark, t2, nation.filter(col("n_nationkey") >= 10),
      toBranch = Some("audit"))
    val r = t3.metadata.refs("audit")
    assert(r.minSnapshotsToKeep === Some(3))
    assert(r.maxSnapshotAgeMs === Some(12345L))
  }

  test("fastForward publishes: main jumps to the branch head atomically") {
    val (t1, nation) = freshNation("br_publish")
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 10),
      toBranch = Some("audit"))
    val t3 = Evolve.fastForward(t2, "main", "audit")
    assert(t3.metadata.currentSnapshotId === Some(t3.metadata.refs("audit").snapshotId))
    assert(SparkRead.read(spark, t3.newScan).count() === 25)
    // history records the publish
    assert(t3.metadata.snapshotLog.last.snapshotId === t3.metadata.currentSnapshotId.get)
  }

  test("fastForward creates a missing target ref at the source head") {
    val (t1, _) = freshNation("br_fftag")
    val t2 = Evolve.fastForward(t1, "release", "main")
    assert(t2.metadata.refs("release").snapshotId === t1.metadata.currentSnapshotId.get)
  }

  test("diverged or rewinding fast-forward is a loud error") {
    val (t1, nation) = freshNation("br_diverge")
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") === 10),
      toBranch = Some("audit"))
    // main moves independently -> audit and main diverge
    val t3 = Writer.append(spark, t2, nation.filter(col("n_nationkey") === 11))
    val e1 = intercept[IllegalArgumentException](Evolve.fastForward(t3, "main", "audit"))
    assert(e1.getMessage.contains("diverged"))
    // rewind: target strictly ahead of source on the same line
    val head = t3.metadata.currentSnapshotId.get
    val parent = t3.metadata.snapshotById(head).get.parentSnapshotId.get
    val t4 = Evolve.setRef(t3, "old", parent, "branch")
    val e2 = intercept[IllegalArgumentException](Evolve.fastForward(t4, "main", "old"))
    assert(e2.getMessage.contains("diverged"))
    // missing source is its own loud error
    val e3 = intercept[IllegalArgumentException](Evolve.fastForward(t4, "main", "nope"))
    assert(e3.getMessage.contains("does not exist"))
  }

  test("branch snapshots stay off the main incremental line") {
    val (t1, nation) = freshNation("br_ancestry")
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 10),
      toBranch = Some("audit"))
    val mainLine = Inspect.ancestorsOfCurrent(t2).map(_.snapshotId)
    assert(!mainLine.contains(t2.metadata.refs("audit").snapshotId))
  }

  // reference cmd/iceberg/branch_tag.go validateRefName +
  // TestRunBranchCreateRejects{NegativeRetentionValues,InvalidRefName} /
  // AllowsSlashStyleRefName; Java rejects removing the main branch
  test("ref names and retention values validate; main branch is unremovable") {
    val (t1, _) = freshNation("br_validate")
    val head = t1.metadata.currentSnapshotId.get
    intercept[IllegalArgumentException](Evolve.setRef(t1, "", head, "branch"))
    intercept[IllegalArgumentException](Evolve.setRef(t1, " padded ", head, "branch"))
    intercept[IllegalArgumentException](Evolve.setRef(t1, "..", head, "tag"))
    intercept[IllegalArgumentException](Evolve.setRef(t1, "badname", head, "branch"))
    intercept[IllegalArgumentException](
      Evolve.setRef(t1, "b", head, "branch", minSnapshotsToKeep = Some(-1)))
    intercept[IllegalArgumentException](
      Evolve.setRef(t1, "b", head, "branch", maxSnapshotAgeMs = Some(-5L)))
    intercept[IllegalArgumentException](
      Evolve.setRef(t1, "t", head, "tag", maxRefAgeMs = Some(0L)))
    // slash-style names are legal (release/2024 convention)
    val t2 = Evolve.setRef(t1, "release/2026.08", head, "branch")
    assert(t2.metadata.refs.contains("release/2026.08"))
    val e = intercept[IllegalArgumentException](Evolve.removeRef(t2, "main"))
    assert(e.getMessage.contains("main"))
    assert(Evolve.removeRef(t2, "release/2026.08").metadata.refs
      .get("release/2026.08").isEmpty)
  }
}
