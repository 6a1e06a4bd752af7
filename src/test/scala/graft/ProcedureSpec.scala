package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog

/** SQL stored procedures (`CALL g.system.<proc>(...)`) — Spark 4's native
  * DSv2 procedure binding over the maintenance/ref/stats library surface.
  */
class ProcedureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("graft-proc").toString
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.g", classOf[graft.sources.GraftSpjCatalog].getName)
    s.conf.set("spark.sql.catalog.g.uri", wh)
    s
  }
  private lazy val catalog = new HadoopCatalog(wh)

  override def afterAll(): Unit = spark.stop()

  test("rollback_to_snapshot via CALL, positional and named args") {
    spark.sql("CREATE TABLE g.r (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.r VALUES (1,'a')")
    val snap1 = catalog.loadTable("r").metadata.currentSnapshotId.get
    spark.sql("INSERT INTO g.r VALUES (2,'b')")
    assert(spark.sql("SELECT count(*) FROM g.r").head.getLong(0) === 2)

    val out = spark.sql(
      s"CALL g.system.rollback_to_snapshot(table => 'r', snapshot_id => $snap1)")
    assert(out.columns.toSeq === Seq("previous_snapshot_id", "current_snapshot_id"))
    assert(out.head.getLong(1) === snap1)
    assert(spark.sql("SELECT count(*) FROM g.r").head.getLong(0) === 1)
  }

  test("expire_snapshots deletes unreachable files; default args fill") {
    spark.sql("CREATE TABLE g.e (k BIGINT)")
    spark.sql("INSERT INTO g.e VALUES (1)")
    spark.sql("INSERT INTO g.e VALUES (2)")
    spark.sql("INSERT OVERWRITE g.e VALUES (9)")
    val out = spark.sql("CALL g.system.expire_snapshots('e')").head
    assert(out.getInt(0) >= 2, "two superseded snapshots expire")
    assert(out.getInt(1) >= 2, "overwritten data files deleted")
    assert(spark.sql("SELECT k FROM g.e").head.getLong(0) === 9L)
  }

  test("rewrite_data_files bin-packs small files; rewrite_manifests compacts") {
    spark.sql("CREATE TABLE g.c (k BIGINT, v DOUBLE)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO g.c VALUES ($i, $i.0)"))
    assert(catalog.loadTable("c").newScan.planFiles().length === 4)

    val r = spark.sql("CALL g.system.rewrite_data_files('c')").head
    assert(r.getInt(0) === 4, s"4 fragments rewritten, got $r")
    assert(r.getInt(1) === 1)
    assert(catalog.loadTable("c").newScan.planFiles().length === 1)

    val m = spark.sql("CALL g.system.rewrite_manifests('c')").head
    assert(m.getInt(1) === 1 && m.getInt(0) >= m.getInt(1))
    assert(spark.sql("SELECT sum(k) FROM g.c").head.getLong(0) === 10L)
  }

  test("branch/tag lifecycle: create_branch, fast_forward, drop_ref, ancestors_of") {
    spark.sql("CREATE TABLE g.b (k BIGINT)")
    spark.sql("INSERT INTO g.b VALUES (1)")
    spark.sql("CALL g.system.create_branch('b', 'audit')")

    // stage a second snapshot on the branch through the library writer
    val t = catalog.loadTable("b")
    import spark.implicits._
    graft.table.Writer.append(spark, t, Seq(2L).toDF("k"), toBranch = Some("audit"))

    // main is still at snapshot 1; fast-forward publishes the branch head
    assert(spark.sql("SELECT count(*) FROM g.b").head.getLong(0) === 1)
    val ff = spark.sql(
      "CALL g.system.fast_forward(table => 'b', branch => 'main', source => 'audit')").head
    assert(spark.sql("SELECT count(*) FROM g.b").head.getLong(0) === 2)
    assert(ff.getLong(1) === catalog.loadTable("b").metadata.currentSnapshotId.get)

    val anc = spark.sql("CALL g.system.ancestors_of('b')").collect()
    assert(anc.length === 2, "two snapshots in the main ancestry")
    assert(anc.head.getLong(0) === ff.getLong(1), "newest first")

    val tag = spark.sql("CALL g.system.create_tag('b', 'v1')").head
    assert(tag.getLong(1) === ff.getLong(1), "tag defaults to current snapshot")
    assert(spark.sql("CALL g.system.drop_ref('b', 'v1')").head.getBoolean(1))
    assert(!catalog.loadTable("b").metadata.refs.contains("v1"))
  }

  test("remove_orphan_files: dry_run lists, real run deletes") {
    spark.sql("CREATE TABLE g.o (k BIGINT)")
    spark.sql("INSERT INTO g.o VALUES (1)")
    val loc = catalog.loadTable("o").metadata.location
    val orphan = new java.io.File(s"$loc/data/orphan-zz.parquet")
    orphan.getParentFile.mkdirs()
    Files.write(orphan.toPath, Array[Byte](1, 2, 3))

    val dry = spark.sql(
      "CALL g.system.remove_orphan_files(table => 'o', dry_run => true)").collect()
    assert(dry.map(_.getString(0)).exists(_.endsWith("orphan-zz.parquet")))
    assert(orphan.exists, "dry run must not delete")

    spark.sql("CALL g.system.remove_orphan_files(table => 'o', dry_run => false)")
    assert(!orphan.exists, "orphan deleted")
    assert(spark.sql("SELECT k FROM g.o").head.getLong(0) === 1L)
  }

  test("compute_table_stats records NDV sketches; compute_partition_stats lands a file") {
    spark.sql("CREATE TABLE g.s (k BIGINT, seg STRING)")
    spark.sql("INSERT INTO g.s VALUES (1,'A'), (2,'A'), (3,'B')")
    val st = spark.sql("CALL g.system.compute_table_stats('s')").head
    assert(st.getInt(1) === 2, "both primitive columns sketched")
    val meta = catalog.loadTable("s").metadata
    assert(meta.statistics.nonEmpty)
    assert(graft.table.Analyze.ndvFor(catalog.loadTable("s")).values.toSet === Set(3L, 2L))

    val ps = spark.sql("CALL g.system.compute_partition_stats('s')").head
    assert(new java.io.File(ps.getString(0)).exists)
  }

  test("partition-spec evolution and sort order via procedures") {
    spark.sql("CREATE TABLE g.pe (k BIGINT, seg STRING, ts TIMESTAMP)")
    spark.sql("INSERT INTO g.pe VALUES (1, 'A', TIMESTAMP '2024-01-15 00:00:00')")

    val r1 = spark.sql(
      "CALL g.system.add_partition_field('pe', 'bucket(8, k)')").head
    assert(r1.getString(1).contains("k_bucket"))
    spark.sql("CALL g.system.add_partition_field('pe', 'months(ts)')")
    // new writes land under the evolved spec; the old file reads under its own
    spark.sql("INSERT INTO g.pe VALUES (2, 'B', TIMESTAMP '2024-02-15 00:00:00')")
    assert(spark.sql("SELECT count(*) FROM g.pe").head.getLong(0) === 2)
    val t = catalog.loadTable("pe")
    assert(t.spec.fields.map(_.name).sorted === Seq("k_bucket", "ts_month"))
    assert(t.newScan.planFiles().exists(_.file.path.contains("k_bucket=")))

    val r2 = spark.sql(
      "CALL g.system.drop_partition_field('pe', 'ts_month')").head
    assert(r2.getString(1) === "k_bucket")
    assert(spark.sql("SELECT count(*) FROM g.pe").head.getLong(0) === 2)

    val r3 = spark.sql(
      "CALL g.system.replace_sort_order('pe', 'seg ASC, truncate(2, seg) DESC NULLS LAST')").head
    assert(r3.getInt(1) === 2)
    val so = catalog.loadTable("pe").metadata
    val order = so.sortOrders.find(_.orderId == so.defaultSortOrderId).get
    assert(order.fields.map(f => (f.ascending, f.nullsFirst)) ===
      Seq((true, true), (false, false)))
  }

  test("unknown procedure and bad table fail loudly; procedures are listable") {
    val e1 = intercept[Exception](spark.sql("CALL g.system.nope()").collect())
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[Exception](
      spark.sql("CALL g.system.ancestors_of('missing')").collect())
    assert(e2.getMessage.contains("missing"))
  }
}
