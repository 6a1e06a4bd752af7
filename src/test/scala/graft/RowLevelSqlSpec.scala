package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog

/** SQL UPDATE / MERGE INTO / rewrite-path DELETE through the group-based
  * copy-on-write row-level operation: Spark transforms the affected files'
  * rows, graft's DSv2 batch write replaces exactly those files in one
  * conflict-validated overwrite snapshot.
  */
class RowLevelSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val wh = Files.createTempDirectory("graft-rowlevel").toString
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

  test("UPDATE rewrites matching rows, preserves the rest, prunes untouched files") {
    spark.sql("""CREATE TABLE g.u (k BIGINT, seg STRING, v DOUBLE)
      PARTITIONED BY (identity(seg))""")
    spark.sql("""INSERT INTO g.u VALUES
      (1,'A',1.0), (2,'A',2.0), (3,'B',3.0), (4,'B',4.0), (5,'C',5.0)""")
    val before = catalog.loadTable("u")
    val filesBefore = before.newScan.planFiles().map(_.file.path).toSet

    spark.sql("UPDATE g.u SET v = v * 10 WHERE seg = 'A' AND k = 1")

    val got = spark.sql("SELECT k, v FROM g.u ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 10.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0)))

    // only seg='A' files were replaced: B and C files survive untouched
    val after = catalog.loadTable("u")
    val filesAfter = after.newScan.planFiles().map(_.file.path).toSet
    assert((filesBefore -- filesAfter).nonEmpty, "no file replaced")
    assert((filesBefore & filesAfter).nonEmpty, "non-matching partitions were rewritten")
    assert(after.metadata.currentSnapshot.get.summary("operation") === "overwrite")
  }

  test("UPDATE with a non-translatable predicate still works (group rewrite)") {
    spark.sql("CREATE TABLE g.u2 (k BIGINT, s STRING)")
    spark.sql("INSERT INTO g.u2 VALUES (1,'apple'), (2,'banana'), (3,'apricot')")
    spark.sql("UPDATE g.u2 SET s = upper(s) WHERE s LIKE '%an%'")
    val got = spark.sql("SELECT s FROM g.u2 ORDER BY k").collect().map(_.getString(0))
    assert(got.toSeq === Seq("apple", "BANANA", "apricot"))
  }

  test("DELETE with a predicate the metadata path can't translate falls back to rewrite") {
    spark.sql("CREATE TABLE g.d (k BIGINT, s STRING)")
    spark.sql("INSERT INTO g.d VALUES (1,'xa'), (2,'yb'), (3,'xc')")
    spark.sql("DELETE FROM g.d WHERE substr(s, 1, 1) = 'x'")
    val got = spark.sql("SELECT k FROM g.d ORDER BY k").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L))
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    spark.sql("CREATE TABLE g.m (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO g.m VALUES (1,'one'), (2,'two'), (3,'three')")
    spark.sql("""
      MERGE INTO g.m t
      USING (SELECT * FROM VALUES (2,'TWO'), (3,NULL), (4,'four') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED AND s.v IS NULL THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val got = spark.sql("SELECT k, v FROM g.m ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "one"), (2L, "TWO"), (4L, "four")))
  }

  test("row-level write rolls files and lands partition values in manifests") {
    spark.sql("""CREATE TABLE g.big (k BIGINT, seg STRING)
      PARTITIONED BY (identity(seg))
      TBLPROPERTIES ('write.target-file-size-bytes'='2048')""")
    spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey AS k", "c_mktsegment AS seg")
      .createOrReplaceTempView("cust_kv")
    spark.sql("INSERT INTO g.big SELECT k, seg FROM cust_kv")
    spark.sql("UPDATE g.big SET k = k + 1000000 WHERE k <= 100")
    val want = spark.sql(
      "SELECT count(*) FROM cust_kv").head.getLong(0)
    assert(spark.sql("SELECT count(*) FROM g.big").head.getLong(0) === want)
    assert(spark.sql("SELECT count(*) FROM g.big WHERE k >= 1000000").head.getLong(0) ===
      spark.sql("SELECT count(*) FROM cust_kv WHERE k <= 100").head.getLong(0))
    // partition pruning still works over the rewritten files (manifest
    // partition values were written by the executor-side fanout)
    val t = catalog.loadTable("big")
    val one = t.newScan.withFilter(graft.core.Expr.eq("seg", "BUILDING")).planFiles()
    val all = t.newScan.planFiles()
    assert(one.nonEmpty && one.size < all.size, s"${one.size} vs ${all.size}")
  }

  test("runtime group filtering: MERGE rewrites only the files containing matches") {
    spark.sql("""CREATE TABLE g.rgf (k BIGINT, seg STRING, v DOUBLE)
      PARTITIONED BY (identity(seg))""")
    spark.sql("""INSERT INTO g.rgf
      SELECT id AS k, CASE WHEN id < 10 THEN 'A' WHEN id < 20 THEN 'B' ELSE 'C' END,
             CAST(id AS DOUBLE)
      FROM range(30)""")
    val filesBefore = catalog.loadTable("rgf").newScan.planFiles().map(_.file.path).toSet
    assert(filesBefore.size >= 3)

    // the ON condition gives the scan NO static file filter — only the
    // runtime _file subquery can narrow the rewrite to seg='A' files
    spark.sql("""
      MERGE INTO g.rgf t
      USING (SELECT * FROM VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)) AS s(k)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + 100""")

    val filesAfter = catalog.loadTable("rgf").newScan.planFiles().map(_.file.path).toSet
    val replaced = filesBefore -- filesAfter
    assert(replaced.nonEmpty, "nothing rewritten")
    assert((filesBefore & filesAfter).size >= filesBefore.size - 1,
      s"runtime group filter failed: replaced ${replaced.size} of ${filesBefore.size} files")
    // and the data is right
    assert(spark.sql("SELECT sum(v) FROM g.rgf").head.getDouble(0) ===
      (0 until 30).map(_.toDouble).sum + 200.0)
  }

  test("SQL reads apply deletion vectors, positional and equality deletes") {
    import graft.core.{Expr, SchemaBridge}
    import graft.format.PartitionSpec
    import graft.table.Writer
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val schema = SchemaBridge.fromSpark(c.schema)
    // DV table (two DVs on the same files must union)
    val t1 = Writer.append(spark,
      catalog.createTable("mor_dv", schema, PartitionSpec.Unpartitioned), c)
    val t2 = Writer.deleteWhereDV(spark, t1, Expr.eq("c_mktsegment", "MACHINERY"))
    Writer.deleteWhereDV(spark, t2, Expr.lt("c_acctbal", 0.0))
    val got = spark.sql(
      "SELECT count(*) FROM g.mor_dv WHERE c_mktsegment = 'MACHINERY'").head.getLong(0)
    assert(got === 0L)
    assert(spark.sql("SELECT count(*) FROM g.mor_dv").head.getLong(0) ===
      c.filter("c_mktsegment <> 'MACHINERY' AND c_acctbal >= 0").count())

    // parquet positional deletes (v2 MoR)
    val t3 = Writer.append(spark,
      catalog.createTable("mor_pos", schema, PartitionSpec.Unpartitioned), c)
    Writer.deleteWhereMoR(spark, t3, Expr.eq("c_mktsegment", "BUILDING"))
    assert(spark.sql("SELECT count(*) FROM g.mor_pos").head.getLong(0) ===
      c.filter("c_mktsegment <> 'BUILDING'").count())

    // equality deletes apply via cached key sets (null-safe membership)
    val t4 = Writer.append(spark,
      catalog.createTable("mor_eq", schema, PartitionSpec.Unpartitioned), c)
    val delKeys = c.select("c_custkey").orderBy("c_custkey").limit(5)
    Writer.equalityDelete(spark, t4, delKeys, Seq("c_custkey"))
    assert(spark.sql("SELECT count(*) FROM g.mor_eq").head.getLong(0) ===
      c.count() - 5)
    // ...and compose with a projection that does NOT include the key column
    assert(spark.sql("SELECT count(c_mktsegment) FROM g.mor_eq").head.getLong(0) ===
      c.count() - 5)
  }

  test("UPDATE on a DV table: deleted rows stay deleted, DVs fold away") {
    import graft.core.{Expr, SchemaBridge}
    import graft.format.PartitionSpec
    import graft.table.Writer
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val schema = SchemaBridge.fromSpark(c.schema)
    val t1 = Writer.append(spark,
      catalog.createTable("mor_up", schema, PartitionSpec.Unpartitioned), c)
    Writer.deleteWhereDV(spark, t1, Expr.eq("c_mktsegment", "MACHINERY"))

    spark.sql("UPDATE g.mor_up SET c_acctbal = 0 WHERE c_acctbal < 0")

    // deleted segment did not resurrect; update applied to survivors only
    assert(spark.sql(
      "SELECT count(*) FROM g.mor_up WHERE c_mktsegment = 'MACHINERY'").head.getLong(0) === 0L)
    assert(spark.sql(
      "SELECT count(*) FROM g.mor_up WHERE c_acctbal < 0").head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM g.mor_up").head.getLong(0) ===
      c.filter("c_mktsegment <> 'MACHINERY'").count())
    // the rewrite folded the DVs away with their files
    val t = catalog.loadTable("mor_up")
    assert(t.newScan.planFiles().forall(_.posDeletes.isEmpty), "DVs survived the rewrite")
  }

  test("time-travel tables refuse row-level DML") {
    spark.sql("CREATE TABLE g.tt (k BIGINT)")
    spark.sql("INSERT INTO g.tt VALUES (1)")
    val snap = catalog.loadTable("tt").metadata.currentSnapshot.get.snapshotId
    val e = intercept[Exception](
      spark.sql(s"UPDATE g.tt VERSION AS OF $snap SET k = 2"))
    assert(e.getMessage != null)
  }

  test("CoW rewrite preserves the table's default sort order in rewritten files") {
    import org.apache.spark.sql.functions.col
    import graft.core.Transforms
    import graft.format.SortField
    spark.sql("CREATE TABLE g.so (k BIGINT, v BIGINT)")
    // scrambled insert, THEN declare sort order v DESC — the UPDATE's
    // rewrite (not the original append) must impose it
    spark.sql("""INSERT INTO g.so
      SELECT CAST(id AS BIGINT), CAST(pmod(id * 48271, 9973) AS BIGINT)
      FROM range(0, 5000)""")
    val t = catalog.loadTable("so")
    val vId = t.schema.fields.find(_.name == "v").get.id
    graft.table.Evolve.replaceSortOrder(t,
      Seq(SortField(vId, Transforms.Identity, ascending = false, nullsFirst = false)))
    spark.sql("UPDATE g.so SET k = k + 1")
    val files = catalog.loadTable("so").newScan.planFiles().map(_.file.path)
    assert(files.nonEmpty)
    files.foreach { p =>
      val vs = spark.read.parquet(p).select(col("v")).collect().map(_.getLong(0))
      assert(vs.sameElements(vs.sortBy(-(_: Long))),
        s"file $p not sorted v DESC after CoW rewrite")
    }
  }
}
