package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{CommitConflict, HadoopCatalog, MultiTableTransaction}
import graft.core._
import graft.format.PartitionSpec
import graft.table.{SparkRead, Writer}

/** Multi-table transactions (reference
  * `catalog/multi_table_transaction.go:50-154`): staged updates across
  * tables commit atomically through the catalog CAS — all version hints
  * advance or none.
  */
class MultiTableTxnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("multi-table-txn")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val warehouse = Files.createTempDirectory("graft-mtt").toString
  private lazy val catalog = new HadoopCatalog(warehouse)

  override def afterAll(): Unit = spark.stop()

  private def freshTables(prefix: String): (graft.table.Table, graft.table.Table) = {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val a = catalog.createTable(s"${prefix}_a", schema, PartitionSpec.Unpartitioned)
    val b = catalog.createTable(s"${prefix}_b", schema, PartitionSpec.Unpartitioned)
    (a, b)
  }

  test("2-table append commits atomically; both reads see the rows") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val (a, b) = freshTables("mtt_ok")
    val txn = new MultiTableTransaction(catalog)
    txn.run(a)(t => Writer.append(spark, t, nation.filter(col("n_nationkey") < 10)))
    txn.run(b)(t => Writer.append(spark, t, nation.filter(col("n_nationkey") >= 10)))
    // nothing visible before commit
    assert(catalog.loadTable(a.name).metadata.currentSnapshotId.isEmpty)
    assert(catalog.loadTable(b.name).metadata.currentSnapshotId.isEmpty)
    val Seq(a2, b2) = txn.commit()
    assert(SparkRead.read(spark, a2.newScan).count() === 10)
    assert(SparkRead.read(spark, b2.newScan).count() === 15)
    intercept[IllegalArgumentException] { txn.commit() } // reuse forbidden
  }

  test("injected conflict on table B leaves table A unchanged") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val (a, b) = freshTables("mtt_cfl")
    val txn = new MultiTableTransaction(catalog)
    txn.run(a)(t => Writer.append(spark, t, nation))
    txn.run(b)(t => Writer.append(spark, t, nation))
    // concurrent writer advances B after staging -> the whole txn must abort
    Writer.append(spark, catalog.loadTable(b.name), nation.limit(3))
    intercept[CommitConflict] { txn.commit() }
    val aAfter = catalog.loadTable(a.name)
    assert(aAfter.metadata.currentSnapshotId.isEmpty, "table A must be unchanged")
    assert(aAfter.currentVersion === 1)
    assert(SparkRead.read(spark, catalog.loadTable(b.name).newScan).count() === 3)
  }

  test("staging from a stale handle retries inside the staging catalog") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val (a, _) = freshTables("mtt_stale")
    Writer.append(spark, catalog.loadTable(a.name), nation.limit(2))
    val txn = new MultiTableTransaction(catalog)
    // stale handle (CAS base v1, catalog at v2): the writer's retry loop
    // refreshes THROUGH the staging catalog and stages on the current base
    txn.run(a)(t => Writer.append(spark, t, nation))
    val Seq(a2) = txn.commit()
    assert(SparkRead.read(spark, a2.newScan).count() === 27)
    assert(a2.metadata.snapshots.size === 2)
  }

  test("duplicate table is rejected; non-transactional catalog is rejected") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val (a, _) = freshTables("mtt_dup")
    val txn = new MultiTableTransaction(catalog)
    txn.run(a)(t => Writer.append(spark, t, nation))
    intercept[IllegalArgumentException] {
      txn.run(a)(t => Writer.append(spark, t, nation))
    }
  }
}
