package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.core.IcebergTypes._
import graft.format.{PartitionSpec, SortField}
import graft.table.{ColumnPosition, Evolve, SparkRead, Writer}

/** Schema/spec/sort-order evolution beyond the round-1 basics: move,
  * union-by-name, identifier fields, spec field removal, sort orders.
  */
class EvolveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val catalog = new HadoopCatalog(Files.createTempDirectory("graft-ev").toString)

  override def afterAll(): Unit = spark.stop()

  private def freshNation(name: String) = {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    Writer.append(spark, catalog.createTable(name, schema, PartitionSpec.Unpartitioned), nation)
  }

  test("move column reorders without changing ids; reads still resolve") {
    val t1 = freshNation("ev_move")
    val t2 = Evolve.moveColumn(t1, "n_regionkey", ColumnPosition.First)
    assert(t2.schema.fields.head.name === "n_regionkey")
    val t3 = Evolve.moveColumn(t2, "n_regionkey", ColumnPosition.After("n_nationkey"))
    assert(t3.schema.fields.map(_.name).take(2) === Seq("n_nationkey", "n_regionkey"))
    // ids unchanged -> old files read fine in the new column order
    val back = SparkRead.read(spark, t3.newScan)
    assert(back.columns.take(2).toSeq === Seq("n_nationkey", "n_regionkey"))
    assert(back.count() === 25)
  }

  test("union by name adds new columns and promotes compatible ones") {
    val t1 = freshNation("ev_union")
    val incoming = IcebergSchema(Seq(
      NestedField(1, "n_nationkey", LongT, required = false), // int -> long promote
      NestedField(2, "n_comment", StringT, required = false))) // new column
    val t2 = Evolve.unionByName(t1, incoming)
    assert(t2.schema.findField("n_comment").isDefined)
    assert(t2.schema.findField("n_nationkey").get.fieldType === LongT)
    // nothing dropped
    assert(t2.schema.findField("n_name").isDefined)
    intercept[IllegalArgumentException] {
      Evolve.unionByName(t2, IcebergSchema(Seq(
        NestedField(1, "n_name", LongT, required = false)))) // string -/-> long
    }
  }

  test("identifier fields set and persist through metadata round-trip") {
    val t1 = freshNation("ev_ident")
    val t2 = Evolve.setIdentifierFields(t1, Seq("n_nationkey"))
    val reloaded = catalog.loadTable("ev_ident")
    assert(reloaded.schema.identifierFieldIds ===
      Seq(t2.schema.findField("n_nationkey").get.id))
  }

  test("remove partition spec field produces a new default spec; old files scan") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val spec = PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()
    val t1 = Writer.append(spark, catalog.createTable("ev_spec", schema, spec), nation)
    val t2 = Evolve.removeSpecFields(t1, Seq(t1.spec.fields.head.name))
    assert(t2.spec.isUnpartitioned)
    // unpartitioned append lands in the new spec; both specs scan together
    val t3 = Writer.append(spark, t2,
      nation.withColumn("n_nationkey", col("n_nationkey") + lit(100)))
    assert(SparkRead.read(spark, t3.newScan).count() === 50)
  }

  test("delete after spec evolution keeps old-spec partition tuples intact") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val spec = PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()
    val t1 = Writer.append(spark, catalog.createTable("ev_cf", schema, spec), nation)
    val t2 = Evolve.removeSpecFields(t1, Seq(t1.spec.fields.head.name))
    val t3 = Writer.append(spark, t2,
      nation.withColumn("n_nationkey", col("n_nationkey") + lit(100)))
    // partial CoW delete removes rows from OLD-spec files -> carry-forward
    // rewrite of the old manifest must keep its spec id + partition values
    val t4 = Writer.deleteWhere(spark, t3, Expr.in("n_nationkey", Seq(1, 101)))
    assert(SparkRead.read(spark, t4.newScan).count() === 48)
    val tasks = t4.newScan.planFiles()
    val oldSpecTasks = tasks.filter(_.specId == t1.spec.specId)
    assert(oldSpecTasks.nonEmpty)
    assert(oldSpecTasks.forall(_.file.partition.size === 1)) // tuple intact
    // partition pruning on the old spec still works after the rewrite
    val pruned = t4.newScan.withFilter(Expr.eq("n_regionkey", 0)).planFiles()
    assert(pruned.size < tasks.size)
  }

  test("replace sort order becomes the write-side clustering") {
    val t1 = freshNation("ev_sort")
    val keyId = t1.schema.findField("n_name").get.id
    val t2 = Evolve.replaceSortOrder(t1,
      Seq(SortField(keyId, Transforms.Identity, ascending = true, nullsFirst = true)))
    assert(t2.metadata.defaultSortOrderId === t2.metadata.sortOrders.last.orderId)
    // subsequent writes succeed with the order in place
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val t3 = Writer.append(spark, t2, nation.limit(5))
    assert(SparkRead.read(spark, t3.newScan).count() === 30)
  }
}
