package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.table.{SparkRead, Writer}

/** v3 variant column through the full Iceberg pipeline (reference
  * `table/internal/variant_shredding.go`; here Spark 4's native VariantType
  * + parquet variant encoding carry the value).
  */
class VariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("variant column round-trips and shredded field access works") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-var").toString)
    val df = Seq(
      (1L, """{"kind":"click","n":3,"tags":["a","b"]}"""),
      (2L, """{"kind":"view","n":7}"""),
      (3L, """{"kind":"click","n":11,"nested":{"x":1.5}}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("props"))
    val schema = SchemaBridge.fromSpark(df.schema)
    assert(schema.findField("props").get.fieldType === IcebergTypes.VariantT)

    val t1 = Writer.append(spark,
      cat.createTable("var_t", schema, PartitionSpec.Unpartitioned), df)
    val back = SparkRead.read(spark, t1.newScan)
    assert(back.schema.fields.find(_.name == "props").get.dataType ===
      org.apache.spark.sql.types.VariantType)
    // typed field extraction over the variant
    val clicks = back.filter(
      variant_get(col("props"), "$.kind", "string") === "click")
    assert(clicks.count() === 2)
    val total = back.select(
      sum(variant_get(col("props"), "$.n", "long")).as("s")).first().getLong(0)
    assert(total === 21L)
    // schema JSON round-trips the variant type
    val reloaded = cat.loadTable("var_t")
    assert(reloaded.schema.findField("props").get.fieldType === IcebergTypes.VariantT)
  }
}
