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

  test("shredded layout reads identical to its unshredded twin") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-vsh").toString)
    val df = (0 until 200).map { i =>
      (i.toLong, s"""{"k":$i,"kind":"t${i % 3}","nested":{"x":${i * 0.5}},"odd":${i % 2 == 1}}""")
    }.toDF("id", "j").select(col("id"), parse_json(col("j")).as("props"))
    val schema = SchemaBridge.fromSpark(df.schema)

    // shredding is ON by default; "false" forces the plain layout twin
    val plain = Writer.append(spark,
      cat.createTable("vsh_plain", schema, PartitionSpec.Unpartitioned,
        properties = Map("write.variant.shredding.enabled" -> "false")), df)
    val shred = Writer.append(spark,
      cat.createTable("vsh_shred", schema, PartitionSpec.Unpartitioned,
        properties = Map("write.variant.shredding.enabled" -> "true")), df)

    // physical layouts differ: the shredded file carries typed_value
    import scala.jdk.CollectionConverters._
    def hasTypedValue(t: graft.table.Table): Boolean = {
      val p = t.newScan.planFiles().head.file.path
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), new org.apache.hadoop.conf.Configuration()))
      try {
        val props = r.getFooter.getFileMetaData.getSchema.getType(Seq("props"): _*)
        !props.isPrimitive &&
          props.asGroupType.getFields.asScala.exists(_.getName == "typed_value")
      } finally r.close()
    }
    assert(!hasTypedValue(plain), "twin table must be unshredded")
    assert(hasTypedValue(shred), "shredding property must produce typed_value layout")

    // logical contents identical: canonical JSON of every row matches
    def contents(t: graft.table.Table): Seq[(Long, String)] =
      SparkRead.read(spark, t.newScan)
        .select(col("id"), to_json(col("props")).as("j"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(contents(shred) === contents(plain))
  }
}
