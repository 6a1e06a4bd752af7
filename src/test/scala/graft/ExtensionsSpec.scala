package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.{IcebergTypes, Literals, Transforms}

/** SparkSessionExtensions registration + TIME type bridge. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("iceberg_bucket is callable from plain SQL and matches spec vectors") {
    val got = spark.sql("SELECT iceberg_bucket(100, CAST(34 AS BIGINT)) AS b")
      .first().getInt(0)
    assert(got === 79) // transforms_test.go spec vector
    val s = spark.sql("SELECT iceberg_bucket(16, 'iceberg') AS b").first().getInt(0)
    assert(s === Transforms.Bucket(16)
      .apply("iceberg", org.apache.spark.sql.types.StringType))
  }

  test("dot_product and top_k_by_score are callable from plain SQL") {
    val d = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .first().getDouble(0)
    assert(d === 32.0)
    val rows = spark.sql(
      """SELECT q, top_k_by_score(s, id, 2) AS top FROM VALUES
         (1, 0.9d, 10L), (1, 0.7d, 11L), (1, 0.95d, 12L), (2, 0.5d, 20L)
         AS t(q, s, id) GROUP BY q ORDER BY q""").collect()
    val top1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(top1.map(r => (r.getLong(0), r.getDouble(1))) === Seq((12L, 0.95), (10L, 0.9)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).length === 1)
  }

  test("bad arity/shape yields a clear error") {
    val e = intercept[Exception](spark.sql("SELECT iceberg_bucket('x', 1)").collect())
    assert(e.getMessage.contains("iceberg_bucket"))
  }

  test("time type bridges as tagged long and round-trips schema JSON") {
    import graft.core._
    val schema = IcebergSchema(Seq(
      NestedField(1, "t", IcebergTypes.TimeT, required = false)))
    val sparkField = SchemaBridge.toSpark(schema).fields.head
    assert(sparkField.dataType === org.apache.spark.sql.types.LongType)
    assert(sparkField.metadata.getString("graft.type") === "time")
    val json = SchemaJson.schemaToJsonNode(schema).toString
    assert(json.contains("\"time\""))
    assert(SchemaJson.schemaFromJsonNode(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
      .findField("t").get.fieldType === IcebergTypes.TimeT)
    // µs-since-midnight literal codec (spec single-value serialization)
    val encoded = Literals.encode(IcebergTypes.TimeT, 81068000000L)
    assert(Literals.decode(IcebergTypes.TimeT, encoded) === 81068000000L)
  }
}
