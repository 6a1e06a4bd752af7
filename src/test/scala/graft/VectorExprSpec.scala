package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.VectorFunctions.{dot, norm}
import graft.llm.Similarity

/** Codegen'd DotProduct semantics + the duplicate-local regression: with
  * NON-nullable children nullSafeCodeGen inlines the snippet unscoped, so
  * two dot products in one whole-stage function must not collide on
  * generated local names. codegen.fallback=false turns a janino failure
  * from a silent interpreted fallback into a test failure.
  */
class VectorExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.codegen.fallback", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def nonNullVecs = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("b", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)),
        Row(Seq(0.0f, 1.0f, 0.0f), Seq(0.0, 0.0, 2.0))),
      schema)
  }

  test("dot product over float x double arrays, sequential accumulation") {
    val out = nonNullVecs.select(dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(1.0 * 4 + 2 * 5 + 3 * 6, 0.0))
  }

  test("multiple dot products in one projection survive strict codegen (fresh locals)") {
    // cosine = dot / (norm * norm) is THREE DotProducts in one whole-stage
    // function; with fixed local names this janino-fails under fallback=false
    val out = nonNullVecs
      .select(Similarity.cosineCol(col("a"), col("a")).as("c"),
        dot(col("a"), col("b")).as("d"), norm(col("b")).as("n"))
      .collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(0).getDouble(1) === 32.0)
  }

  test("mismatched lengths dot the common prefix") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("b", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(2.0, 3.0, 9.0), Seq(5.0, 7.0))), schema)
    assert(df.select(dot(col("a"), col("b"))).collect()(0).getDouble(0) === 31.0)
  }
}
