package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.Transforms

/** The native Catalyst bucket expression must agree with the row-level
  * `Transform.apply` (which carries the spec hash vectors) across every
  * supported input type — evaluated through a real DataFrame so whole-stage
  * codegen compiles the generated `BucketUtil` calls.
  */
class BucketExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("codegen bucket equals row-level apply: long/string/binary/decimal") {
    import spark.implicits._
    val b = Transforms.Bucket(16)
    val longs = Seq(0L, 1L, -1L, 34L, 1420L, Long.MaxValue, Long.MinValue + 1).toDF("v")
    val gotLongs = longs.select(b.toColumn(col("v"), LongType).as("b")).as[Int].collect()
    val wantLongs = Seq(0L, 1L, -1L, 34L, 1420L, Long.MaxValue, Long.MinValue + 1)
      .map(v => b.apply(v, LongType).asInstanceOf[Int])
    assert(gotLongs.toSeq === wantLongs)

    val strs = Seq("iceberg", "", "graft", "ü-umlaut").toDF("v")
    val gotStrs = strs.select(b.toColumn(col("v"), StringType).as("b")).as[Int].collect()
    val wantStrs = Seq("iceberg", "", "graft", "ü-umlaut")
      .map(v => b.apply(v, StringType).asInstanceOf[Int])
    assert(gotStrs.toSeq === wantStrs)

    val bins = Seq(Array[Byte](0, 1, 2, 3), Array[Byte]()).toDF("v")
    val gotBins = bins.select(b.toColumn(col("v"), BinaryType).as("b")).as[Int].collect()
    val wantBins = Seq(Array[Byte](0, 1, 2, 3), Array[Byte]())
      .map(v => b.apply(v, BinaryType).asInstanceOf[Int])
    assert(gotBins.toSeq === wantBins)

    val dt = DecimalType(9, 2)
    val decs = Seq(BigDecimal("14.20"), BigDecimal("0.00"), BigDecimal("-7.50"))
    val gotDecs = decs.toDF("v").select(b.toColumn(col("v"), dt).as("b")).as[Int].collect()
    val wantDecs = decs.map(v =>
      b.apply(v.underlying.setScale(2), dt).asInstanceOf[Int])
    assert(gotDecs.toSeq === wantDecs)
  }

  test("spec vector through codegen: bucket[100] of 34L = 79") {
    import spark.implicits._
    val b = Transforms.Bucket(100)
    val got = Seq(34L).toDF("v")
      .select(b.toColumn(col("v"), LongType).as("b")).as[Int].head()
    assert(got === 79) // transforms_test.go spec vector
  }

  test("null input stays null") {
    import spark.implicits._
    val b = Transforms.Bucket(8)
    val got = Seq(Option.empty[Long]).toDF("v")
      .select(b.toColumn(col("v"), LongType).as("b")).collect()
    assert(got.head.isNullAt(0))
  }
}
