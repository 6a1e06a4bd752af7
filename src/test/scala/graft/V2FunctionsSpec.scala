package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, StringType, StructField, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Transforms
import graft.sources.{GraftTimeUnbound, GraftTruncateUnbound, GraftTruncateWidthUnbound}

/** The catalog's V2 functions make LAYOUT CLAIMS (storage-partitioned
  * joins, write distributions) about data the fanout writers placed via
  * [[graft.core.Transforms]] — the two arithmetics must agree on every
  * input or a claim is a lie. Property-style agreement over a wide value
  * sweep, including the floor-division edge cases (pre-epoch values).
  */
class V2FunctionsSpec extends AnyFunSuite {

  private def row(vs: Any*): GenericInternalRow =
    new GenericInternalRow(vs.toArray)

  private val micros: Seq[Long] = {
    val rnd = new scala.util.Random(7)
    Seq(0L, -1L, 1L, 86400000000L - 1, 86400000000L, -86400000000L,
      3600000000L, -3600000000L - 1) ++
      Seq.fill(200)(rnd.nextLong() % (4000L * 365 * 86400000000L))
  }
  private val days: Seq[Int] = {
    val rnd = new scala.util.Random(11)
    Seq(0, 1, -1, 365, -365, 18262) ++ Seq.fill(200)(rnd.nextInt(40000) - 20000)
  }

  test("time V2 functions agree with the write-side transforms on timestamps") {
    for (fn <- Seq("years", "months", "days", "hours")) {
      val bound = new GraftTimeUnbound(fn).bind(
        StructType(Seq(StructField("v", TimestampType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      val tr = fn match {
        case "years" => Transforms.Years
        case "months" => Transforms.Months
        case "days" => Transforms.Days
        case "hours" => Transforms.Hours
      }
      micros.foreach { us =>
        val want = tr.apply(us, TimestampType)
        assert(bound.produceResult(row(Long.box(us))) === want,
          s"$fn($us µs)")
      }
      // ntz binds the same arithmetic under its own declared type
      val ntz = new GraftTimeUnbound(fn).bind(
        StructType(Seq(StructField("v", TimestampNTZType))))
      assert(ntz.inputTypes().head === TimestampNTZType)
    }
  }

  test("time V2 functions agree with the write-side transforms on dates") {
    for (fn <- Seq("years", "months", "days")) {
      val bound = new GraftTimeUnbound(fn).bind(
        StructType(Seq(StructField("v", DateType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      val tr = fn match {
        case "years" => Transforms.Years
        case "months" => Transforms.Months
        case "days" => Transforms.Days
      }
      days.foreach { d =>
        val want = tr.apply(d, DateType)
        assert(bound.produceResult(row(Int.box(d))) === want, s"$fn(date $d)")
      }
    }
    intercept[UnsupportedOperationException] {
      new GraftTimeUnbound("hours").bind(
        StructType(Seq(StructField("v", DateType))))
    }
  }

  test("truncate V2 functions agree with the write-side transform") {
    val rnd = new scala.util.Random(13)
    val ints = Seq(0, 1, -1, 9, 10, -10, Int.MaxValue, Int.MinValue + 1) ++
      Seq.fill(100)(rnd.nextInt())
    val longs = ints.map(_.toLong) ++ Seq(Long.MaxValue, Long.MinValue + 1)
    val widths = Seq(1, 2, 7, 10, 1000)
    for (w <- widths) {
      val bi = GraftTruncateUnbound.bind(StructType(Seq(
        StructField("w", IntegerType), StructField("v", IntegerType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      ints.foreach { i =>
        assert(bi.produceResult(row(Int.box(w), Int.box(i))) ===
          Transforms.Truncate(w).apply(i, IntegerType), s"truncate[$w]($i)")
      }
      val bl = GraftTruncateUnbound.bind(StructType(Seq(
        StructField("w", IntegerType), StructField("v", LongType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Long]]
      longs.foreach { l =>
        assert(bl.produceResult(row(Int.box(w), Long.box(l))) ===
          Transforms.Truncate(w).apply(l, LongType), s"truncate[$w]($l)")
      }
    }
    // strings truncate by CODE POINT, surrogate pairs whole
    val bs = GraftTruncateUnbound.bind(StructType(Seq(
      StructField("w", IntegerType), StructField("v", StringType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[UTF8String]]
    for (s <- Seq("", "a", "abcdef", "a😀b😀c", "𝔘𝔫𝔦", "こんにちは"); w <- Seq(1, 2, 3, 10)) {
      assert(bs.produceResult(row(Int.box(w), UTF8String.fromString(s))).toString ===
        Transforms.Truncate(w).apply(s, StringType), s"truncate[$w]('$s')")
    }
  }

  test("width-embedded truncate_<W> matches the 2-arg function and write transform") {
    val rnd = new scala.util.Random(29)
    val longs = Seq(0L, 1L, -1L, 99L, 100L, -100L, Long.MaxValue, Long.MinValue + 1) ++
      Seq.fill(100)(rnd.nextLong())
    for (w <- Seq(1, 7, 100, 4096)) {
      val f = GraftTruncateWidthUnbound(w).bind(
        StructType(Seq(StructField("v", LongType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Long]]
      longs.foreach { l =>
        assert(f.produceResult(row(Long.box(l))) ===
          Transforms.Truncate(w).apply(l, LongType), s"truncate_$w($l)")
      }
      // canonical names unify per width — the SPJ compatibility key
      assert(f.canonicalName() === s"graft.truncate[$w](long)")
      val fs = GraftTruncateWidthUnbound(w).bind(
        StructType(Seq(StructField("v", StringType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[UTF8String]]
      for (s <- Seq("", "a😀b😀c", "abcdef")) {
        assert(fs.produceResult(row(UTF8String.fromString(s))).toString ===
          Transforms.Truncate(w).apply(s, StringType), s"truncate_$w('$s')")
      }
    }
  }
}
