package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Iceberg `bucket[N]` transform:
  * murmur3_x86_32(seed 0) over the spec single-value serialization
  * (reference `transforms.go:360-491`), `(hash & MaxInt) % N`.
  *
  * A codegen'd static call — unlike a ScalaUDF there is no
  * encoder boxing and the expression stays inside whole-stage codegen, so
  * partitioned writes and bucket-pruned reads pay a plain function call per
  * row. Spark's own `hash()` is murmur3 seed 42 over Spark's internal row
  * encoding and is NOT spec-compatible.
  *
  * Date/timestamp children are consumed directly as their Catalyst-internal
  * encodings (epoch days int, epoch micros long) — no tz-sensitive SQL cast.
  * Integers must still be pre-cast to LongType by the caller; strings arrive
  * as StringType, binary/fixed as BinaryType, decimals as DecimalType.
  */
final case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket n must be > 0, got $n")

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"iceberg_bucket_$n"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    // date/timestamp Catalyst-internal values ARE the spec encodings
    // (epoch days int, epoch micros long) — no tz-sensitive SQL cast needed
    case LongType | TimestampType | TimestampNTZType =>
      BucketUtil.bucketLong(input.asInstanceOf[Long], n)
    case DateType => BucketUtil.bucketLong(input.asInstanceOf[Int].toLong, n)
    case StringType => BucketUtil.bucketUtf8(input.asInstanceOf[UTF8String], n)
    case BinaryType => BucketUtil.bucketBinary(input.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => BucketUtil.bucketDecimal(input.asInstanceOf[Decimal], n)
    case other => throw new IllegalStateException(s"bucket over $other unsupported")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    child.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"graft.core.BucketUtil.bucketLong($c, $n)")
      case DateType =>
        defineCodeGen(ctx, ev, c => s"graft.core.BucketUtil.bucketLong((long) $c, $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.core.BucketUtil.bucketUtf8($c, $n)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.core.BucketUtil.bucketBinary($c, $n)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev, c => s"graft.core.BucketUtil.bucketDecimal($c, $n)")
      case other => throw new IllegalStateException(s"bucket over $other unsupported")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

/** Codegen'd `Math.floorDiv` over a column's Catalyst-internal epoch long.
  *
  * TIMESTAMP and TIMESTAMP_NTZ columns both carry epoch-micros longs
  * internally (UTC-instant micros for the former, local-datetime micros for
  * the latter) — exactly the µs domains the Iceberg time transforms floor
  * from (reference `transforms.go:826-1230`). Reading the internal value
  * sidesteps the session-timezone shift that `cast(TimestampType)` /
  * `unix_micros` would introduce for NTZ sources, and the session-local
  * rendering that `year()`/`cast(DateType)` would introduce for tz-aware
  * sources; it also keeps the arithmetic in exact 64-bit integers instead of
  * a lossy double round trip.
  */
final case class EpochFloorDiv(child: Expression, divisor: Long) extends UnaryExpression {
  require(divisor > 0, s"divisor must be > 0, got $divisor")

  override def dataType: DataType = LongType
  override def prettyName: String = s"epoch_floordiv_$divisor"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"epoch_floordiv over $other unsupported (need long/timestamp/timestamp_ntz)")
    }

  override protected def nullSafeEval(input: Any): Any =
    Math.floorDiv(input.asInstanceOf[Long], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): EpochFloorDiv =
    copy(child = newChild)
}

/** Static hash entry points callable from generated Java code. */
object BucketUtil {
  def bucketLong(v: Long, n: Int): Int = Transforms.bucketLong(v, n)
  def bucketUtf8(v: UTF8String, n: Int): Int = Transforms.bucketBytes(v.getBytes, n)
  def bucketBinary(v: Array[Byte], n: Int): Int = Transforms.bucketBytes(v, n)
  def bucketDecimal(v: Decimal, n: Int): Int =
    Transforms.bucketBytes(v.toJavaBigDecimal.unscaledValue.toByteArray, n)
}
