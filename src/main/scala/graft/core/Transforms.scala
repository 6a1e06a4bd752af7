package graft.core

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg partition transforms (reference: `transforms.go:103-1230`),
  * re-expressed two ways: a pure-Scala `apply` on single values (used by the
  * metadata planner for partition pruning and by the writer for partition
  * tuples harvested from data), and a Spark `Column` lowering (used to derive
  * partition columns for fanout writes, fully codegen'd for the built-in
  * function paths).
  *
  * Correctness-critical details carried over from the spec (not the code) of
  * the reference:
  *  - `bucket[N]` hashes the *single-value serialization* of the value with
  *    murmur3_x86_32 seed 0 (`transforms.go:360-491`): int/long/date/ts(µs)
  *    as 8-byte little-endian long, string as UTF-8 bytes, decimal as minimal
  *    two's-complement big-endian unscaled value, fixed/binary raw bytes.
  *  - time transforms are floor-divisions from the epoch, so pre-1970 values
  *    floor toward -inf (`transforms.go:826-1230`).
  *  - `truncate[W]` on ints floors toward -inf: `v - (((v % W) + W) % W)`;
  *    on strings it takes the first W *codepoints* (`transforms.go:538-667`).
  */
sealed trait Transform {
  def name: String
  /** Lower to a Spark Column over the source column. */
  def toColumn(src: Column, srcType: DataType): Column
  /** Single-value semantics (driver-side partition tuples / pruning). */
  def apply(v: Any, srcType: DataType): Any
  def resultType(srcType: DataType): DataType
  def preservesOrder: Boolean = false
  override def toString: String = name
}

object Transforms {

  private val EpochDay = java.time.LocalDate.ofEpochDay(0)

  case object Identity extends Transform {
    val name = "identity"
    def toColumn(src: Column, t: DataType): Column = src
    def apply(v: Any, t: DataType): Any = v
    def resultType(t: DataType): DataType = t
    override def preservesOrder = true
  }

  case object Void extends Transform {
    val name = "void"
    // typed null: partitionBy rejects untyped NullType partition columns
    def toColumn(src: Column, t: DataType): Column = lit(null).cast(t)
    def apply(v: Any, t: DataType): Any = null
    def resultType(t: DataType): DataType = t
  }

  /** Floor a timestamp column to whole epoch units via the internal micros
    * long — never through a session-timezone-sensitive cast. The driver-side
    * `timeUnits` speaks UTC for instants and the raw local datetime for NTZ;
    * the Catalyst-internal encodings are exactly those micros, so
    * [[EpochFloorDiv]] keeps writer columns and driver-side apply in
    * agreement under ANY session timezone (the silent-row-loss hazard
    * TransformConsistencySpec's non-UTC cases pin).
    */
  private def epochUnits(src: Column, unitMicros: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(EpochFloorDiv(ColumnBridge.expression(src), unitMicros))
  }

  /** The UTC calendar date of a timestamp column (for year/month extraction).
    * `cast(DateType)` / `year()` on a tz-aware timestamp render in the
    * SESSION timezone; deriving the date from the floored UTC day ordinal is
    * timezone-free. NTZ and DATE sources extract locally, which already
    * matches the driver-side apply.
    */
  private def utcDate(src: Column, t: DataType): Column = t match {
    case TimestampType =>
      date_add(lit(java.sql.Date.valueOf("1970-01-01")),
        epochUnits(src, 86400000000L).cast(IntegerType))
    case _ => src.cast(DateType)
  }

  /** Years since 1970 (int). */
  case object Years extends Transform {
    val name = "year"
    def toColumn(src: Column, t: DataType): Column =
      (year(utcDate(src, t)) - lit(1970)).cast(IntegerType)
    def apply(v: Any, t: DataType): Any = timeUnits(v, t, Years)
    def resultType(t: DataType): DataType = IntegerType
    override def preservesOrder = true
  }

  /** Months since 1970-01 (int). */
  case object Months extends Transform {
    val name = "month"
    def toColumn(src: Column, t: DataType): Column = {
      val d = utcDate(src, t)
      ((year(d) - lit(1970)) * lit(12) + (month(d) - lit(1))).cast(IntegerType)
    }
    def apply(v: Any, t: DataType): Any = timeUnits(v, t, Months)
    def resultType(t: DataType): DataType = IntegerType
    override def preservesOrder = true
  }

  /** Days since 1970-01-01; result is date-typed per spec (int ordinal here). */
  case object Days extends Transform {
    val name = "day"
    def toColumn(src: Column, t: DataType): Column = t match {
      case TimestampType | TimestampNTZType =>
        epochUnits(src, 86400000000L).cast(IntegerType)
      case _ =>
        datediff(src.cast(DateType), lit("1970-01-01").cast(DateType)).cast(IntegerType)
    }
    def apply(v: Any, t: DataType): Any = timeUnits(v, t, Days)
    def resultType(t: DataType): DataType = DateType
    override def preservesOrder = true
  }

  /** Hours since epoch (int); timestamps only. */
  case object Hours extends Transform {
    val name = "hour"
    def toColumn(src: Column, t: DataType): Column = t match {
      case TimestampType | TimestampNTZType =>
        epochUnits(src, 3600000000L).cast(IntegerType)
      case _ =>
        epochUnits(src.cast(TimestampType), 3600000000L).cast(IntegerType)
    }
    def apply(v: Any, t: DataType): Any = timeUnits(v, t, Hours)
    def resultType(t: DataType): DataType = IntegerType
    override def preservesOrder = true
  }

  final case class Bucket(n: Int) extends Transform {
    require(n > 0, s"bucket n must be > 0, got $n")
    val name = s"bucket[$n]"
    def toColumn(src: Column, t: DataType): Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      def bucketed(c: Column): Column =
        ColumnBridge.column(IcebergBucket(ColumnBridge.expression(c), n))
      t match {
        case IntegerType | LongType => bucketed(src.cast(LongType))
        // date/timestamp columns pass through UNCAST: their Catalyst
        // internal values are already the spec encodings (epoch days /
        // epoch micros) and IcebergBucket reads them directly — ANSI
        // forbids the DATE→BIGINT SQL cast, and an NTZ→TIMESTAMP cast
        // would silently shift by the session timezone
        case DateType | TimestampType | TimestampNTZType => bucketed(src)
        case StringType | BinaryType => bucketed(src)
        case dt: DecimalType => bucketed(src.cast(dt))
        case other => throw new IllegalArgumentException(s"bucket over $other unsupported")
      }
    }
    def apply(v: Any, t: DataType): Any = v match {
      case null => null
      case i: Int => bucketLong(i.toLong, n)
      case l: Long => bucketLong(l, n)
      case s: String => bucketBytes(s.getBytes(StandardCharsets.UTF_8), n)
      case b: Array[Byte] => bucketBytes(b, n)
      case d: java.math.BigDecimal => bucketBytes(d.unscaledValue.toByteArray, n)
      case d: java.sql.Date => bucketLong(d.toLocalDate.toEpochDay, n)
      case d: java.time.LocalDate => bucketLong(d.toEpochDay, n)
      case ts: java.sql.Timestamp =>
        bucketLong(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000, n)
      case d: java.time.LocalDateTime =>
        bucketLong(d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000, n)
      case other => throw new IllegalArgumentException(s"bucket of $other")
    }
    def resultType(t: DataType): DataType = IntegerType
  }

  final case class Truncate(w: Int) extends Transform {
    require(w > 0, s"truncate width must be > 0, got $w")
    val name = s"truncate[$w]"
    def toColumn(src: Column, t: DataType): Column = t match {
      // Integer truncate is WRAPPING 32-bit arithmetic in the reference
      // (Go int32 / Java int both wrap near Int.MinValue, transforms.go:538)
      // and in our driver-side apply; a plain long→int cast of the wrapped
      // value throws CAST_OVERFLOW under ANSI. Compute in long (exact) and
      // re-wrap explicitly so the writer column agrees with apply on every
      // input instead of failing the write.
      case IntegerType =>
        val ww = lit(w.toLong)
        val lsrc = src.cast(LongType)
        val lres = lsrc - (((lsrc % ww) + ww) % ww)
        when(lres < lit(Int.MinValue.toLong), lres + lit(1L << 32))
          .otherwise(lres).cast(IntegerType)
      // Long truncate wraps the same way at Long.MinValue; long arithmetic
      // can't see past its own edge, so rows INSIDE the w-wide underflow
      // window re-wrap through decimal(22,0) (+2^64) while every other row
      // keeps the plain codegen'd long arithmetic (CASE WHEN evaluates only
      // the matching branch, so the hot write path never touches decimal)
      case LongType =>
        val ww = lit(w.toLong)
        val adj = ((src % ww) + ww) % ww
        val fast = src - adj
        val dec = src.cast(DecimalType(22, 0)) - adj.cast(DecimalType(22, 0))
        val lMin = lit(new java.math.BigDecimal(Long.MinValue)).cast(DecimalType(22, 0))
        val twoTo64 = lit(new java.math.BigDecimal(BigInteger.ONE.shiftLeft(64)))
        val wrapped = when(dec < lMin, dec + twoTo64).otherwise(dec).cast(LongType)
        when(src < lit(Long.MinValue) + ww, wrapped).otherwise(fast)
      case StringType => substring(src, 1, w)
      case dt: DecimalType =>
        val f = udf((v: java.math.BigDecimal) =>
          if (v == null) null else truncDecimal(v, w))
        f(src.cast(dt)).cast(dt)
      case BinaryType =>
        val f = udf((v: Array[Byte]) => if (v == null) null else v.take(w))
        f(src)
      case other => throw new IllegalArgumentException(s"truncate over $other unsupported")
    }
    def apply(v: Any, t: DataType): Any = v match {
      case null => null
      case i: Int => (i - (((i % w) + w) % w))
      case l: Long => l - (((l % w) + w) % w)
      case s: String =>
        // first w codepoints, not chars
        val cps = s.codePointCount(0, s.length)
        if (cps <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
      case b: Array[Byte] => b.take(w)
      case d: java.math.BigDecimal => truncDecimal(d, w)
      case other => throw new IllegalArgumentException(s"truncate of $other")
    }
    def resultType(t: DataType): DataType = t
    override def preservesOrder = true
  }

  private def truncDecimal(v: java.math.BigDecimal, w: Int): java.math.BigDecimal = {
    val unscaled = v.unscaledValue
    val ww = BigInteger.valueOf(w.toLong)
    val m = unscaled.mod(ww) // BigInteger.mod is always non-negative
    new java.math.BigDecimal(unscaled.subtract(m), v.scale)
  }

  private def timeUnits(v: Any, t: DataType, tr: Transform): Any = {
    if (v == null) return null
    val micros: Long = v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay * 86400000000L
      case d: java.time.LocalDate => d.toEpochDay * 86400000000L
      case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
      case d: java.time.LocalDateTime =>
        d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000
      case l: Long => l // already µs
      case i: Int => i.toLong * 86400000000L // date ordinal
      case other => throw new IllegalArgumentException(s"time transform of $other")
    }
    val days = Math.floorDiv(micros, 86400000000L)
    val date = java.time.LocalDate.ofEpochDay(days)
    tr match {
      case Years => date.getYear - 1970
      case Months => (date.getYear - 1970) * 12 + (date.getMonthValue - 1)
      case Days => days.toInt
      case Hours => Math.floorDiv(micros, 3600000000L).toInt
      case _ => throw new IllegalStateException
    }
  }

  /** Time transforms speak the µs convention; v3 ns-timestamp columns
    * surface in Spark as raw ns longs (SchemaBridge tags them), so their
    * source column floor-divides to µs before the transform (reference
    * downcast rules, `table/arrow_utils.go:487-506`). Other transforms
    * (identity, bucket) keep the raw ns domain.
    */
  def sourceFor(tr: Transform, c: Column, it: IcebergType): (Column, DataType) =
    (tr, it) match {
      case (Years | Months | Days | Hours,
          IcebergTypes.TimestampNsT | IcebergTypes.TimestampTzNsT) =>
        // (c - pmod(c, 1000)) is exactly divisible: integral div stays exact
        // where a double round trip would lose low bits at ns magnitudes
        (timestamp_micros(((c - pmod(c, lit(1000L))) / lit(1000L)).cast(LongType)),
          TimestampType)
      case _ => (c, SchemaBridge.toSparkType(it))
    }

  /** Driver-side dual of [[sourceFor]] for literal/bound projection. */
  def valueFor(tr: Transform, v: Any, it: IcebergType): Any = (tr, it, v) match {
    case (Years | Months | Days | Hours,
        IcebergTypes.TimestampNsT | IcebergTypes.TimestampTzNsT, l: Long) =>
      Math.floorDiv(l, 1000L)
    case _ => v
  }

  /** murmur3_x86_32(seed=0) over the 8-byte little-endian encoding. */
  def bucketLong(v: Long, n: Int): Int = {
    val bytes = new Array[Byte](8)
    var i = 0; var x = v
    while (i < 8) { bytes(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    bucketBytes(bytes, n)
  }

  def bucketBytes(bytes: Array[Byte], n: Int): Int =
    (Murmur3.hash(bytes, 0) & Integer.MAX_VALUE) % n

  /** Forward-compat passthrough (reference `transforms.go:253-310`): a
    * transform this engine doesn't know. Reads are permissive — partition
    * values surface as strings and predicates never project onto the field —
    * but writing through it is an error.
    */
  final case class Unknown(raw: String) extends Transform {
    val name = raw
    def toColumn(src: Column, t: DataType): Column =
      throw new UnsupportedOperationException(s"cannot write with unknown transform $raw")
    def apply(v: Any, t: DataType): Any =
      throw new UnsupportedOperationException(s"cannot apply unknown transform $raw")
    def resultType(t: DataType): DataType = StringType
  }

  def parse(s: String): Transform = s match {
    case "identity" => Identity
    case "void" => Void
    case "year" => Years
    case "month" => Months
    case "day" => Days
    case "hour" => Hours
    case b if b.startsWith("bucket[") => Bucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
    case t if t.startsWith("truncate[") => Truncate(t.stripPrefix("truncate[").stripSuffix("]").toInt)
    case other => Unknown(other)
  }
}

/** Standard murmur3_x86_32 (public algorithm, Austin Appleby). Spark's own
  * `hash()` uses seed 42 over Spark's internal encoding and is NOT
  * spec-compatible, hence this standalone implementation.
  */
object Murmur3 {
  def hash(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
