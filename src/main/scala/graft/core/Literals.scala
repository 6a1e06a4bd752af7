package graft.core

import java.math.BigInteger
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import IcebergTypes._

/** Single-value (de)serialization for manifest lower/upper bounds — the
  * spec's little-endian binary encoding (reference: `literals.go:138-245`).
  * Values decode to the same JVM types the Spark row readers use:
  * Int/Long/Float/Double/Boolean/String/Array[Byte]/BigDecimal, with
  * date/time/timestamp as their underlying int/long ordinals (days/µs).
  */
object Literals {

  def encode(t: IcebergType, v: Any): Array[Byte] = t match {
    case BooleanT => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case IntT | DateT =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(toInt(v)).array
    case LongT | TimeT | TimestampT | TimestampTzT | TimestampNsT | TimestampTzNsT =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(toLong(v)).array
    case FloatT =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(v.asInstanceOf[Float]).array
    case DoubleT =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v.asInstanceOf[Double]).array
    case StringT => v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
    // geo bounds are pre-encoded envelope points (see Geo.encodeBound) — raw passthrough
    case BinaryT | FixedT(_) | GeometryT(_) | GeographyT(_, _) => v.asInstanceOf[Array[Byte]]
    case UuidT =>
      val u = v match {
        case u: java.util.UUID => u
        case s: String => java.util.UUID.fromString(s)
      }
      ByteBuffer.allocate(16).putLong(u.getMostSignificantBits)
        .putLong(u.getLeastSignificantBits).array
    case DecimalT(_, _) =>
      val bd = v match {
        case b: java.math.BigDecimal => b
        case b: BigDecimal => b.bigDecimal
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      }
      bd.unscaledValue.toByteArray // minimal two's-complement big-endian
    case other => throw new IllegalArgumentException(s"cannot encode $other")
  }

  /** Length-validated decode for stats-pruning paths (reference
    * `table/evaluators_invalid_bounds_test.go`: a bound whose byte length
    * is wrong for its type — a corrupt manifest or a buggy external
    * committer — must degrade to "no bound", never to a silently-misread
    * value that prunes live data). Returns None when the bytes cannot be a
    * spec encoding of `t`; widened encodings that real promotion produces
    * (int-width bounds on long/double columns) stay accepted.
    */
  def decodeChecked(t: IcebergType, bytes: Array[Byte]): Option[Any] = {
    if (bytes == null) return None
    val lengthOk = t match {
      case BooleanT => bytes.length == 1
      case IntT | DateT | FloatT => bytes.length == 4
      case LongT | TimeT | TimestampT | TimestampTzT | TimestampNsT |
           TimestampTzNsT | DoubleT =>
        bytes.length == 8 || bytes.length == 4 // 4 = pre-promotion bound
      case UuidT => bytes.length == 16
      case FixedT(n) => bytes.length == n
      case DecimalT(_, _) => bytes.length >= 1
      case _ => true
    }
    if (!lengthOk) None
    else scala.util.Try(decode(t, bytes)).toOption
  }

  def decode(t: IcebergType, bytes: Array[Byte]): Any = {
    if (bytes == null) return null
    t match {
      case BooleanT => bytes(0) != 0
      case IntT | DateT =>
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt
      case LongT | TimeT | TimestampT | TimestampTzT | TimestampNsT | TimestampTzNsT =>
        // manifests may carry int bounds for long columns after promotion
        if (bytes.length == 4)
          ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong
        else ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong
      case FloatT => ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat
      case DoubleT =>
        if (bytes.length == 4)
          ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat.toDouble
        else ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getDouble
      case StringT => new String(bytes, StandardCharsets.UTF_8)
      case BinaryT | FixedT(_) | GeometryT(_) | GeographyT(_, _) => bytes
      case UuidT =>
        val bb = ByteBuffer.wrap(bytes)
        new java.util.UUID(bb.getLong, bb.getLong).toString
      case DecimalT(_, s) =>
        new java.math.BigDecimal(new BigInteger(bytes), s)
      case other => throw new IllegalArgumentException(s"cannot decode $other")
    }
  }

  private def toInt(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000
  }

  /** Three-way compare of decoded literal values; nulls first. */
  def compare(t: IcebergType, a: Any, b: Any): Int = {
    if (a == null && b == null) return 0
    if (a == null) return -1
    if (b == null) return 1
    t match {
      case BooleanT => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case IntT | DateT => java.lang.Long.compare(num(a), num(b))
      case LongT | TimeT | TimestampT | TimestampTzT | TimestampNsT | TimestampTzNsT =>
        java.lang.Long.compare(num(a), num(b))
      case FloatT | DoubleT => java.lang.Double.compare(dnum(a), dnum(b))
      case StringT => a.asInstanceOf[String].compareTo(b.asInstanceOf[String])
      case BinaryT | FixedT(_) =>
        unsignedCompare(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      case UuidT => a.toString.compareTo(b.toString)
      case DecimalT(_, _) => bd(a).compareTo(bd(b))
      case other => throw new IllegalArgumentException(s"cannot compare $other")
    }
  }

  private def num(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000
  }

  private def dnum(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
    case other => num(other).toDouble
  }

  private def bd(v: Any): java.math.BigDecimal = v match {
    case b: java.math.BigDecimal => b
    case b: BigDecimal => b.bigDecimal
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case s: String => new java.math.BigDecimal(s)
  }

  def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val cmp = Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  // ------------------------------------------------- bound truncation (write)

  /** Truncate a lower bound to `len` UTF-8 characters (safe: truncation only
    * lowers a lower bound). Reference: `table/internal/parquet_files.go`.
    */
  def truncateLower(s: String, len: Int): String =
    if (s.codePointCount(0, s.length) <= len) s
    else s.substring(0, s.offsetByCodePoints(0, len))

  /** Truncate an upper bound to `len` characters and increment the last
    * codepoint so the result still upper-bounds the original. Returns None if
    * no valid increment exists (all max codepoints).
    */
  def truncateUpper(s: String, len: Int): Option[String] = {
    if (s.codePointCount(0, s.length) <= len) return Some(s)
    val prefix = s.substring(0, s.offsetByCodePoints(0, len))
    val cps = prefix.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) != Character.MAX_CODE_POINT) {
        val bumped = cps.take(i) :+ (cps(i) + 1)
        return Some(new String(bumped, 0, bumped.length))
      }
      i -= 1
    }
    None
  }
}
