package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Murmur3, Transforms}
import graft.core.Transforms._
import org.apache.spark.sql.types._

/** Transform semantics vs the Iceberg spec's published test vectors
  * (spec Appendix B "32-bit Hash Requirements"; reference mirrors them in
  * `transforms_test.go`).
  */
class TransformsSpec extends AnyFunSuite {

  private def hashLong(v: Long): Int = {
    val bytes = new Array[Byte](8)
    var i = 0; var x = v
    while (i < 8) { bytes(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    Murmur3.hash(bytes, 0)
  }

  test("spec hash vectors: int/long") {
    assert(hashLong(34L) === 2017239379)
  }

  test("spec hash vectors: date 2017-11-16 (17486 days)") {
    assert(hashLong(17486L) === -653330422)
  }

  test("spec hash vectors: time 22:31:08 (81068000000 µs)") {
    assert(hashLong(81068000000L) === -662762989)
  }

  test("spec hash vectors: timestamp 2017-11-16T22:31:08 (µs)") {
    assert(hashLong(1510871468000000L) === -2047944441)
  }

  test("spec hash vectors: string 'iceberg'") {
    assert(Murmur3.hash("iceberg".getBytes("UTF-8"), 0) === 1210000089)
  }

  test("spec hash vectors: binary 00 01 02 03") {
    assert(Murmur3.hash(Array[Byte](0, 1, 2, 3), 0) === -188683207)
  }

  test("spec hash vectors: decimal 14.20 (unscaled 1420 minimal bytes)") {
    val unscaled = java.math.BigDecimal.valueOf(1420, 2).unscaledValue.toByteArray
    assert(Murmur3.hash(unscaled, 0) === -500754589)
  }

  test("spec hash vectors: uuid f79c3e09-677c-4bbd-a479-3f349cb785e7") {
    val uuid = java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    assert(Murmur3.hash(bb.array, 0) === 1488055340)
  }

  test("bucket transform applies (hash & MaxInt) % n") {
    assert(Bucket(16).apply(34, IntegerType) === (2017239379 & Int.MaxValue) % 16)
    assert(Bucket(8).apply("iceberg", StringType) === (1210000089 & Int.MaxValue) % 8)
  }

  test("truncate int floors toward -inf") {
    assert(Truncate(10).apply(1, IntegerType) === 0)
    assert(Truncate(10).apply(-1, IntegerType) === -10)
    assert(Truncate(10).apply(-10, IntegerType) === -10)
    assert(Truncate(10).apply(-11, IntegerType) === -20)
    assert(Truncate(10).apply(11L, LongType) === 10L)
  }

  test("truncate decimal on unscaled value (spec: 10.65 trunc 50 -> 10.50)") {
    val v = new java.math.BigDecimal("10.65")
    assert(Truncate(50).apply(v, DecimalType(4, 2)) === new java.math.BigDecimal("10.50"))
  }

  test("truncate string takes first W codepoints") {
    assert(Truncate(3).apply("iceberg", StringType) === "ice")
    assert(Truncate(10).apply("ice", StringType) === "ice")
    // astral codepoint counts as one
    assert(Truncate(2).apply("😀x", StringType) === "😀x".substring(0, 3))
  }

  test("time transforms floor toward -inf pre-1970") {
    val d1969 = java.time.LocalDate.of(1969, 12, 31)
    assert(Years.apply(d1969, DateType) === -1)
    assert(Months.apply(d1969, DateType) === -1)
    assert(Days.apply(d1969, DateType) === -1)
    val d1970 = java.time.LocalDate.of(1970, 1, 1)
    assert(Years.apply(d1970, DateType) === 0)
    assert(Months.apply(d1970, DateType) === 0)
    val ts = java.sql.Timestamp.valueOf("2017-12-01 10:30:00")
    assert(Years.apply(ts, TimestampType) === 47)
    assert(Months.apply(ts, TimestampType) === (2017 - 1970) * 12 + 11)
  }

  test("transform parse round-trip") {
    assert(Transforms.parse("bucket[16]") === Bucket(16))
    assert(Transforms.parse("truncate[4]") === Truncate(4))
    assert(Transforms.parse("day") === Days)
    assert(Transforms.parse("identity") === Identity)
  }

  test("ns-timestamp sources floor-divide to µs for time transforms only") {
    import graft.core.IcebergTypes._
    val dayNs = 86400000000000L
    // 1970-01-02T00:00:00.000000500 ns -> day 1
    assert(Transforms.valueFor(Days, dayNs + 500L, TimestampNsT) === 86400000000L)
    assert(Days.apply(Transforms.valueFor(Days, dayNs + 500L, TimestampNsT),
      org.apache.spark.sql.types.TimestampType) === 1)
    // pre-1970 floors toward -inf: 500ns before epoch is day -1, hour -1
    assert(Transforms.valueFor(Hours, -500L, TimestampTzNsT) === -1L)
    assert(Days.apply(Transforms.valueFor(Days, -500L, TimestampNsT),
      org.apache.spark.sql.types.TimestampType) === -1)
    // identity/bucket keep the raw ns domain
    assert(Transforms.valueFor(Identity, dayNs + 500L, TimestampNsT) === dayNs + 500L)
    assert(Transforms.valueFor(Bucket(8), dayNs + 500L, TimestampNsT) === dayNs + 500L)
    // µs timestamps pass through unchanged
    assert(Transforms.valueFor(Days, 123L, TimestampT) === 123L)
  }
}
