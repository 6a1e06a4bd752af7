package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.IcebergTypes._
import graft.format.{DataFile, DataFileContent}

/** Strict metrics evaluator — the rowsMustMatch dual (reference
  * `table/evaluators.go:1290-1683`). False positives here would drop live
  * rows in metadata-only deletes, so each rule is pinned.
  */
class StrictEvaluatorSpec extends AnyFunSuite {

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "seg", StringT, required = false),
    NestedField(3, "score", DoubleT, required = false)))

  private def file(
      lower: Map[Int, Any] = Map.empty, upper: Map[Int, Any] = Map.empty,
      valueCounts: Map[Int, Long] = Map.empty, nullCounts: Map[Int, Long] = Map.empty,
      nanCounts: Map[Int, Long] = Map.empty, records: Long = 100): DataFile = {
    def enc(m: Map[Int, Any]): Map[Int, Array[Byte]] = m.map { case (id, v) =>
      id -> Literals.encode(schema.idToField(id).fieldType, v)
    }
    DataFile(DataFileContent.Data, "/f.parquet", "PARQUET", Nil, records, 1024,
      valueCounts = valueCounts, nullCounts = nullCounts, nanCounts = nanCounts,
      lowerBounds = enc(lower), upperBounds = enc(upper))
  }

  private def must(e: Expr, f: DataFile): Boolean =
    Evaluators.fileMustMatch(schema, Expr.rewriteNot(e), f)

  test("eq must-match only when lower == v == upper and no nulls") {
    val single = file(lower = Map(2 -> "BUILDING"), upper = Map(2 -> "BUILDING"),
      valueCounts = Map(2 -> 100L), nullCounts = Map(2 -> 0L))
    assert(must(Expr.eq("seg", "BUILDING"), single))
    assert(!must(Expr.eq("seg", "MACHINERY"), single))
    val range = file(lower = Map(2 -> "AUTO"), upper = Map(2 -> "BUILDING"),
      nullCounts = Map(2 -> 0L))
    assert(!must(Expr.eq("seg", "BUILDING"), range))
    val withNulls = file(lower = Map(2 -> "BUILDING"), upper = Map(2 -> "BUILDING"),
      valueCounts = Map(2 -> 100L), nullCounts = Map(2 -> 5L))
    assert(!must(Expr.eq("seg", "BUILDING"), withNulls))
  }

  test("range ops use the opposite bound from the inclusive evaluator") {
    val f = file(lower = Map(1 -> 10L), upper = Map(1 -> 20L), nullCounts = Map(1 -> 0L))
    assert(must(Expr.lt("id", 21L), f))
    assert(!must(Expr.lt("id", 20L), f))
    assert(must(Expr.ltEq("id", 20L), f))
    assert(must(Expr.gt("id", 9L), f))
    assert(!must(Expr.gt("id", 10L), f))
    assert(must(Expr.gtEq("id", 10L), f))
  }

  test("notEq / notIn require the value(s) fully outside the bounds") {
    val f = file(lower = Map(1 -> 10L), upper = Map(1 -> 20L), nullCounts = Map(1 -> 0L))
    assert(must(Expr.notEq("id", 25L), f))
    assert(!must(Expr.notEq("id", 15L), f))
    assert(must(Expr.notIn("id", Seq(5L, 25L)), f))
    assert(!must(Expr.notIn("id", Seq(5L, 15L)), f))
  }

  test("null and nan predicates") {
    val allNull = file(valueCounts = Map(2 -> 50L), nullCounts = Map(2 -> 50L))
    assert(must(Expr.isNull("seg"), allNull))
    assert(!must(Expr.notNull("seg"), allNull))
    val noNull = file(lower = Map(2 -> "A"), upper = Map(2 -> "Z"),
      valueCounts = Map(2 -> 50L), nullCounts = Map(2 -> 0L))
    assert(must(Expr.notNull("seg"), noNull))
    // doubles: missing nan counts block strict value predicates
    val d = file(lower = Map(3 -> 1.0), upper = Map(3 -> 2.0), nullCounts = Map(3 -> 0L))
    assert(!must(Expr.lt("score", 5.0), d))
    val dSafe = file(lower = Map(3 -> 1.0), upper = Map(3 -> 2.0),
      nullCounts = Map(3 -> 0L), nanCounts = Map(3 -> 0L))
    assert(must(Expr.lt("score", 5.0), dSafe))
  }

  test("empty file vacuously must-match; missing stats never must-match") {
    assert(must(Expr.eq("seg", "X"), file(records = 0)))
    assert(!must(Expr.eq("seg", "X"), file())) // no bounds/counts
  }

  test("in requires a single-valued file inside the set") {
    val single = file(lower = Map(1 -> 7L), upper = Map(1 -> 7L), nullCounts = Map(1 -> 0L))
    assert(must(Expr.in("id", Seq(5L, 7L)), single))
    assert(!must(Expr.in("id", Seq(5L, 6L)), single))
    val range = file(lower = Map(1 -> 5L), upper = Map(1 -> 7L), nullCounts = Map(1 -> 0L))
    assert(!must(Expr.in("id", Seq(5L, 6L, 7L)), range))
  }

  test("transform predicates strict-match when the whole bound range satisfies them") {
    // day(ts): µs timestamps 1970-01-05T06:00 .. 1970-01-05T18:00 — all day 4
    val tsSchema = IcebergSchema(Seq(
      NestedField(1, "id", LongT, required = true),
      NestedField(5, "ts", TimestampT, required = false)))
    val day4lo = 4L * 86400000000L + 6L * 3600000000L
    val day4hi = 4L * 86400000000L + 18L * 3600000000L
    def tsFile(nulls: Long) = DataFile(DataFileContent.Data, "/t.parquet", "PARQUET",
      Nil, 100, 1024,
      valueCounts = Map(5 -> 100L), nullCounts = Map(5 -> nulls),
      lowerBounds = Map(5 -> Literals.encode(TimestampT, day4lo)),
      upperBounds = Map(5 -> Literals.encode(TimestampT, day4hi)))
    import org.apache.spark.sql.types.TimestampType
    def tp(op: Expr.Op, lit: Any) =
      Expr.TransformPredicate(op, Transforms.Days, "ts", TimestampType, Seq(lit))
    val f = tsFile(nulls = 0L)
    // the whole file is day 4: eq(4) and lt(5) are proven, eq(5)/lt(4) are not
    assert(Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.Eq, 4), f))
    assert(Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.Lt, 5), f))
    assert(Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.GtEq, 4), f))
    assert(Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.NotEq, 9), f))
    assert(Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.In, 4), f))
    assert(!Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.Eq, 5), f))
    assert(!Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.Lt, 4), f))
    assert(!Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.NotEq, 4), f))
    // nulls block every strict transform proof
    assert(!Evaluators.fileMustMatch(tsSchema, tp(Expr.Op.Eq, 4), tsFile(nulls = 1L)))
    // non-order-preserving transforms never strict-match
    assert(!Evaluators.fileMustMatch(tsSchema,
      Expr.TransformPredicate(Expr.Op.Eq, Transforms.Bucket(8), "ts",
        TimestampType, Seq(3)), f))
  }

  test("geo columns: value predicates never strict-match, null predicates use counts") {
    val geoSchema = IcebergSchema(Seq(
      NestedField(1, "id", LongT, required = true),
      NestedField(4, "geom", GeometryT(), required = false)))
    // file carries envelope bounds — an ordering compare on them would throw
    val env = Geo.encodeBound(0.0, 0.0)
    val f = DataFile(DataFileContent.Data, "/g.parquet", "PARQUET", Nil, 10, 1024,
      valueCounts = Map(4 -> 10L), nullCounts = Map(4 -> 0L),
      lowerBounds = Map(4 -> env), upperBounds = Map(4 -> env))
    // must not throw, must not claim a strict match
    assert(!Evaluators.fileMustMatch(geoSchema, Expr.eq("geom", env), f))
    assert(!Evaluators.fileMustMatch(geoSchema, Expr.lt("geom", env), f))
    // null predicates remain provable from counts
    assert(Evaluators.fileMustMatch(geoSchema, Expr.notNull("geom"), f))
    val allNull = DataFile(DataFileContent.Data, "/g2.parquet", "PARQUET", Nil, 10, 1024,
      valueCounts = Map(4 -> 10L), nullCounts = Map(4 -> 10L))
    assert(Evaluators.fileMustMatch(geoSchema, Expr.isNull("geom"), allNull))
    assert(!Evaluators.fileMustMatch(geoSchema, Expr.notNull("geom"), allNull))
    // inclusive side: IsNull/NotNull prune from counts on geo too
    assert(!Evaluators.fileMightMatch(geoSchema, Expr.isNull("geom"), f))
    assert(!Evaluators.fileMightMatch(geoSchema, Expr.notNull("geom"), allNull))
    assert(Evaluators.fileMightMatch(geoSchema, Expr.eq("geom", env), f))
  }
}
