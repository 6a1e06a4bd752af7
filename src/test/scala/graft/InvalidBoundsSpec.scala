package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.IcebergTypes._
import graft.format.{DataFile, DataFileContent, FieldSummary, ManifestContent,
  ManifestFile, PartitionSpec}

/** Malformed stat bounds must degrade conservatively, never silently misread
  * (reference `table/evaluators_invalid_bounds_test.go`): a bound whose byte
  * length is wrong for its type — corrupt manifest, buggy external committer —
  * keeps the manifest/file in inclusive pruning and proves nothing in the
  * strict evaluator. A silent misread prunes live data; a thrown decode kills
  * the scan. Both are worse than reading one extra file.
  */
class InvalidBoundsSpec extends AnyFunSuite {

  private val malformed = Array[Byte](1, 2, 3, 4, 5) // 5 bytes for fixed(4)/int

  private def dataFile(ft: IcebergType, lo: Array[Byte], hi: Array[Byte],
      nulls: Long = 0L): DataFile =
    DataFile(DataFileContent.Data, "/f.parquet", "PARQUET", Nil, 100L, 1024L,
      valueCounts = Map(1 -> 100L), nullCounts = Map(1 -> nulls),
      lowerBounds = Map(1 -> lo), upperBounds = Map(1 -> hi))

  test("manifest evaluator keeps the manifest on malformed fixed bounds") {
    val schema = IcebergSchema(Seq(NestedField(1, "value", FixedT(4), required = true)))
    val spec = PartitionSpec.builder(schema).add("value", Transforms.Identity).build()
    val m = ManifestFile("/m.avro", 1L, spec.specId, ManifestContent.Data,
      1L, 1L, 1L, 1, 0, 0, 100L, 0L, 0L,
      partitions = Seq(FieldSummary(containsNull = false, containsNan = None,
        lowerBound = Some(malformed), upperBound = Some(malformed))))
    val expr = Expr.eq("value", Array[Byte](1, 2, 3, 4))
    assert(Evaluators.manifestMightMatch(schema, spec, expr, m))
  }

  test("inclusive metrics evaluator keeps the file on malformed bounds") {
    val fixedSchema = IcebergSchema(Seq(NestedField(1, "value", FixedT(4), required = true)))
    val f = dataFile(FixedT(4), malformed, malformed)
    assert(Evaluators.fileMightMatch(fixedSchema, Expr.eq("value", Array[Byte](1, 2, 3, 4)), f))

    // an int bound with 5 bytes would silently misread through a 4-byte
    // LE window; it must instead be ignored (file kept)
    val intSchema = IcebergSchema(Seq(NestedField(1, "value", IntT, required = true)))
    val fi = dataFile(IntT, malformed, malformed)
    assert(Evaluators.fileMightMatch(intSchema, Expr.eq("value", 7), fi))
    assert(Evaluators.fileMightMatch(intSchema, Expr.lt("value", -1000000), fi))
  }

  test("strict evaluator does not prove a match from malformed bounds") {
    val schema = IcebergSchema(Seq(NestedField(1, "value", FixedT(4), required = true)))
    val f = dataFile(FixedT(4), malformed, malformed)
    assert(!Evaluators.fileMustMatch(schema,
      Expr.rewriteNot(Expr.eq("value", Array[Byte](1, 2, 3, 4))), f))
  }

  test("well-formed bounds still prune (the check is not a blanket keep)") {
    val intSchema = IcebergSchema(Seq(NestedField(1, "value", IntT, required = true)))
    val lo = Literals.encode(IntT, 10)
    val hi = Literals.encode(IntT, 20)
    val f = dataFile(IntT, lo, hi)
    assert(!Evaluators.fileMightMatch(intSchema, Expr.eq("value", 30), f))
    assert(Evaluators.fileMightMatch(intSchema, Expr.eq("value", 15), f))
    assert(Evaluators.fileMustMatch(intSchema,
      Expr.rewriteNot(Expr.lt("value", 21)), f))
  }

  test("decodeChecked accepts promotion-width bounds, rejects the rest") {
    assert(Literals.decodeChecked(LongT, Literals.encode(IntT, 7)).contains(7L))
    assert(Literals.decodeChecked(DoubleT, Literals.encode(FloatT, 1.5f)).contains(1.5))
    assert(Literals.decodeChecked(IntT, Array[Byte](1, 2)).isEmpty)
    assert(Literals.decodeChecked(LongT, Array.fill[Byte](6)(1)).isEmpty)
    assert(Literals.decodeChecked(UuidT, Array.fill[Byte](15)(1)).isEmpty)
    assert(Literals.decodeChecked(BooleanT, Array[Byte](1, 0)).isEmpty)
  }
}
