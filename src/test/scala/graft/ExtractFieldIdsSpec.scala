package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DateType, LongType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.IcebergTypes._

/** ExtractFieldIDs parity (reference `visitors.go:482-531`): the ID-set fold
  * over a bound expression tree that feeds the projection union
  * (`table/arrow_scanner.go:713-733`) — projected columns ∪ filter columns.
  * A dropped ID starves the residual filter of its column; a phantom ID
  * defeats pruning. Every node shape is pinned.
  */
class ExtractFieldIdsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "seg", StringT, required = false),
    NestedField(3, "ship_date", DateT, required = false),
    NestedField(4, "info", StructT(Seq(
      NestedField(5, "nk", LongT, required = false),
      NestedField(6, "name", StringT, required = false))), required = false),
    NestedField(7, "geom", GeometryT(), required = false),
    NestedField(8, "props", VariantT, required = false)))

  private def ids(e: Expr): Set[Int] = Expr.extractFieldIds(e, schema)

  test("constants reference nothing") {
    assert(ids(Expr.AlwaysTrue) === Set.empty)
    assert(ids(Expr.AlwaysFalse) === Set.empty)
  }

  test("single predicate yields its bound field id") {
    assert(ids(Expr.eq("seg", "BUILDING")) === Set(2))
    assert(ids(Expr.isNull("id")) === Set(1))
  }

  test("and/or union both sides; not passes through") {
    assert(ids(Expr.and(Expr.eq("seg", "A"), Expr.gt("id", 5L))) === Set(2, 1))
    assert(ids(Expr.or(Expr.lt("id", 3L), Expr.notNull("ship_date"))) === Set(1, 3))
    assert(ids(Expr.not(Expr.eq("seg", "A"))) === Set(2))
    // duplicate references collapse: it is a set, not a bag
    assert(ids(Expr.and(Expr.gt("id", 1L), Expr.lt("id", 9L))) === Set(1))
  }

  test("nested reference yields the LEAF field id, not the struct's") {
    assert(ids(Expr.eq("info.nk", 42L)) === Set(5))
    assert(ids(Expr.and(Expr.eq("info.nk", 1L), Expr.eq("info.name", "x")))
      === Set(5, 6))
  }

  test("transform term references its source column") {
    val tp = Expr.TransformPredicate(Expr.Op.Eq, Transforms.Bucket(16), "id",
      LongType, Seq(3))
    assert(ids(tp) === Set(1))
    val month = Expr.TransformPredicate(Expr.Op.GtEq, Transforms.Months, "ship_date",
      DateType, Seq(326))
    assert(ids(Expr.and(month, Expr.eq("seg", "A"))) === Set(3, 2))
  }

  test("geo and variant predicates reference their column roots") {
    assert(ids(Expr.bboxIntersects("geom", 0, 0, 1, 1)) === Set(7))
    assert(ids(Expr.variantPredicate(Expr.Op.GtEq, "props", "$.qty", LongT, 5L))
      === Set(8))
  }

  test("unbound reference is an error, never a silent drop") {
    val ex = intercept[IllegalArgumentException] {
      ids(Expr.and(Expr.eq("seg", "SECRET-VALUE"), Expr.eq("nope", 1L)))
    }
    assert(ex.getMessage.contains("nope"))
    // error text carries the sanitized shape only — no literal leakage
    assert(!ex.getMessage.contains("SECRET-VALUE"))
  }

  test("case-insensitive extraction resolves through the same bind") {
    assert(Expr.extractFieldIds(Expr.eq("SEG", "A"), schema,
      caseSensitive = false) === Set(2))
    intercept[IllegalArgumentException] {
      Expr.extractFieldIds(Expr.eq("SEG", "A"), schema, caseSensitive = true)
    }
  }

  test("plan-time validation rejects a typo'd filter column") {
    // planFiles must fail fast (reference unbound panic) rather than treat
    // the predicate as might-match and scan everything
    val dir = java.nio.file.Files.createTempDirectory("xfid").toString
    val cat = new graft.catalog.HadoopCatalog(dir)
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "seg")
    val t = graft.table.Writer.append(spark,
      cat.createTable("t", SchemaBridge.fromSpark(df.schema),
        graft.format.PartitionSpec.Unpartitioned), df)
    val ex = intercept[IllegalArgumentException] {
      t.newScan.withFilter(Expr.eq("sgement_typo", "a")).planFiles()
    }
    assert(ex.getMessage.contains("sgement_typo"))
  }
}
