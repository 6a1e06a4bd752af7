package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Expr._

/** REST expression wire-format round trips (reference expr_json.go). */
class ExprJsonSpec extends AnyFunSuite {

  private def roundTrip(e: Expr): Expr = ExprJson.fromJson(ExprJson.toJson(e))

  test("constants serialize as bare booleans") {
    assert(ExprJson.toJson(AlwaysTrue) === "true")
    assert(ExprJson.toJson(AlwaysFalse) === "false")
    assert(roundTrip(AlwaysTrue) === AlwaysTrue)
  }

  test("predicate shapes round trip") {
    val exprs: Seq[Expr] = Seq(
      Expr.eq("a", 5L),
      Expr.lt("b", 1.5),
      Expr.startsWith("s", "pre"),
      Expr.isNull("n"),
      Expr.in("k", Seq(1L, 2L, 3L)),
      Expr.notIn("k", Seq("x", "y")),
      Expr.and(Expr.gt("a", 1L), Expr.or(Expr.eq("b", 2L), Expr.notEq("c", 3L))),
      Not(Expr.eq("z", 0L)))
    exprs.foreach { e =>
      assert(roundTrip(e) === e, ExprJson.toJson(e))
    }
  }

  test("wire op names match the REST spec") {
    assert(ExprJson.toJson(Expr.ltEq("a", 1L)).contains(""""type":"lt-eq""""))
    assert(ExprJson.toJson(Expr.notEq("a", 1L)).contains(""""type":"not-eq""""))
    assert(ExprJson.toJson(Expr.startsWith("a", "x")).contains(""""type":"starts-with""""))
    assert(ExprJson.toJson(Expr.isNull("a")).contains(""""type":"is-null""""))
  }

  test("transform terms round trip with schema-resolved source type") {
    val schema = IcebergSchema(Seq(
      NestedField(1, "ts", IcebergTypes.DateT, required = false)))
    val e = TransformPredicate(Op.Eq, Transforms.Months, "ts",
      org.apache.spark.sql.types.DateType, Seq(326L))
    val json = ExprJson.toJson(e)
    assert(json.contains(""""transform":"month""""))
    val back = ExprJson.fromJson(json, Some(schema))
    assert(back === e)
  }

  test("bbox predicate round trips") {
    val e = Expr.bboxIntersects("geom", 1, 2, 3, 4)
    assert(roundTrip(e) === e)
    assert(roundTrip(Expr.not(e).negate.negate) === Not(e).negate.negate)
  }

  test("sanitize masks literals, keeps structure/refs/arity, serializes") {
    val e = Expr.and(
      Expr.eq("ssn", "123-45-6789"),
      Expr.or(Expr.in("region", Seq("EU", "US", "APAC")), Expr.isNull("email")))
    val s = Expr.sanitize(e)
    val json = ExprJson.toJson(s)
    assert(!json.contains("123-45-6789") && !json.contains("EU") && !json.contains("APAC"))
    assert(json.contains("ssn") && json.contains("region") && json.contains("email"))
    // IN keeps its arity with distinct masks — never collapses to EQ
    s match {
      case And(Predicate(Op.Eq, "ssn", Seq(m)),
          Or(Predicate(Op.In, "region", masks), Predicate(Op.IsNull, "email", _))) =>
        assert(m === Expr.SanitizedLiteralMask)
        assert(masks.size === 3 && masks.distinct.size === 3)
      case other => fail(s"unexpected shape: $other")
    }
    // bbox query boxes collapse to always-true (no wire form, nothing leaks)
    assert(Expr.sanitize(Expr.bboxIntersects("g", 1, 2, 3, 4)) === Expr.AlwaysTrue)
  }

  test("sanitizedString redacts sensitive literals in error text") {
    val msg = Expr.sanitizedString(Expr.eq("api_key", "sk-super-secret"))
    assert(msg.contains("(hash-redacted)"))
    assert(!msg.contains("sk-super-secret"))
    assert(Expr.sanitizedString(Expr.lt("balance", 100)).contains("(number)"))
  }
}
