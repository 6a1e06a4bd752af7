package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.core.IcebergBucket
import graft.functions.{DotProduct, TopKByScore}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so plain `spark.sql` users get
  * spec-correct behavior (Spark's own `hash()` is murmur3 seed 42 over its
  * internal encoding — NOT the Iceberg bucket hash).
  *
  * Enable with:
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * SQL surface:
  *  - `iceberg_bucket(n, col)` — col pre-normalized per the transform
  *    contract (long/string/binary/decimal)
  *  - `dot_product(a, b)` — codegen'd float/double array dot product
  *  - `top_k_by_score(score, id, k)` — bounded exact top-k aggregate,
  *    (score desc, id asc), only k entries per map task cross the shuffle
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL views over V2 ViewCatalogs. View DDL must be claimed at PARSE
    // time: ResolveSessionCatalog throws MISSING_CATALOG_ABILITY.VIEWS for
    // any non-session catalog and runs before injected resolution rules.
    // Reads are claimed by a resolution rule (unknown relations stay
    // unresolved, so running late is safe).
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftViewSqlParser(session, delegate))
    ext.injectResolutionRule(session => graft.plans.ResolveGraftViews(session))
    ext.injectFunction((
      new FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (children: Seq[Expression]) => children match {
        case Seq(Literal(n: Int, IntegerType), child) => IcebergBucket(child, n)
        case _ => throw new IllegalArgumentException(
          "usage: iceberg_bucket(<int literal n>, col)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("usage: dot_product(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (children: Seq[Expression]) => children match {
        case Seq(score, id, Literal(k: Int, IntegerType)) =>
          TopKByScore(score, id, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "usage: top_k_by_score(score, id, <int literal k>)")
      }))
  }
}
