package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.core.IcebergBucket

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so plain `spark.sql` users get
  * spec-correct behavior (Spark's own `hash()` is murmur3 seed 42 over its
  * internal encoding — NOT the Iceberg bucket hash).
  *
  * Enable with:
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * SQL: `iceberg_bucket(n, col)` — col pre-normalized per the transform
  * contract (long/string/binary/decimal).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (children: Seq[Expression]) => children match {
        case Seq(Literal(n: Int, IntegerType), child) => IcebergBucket(child, n)
        case _ => throw new IllegalArgumentException(
          "usage: iceberg_bucket(<int literal n>, col)")
      }))
  }
}
