package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core._

/** Spec variant bounds-object codec + shredded typed_value stats harvest. */
class VariantBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.variant.writeShredding.enabled", "true")
    .config("spark.sql.variant.inferShreddingSchema", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("shredded append harvests typed_value bounds; evaluator prunes on them") {
    import spark.implicits._
    import graft.catalog.HadoopCatalog
    import graft.format.PartitionSpec
    import graft.table.{SparkRead, Writer}
    val cat = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-varb").toString)
    val rows = (0 until 100).map(i => (i.toLong, s"""{"qty": $i, "name": "n$i"}"""))
    val df = rows.toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("props"))
    val schema = SchemaBridge.fromSpark(df.schema)
    // two appends with disjoint qty ranges -> per-file variant bounds
    val t0 = Writer.append(spark,
      cat.createTable("vb", schema, PartitionSpec.Unpartitioned), df.filter(col("id") < 50))
    val t1 = Writer.append(spark, t0, df.filter(col("id") >= 50))
    val propsId = t1.schema.findField("props").get.id
    val files = t1.newScan.planFiles().map(_.file)
    assert(files.size >= 2)
    // every file carries a decodable bounds object for $['qty']
    val ranges = files.map { f =>
      val lo = f.lowerBounds.get(propsId).flatMap(VariantBounds.get(_, "$['qty']"))
      val hi = f.upperBounds.get(propsId).flatMap(VariantBounds.get(_, "$['qty']"))
      assert(lo.isDefined && hi.isDefined, s"missing qty bounds for ${f.path}")
      (lo.get.asInstanceOf[Long], hi.get.asInstanceOf[Long])
    }
    assert(ranges.exists(_._2 < 50) && ranges.exists(_._1 >= 50))
    // string leaf bounds round-trip too
    assert(files.forall(
      _.lowerBounds.get(propsId).flatMap(VariantBounds.get(_, "$['name']")).isDefined))
    // evaluator: variant_get($.qty) >= 50 skips the low file(s)
    val filter = Expr.variantPredicate(Expr.Op.GtEq, "props", "$.qty",
      IcebergTypes.LongT, 50L)
    val (tasks, m) = t1.newScan.withFilter(filter).planFilesWithMetrics()
    assert(m.skippedDataFiles > 0, s"expected variant-bound pruning, got $m")
    assert(tasks.nonEmpty)
    // residual row filter matches the pruned plan
    val ids = SparkRead.read(spark, t1.newScan.withFilter(filter))
      .select("id").as[Long].collect().toSet
    assert(ids === (50L until 100L).toSet)
    // strict evaluator never claims a full match on variant predicates
    assert(!Evaluators.fileMustMatch(t1.schema, filter, files.head))
  }

  test("variant predicate JSON wire round trip") {
    val e = Expr.variantPredicate(Expr.Op.Gt, "props", "$.qty", IcebergTypes.LongT, 7L)
    assert(ExprJson.fromJson(ExprJson.toJson(e)) === e)
  }

  test("bounds object: encode, split, lookup") {
    val bytes = VariantBounds.encode(Seq(
      "$['qty']" -> 5L, "$['score']" -> 1.5, "$['name']" -> "abc", "$['ok']" -> true))
    assert(VariantBounds.get(bytes, "$['qty']") === Some(5L))
    assert(VariantBounds.get(bytes, "$['score']") === Some(1.5))
    assert(VariantBounds.get(bytes, "$['name']") === Some("abc"))
    assert(VariantBounds.get(bytes, "$['ok']") === Some(true))
    assert(VariantBounds.get(bytes, "$['missing']") === None)
    // the bytes are spec variant binary: Spark's own reader parses them
    val (meta, value) = VariantBounds.split(bytes)
    val v = new org.apache.spark.types.variant.Variant(value, meta)
    assert(v.objectSize() === 4)
  }

  test("path normalization") {
    assert(VariantBounds.normalizePath("$.qty") === "$['qty']")
    assert(VariantBounds.normalizePath("$.a.b") === "$['a']['b']")
    assert(VariantBounds.normalizePath("$") === "$")
  }
}
