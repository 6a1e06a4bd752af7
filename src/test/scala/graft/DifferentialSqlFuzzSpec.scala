package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core.{SchemaBridge, Transforms}
import graft.format.PartitionSpec
import graft.table.Writer

/** End-to-end differential fuzz: random SQL WHERE clauses run through the
  * full DSv2 route (pushdown → Expr translation → manifest/partition/
  * metrics pruning → parquet scan → residual) must return exactly what
  * plain Spark returns over the raw rows. Ground truth is Spark itself, so
  * every divergence is OURS — a pushdown translation that over-prunes, a
  * partition tuple that doesn't match its filter, a residual that drops or
  * duplicates. The table is deliberately hostile: identity + bucket + year
  * partitions, several files with distinct value ranges, nulls and NaNs in
  * filterable columns.
  */
class DifferentialSqlFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val wh = Files.createTempDirectory("graft-dfuzz").toString
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.g", classOf[graft.sources.GraftSpjCatalog].getName)
    s.conf.set("spark.sql.catalog.g.uri", wh)
    s
  }

  private lazy val raw: DataFrame = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(
      col("l_orderkey").cast("long").as("k"),
      col("l_linenumber").cast("int").as("ln"),
      // qty: doubles with injected NaN and null rows
      when(col("l_orderkey") % 97 === 0, lit(Double.NaN))
        .when(col("l_orderkey") % 89 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity").cast("double")).as("qty"),
      when(col("l_orderkey") % 83 === 0, lit(null).cast("string"))
        .otherwise(col("l_returnflag")).as("flag"),
      col("l_shipdate").as("ship"))
    .cache()

  override def afterAll(): Unit = spark.stop()

  private def buildTable(): Unit = {
    val cat = new HadoopCatalog(wh)
    val schema = SchemaBridge.fromSpark(raw.schema)
    // years (not days/months): finer time grain fans flag×bucket×unit out
    // to thousands of tiny-file partitions × 4 appends and inflates
    // `sbt test` by minutes without adding filter coverage — the
    // temporal-pruning arm only needs SOME time transform in the spec
    val spec = PartitionSpec.builder(schema)
      .add("flag", Transforms.Identity)
      .add("k", Transforms.Bucket(4))
      .add("ship", Transforms.Years)
      .build()
    var t = cat.createTable("dfz", schema, spec)
    // several appends with disjoint key ranges → per-file bounds differ
    Seq(0, 1, 2, 3).foreach { i =>
      t = Writer.append(spark, t, raw.filter(col("k") % 4 === i))
    }
  }

  private val dateLits = Seq("1992-03-15", "1994-01-01", "1995-06-17",
    "1996-12-01", "1998-09-02")
  private val flagLits = Seq("'A'", "'N'", "'R'", "'Z'")

  private def leaf(r: Random): String = r.nextInt(16) match {
    case 0 => s"k ${cmp(r)} ${r.nextInt(6200)}"
    case 1 => s"k IN (${Seq.fill(1 + r.nextInt(3))(r.nextInt(6200)).mkString(",")})"
    case 2 => s"ln ${cmp(r)} ${1 + r.nextInt(7)}"
    case 3 => s"qty ${cmp(r)} ${r.nextInt(55)}.5"
    case 4 => "qty IS NULL"
    case 5 => "qty IS NOT NULL"
    case 6 => "isnan(qty)"
    case 7 => "NOT isnan(qty)"
    case 8 => s"flag ${cmp(r)} ${flagLits(r.nextInt(flagLits.size))}"
    case 9 => "flag IS NULL"
    case 10 => "flag IS NOT NULL"
    case 11 => s"flag IN (${flagLits.take(1 + r.nextInt(3)).mkString(",")})"
    case 12 => s"flag LIKE '${Seq("A", "N", "R")(r.nextInt(3))}%'"
    case 13 => s"ship ${cmp(r)} DATE'${dateLits(r.nextInt(dateLits.size))}'"
    case 14 => s"ship = DATE'${dateLits(r.nextInt(dateLits.size))}'"
    case 15 => s"ship NOT IN (DATE'${dateLits(r.nextInt(dateLits.size))}')"
  }
  private def cmp(r: Random): String =
    Seq("=", "<>", "<", "<=", ">", ">=")(r.nextInt(6))

  private def genPred(r: Random, depth: Int): String =
    if (depth == 0) leaf(r)
    else r.nextInt(6) match {
      case 0 => s"(${genPred(r, depth - 1)}) AND (${genPred(r, depth - 1)})"
      case 1 => s"(${genPred(r, depth - 1)}) OR (${genPred(r, depth - 1)})"
      case 2 => s"NOT (${genPred(r, depth - 1)})"
      case _ => leaf(r)
    }

  test("random WHERE clauses agree between the DSv2 route and plain Spark") {
    buildTable()
    val r = new Random(90210L)
    raw.createOrReplaceTempView("dfz_raw")
    var nonEmpty = 0
    (0 until 60).foreach { iter =>
      val pred = genPred(r, 2)
      val agg = "count(*) AS n, coalesce(sum(cast(hash(k, ln, qty, flag, ship) AS BIGINT)), 0) AS h"
      val ours = spark.sql(s"SELECT $agg FROM g.dfz WHERE $pred").head
      val truth = spark.sql(s"SELECT $agg FROM dfz_raw WHERE $pred").head
      assert(ours.getLong(0) === truth.getLong(0),
        s"iter=$iter row count diverged for WHERE $pred")
      assert(ours.getLong(1) === truth.getLong(1),
        s"iter=$iter row content diverged for WHERE $pred")
      if (truth.getLong(0) > 0) nonEmpty += 1
    }
    assert(nonEmpty > 25, s"weak generator: only $nonEmpty non-empty results")
  }

  // the same clause generator AFTER a mixed delete history: CoW rewrite,
  // MoR positional deletes, a v3 deletion vector, and a global equality
  // delete all live on the table at once, so pushdown/pruning/residual
  // interplay WITH delete application gets the plain-Spark ground-truth
  // treatment (MorWalkFuzz checks full contents, never filtered reads)
  test("random WHERE clauses agree after a mixed CoW/pos-delete/DV/eq-delete history") {
    val cat = new HadoopCatalog(wh)
    val schema = SchemaBridge.fromSpark(raw.schema)
    val spec = PartitionSpec.builder(schema)
      .add("flag", Transforms.Identity)
      .add("k", Transforms.Bucket(4))
      .add("ship", Transforms.Years)
      .build()
    var t = cat.createTable("dfzd", schema, spec)
    Seq(0, 1, 2, 3).foreach { i =>
      t = Writer.append(spark, t, raw.filter(col("k") % 4 === i))
    }
    // ground truth mirrors each delete with SQL semantics: DELETE removes
    // rows where the predicate is TRUE; null-valued predicates survive
    var truth = raw
    def erase(sqlPred: String): Unit =
      truth = truth.where(s"NOT coalesce(($sqlPred), false)")

    // 1. MoR positional deletes (v2 parquet pos-delete files)
    t = Writer.deleteWhereMoR(spark, t, graft.core.Expr.eq("ln", 3))
    erase("ln = 3")
    // 2. global equality delete over sampled keys (lower-sequence rows die)
    val rEq = new Random(4242L)
    val eqKeys = Seq.fill(120)(rEq.nextInt(6200).toLong).distinct
    import spark.implicits._
    t = Writer.equalityDelete(spark, t, eqKeys.toDF("k"), Seq("k"))
    erase(s"k IN (${eqKeys.mkString(",")})")
    // 3. v3 upgrade, then a deletion vector (NaN-adjacent predicate: Spark
    //    NaN-sorts-greatest semantics must agree end to end)
    t = graft.table.Evolve.upgradeFormatVersion(t, 3)
    t = Writer.deleteWhereDV(spark, t, graft.core.Expr.gt("qty", 45.0d))
    erase("qty > 45.0D")
    // 4. CoW delete: strict classification rewrites whole files
    t = Writer.deleteWhere(spark, t,
      graft.core.Expr.lt("ship", java.time.LocalDate.parse("1993-01-01")))
    erase("ship < DATE'1993-01-01'")

    val r = new Random(31337L)
    truth.createOrReplaceTempView("dfzd_truth")
    var nonEmpty = 0
    (0 until 60).foreach { iter =>
      val pred = genPred(r, 2)
      val agg = "count(*) AS n, coalesce(sum(cast(hash(k, ln, qty, flag, ship) AS BIGINT)), 0) AS h"
      val ours = spark.sql(s"SELECT $agg FROM g.dfzd WHERE $pred").head
      val want = spark.sql(s"SELECT $agg FROM dfzd_truth WHERE $pred").head
      assert(ours.getLong(0) === want.getLong(0),
        s"iter=$iter row count diverged after deletes for WHERE $pred")
      assert(ours.getLong(1) === want.getLong(1),
        s"iter=$iter row content diverged after deletes for WHERE $pred")
      if (want.getLong(0) > 0) nonEmpty += 1
    }
    assert(nonEmpty > 25, s"weak generator: only $nonEmpty non-empty results")
    // the delete mix is genuinely live on the read path: both MoR delete
    // shapes attach to current scan tasks
    val tasks = cat.loadTable("dfzd").newScan.planFiles()
    assert(tasks.exists(_.eqDeletes.nonEmpty), "eq-deletes attached")
    assert(tasks.exists(_.posDeletes.nonEmpty), "pos-deletes/DVs attached")
  }

  // the same clause generator across a COLUMN-RENAME boundary: half the
  // files were written under the old names, half under the new — filters
  // over the new names must rebind per file by FIELD ID
  // (TranslateColumnNames) for pushdown, metrics pruning, partition
  // projection, and residuals alike; a name-based rebind would silently
  // skip (or mis-prune) the pre-rename files
  test("random WHERE clauses agree across a mid-history column rename") {
    val cat = new HadoopCatalog(wh)
    spark.conf.set("spark.sql.catalog.gr", classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.gr.uri", wh)
    val schema = SchemaBridge.fromSpark(raw.schema)
    val spec = PartitionSpec.builder(schema)
      .add("flag", Transforms.Identity)
      .add("k", Transforms.Bucket(4))
      .add("ship", Transforms.Years)
      .build()
    var t = cat.createTable("dfzr", schema, spec)
    Seq(0, 1).foreach { i =>
      t = Writer.append(spark, t, raw.filter(col("k") % 4 === i))
    }
    spark.sql("ALTER TABLE gr.dfzr RENAME COLUMN flag TO fl")
    spark.sql("ALTER TABLE gr.dfzr RENAME COLUMN k TO kk")
    val renamed = raw.withColumnRenamed("flag", "fl").withColumnRenamed("k", "kk")
    Seq(2, 3).foreach { i =>
      Writer.append(spark, cat.loadTable("dfzr"),
        renamed.filter(col("kk") % 4 === i))
      ()
    }
    renamed.createOrReplaceTempView("dfzr_truth")
    val r = new Random(271828L)
    // generated clauses speak the NEW names ("flag" has no standalone k,
    // so the boundary-anchored k replacement is unambiguous)
    def renamePred(p: String): String =
      p.replace("flag", "fl").replaceAll("\\bk\\b", "kk")
    var nonEmpty = 0
    (0 until 60).foreach { iter =>
      val pred = renamePred(genPred(r, 2))
      val agg = "count(*) AS n, coalesce(sum(cast(hash(kk, ln, qty, fl, ship) AS BIGINT)), 0) AS h"
      val ours = spark.sql(s"SELECT $agg FROM gr.dfzr WHERE $pred").head
      val want = spark.sql(s"SELECT $agg FROM dfzr_truth WHERE $pred").head
      assert(ours.getLong(0) === want.getLong(0),
        s"iter=$iter row count diverged across rename for WHERE $pred")
      assert(ours.getLong(1) === want.getLong(1),
        s"iter=$iter row content diverged across rename for WHERE $pred")
      if (want.getLong(0) > 0) nonEmpty += 1
    }
    assert(nonEmpty > 25, s"weak generator: only $nonEmpty non-empty results")
  }

  // the same clause generator across a PARTITION-SPEC-EVOLUTION boundary:
  // half the files carry (flag, bucket4(k), years(ship)) tuples, half
  // (bucket8(k), days(ship)) — per-spec inclusive projection must prune
  // each manifest under ITS OWN spec (a default-spec-only projection
  // over-prunes or mis-prunes the other population), with a MoR delete
  // spanning the boundary so delete matching crosses specs too
  test("random WHERE clauses agree across a partition-spec-evolution boundary") {
    val cat = new HadoopCatalog(wh)
    val schema = SchemaBridge.fromSpark(raw.schema)
    val spec = PartitionSpec.builder(schema)
      .add("flag", Transforms.Identity)
      .add("k", Transforms.Bucket(4))
      .add("ship", Transforms.Years)
      .build()
    var t = cat.createTable("dfze", schema, spec)
    Seq(0, 1).foreach { i =>
      t = Writer.append(spark, t, raw.filter(col("k") % 4 === i))
    }
    t = graft.table.Evolve.updateSpec(t,
      _.add("k", Transforms.Bucket(8)).add("ship", Transforms.Days))
    Seq(2, 3).foreach { i =>
      t = Writer.append(spark, t, raw.filter(col("k") % 4 === i))
    }
    // a MoR delete planned under the NEW default spec, matching files of
    // BOTH populations
    t = Writer.deleteWhereMoR(spark, t, graft.core.Expr.eq("ln", 5))
    val truth = raw.where("NOT coalesce((ln = 5), false)")
    truth.createOrReplaceTempView("dfze_truth")
    val r = new Random(161803L)
    var nonEmpty = 0
    (0 until 60).foreach { iter =>
      val pred = genPred(r, 2)
      val agg = "count(*) AS n, coalesce(sum(cast(hash(k, ln, qty, flag, ship) AS BIGINT)), 0) AS h"
      val ours = spark.sql(s"SELECT $agg FROM g.dfze WHERE $pred").head
      val want = spark.sql(s"SELECT $agg FROM dfze_truth WHERE $pred").head
      assert(ours.getLong(0) === want.getLong(0),
        s"iter=$iter row count diverged across spec evolution for WHERE $pred")
      assert(ours.getLong(1) === want.getLong(1),
        s"iter=$iter row content diverged across spec evolution for WHERE $pred")
      if (want.getLong(0) > 0) nonEmpty += 1
    }
    assert(nonEmpty > 25, s"weak generator: only $nonEmpty non-empty results")
    // both spec populations are live in the final plan
    val specIds = cat.loadTable("dfze").newScan.planFiles().map(_.specId).distinct
    assert(specIds.size === 2, s"expected 2 spec populations, got $specIds")
  }
}
