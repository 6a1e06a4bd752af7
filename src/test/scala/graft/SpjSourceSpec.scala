package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core.{Expr, SchemaBridge, Transforms}
import graft.format.PartitionSpec
import graft.table.Writer

/** Storage-partitioned-join DSv2 source: content correctness, key-grouped
  * plan shape, and the loud-refusal scope guards (identity-only, clean
  * tables only).
  */
class SpjSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = Files.createTempDirectory("graft-spj").toString
  private lazy val catalog = new HadoopCatalog(wh)

  override def afterAll(): Unit = spark.stop()

  private def rd(name: String) = spark.read.format("graft-iceberg-spj")
    .option("catalog", wh).option("table", name).load()

  test("round-trips identity-partitioned content; partitions group by key") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val schema = SchemaBridge.fromSpark(c.schema)
    Writer.append(spark, catalog.createTable("cust_spj", schema,
      PartitionSpec.builder(schema).add("c_nationkey", Transforms.Identity).build()), c)
    val got = rd("cust_spj")
    assert(got.count() === c.count())
    assert(got.agg(sum(col("c_custkey"))).head.getLong(0) ===
      c.agg(sum(col("c_custkey"))).head.getLong(0))
    // one input partition per distinct nation
    assert(got.rdd.getNumPartitions ===
      c.select(col("c_nationkey")).distinct().count())
  }

  test("self-join on the partition key plans without a hash exchange") {
    val j = rd("cust_spj").groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("column pruning reaches the scan; filters prune partitions and rows") {
    val q = rd("cust_spj").filter(col("c_nationkey") === 3)
      .select(col("c_custkey"))
    val got = q.collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_nationkey") === 3).select(col("c_custkey"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    // the scan itself reads only the needed columns...
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).get
    assert(!scanLine.contains("c_name"), scanLine)
    // ...and the partition-key filter pruned the non-matching partitions
    // at plan time (one surviving key-grouped partition)
    assert(q.rdd.getNumPartitions === 1)
  }

  test("bucket tables via the bare provider point at the function catalog") {
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(n.schema)
    Writer.append(spark, catalog.createTable("nat_bucket", schema,
      PartitionSpec.builder(schema).add("n_nationkey", Transforms.Bucket(4)).build()), n)
    // the TableProvider path has no FunctionCatalog, so Spark could never
    // prove co-partitioning — refuse with directions, don't mis-plan
    val e = intercept[Exception](rd("nat_bucket").count())
    assert(e.getMessage.contains("function"))
  }

  test("bucket SPJ through the function catalog: co-bucketed join, no hash exchange") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val cS = SchemaBridge.fromSpark(c.schema)
    val oS = SchemaBridge.fromSpark(o.schema)
    Writer.append(spark, catalog.createTable("cust_b", cS,
      PartitionSpec.builder(cS).add("c_custkey", Transforms.Bucket(8)).build()), c)
    Writer.append(spark, catalog.createTable("ord_b", oS,
      PartitionSpec.builder(oS).add("o_custkey", Transforms.Bucket(8)).build()), o)
    spark.conf.set("spark.sql.catalog.spjcat", classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat.uri", wh)
    val j = spark.table("spjcat.cust_b")
      .join(spark.table("spjcat.ord_b"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_orders"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = c.join(o, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === want.toSeq)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("COUNT/MIN/MAX answer from manifest stats without reading data") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val schema = SchemaBridge.fromSpark(c.schema)
    // nan-counts on: float/double MIN/MAX only push when the writer proved
    // the column NaN-free (parquet bounds exclude NaN)
    Writer.append(spark, catalog.createTable("cust_agg", schema,
      PartitionSpec.builder(schema).add("c_nationkey", Transforms.Identity).build(),
      properties = Map("write.metadata.metrics.nan-counts.enabled" -> "true")), c)
    val q = rd("cust_agg").agg(
      count(lit(1)).as("n"), count(col("c_acctbal")).as("n_bal"),
      min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"),
      min(col("c_custkey")).as("k_lo"), max(col("c_custkey")).as("k_hi"))
    val got = q.collect()(0)
    val want = c.agg(count(lit(1)), count(col("c_acctbal")), min(col("c_acctbal")),
      max(col("c_acctbal")), min(col("c_custkey")), max(col("c_custkey"))).collect()(0)
    assert(got.toSeq === want.toSeq)
    // the scan IS the answer: aggregate pushed completely, no parquet read
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SpjAggScan"), plan)

    // a filtered aggregate must NOT push (our filters are all residual)
    val qf = rd("cust_agg").filter(col("c_nationkey") === 3)
      .agg(count(lit(1)).as("n"))
    val gotF = qf.collect()(0).getLong(0)
    val wantF = c.filter(col("c_nationkey") === 3).count()
    assert(gotF === wantF)
    assert(!qf.queryExecution.executedPlan.toString.contains("SpjAggScan"))
  }

  test("MoR deletes (positional + equality) apply inside SPJ partitions") {
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(n.schema)
    val t1 = Writer.append(spark, catalog.createTable("nat_mor", schema,
      PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()), n)
    Writer.deleteWhereMoR(spark, t1, Expr.eq("n_nationkey", 3))
    // deletes only remove rows, so the key-grouped claim still holds —
    // the scan applies them per-row and stays partition-grouped
    assert(rd("nat_mor").count() === 24)
    assert(rd("nat_mor").filter(col("n_nationkey") === 3).count() === 0)

    // equality deletes: key-set membership filter in the reader
    val t2 = Writer.append(spark, catalog.createTable("nat_eq", schema,
      PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()), n)
    Writer.equalityDelete(spark, t2,
      n.filter(col("n_nationkey") < 2).select(col("n_nationkey")),
      Seq("n_nationkey"))
    assert(rd("nat_eq").count() === 23)
    assert(rd("nat_eq").filter(col("n_nationkey") < 2).count() === 0)
  }

  test("runtime filtering (DPP): a dim-side filter prunes fact files at execution") {
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(n.schema)
    Writer.append(spark, catalog.createTable("dpp_fact", schema,
      PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()), n)
    val region = spark.read.parquet(s"$sf/region.parquet")
    region.createOrReplaceTempView("dpp_region")

    val factFiles = catalog.loadTable("dpp_fact").newScan.planFiles().length
    assert(factFiles === 5, "one file per region partition")

    // broadcast the dim (the suite disables auto-broadcast for SPJ tests);
    // DPP reuses the broadcast result as the pruning subquery
    val joined = rd("dpp_fact").as("f")
      .join(broadcast(region.filter(col("r_name") === "ASIA")).as("r"),
        col("f.n_regionkey") === col("r.r_regionkey"))
    assert(joined.collect().length === 5, "5 nations in ASIA")

    // the executed fact scan must carry runtime filters and read ONE file
    // (inspect the SAME query execution the collect ran — its pruning
    // subquery has a result; a fresh executedPlan would not). AQE wraps
    // subtrees in leaf QueryStageExec nodes — unwrap them explicitly.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def allScans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(joined.queryExecution.executedPlan)
      .filter(_.runtimeFilters.nonEmpty)
    assert(scans.nonEmpty,
      s"no runtime-filtered scan in:\n${joined.queryExecution.executedPlan}")
    // Spark preserves the key-grouped partition COUNT (pruned groups stay
    // as empty partitions), so assert on the planned FILE set instead
    val spjScan = scans.head.scan.asInstanceOf[graft.sources.SpjScan]
    assert(spjScan.plannedFileCount === 1,
      "runtime filter prunes 5 partition files to 1")
  }

  test("anti-join fallback composes with filters, projection, and time travel") {
    import spark.implicits._
    val ctl = "gspj_aj"
    spark.conf.set(s"spark.sql.catalog.$ctl",
      classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$ctl.uri", wh)
    val df = (0L until 2000L).map(i => (i, i % 7, s"v$i")).toDF("id", "g", "v")
    val t1 = Writer.append(spark,
      catalog.createTable("aj", SchemaBridge.fromSpark(df.schema),
        PartitionSpec.Unpartitioned), df.repartition(4))
    val preDeleteSnap = t1.metadata.currentSnapshotId.get
    var t = t1
    (0 until 3).foreach { k =>
      t = Writer.equalityDelete(spark, t,
        df.filter(col("id") % 5 === k).select(col("id")), Seq("id"))
    }
    val saved = spark.conf.getOption("spark.graft.eqDeleteFallbackBytes")
    try {
      spark.conf.set("spark.graft.eqDeleteFallbackBytes", "64")
      // residual filter + pruned projection re-apply above the fallback
      val q = spark.sql(s"SELECT g, count(*) AS n FROM $ctl.aj " +
        "WHERE id >= 1000 GROUP BY g ORDER BY g")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = (1000L until 2000L).filter(_ % 5 > 2).groupBy(_ % 7)
        .map { case (g, xs) => g -> xs.size.toLong }
      assert(got === want)
      assert(q.queryExecution.executedPlan.toString.contains("GraftEqDeleteAntiJoin"))
      // time travel to the pre-delete snapshot: the fallback is never taken
      // (no deletes in that scan) and every row is visible
      val tt = spark.sql(
        s"SELECT count(*) FROM $ctl.aj VERSION AS OF $preDeleteSnap WHERE id >= 0")
      assert(tt.head.getLong(0) === 2000L)
    } finally saved match {
      case Some(x) => spark.conf.set("spark.graft.eqDeleteFallbackBytes", x)
      case None => spark.conf.unset("spark.graft.eqDeleteFallbackBytes")
    }
  }

  test("null partition keys: grouping, aggregation, and joins match plain Spark") {
    import spark.implicits._
    // identity-partitioned on a NULLABLE column: the null rows form their
    // own partition and their own SPJ key group. Nulls group together
    // under GROUP BY, match nothing under =, match each other under <=>
    val df = Seq(
      (1L, Option(10L), "a"), (2L, Option.empty[Long], "b"),
      (3L, Option(10L), "c"), (4L, Option.empty[Long], "d"),
      (5L, Option(20L), "e"), (6L, Option.empty[Long], "f")
    ).toDF("id", "k", "s")
    val schema = SchemaBridge.fromSpark(df.schema)
    Writer.append(spark, catalog.createTable("null_part", schema,
      PartitionSpec.builder(schema).add("k", Transforms.Identity).build()), df)
    val t = rd("null_part")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1))).sorted.toSeq
    val g = t.groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(norm(g.collect()) ===
      norm(df.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()))
    // the grouped aggregate must not need a hash exchange even with a
    // null key group present
    assert(!g.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      g.queryExecution.executedPlan.toString)
    val eq = t.alias("l").join(t.alias("r"), col("l.k") === col("r.k"))
    assert(eq.count() ===
      df.alias("l").join(df.alias("r"), col("l.k") === col("r.k")).count())
    val nsf = t.alias("l").join(t.alias("r"), col("l.k") <=> col("r.k"))
    assert(nsf.count() ===
      df.alias("l").join(df.alias("r"), col("l.k") <=> col("r.k")).count())
  }
}
