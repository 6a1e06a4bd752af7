package graft

import java.time.{LocalDate, LocalDateTime}

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.{Transform, Transforms}

/** Writer/pruner transform agreement fuzz: `Transform.toColumn` is what the
  * fanout WRITER executes (Catalyst, codegen) to stamp partition tuples;
  * `Transform.apply` is what the driver-side PRUNING stack evaluates
  * (partition projection literals, partition-value filters, strict
  * transform-space proofs). If the two ever disagree on a value, files are
  * written under one partition and pruned under another — silent row loss
  * with no error anywhere. Reference parity anchor: `transforms.go:360-667`
  * computes both sides from ONE function, a luxury a Spark-native split
  * design doesn't have, so the agreement must be pinned by test instead.
  *
  * Each (transform, source type) pair is checked over curated edge values
  * (epoch boundaries, pre-1970, astral-plane strings, negative decimals)
  * plus seeded-random values, comparing the collected Catalyst result
  * against apply() row by row.
  */
class TransformConsistencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new Random(1408L)

  // ---- value pools (curated edges + random tail)

  // MinValue and MinValue+w-1 (for every tested width w ∈ {1,2,5,16}) sit
  // inside the w-wide underflow window where integer truncate WRAPS — the
  // +2^32 / decimal +2^64 re-wrap branches in Truncate.toColumn
  private def ints: Seq[Any] = Seq(0, 1, -1, 7, -7, Int.MaxValue,
    Int.MinValue, Int.MinValue + 1, Int.MinValue + 4, Int.MinValue + 15, null) ++
    Seq.fill(60)(Int.box(rnd.nextInt()))
  private def longs: Seq[Any] = Seq(0L, 1L, -1L, 86400L, Long.MaxValue,
    Long.MinValue, Long.MinValue + 1, Long.MinValue + 4, Long.MinValue + 15, null) ++
    Seq.fill(60)(Long.box(rnd.nextLong()))
  private def strings: Seq[Any] = Seq("", "a", "ab", "abc", "abcdef",
    "ab😀xy", "😀😁😂", "éàü", "ab cd", null) ++
    Seq.fill(40)(Random.javaRandomToRandom(new java.util.Random(rnd.nextLong()))
      .alphanumeric.take(1 + rnd.nextInt(8)).mkString)
  private def binaries: Seq[Any] = Seq(Array[Byte](), Array[Byte](0), Array[Byte](-1, 0, 1), null) ++
    Seq.fill(40) { val b = new Array[Byte](1 + rnd.nextInt(8)); rnd.nextBytes(b); b }
  private def decimals: Seq[Any] = Seq("0.00", "1.23", "-1.23", "12345.67", "-0.01")
    .map(new java.math.BigDecimal(_)) ++ Seq(null) ++
    Seq.fill(40)(new java.math.BigDecimal(java.math.BigInteger.valueOf(rnd.nextLong() % 100000000L), 2))
  private def dates: Seq[Any] = Seq(
    LocalDate.of(1970, 1, 1), LocalDate.of(1969, 12, 31), LocalDate.of(1970, 12, 31),
    LocalDate.of(1969, 1, 1), LocalDate.of(2024, 2, 29), LocalDate.of(1900, 6, 15), null)
    .map { case d: LocalDate => java.sql.Date.valueOf(d); case null => null } ++
    Seq.fill(40)(java.sql.Date.valueOf(LocalDate.ofEpochDay(rnd.nextInt(40000) - 20000L)))
  private def timestampsNtz: Seq[Any] = Seq(
    LocalDateTime.of(1970, 1, 1, 0, 0, 0),
    LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000),
    LocalDateTime.of(1970, 1, 1, 0, 0, 0, 1000),
    LocalDateTime.of(1969, 12, 31, 0, 0, 1),
    LocalDateTime.of(2024, 2, 29, 23, 0, 0), null) ++
    Seq.fill(40)(LocalDateTime.of(1970, 1, 1, 0, 0, 0)
      .plusSeconds(rnd.nextLong() % 3000000000L).plusNanos((rnd.nextInt(1000000)) * 1000L))
  // tz-aware instants: epoch edges, values whose UTC calendar date differs
  // from the session-local one (the rows a session-tz-sensitive lowering
  // mis-partitions), and a DST-transition morning
  private def timestampsTz: Seq[Any] = Seq(
    java.time.Instant.EPOCH,
    java.time.Instant.EPOCH.minusNanos(1000),
    java.time.Instant.parse("1969-12-31T23:59:59.999999Z"),
    java.time.Instant.parse("2024-01-01T05:00:00Z"),  // 2023-12-31 21:00 in LA
    java.time.Instant.parse("2024-06-30T22:30:00Z"),  // 2024-07-01 04:15 in Kathmandu
    java.time.Instant.parse("2024-03-10T09:59:00Z"),  // PST→PDT jump morning
    java.time.Instant.parse("1901-07-04T12:00:00Z"), null)
    .map { case i: java.time.Instant => java.sql.Timestamp.from(i); case null => null } ++
    Seq.fill(40)(java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusSeconds(rnd.nextLong() % 3000000000L)
        .plusNanos((rnd.nextInt(1000000)) * 1000L)))

  /** Collect toColumn over the pool and compare to apply per row. */
  private def check(tr: Transform, sparkT: DataType, pool: Seq[Any]): Unit = {
    val sch = StructType(Seq(StructField("v", sparkT, nullable = true)))
    val rows = pool.map(v => org.apache.spark.sql.Row(v))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), sch)
    val out = df.select(col("v"), tr.toColumn(col("v"), sparkT).as("t")).collect()
    out.foreach { r =>
      val in = r.get(0)
      val catalyst = r.get(1)
      val driver = tr.apply(in, sparkT)
      val (c, d) = (norm(catalyst), norm(driver))
      assert(c == d,
        s"${tr.name} over $sparkT disagrees on ${render(in)}: " +
        s"catalyst=${render(catalyst)} driver=${render(driver)}")
    }
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => b.toSeq
    case d: java.sql.Date => d.toLocalDate.toEpochDay // Days result as DateType
    case d: LocalDate => d.toEpochDay
    case i: Int => i.toLong
    case l: Long => l
    case d: java.math.BigDecimal => d.stripTrailingZeros
    case bd: BigDecimal => bd.bigDecimal.stripTrailingZeros
    case other => other
  }
  private def render(v: Any): String = v match {
    case b: Array[Byte] => b.mkString("[", ",", "]")
    case other => String.valueOf(other)
  }

  test("bucket[N] agrees between Catalyst and driver for every source type") {
    Seq(1, 2, 8, 128).foreach { n =>
      val b = Transforms.Bucket(n)
      check(b, IntegerType, ints)
      check(b, LongType, longs)
      check(b, StringType, strings)
      check(b, BinaryType, binaries)
      check(b, DateType, dates)
      check(b, TimestampNTZType, timestampsNtz)
      check(b, DecimalType(18, 2), decimals)
    }
  }

  test("truncate[W] agrees between Catalyst and driver for every source type") {
    Seq(1, 2, 5, 16).foreach { w =>
      val t = Transforms.Truncate(w)
      check(t, IntegerType, ints)
      check(t, LongType, longs)
      check(t, StringType, strings)
      check(t, BinaryType, binaries)
      check(t, DecimalType(18, 2), decimals)
    }
  }

  test("date- and ntz-bucket partitioned tables write and prune end-to-end") {
    // before the native date/ntz bucket binding, the fanout writer THREW at
    // analysis (ANSI refuses DATE→BIGINT / NTZ unix_micros) — no gate could
    // exist because the table could never be written
    import spark.implicits._
    import graft.catalog.HadoopCatalog
    import graft.core.{Expr, SchemaBridge}
    import graft.format.PartitionSpec
    import graft.table.{SparkRead, Writer}
    val cat = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-dbk").toString)
    val df = (0 until 300).map { i =>
      (i.toLong, java.sql.Date.valueOf(LocalDate.ofEpochDay(i - 150L)),
        LocalDateTime.of(1970, 1, 1, 0, 0).plusHours(i - 150L))
    }.toDF("id", "d", "ts")
    val schema = SchemaBridge.fromSpark(df.schema)
    val spec = PartitionSpec.builder(schema)
      .add("d", Transforms.Bucket(4)).add("ts", Transforms.Bucket(4)).build()
    val t1 = Writer.append(spark, cat.createTable("dbk", schema, spec), df)
    assert(SparkRead.read(spark, t1.newScan).count() === 300)
    // pruning agrees with what the writer stamped: an equality filter on the
    // source column projects to one bucket and skips the other files
    val probe = LocalDate.ofEpochDay(-3L)
    val (tasks, m) = t1.newScan
      .withFilter(Expr.eq("d", probe)).planFilesWithMetrics()
    assert(m.skippedDataFiles > 0 && tasks.nonEmpty,
      s"bucket(date) pruning: $m")
    val rows = SparkRead.read(spark,
      t1.newScan.withFilter(Expr.eq("d", probe)))
    assert(rows.count() === 1)
    assert(rows.select(col("id")).first().getLong(0) === 147L)
  }

  test("time transforms agree between Catalyst and driver on dates and timestamps") {
    Seq(Transforms.Years, Transforms.Months, Transforms.Days).foreach { tr =>
      check(tr, DateType, dates)
      check(tr, TimestampNTZType, timestampsNtz)
      check(tr, TimestampType, timestampsTz)
    }
    check(Transforms.Hours, TimestampNTZType, timestampsNtz)
    check(Transforms.Hours, TimestampType, timestampsTz)
  }

  test("hour-partitioned NTZ table writes and prunes end-to-end under Kathmandu tz") {
    // the table-level proof for the EpochFloorDiv lowering: before it, the
    // fanout writer stamped NTZ hour partitions shifted by the session tz
    // (+05:45 here), so driver-side partition pruning — which floors the
    // raw local-datetime micros — skipped the very files holding the rows
    import spark.implicits._
    import graft.catalog.HadoopCatalog
    import graft.core.{Expr, SchemaBridge}
    import graft.format.PartitionSpec
    import graft.table.{SparkRead, Writer}
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    try {
      val cat = new HadoopCatalog(
        java.nio.file.Files.createTempDirectory("graft-ntzhr").toString)
      val df = (0 until 240).map { i =>
        (i.toLong, LocalDateTime.of(1970, 1, 1, 0, 30).plusHours(i - 120L))
      }.toDF("id", "ts")
      val schema = SchemaBridge.fromSpark(df.schema)
      val spec = PartitionSpec.builder(schema)
        .add("ts", Transforms.Hours).build()
      val t1 = Writer.append(spark, cat.createTable("ntzhr", schema, spec), df)
      assert(SparkRead.read(spark, t1.newScan).count() === 240)
      // pruning agrees with what the writer stamped: a half-open hour range
      // on the source column projects to exactly the files it should
      val lo = LocalDateTime.of(1970, 1, 1, 3, 0)
      val hi = LocalDateTime.of(1970, 1, 1, 5, 0)
      val scan = t1.newScan.withFilter(Expr.and(
        Expr.gtEq("ts", lo), Expr.lt("ts", hi)))
      val (tasks, m) = scan.planFilesWithMetrics()
      assert(m.skippedDataFiles > 0 && tasks.nonEmpty, s"hour(ntz) pruning: $m")
      val rows = SparkRead.read(spark, scan)
      assert(rows.count() === 2) // 03:30 and 04:30
      assert(rows.selectExpr("id").as[Long].collect().sorted ===
        Array(123L, 124L))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("time and bucket transforms agree under non-UTC session timezones") {
    // The driver-side apply speaks UTC for instants and the raw local
    // datetime for NTZ; a toColumn lowering that routes through
    // cast(TimestampType)/cast(DateType)/year() on the WRONG source type
    // silently shifts by the session tz — files stamped under one partition,
    // pruned under another. Kathmandu (+05:45) catches hour-level shifts LA
    // (-08:00, whole hours) cannot.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      Seq("America/Los_Angeles", "Asia/Kathmandu").foreach { tz =>
        spark.conf.set("spark.sql.session.timeZone", tz)
        Seq(Transforms.Years, Transforms.Months, Transforms.Days).foreach { tr =>
          check(tr, DateType, dates)
          check(tr, TimestampNTZType, timestampsNtz)
          check(tr, TimestampType, timestampsTz)
        }
        check(Transforms.Hours, TimestampNTZType, timestampsNtz)
        check(Transforms.Hours, TimestampType, timestampsTz)
        val b = Transforms.Bucket(8)
        check(b, DateType, dates)
        check(b, TimestampNTZType, timestampsNtz)
        check(b, TimestampType, timestampsTz)
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
