package graft

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.{BeforeAndAfterAll, Retries}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.tagobjects.Retryable

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.streaming.IcebergSink
import graft.table.{SparkRead, Writer}

/** Structured Streaming SOURCE over an Iceberg table (SURVEY §2.8): initial
  * load, incremental append batches, snapshot-paced triggers, checkpoint
  * restart exactly-once, and the symmetric V1 sink format.
  *
  * Streaming tests race the engine's trigger thread against wall-clock on
  * a shared box, so each test is `Retryable` (retry once) with
  * per-attempt UNIQUE table/query names — a genuine regression still
  * fails twice; a loaded-box timing hiccup doesn't fail the suite.
  */
class StreamingSourceSpec extends AnyFunSuite with BeforeAndAfterAll with Retries {

  override def withFixture(test: NoArgTest) =
    if (isRetryable(test)) withRetry { super.withFixture(test) }
    else super.withFixture(test)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val warehouse = Files.createTempDirectory("graft-stsrc").toString
  private lazy val catalog = new HadoopCatalog(warehouse)

  override def afterAll(): Unit = spark.stop()

  private def tok(): String = UUID.randomUUID().toString.take(8)

  private def rows(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"p$i")).toDF("id", "payload")
  }

  private def createWith(name: String, ids: Long*): Unit = {
    val df = rows(ids: _*)
    val t = catalog.createTable(name, SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned)
    Writer.append(spark, t, df)
    ()
  }

  private def sourceDf(name: String, extra: (String, String)*): DataFrame = {
    val r = spark.readStream.format("graft-iceberg")
      .option("catalog", warehouse).option("table", name)
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  test("initial full-table batch, then incremental append batches", Retryable) {
    val (src, mem) = (s"src_a_${tok()}", s"mem_a_${tok()}")
    createWith(src, 1L, 2L, 3L)
    val q = sourceDf(src).writeStream
      .format("memory").queryName(mem)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(mem).count() === 3) // initial snapshot state
      Writer.append(spark, catalog.loadTable(src), rows(4L, 5L))
      q.processAllAvailable()
      val got = spark.table(mem).select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === Seq(1L, 2L, 3L, 4L, 5L)) // delta only, no re-read
    } finally q.stop()
  }

  test("max-snapshots-per-trigger paces the backlog one snapshot per batch", Retryable) {
    val (src, mem) = (s"src_b_${tok()}", s"mem_b_${tok()}")
    createWith(src, 1L)
    val s1 = catalog.loadTable(src).metadata.currentSnapshotId.get
    Writer.append(spark, catalog.loadTable(src), rows(2L))
    Writer.append(spark, catalog.loadTable(src), rows(3L))
    // AvailableNow + cap=1: the capped drain must run MULTIPLE micro-batches
    // to the endpoint latched at prepare time (FileStreamSource contract)
    val q = sourceDf(src,
        "starting-snapshot-id" -> s1.toString,
        "max-snapshots-per-trigger" -> "1")
      .writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(180000))
      // rows after s1 arrive, each append snapshot in its own micro-batch
      val got = spark.table(mem).select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === Seq(2L, 3L))
      assert(q.recentProgress.count(_.numInputRows > 0) === 2)
    } finally q.stop()
  }

  test("checkpoint restart resumes from committed offset exactly-once", Retryable) {
    val (src, dst) = (s"src_c_${tok()}", s"dst_c_${tok()}")
    createWith(src, 1L, 2L)
    catalog.createTable(dst,
      SchemaBridge.fromSpark(rows(1L).schema), PartitionSpec.Unpartitioned)
    val ckpt = Files.createTempDirectory("ck").toString
    def run(): Unit = {
      val q = sourceDf(src).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(IcebergSink.append(catalog, dst))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    Writer.append(spark, catalog.loadTable(src), rows(3L))
    run() // restart: must deliver ONLY the new snapshot's rows
    val dstT = SparkRead.read(spark, catalog.loadTable(dst).newScan)
    val got = dstT.select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("writeStream.format(graft-iceberg) V1 sink commits micro-batches", Retryable) {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dst = s"dst_d_${tok()}"
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "payload")
    catalog.createTable(dst, SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned)
    val q = df.writeStream.format("graft-iceberg")
      .option("catalog", warehouse).option("table", dst)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val t = catalog.loadTable(dst)
    assert(SparkRead.read(spark, t.newScan).count() === 3)
    assert(t.metadata.snapshots.size === 2)
  }

  test("deletes and non-append snapshots do not resurrect rows mid-stream", Retryable) {
    val (src, mem) = (s"src_e_${tok()}", s"mem_e_${tok()}")
    createWith(src, 1L, 2L, 3L, 4L)
    val q = sourceDf(src).writeStream
      .format("memory").queryName(mem)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(mem).count() === 4)
      // a CoW delete rewrites surviving rows into new files — those files
      // must NOT stream as fresh appends
      val t = catalog.loadTable(src)
      Writer.deleteWhere(spark, t, Expr.eq("id", 2L))
      Writer.append(spark, catalog.loadTable(src), rows(5L))
      q.processAllAvailable()
      val got = spark.table(mem).select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }
}
