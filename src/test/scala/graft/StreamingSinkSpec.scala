package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.streaming.IcebergSink
import graft.table.{SparkRead, Writer}

/** Streaming microbatch appends into an Iceberg table: end-to-end through a
  * real writeStream, plus the exactly-once replay contract.
  */
class StreamingSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val catalog = new HadoopCatalog(Files.createTempDirectory("graft-st").toString)

  override def afterAll(): Unit = spark.stop()

  test("writeStream foreachBatch appends microbatches as snapshots") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "payload")
    catalog.createTable("stream_t", SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned)

    val q = df.writeStream
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreachBatch(IcebergSink.append(catalog, "stream_t"))
      .start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    val t = catalog.loadTable("stream_t")
    assert(SparkRead.read(spark, t.newScan).count() === 3)
    assert(t.metadata.snapshots.size === 2) // one per non-empty microbatch
    assert(t.metadata.currentSnapshot.get.summary
      .get(IcebergSink.BatchIdSummaryKey).contains("1"))
    // and the query id is the real streaming query's, not the fallback
    assert(t.metadata.currentSnapshot.get.summary
      .get(IcebergSink.QueryIdSummaryKey).exists(_ != "default"))
  }

  test("replayed batch ids are skipped (exactly-once)") {
    import spark.implicits._
    val df = Seq((10L, "x"), (11L, "y")).toDF("id", "payload")
    catalog.createTable("stream_replay", SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned)
    IcebergSink.appendBatch(catalog, "stream_replay", df, batchId = 0L)
    // restart redelivery of the SAME batch must be a no-op
    IcebergSink.appendBatch(catalog, "stream_replay", df, batchId = 0L)
    IcebergSink.appendBatch(catalog, "stream_replay", df, batchId = 1L)
    val t = catalog.loadTable("stream_replay")
    assert(SparkRead.read(spark, t.newScan).count() === 4)
    assert(t.metadata.snapshots.size === 2)
  }

  test("windowed streaming aggregation lands through the sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), lit(1).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .drop("g")
    catalog.createTable("stream_agg", SchemaBridge.fromSpark(agg.schema),
      PartitionSpec.Unpartitioned)
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ckpt2").toString)
      .foreachBatch(IcebergSink.append(catalog, "stream_agg"))
      .start()
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    input.addData((base, 1.5), (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), 2.5))
    q.processAllAvailable()
    q.stop()
    val rows = SparkRead.read(spark, catalog.loadTable("stream_agg").newScan).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum >= 2)
  }

  test("upsert sink keeps the latest row per key, exactly-once on replay") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    catalog.createTable("stream_ups", SchemaBridge.fromSpark(v1.schema),
      PartitionSpec.Unpartitioned)
    IcebergSink.upsertBatch(catalog, "stream_ups", v1, 0L, Seq("id"))
    // batch 1: update key 2, insert key 3
    val v2 = Seq((2L, "b2"), (3L, "c")).toDF("id", "payload")
    IcebergSink.upsertBatch(catalog, "stream_ups", v2, 1L, Seq("id"))
    // replay of batch 1 must be a no-op
    IcebergSink.upsertBatch(catalog, "stream_ups", v2, 1L, Seq("id"))
    val t = catalog.loadTable("stream_ups")
    val got = SparkRead.read(spark, t.newScan).as[(Long, String)].collect().sorted
    assert(got.toSeq === Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(t.metadata.snapshots.size === 2)
    // empty batch: no snapshot, no high-water-mark regression
    IcebergSink.upsertBatch(catalog, "stream_ups", v1.limit(0), 2L, Seq("id"))
    assert(catalog.loadTable("stream_ups").metadata.snapshots.size === 2)
  }
}
