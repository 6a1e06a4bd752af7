package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core.SchemaBridge
import graft.format.PartitionSpec
import graft.table.{Maintenance, SparkRead, Writer}

/** Commit-protocol stress: many writers hammering ONE table through real
  * thread-level races (not the orchestrated two-party conflicts of
  * CommitConcurrencySpec). Every appender starts from a stale handle and
  * relies on the retry/rebase loop; a compaction races the appenders
  * midway. Invariant: no lost updates — the final table holds exactly the
  * union of every batch, one snapshot per commit, with strictly
  * monotonically increasing sequence numbers and distinct snapshot ids.
  */
class ConcurrencyFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("8 racing appenders + a racing compaction lose nothing") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-ccfuzz").toString)
    val probe = Seq((-1L, -1, -1)).toDF("id", "writer", "seq")
    val t0 = cat.createTable("race", SchemaBridge.fromSpark(probe.schema),
      PartitionSpec.Unpartitioned,
      properties = Map(
        "commit.retry.num-retries" -> "20",
        "commit.retry.min-wait-ms" -> "5",
        "commit.retry.max-wait-ms" -> "50"))
    Writer.append(spark, t0, probe) // seed so compaction has work

    val writers = 8
    val batchesPerWriter = 4
    val rowsPerBatch = 50
    val pool = Executors.newFixedThreadPool(writers + 1)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

    val appenders = (0 until writers).map { w =>
      Future {
        (0 until batchesPerWriter).foreach { s =>
          val rows = (0 until rowsPerBatch).map { i =>
            ((w.toLong << 32) | (s.toLong << 16) | i.toLong, w, s)
          }
          // stale handle on purpose: the commit loop must rebase
          Writer.append(spark, cat.loadTable("race"),
            rows.toDF("id", "writer", "seq"))
        }
      }
    }
    val compactor = Future {
      Thread.sleep(300)
      Maintenance.rewriteDataFiles(spark, cat.loadTable("race"), rewriteAll = true)
    }
    Await.result(Future.sequence(appenders :+ compactor.map(_ => ())), 10.minutes)
    pool.shutdown()

    val t = cat.loadTable("race")
    val got = SparkRead.read(spark, t.newScan)
      .filter(col("id") =!= -1L).select(col("id")).as[Long].collect().sorted.toSeq
    val want = (for {
      w <- 0 until writers; s <- 0 until batchesPerWriter; i <- 0 until rowsPerBatch
    } yield (w.toLong << 32) | (s.toLong << 16) | i.toLong).sorted
    assert(got.size === want.size,
      s"lost updates: ${want.size - got.size} rows missing of ${want.size}")
    assert(got === want)

    val snaps = t.metadata.snapshots
    // every commit made a snapshot: 1 seed + 32 appends + 1 compaction
    assert(snaps.size === 1 + writers * batchesPerWriter + 1,
      s"expected one snapshot per commit, got ${snaps.size}")
    assert(snaps.map(_.snapshotId).distinct.size === snaps.size)
    val seqs = snaps.map(_.sequenceNumber)
    assert(seqs.distinct.size === seqs.size, "duplicate sequence numbers")
    assert(seqs.max === t.metadata.lastSequenceNumber)
  }
}
