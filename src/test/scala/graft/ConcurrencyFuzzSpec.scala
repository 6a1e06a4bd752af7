package graft

import java.nio.file.Files
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{Catalog, HadoopCatalog, SqlCatalog}
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
  *
  * The SAME walk runs over every CAS implementation that differs:
  * HadoopCatalog's atomic version-hint rename, SqlCatalog's JDBC
  * conditional UPDATE, and HiveCatalog's lock→verify→alter — the Hive run
  * with fault injection (lost responses and pre-apply failures mid-race)
  * so the unknown-outcome reconciliation path runs UNDER CONTENTION, not
  * just in the orchestrated two-party test.
  */
class ConcurrencyFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The race: `writers` appenders × `batches` batches from deliberately
    * stale handles, one rewriteAll compaction midway. Asserts the full
    * no-lost-updates / one-snapshot-per-commit / unique-monotone-sequence
    * invariant set against whatever catalog backend is passed in.
    */
  // retry budget sized for the WORST contention this suite sees: sbt runs
  // suites in parallel in one JVM, so the compaction here races not just
  // its own 8 appenders (32 commits) but every sibling suite's Spark jobs
  // for the same cores — 20 retries exhausted twice in full-suite runs
  // once the r16 suites widened the pool (standalone runs never flaked).
  // A bigger budget changes NO invariant: bounded-retry exhaustion under
  // arbitrary box load is the configured behavior, not a lost update.
  private def raceWalk(cat: Catalog, tableName: String,
      writers: Int = 8, batches: Int = 4,
      retries: Int = 60, maxWaitMs: Int = 50): Unit = {
    import spark.implicits._
    val probe = Seq((-1L, -1, -1)).toDF("id", "writer", "seq")
    val t0 = cat.createTable(tableName, SchemaBridge.fromSpark(probe.schema),
      PartitionSpec.Unpartitioned,
      properties = Map(
        "commit.retry.num-retries" -> retries.toString,
        "commit.retry.min-wait-ms" -> "5",
        "commit.retry.max-wait-ms" -> maxWaitMs.toString))
    Writer.append(spark, t0, probe) // seed so compaction has work

    val rowsPerBatch = 50
    val pool = Executors.newFixedThreadPool(writers + 1)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

    val appenders = (0 until writers).map { w =>
      Future {
        (0 until batches).foreach { s =>
          val rows = (0 until rowsPerBatch).map { i =>
            ((w.toLong << 32) | (s.toLong << 16) | i.toLong, w, s)
          }
          // stale handle on purpose: the commit loop must rebase
          Writer.append(spark, cat.loadTable(tableName),
            rows.toDF("id", "writer", "seq"))
        }
      }
    }
    val compactor = Future {
      Thread.sleep(300)
      Maintenance.rewriteDataFiles(spark, cat.loadTable(tableName),
        rewriteAll = true)
    }
    Await.result(Future.sequence(appenders :+ compactor.map(_ => ())), 10.minutes)
    pool.shutdown()

    val t = cat.loadTable(tableName)
    val got = SparkRead.read(spark, t.newScan)
      .filter(col("id") =!= -1L).select(col("id")).as[Long].collect().sorted.toSeq
    val want = (for {
      w <- 0 until writers; s <- 0 until batches; i <- 0 until rowsPerBatch
    } yield (w.toLong << 32) | (s.toLong << 16) | i.toLong).sorted
    assert(got.size === want.size,
      s"lost updates: ${want.size - got.size} rows missing of ${want.size}")
    assert(got === want)

    val snaps = t.metadata.snapshots
    // every commit made a snapshot: 1 seed + all appends + 1 compaction
    assert(snaps.size === 1 + writers * batches + 1,
      s"expected one snapshot per commit, got ${snaps.size}")
    assert(snaps.map(_.snapshotId).distinct.size === snaps.size)
    val seqs = snaps.map(_.sequenceNumber)
    assert(seqs.distinct.size === seqs.size, "duplicate sequence numbers")
    assert(seqs.max === t.metadata.lastSequenceNumber)
  }

  // reference `evaluator_race_test.go`: its cached evaluator closures
  // raced on shared visitor receiver fields under concurrent planning.
  // Our evaluators are pure functions (zero mutable state by construction)
  // — this pins that the whole planning stack over ONE shared Table
  // (manifest pruning, metrics eval, partition projection, delete
  // attachment) stays safe and deterministic under 64-way concurrent use,
  // the reference's production caller shape
  // (classifyFilesForFilteredDeletions fanning one closure across an
  // errgroup).
  test("concurrent planFiles over one shared table is race-free and deterministic") {
    import spark.implicits._
    val cat = new HadoopCatalog(
      Files.createTempDirectory("graft-evalrace").toString)
    val df = (0 until 2000).map(i => (i.toLong, i % 16)).toDF("id", "b")
    val schema = SchemaBridge.fromSpark(df.schema)
    var t = cat.createTable("evr", schema,
      PartitionSpec.builder(schema).add("b", graft.core.Transforms.Identity).build())
    (0 until 4).foreach { i =>
      t = Writer.append(spark, t, df.filter(col("id") % 4 === i))
    }
    t = Writer.deleteWhereMoR(spark, t, graft.core.Expr.eq("b", 3))
    val shared = cat.loadTable("evr") // ONE table instance for every thread
    val filter = graft.core.Expr.and(
      graft.core.Expr.lt("id", 1500L), graft.core.Expr.gtEq("b", 2))
    def signature(): (Int, Set[String], Int) = {
      val tasks = shared.newScan.withFilter(filter).planFiles()
      (tasks.size, tasks.map(_.file.path).toSet,
        tasks.map(_.posDeletes.size).sum)
    }
    val expected = signature()
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = Await.result(
      Future.sequence((0 until 64).map(_ => Future(signature()))), 2.minutes)
    pool.shutdown()
    assert(results.forall(_ == expected),
      "every concurrent plan must equal the single-threaded plan")
    assert(expected._1 > 0 && expected._3 > 0,
      "the shared plan exercises pruning AND delete attachment")
  }

  test("hadoop: 8 racing appenders + a racing compaction lose nothing") {
    raceWalk(new HadoopCatalog(
      Files.createTempDirectory("graft-ccfuzz").toString), "race")
  }

  test("sql: the same race over the JDBC conditional-UPDATE CAS") {
    raceWalk(new SqlCatalog(
      s"jdbc:derby:${Files.createTempDirectory("graft-ccfuzz-sql")}/db;create=true",
      Files.createTempDirectory("graft-ccfuzz-sqlwh").toString), "ccfuzz_race_sql")
  }

  test("hive: the same race over lock→verify→alter, with injected faults " +
      "driving unknown-outcome reconciliation under contention") {
    val cat = graft.catalog.HiveCatalog.embedded(
      Files.createTempDirectory("graft-ccfuzz-hivems").toString,
      Files.createTempDirectory("graft-ccfuzz-hivewh").toString)
    val alterN = new AtomicInteger(0)
    val lostResponses = new AtomicInteger(0)
    val preApplyFailures = new AtomicInteger(0)
    // every 4th alter applies then loses its response (reconciliation must
    // observe pointer==newPath and call it SUCCESS under the held lock);
    // every 9th fails before applying (reconciliation observes pointer at
    // base → retryable CommitConflict → the retry loop re-stages). Both
    // fire while 8 other writers contend for the same table lock.
    cat.commitAlterHook = { f =>
      val n = alterN.incrementAndGet()
      if (n % 4 == 0) {
        f()
        lostResponses.incrementAndGet()
        throw new RuntimeException("connection reset by peer (injected)")
      } else if (n % 9 == 0) {
        preApplyFailures.incrementAndGet()
        throw new RuntimeException("socket timeout (injected)")
      } else f()
    }
    try {
      // smaller batch count + bigger retry budget: embedded-Derby HMS lock
      // polling under 8-way contention is slow, and injected pre-apply
      // failures consume retry attempts on top of genuine CAS conflicts
      raceWalk(cat, "ccfuzz_race_hive", batches = 3,
        retries = 40, maxWaitMs = 100)
    } finally cat.commitAlterHook = f => f()
    assert(lostResponses.get >= 1,
      "the lost-response reconciliation branch must have run under contention")
    assert(preApplyFailures.get >= 1,
      "the pre-apply-failure reconciliation branch must have run under contention")
  }
}
