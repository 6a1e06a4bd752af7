package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.table.{Maintenance, ValidationException}

/** Concurrent row-level SQL DML through Spark's plans: two statements
  * racing on the SAME table must serialize — the final state is exactly
  * the serial application of the statements that SUCCEEDED, and a loser
  * surfaces a commit conflict instead of silently dropping the winner's
  * effect (the lost-update anomaly). CommitConcurrencySpec pins these
  * invariants at the programmatic API; this spec drives them end-to-end
  * through `spark.sql` (group-based CoW rewrites and MoR delta writes),
  * where analysis-time planning and commit-time validation happen in
  * Spark-owned code paths the API tests never exercise.
  *
  * Reference semantics: `table/conflict_validation.go:68-860` —
  * a CoW rewrite validates its rewritten files still exist at rebase
  * (`validateDataFilesExist`); MoR deletes validate no new deletes landed
  * on their files. Timing decides whether the race manifests (a fast
  * winner can finish before the loser plans — then both apply serially);
  * the invariant below holds for EVERY schedule.
  */
class SqlDmlRaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private var n = 0

  /** Fresh v3 table `<catalog>.t` with rows id=0..79, seg=id%4, v=0. */
  private def fresh(mode: String): (String, String) = {
    n += 1
    val wh = Files.createTempDirectory(s"graft-dmlrace$n").toString
    val ctl = s"dmlrace$n"
    spark.conf.set(s"spark.sql.catalog.$ctl",
      classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$ctl.uri", wh)
    val t = s"$ctl.t"
    spark.sql(s"CREATE TABLE $t (id BIGINT, seg STRING, v INT) PARTITIONED BY (seg)")
    graft.table.Evolve.upgradeFormatVersion(new HadoopCatalog(wh).loadTable("t"), 3)
    spark.sql(s"""ALTER TABLE $t SET TBLPROPERTIES (
      'write.update.mode' = '$mode',
      'write.merge.mode' = '$mode',
      'write.delete.mode' = '$mode')""")
    val rows = (0 until 80)
      .map(i => s"($i, '${('A' + i % 4).toChar}', 0)").mkString(", ")
    spark.sql(s"INSERT INTO $t VALUES $rows")
    (t, wh)
  }

  /** Run both thunks as concurrently as a barrier can make them. */
  private def race(a: => Unit, b: => Unit): (Try[Unit], Try[Unit]) = {
    val barrier = new CyclicBarrier(2)
    var ra: Try[Unit] = null
    var rb: Try[Unit] = null
    val ta = new Thread(() => { barrier.await(); ra = Try(a) })
    val tb = new Thread(() => { barrier.await(); rb = Try(b) })
    ta.start(); tb.start(); ta.join(120000); tb.join(120000)
    (ra, rb)
  }

  private def isConflict(t: Throwable): Boolean = {
    var c = t
    while (c != null) {
      if (c.isInstanceOf[ValidationException] ||
        c.isInstanceOf[graft.catalog.CommitConflict] ||
        c.isInstanceOf[graft.catalog.CommitStateUnknown]) return true
      c = c.getCause
    }
    false
  }

  private def applied(r: Try[Unit], label: String): Boolean = r match {
    case Success(_) => true
    case Failure(e) =>
      assert(isConflict(e),
        s"$label failed with a NON-conflict error: ${e.getMessage}\n" +
          org.apache.commons.lang3.exception.ExceptionUtils.getStackTrace(e))
      false
  }

  private def contents(t: String): Map[Long, Int] =
    spark.sql(s"SELECT id, v FROM $t").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def lineageDistinct(t: String): Unit = {
    val rids = spark.sql(s"SELECT _row_id FROM $t").collect()
      .map(r => { assert(!r.isNullAt(0), "null _row_id after race"); r.getLong(0) })
    assert(rids.distinct.length === rids.length, "duplicate _row_id after race")
  }

  for (mode <- Seq("copy-on-write", "merge-on-read")) {
    test(s"$mode: concurrent overlapping UPDATEs serialize or the loser conflicts") {
      // a few rounds: schedules vary run to run, the invariant may not
      val hit = (0 until 3).map { _ =>
        val (t, _) = fresh(mode)
        val (ra, rb) = race(
          spark.sql(s"UPDATE $t SET v = v + 1 WHERE id < 60"),
          spark.sql(s"UPDATE $t SET v = v + 100 WHERE id >= 20"))
        val aOk = applied(ra, "update-a")
        val bOk = applied(rb, "update-b")
        assert(aOk || bOk, "both racers conflicted — no progress")
        val want = (0L until 80L).map { id =>
          id -> ((if (aOk && id < 60) 1 else 0) + (if (bOk && id >= 20) 100 else 0))
        }.toMap
        assert(contents(t) === want,
          s"mode=$mode aOk=$aOk bOk=$bOk: final state is not the serial " +
            "application of the successful statements (lost or partial update)")
        lineageDistinct(t)
        !(aOk && bOk)
      }
      info(s"conflict manifested in ${hit.count(identity)}/3 rounds")
    }

    test(s"$mode: concurrent overlapping DELETEs never over- or under-delete") {
      val (t, _) = fresh(mode)
      val (ra, rb) = race(
        spark.sql(s"DELETE FROM $t WHERE id % 2 = 0"),
        spark.sql(s"DELETE FROM $t WHERE id % 3 = 0"))
      val aOk = applied(ra, "delete-a")
      val bOk = applied(rb, "delete-b")
      assert(aOk || bOk, "both racers conflicted — no progress")
      val survivors = contents(t).keySet
      val want = (0L until 80L)
        .filterNot(id => (aOk && id % 2 == 0) || (bOk && id % 3 == 0)).toSet
      assert(survivors === want,
        s"mode=$mode aOk=$aOk bOk=$bOk: surviving rows diverge " +
          s"(extra=${(survivors -- want).take(5)}, missing=${(want -- survivors).take(5)})")
      lineageDistinct(t)
    }
  }

  test("ALTER TABLE racing INSERT: both land (metadata commit retries on a fresh base)") {
    (0 until 3).foreach { round =>
      val (t, _) = fresh("copy-on-write")
      val (ra, rb) = race(
        spark.sql(s"ALTER TABLE $t ADD COLUMN extra INT"),
        spark.sql(s"INSERT INTO $t (id, seg, v) VALUES (900, 'A', 1), (901, 'B', 2)"))
      // a schema change and a data commit touch disjoint state — neither
      // may fail OR be lost: the ALTER re-applies on a refreshed handle
      // when the CAS loses, the INSERT rebases through the writer retry
      assert(ra.isSuccess,
        s"round=$round ALTER failed: ${ra.failed.toOption.map(_.getMessage)}")
      assert(rb.isSuccess,
        s"round=$round INSERT failed: ${rb.failed.toOption.map(_.getMessage)}")
      assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 82L)
      assert(spark.sql(s"SELECT * FROM $t").columns.contains("extra"))
      lineageDistinct(t)
    }
  }

  test("mixed modes: CoW UPDATE racing a MoR DELETE on overlapping rows") {
    // update.mode=copy-on-write but delete.mode=merge-on-read: whichever
    // direction wins, the loser must conflict — an UPDATE rebasing over a
    // fresh DV on its rewritten files would resurrect the deleted rows,
    // and a DV referencing files the UPDATE removed would be orphaned
    val hit = (0 until 3).map { _ =>
      val (t, _) = fresh("merge-on-read")
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.update.mode' = 'copy-on-write')")
      val (ra, rb) = race(
        spark.sql(s"UPDATE $t SET v = v + 1 WHERE id < 60"),
        spark.sql(s"DELETE FROM $t WHERE id >= 20 AND id < 70"))
      val aOk = applied(ra, "cow-update")
      val bOk = applied(rb, "mor-delete")
      assert(aOk || bOk, "both racers conflicted — no progress")
      val got = contents(t)
      val want = (0L until 80L)
        .filterNot(id => bOk && id >= 20 && id < 70)
        .map(id => id -> (if (aOk && id < 60) 1 else 0)).toMap
      assert(got === want,
        s"update=$aOk delete=$bOk: contents diverge from the serial outcome " +
          s"(extra=${(got.keySet -- want.keySet).take(5)}, " +
          s"missing=${(want.keySet -- got.keySet).take(5)})")
      lineageDistinct(t)
      !(aOk && bOk)
    }
    info(s"conflict manifested in ${hit.count(identity)}/3 rounds")
  }

  test("copy-on-write: UPDATE racing a compaction — contents reflect exactly the survivors") {
    val (t, wh) = fresh("copy-on-write")
    // fragment the table so the compaction has real work
    (0 until 3).foreach { k =>
      val rows = (80 + k * 10 until 90 + k * 10)
        .map(i => s"($i, '${('A' + i % 4).toChar}', 0)").mkString(", ")
      spark.sql(s"INSERT INTO $t VALUES $rows")
    }
    val (ra, rb) = race(
      spark.sql(s"UPDATE $t SET v = v + 7 WHERE id < 100"),
      { Maintenance.rewriteDataFiles(spark,
          new HadoopCatalog(wh).loadTable("t")); () })
    val aOk = applied(ra, "update")
    val bOk = applied(rb, "compaction")
    assert(aOk || bOk, "both racers conflicted — no progress")
    // compaction never changes contents; the update applied iff it won
    val want = (0L until 110L).map(id => id -> (if (aOk && id < 100) 7 else 0)).toMap
    assert(contents(t) === want,
      s"update=$aOk compaction=$bOk: contents diverge from the serial outcome")
    lineageDistinct(t)
  }
}
