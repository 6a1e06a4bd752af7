package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{CommitConflict, HadoopCatalog}
import graft.core._
import graft.format._
import graft.table.{SparkRead, ValidationException, Writer}

/** Optimistic-concurrency commit protocol: CAS atomicity, retry + rebase,
  * conflict validation (reference retry `table/table.go:520-980`, validators
  * `table/conflict_validation.go:68-860`).
  */
class CommitConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("commit-concurrency")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val warehouse = Files.createTempDirectory("graft-cc").toString
  private lazy val catalog = new HadoopCatalog(warehouse)

  override def afterAll(): Unit = spark.stop()

  test("stale-base commit conflicts at the catalog, succeeds after retry") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_stale", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation.filter(col("n_nationkey") < 10))
    // commit from the STALE t0 handle: the retry loop must refresh + rebase,
    // keeping t1's snapshot in history
    val t2 = Writer.append(spark, t0, nation.filter(col("n_nationkey") >= 10))
    assert(SparkRead.read(spark, t2.newScan).count() === 25)
    assert(t2.metadata.snapshots.size === 2)
    assert(t2.currentVersion === 3) // v1 create, v2 first append, v3 rebased
    assert(t1.metadata.currentSnapshotId.get ===
      t2.metadata.currentSnapshot.get.parentSnapshotId.get)
  }

  // reference `table/table.go:878-935` readRetryConfig: junk retry
  // properties must not crash a later Thread.sleep mid-retry — negatives
  // and unparseable values fall back to defaults; unsafe values (overflow
  // durations, min > max, count beyond uint32) reject up front
  test("retry properties: negatives default, unsafe values reject up front") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)

    // negative + unparseable spellings: commit succeeds on defaults
    val ok = catalog.createTable("cc_retry_ok", schema, PartitionSpec.Unpartitioned,
      properties = Map("commit.retry.min-wait-ms" -> "-5",
        "commit.retry.num-retries" -> "junk",
        "commit.retry.total-timeout-ms" -> "0"))
    val t1 = Writer.append(spark, ok, nation)
    assert(SparkRead.read(spark, t1.newScan).count() === 25)

    // min > max: rejected before any attempt
    val minMax = catalog.createTable("cc_retry_minmax", schema,
      PartitionSpec.Unpartitioned,
      properties = Map("commit.retry.min-wait-ms" -> "5000",
        "commit.retry.max-wait-ms" -> "10"))
    intercept[IllegalArgumentException](Writer.append(spark, minMax, nation))

    // duration beyond the representable backoff range: rejected
    val tooLong = catalog.createTable("cc_retry_dur", schema,
      PartitionSpec.Unpartitioned,
      properties = Map("commit.retry.max-wait-ms" -> Long.MaxValue.toString))
    intercept[IllegalArgumentException](Writer.append(spark, tooLong, nation))

    // count beyond uint32: rejected
    val tooMany = catalog.createTable("cc_retry_count", schema,
      PartitionSpec.Unpartitioned,
      properties = Map("commit.retry.num-retries" -> "4294967296"))
    intercept[IllegalArgumentException](Writer.append(spark, tooMany, nation))
  }

  test("racing appends both land (one wins CAS, one rebases)") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_race", schema, PartitionSpec.Unpartitioned)
    val f1 = Future(Writer.append(spark, t0, nation.filter(col("n_nationkey") % 2 === 0)))
    val f2 = Future(Writer.append(spark, t0, nation.filter(col("n_nationkey") % 2 =!= 0)))
    Await.result(f1, 2.minutes); Await.result(f2, 2.minutes)
    val t = catalog.loadTable("cc_race")
    assert(SparkRead.read(spark, t.newScan).count() === 25)
    assert(t.metadata.snapshots.size === 2)
  }

  test("raw catalog CAS rejects a commit against a superseded version") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_cas", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation)
    intercept[CommitConflict] {
      catalog.commit("cc_cas", t0.metadata, t0.metadata, t0.currentVersion)
    }
    assert(t1.currentVersion === 2)
  }

  test("concurrent delete of the same rows fails validation, not silently") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_del", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation)
    // two CoW deletes race from the same base; the rebasing one rewrites
    // files the winner already removed -> non-retryable ValidationException
    val winner = Writer.deleteWhere(spark, t1, Expr.lt("n_nationkey", 5))
    intercept[ValidationException] {
      Writer.deleteWhere(spark, t1, Expr.lt("n_nationkey", 10))
    }
    assert(SparkRead.read(spark, winner.refresh().newScan).count() === 20)
  }

  test("concurrent v3 DV deletes from one base conflict, never supersede silently") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_dvrace", schema, PartitionSpec.Unpartitioned)
    val up = graft.table.Evolve.upgradeFormatVersion(
      Writer.append(spark, t0, nation), 3)
    // the winner lands a DV; the stale-base loser folded only the delete
    // state it saw at scan — its DV would SUPERSEDE (drop) the winner's
    val winner = Writer.deleteWhereDV(spark, up, Expr.lt("n_nationkey", 5))
    intercept[ValidationException] {
      Writer.deleteWhereDV(spark, up, Expr.lt("n_nationkey", 10))
    }
    assert(SparkRead.read(spark, winner.refresh().newScan).count() === 20)
    // from a FRESH handle the same delete folds the winner's DV and lands
    val again = Writer.deleteWhereDV(spark, winner.refresh(),
      Expr.lt("n_nationkey", 10))
    assert(SparkRead.read(spark, again.newScan).count() === 15)
  }

  test("v3 pos-delete compaction racing a fresh DV delete conflicts, not drops") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_dvcomp", schema, PartitionSpec.Unpartitioned)
    // v2 history leaves a legacy parquet pos-delete backlog, then upgrade
    val t1 = Writer.append(spark, t0, nation)
    val t2 = Writer.deleteWhereMoR(spark, t1, Expr.lt("n_nationkey", 3))
    val up = graft.table.Evolve.upgradeFormatVersion(t2, 3)
    // a fresh DV delete lands AFTER the compactor's (stale) view
    val winner = Writer.deleteWhereDV(spark, up, Expr.eq("n_nationkey", 10L))
    // compacting the parquet backlog from the stale handle would write DVs
    // that supersede the winner's — must conflict
    intercept[ValidationException] {
      graft.table.Maintenance.rewritePositionDeleteFiles(spark, up)
    }
    // fresh handle: the rewrite folds everything and all deletes survive
    val res = graft.table.Maintenance.rewritePositionDeleteFiles(
      spark, winner.refresh())
    assert(SparkRead.read(spark, res.table.newScan).count() === 21) // 25-3-1
  }

  test("append concurrent with a delete is allowed (no overlapping files)") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_mix", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation.filter(col("n_nationkey") < 20))
    val afterDelete = Writer.deleteWhere(spark, t1, Expr.lt("n_nationkey", 5))
    // stale-base append: file-level rebase is clean (no removed paths)
    val t2 = Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 20))
    assert(SparkRead.read(spark, t2.newScan).count() === 20) // 25 - 5 deleted
    assert(afterDelete.metadata.currentSnapshotId.isDefined)
  }

  test("pos-delete whose referenced files were concurrently compacted fails") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    var t = catalog.createTable("cc_dfe", schema, PartitionSpec.Unpartitioned)
    (0 until 3).foreach { i =>
      t = Writer.append(spark, t, nation.filter(col("n_nationkey") % 3 === i))
    }
    val staleDeleteBase = t
    // compaction wins: all referenced data files are rewritten
    graft.table.Maintenance.rewriteDataFiles(spark, t, rewriteAll = true)
    // data-files-exist: the pos-delete would orphan against moved rows
    intercept[ValidationException] {
      Writer.deleteWhereMoR(spark, staleDeleteBase, Expr.lt("n_nationkey", 5))
    }
    val head = catalog.loadTable("cc_dfe")
    assert(SparkRead.read(spark, head.newScan).count() === 25) // delete rejected
  }

  test("compaction racing a MoR DV delete never loses the delete") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    var t = catalog.createTable("cc_rwd", schema, PartitionSpec.Unpartitioned)
    (0 until 3).foreach { i =>
      t = Writer.append(spark, t, nation.filter(col("n_nationkey") % 3 === i))
    }
    val staleCompactionBase = t
    Writer.deleteWhereDV(spark, t, Expr.lt("n_nationkey", 5))
    // deletes-for-rewritten-files: dropping the old files would drop the DV
    intercept[ValidationException] {
      graft.table.Maintenance.rewriteDataFiles(spark, staleCompactionBase,
        rewriteAll = true)
    }
    val head = catalog.loadTable("cc_rwd")
    assert(SparkRead.read(spark, head.newScan).count() === 20) // delete intact
  }

  test("eq-delete vs concurrent append: serializable rejects, snapshot allows") {
    import spark.implicits._
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_eqiso", schema, PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, nation.filter(col("n_nationkey") < 20))
    // concurrent append lands first; the eq-delete's base is stale
    Writer.append(spark, t1, nation.filter(col("n_nationkey") >= 20))
    val keys = Seq(1, 2).toDF("n_nationkey")
    intercept[ValidationException] {
      Writer.equalityDelete(spark, t1, keys, Seq("n_nationkey"))
    }
    // snapshot isolation: concurrent adds into the delete scope are allowed
    val t2 = catalog.loadTable("cc_eqiso")
    val relaxed = graft.table.Evolve.setProperties(t2,
      Map("write.delete.isolation-level" -> "snapshot"))
    val stale2 = relaxed
    Writer.append(spark, relaxed, nation.filter(col("n_nationkey") < 2))
    val done = Writer.equalityDelete(spark, stale2, keys, Seq("n_nationkey"))
    assert(done.metadata.currentSnapshotId.isDefined)
  }

  test("cross-codec CAS: a gzip committer loses to an already-placed plain version") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_codec", schema, PartitionSpec.Unpartitioned)
    // racer A already placed the PLAIN v2 file (simulated out-of-band);
    // racer B commits the same version carrying codec=gzip — different
    // file name, so create-no-replace alone can't arbitrate
    val plainV2 = s"$warehouse/cc_codec/metadata/v2.metadata.json"
    graft.io.FileIO.createNoReplace(plainV2,
      graft.format.TableMetadata.toJson(t0.metadata).getBytes("UTF-8"))
    val gz = t0.metadata.copy(properties =
      t0.metadata.properties + ("write.metadata.compression-codec" -> "gzip"))
    intercept[CommitConflict] { catalog.commit("cc_codec", t0.metadata, gz, 1) }
    // the loser rolled back its own spelling; the winner's file survives
    assert(!graft.io.FileIO.exists(
      s"$warehouse/cc_codec/metadata/v2.gz.metadata.json"))
    assert(graft.io.FileIO.exists(plainV2))
    // once the winner PUBLISHES (hint -> 2), a rebased retry commits v3
    // as gzip (an unpublished reservation conflicts until published or
    // cleaned — the documented crash-window semantics)
    graft.io.FileIO.replaceAtomic(
      s"$warehouse/cc_codec/metadata/version-hint.text", "2".getBytes("UTF-8"))
    val t2 = catalog.loadTable("cc_codec")
    val t3 = graft.table.Evolve.setProperties(t2,
      Map("write.metadata.compression-codec" -> "gzip"))
    assert(t3.metadataPath.endsWith(".gz.metadata.json"))
    assert(catalog.loadTable("cc_codec").metadata
      .properties("write.metadata.compression-codec") === "gzip")
  }

  test("cross-codec CAS: the v<N>.commit marker arbitrates when both spellings race") {
    // The interleaving the codec-file check alone cannot catch: both racers
    // pass the other-spelling-exists check before either file lands, so the
    // single create-no-replace of v<N>.commit must decide. Simulate the
    // loser's view: the marker is already claimed (winner between its marker
    // claim and its hint publish), the winner's codec file not yet visible.
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_marker", schema, PartitionSpec.Unpartitioned)
    graft.io.FileIO.createNoReplace(
      s"$warehouse/cc_marker/metadata/v2.commit",
      "v2.gz.metadata.json".getBytes("UTF-8"))
    intercept[CommitConflict] { catalog.commit("cc_marker", t0.metadata, t0.metadata, 1) }
    // the loser rolled back its plain spelling; nothing claims v2 but the marker
    assert(!graft.io.FileIO.exists(s"$warehouse/cc_marker/metadata/v2.metadata.json"))
  }

  test("readers resolve the marker-recorded spelling, not sniff order") {
    // A stale plain-spelling file (crashed pre-marker committer, or a loser
    // whose rollback delete failed) must NOT shadow the committed gzip file:
    // the marker records the winner and loadTable follows it.
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_mread", schema, PartitionSpec.Unpartitioned)
    val t1 = graft.table.Evolve.setProperties(t0,
      Map("write.metadata.compression-codec" -> "gzip")) // commits v2 as gzip
    assert(t1.metadataPath.endsWith("v2.gz.metadata.json"))
    // drop a bogus plain v2 AFTER the commit (sniff order would prefer it)
    graft.io.FileIO.createNoReplace(
      s"$warehouse/cc_mread/metadata/v2.metadata.json",
      TableMetadata.toJson(t0.metadata).getBytes("UTF-8"))
    val loaded = catalog.loadTable("cc_mread")
    assert(loaded.metadataPath.endsWith("v2.gz.metadata.json"))
    assert(loaded.metadata.properties.get("write.metadata.compression-codec")
      .contains("gzip"))
  }

  test("cross-codec stress: concurrent racers with different codecs never both win") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("cc_stress", schema, PartitionSpec.Unpartitioned)
    (0 until 6).foreach { round =>
      val base = catalog.loadTable("cc_stress")
      val v = base.currentVersion
      def attempt(codec: String): Option[String] = try {
        val m = base.metadata.copy(properties = base.metadata.properties +
          ("write.metadata.compression-codec" -> codec) +
          (s"round" -> s"$round-$codec"))
        Some(catalog.commit("cc_stress", base.metadata, m, v))
      } catch { case _: CommitConflict => None }
      val fa = Future(attempt("none"))
      val fb = Future(attempt("gzip"))
      val (ra, rb) = (Await.result(fa, 1.minute), Await.result(fb, 1.minute))
      assert(!(ra.isDefined && rb.isDefined),
        s"round $round: BOTH racers won version ${v + 1} ($ra / $rb)")
      // whatever happened, the table stays loadable and consistent: the
      // loaded metadata is exactly the winner's (or unchanged if both
      // backed off)
      val loaded = catalog.loadTable("cc_stress")
      (ra.orElse(rb)) match {
        case Some(winnerPath) =>
          assert(loaded.metadataPath === winnerPath)
          assert(loaded.currentVersion === v + 1)
        case None =>
          assert(loaded.currentVersion === v)
      }
    }
  }

  test("multi-table transaction: lost race rolls back codec files AND markers") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val ta = catalog.createTable("cc_txn_a", schema, PartitionSpec.Unpartitioned)
    val tb = catalog.createTable("cc_txn_b", schema, PartitionSpec.Unpartitioned)
    // second table's version is already reserved by a concurrent committer
    graft.io.FileIO.createNoReplace(
      s"$warehouse/cc_txn_b/metadata/v2.commit",
      "v2.gz.metadata.json".getBytes("UTF-8"))
    intercept[CommitConflict] {
      catalog.commitTransaction(Seq(
        graft.catalog.StagedCommit("cc_txn_a", ta.metadata, ta.metadata, 1),
        graft.catalog.StagedCommit("cc_txn_b", tb.metadata, tb.metadata, 1)))
    }
    // table A's reservation (file + marker) rolled back with table B's
    assert(!graft.io.FileIO.exists(s"$warehouse/cc_txn_a/metadata/v2.metadata.json"))
    assert(!graft.io.FileIO.exists(s"$warehouse/cc_txn_a/metadata/v2.commit"))
    assert(!graft.io.FileIO.exists(s"$warehouse/cc_txn_b/metadata/v2.metadata.json"))
    assert(catalog.loadTable("cc_txn_a").currentVersion === 1)
  }

  test("v3 row-id blocks never overlap under commit-conflict rebase") {
    // reference rebuild_manifest_test.go TestRebuildFn_V3FirstRowIDDerived-
    // FromFreshMeta + TestAddManifestsPresetAndNilFirstRowIDNoOverlap: the
    // LOSER of a concurrent commit must re-derive its first-row-id from the
    // fresh parent's next-row-id on rebase — a stale-base block would hand
    // the same _row_id range to two snapshots' rows
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = graft.table.Evolve.upgradeFormatVersion(
      catalog.createTable("cc_lineage", schema, PartitionSpec.Unpartitioned), 3)
    val f1 = Future(Writer.append(spark, t0, nation.filter(col("n_nationkey") < 12)))
    val f2 = Future(Writer.append(spark, t0, nation.filter(col("n_nationkey") >= 12)))
    Await.result(f1, 2.minutes); Await.result(f2, 2.minutes)
    val t = catalog.loadTable("cc_lineage")
    val snaps = t.metadata.snapshots.sortBy(_.sequenceNumber)
    assert(snaps.size === 2)
    val blocks = snaps.map(s => (s.firstRowId.get, s.addedRows.get))
    // contiguous, non-overlapping: each block starts where the previous ended
    assert(blocks.head._1 === 0L)
    assert(blocks(1)._1 === blocks.head._1 + blocks.head._2,
      s"rebased snapshot must start at the fresh cursor, got $blocks")
    assert(t.metadata.nextRowId === blocks(1)._1 + blocks(1)._2)
    assert(blocks.map(_._2).sum === 25L)
    // per-file ids mirror the snapshot blocks with no overlap either
    val fileBlocks = t.newScan.planFiles()
      .map(ft => (ft.file.firstRowId.get, ft.file.recordCount)).sortBy(_._1)
    fileBlocks.sliding(2).foreach {
      case Seq((a, n), (b, _)) => assert(a + n <= b, s"file blocks overlap: $fileBlocks")
      case _ => ()
    }
  }
}
