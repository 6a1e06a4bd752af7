package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.metrics._
import graft.table.Writer

/** Commit/scan metrics reports + reporter registry (reference
  * `metrics/commit_report.go:29-110`, `metrics/reporter.go`,
  * `metrics/registry.go`, wire fixture `metrics/testdata/commit_report.json`).
  */
class MetricsReportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("metrics-report")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val warehouse = Files.createTempDirectory("graft-mr").toString
  private lazy val catalog = new HadoopCatalog(warehouse)

  private val mem = new InMemoryReporter
  Registry.register("test-mem", _ => mem)

  override def afterAll(): Unit = spark.stop()

  private def commits: Seq[CommitReport] =
    mem.reports.collect { case c: CommitReport => c }

  test("append emits a commit report with counts, attempts and duration") {
    mem.reset()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("mr_append", schema, PartitionSpec.Unpartitioned,
      properties = Map(Registry.ReporterImplKey -> "test-mem"))
    Writer.append(spark, t0, nation)

    val r = commits.last
    assert(r.operation == "append")
    assert(r.tableName == "mr_append")
    assert(r.sequenceNumber == 1L)
    val m = r.metrics
    assert(m.attempts.map(_.value).contains(1L))
    assert(m.addedDataFiles.exists(_.value >= 1L))
    assert(m.addedRecords.map(_.value).contains(nation.count()))
    assert(m.totalRecords.map(_.value).contains(nation.count()))
    assert(m.totalDataFiles.get.value == m.addedDataFiles.get.value)
    assert(m.addedFilesSizeBytes.exists(c => c.unit == "bytes" && c.value > 0L))
    assert(m.removedDataFiles.map(_.value).contains(0L))
    assert(m.manifestsCreated.exists(_.value >= 1L))
    assert(m.totalDuration.exists(t => t.timeUnit == "nanoseconds" && t.totalDuration > 0L))
  }

  test("MoR delete reports added delete files; CoW delete reports removals") {
    mem.reset()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("mr_mor", schema, PartitionSpec.Unpartitioned,
      properties = Map(Registry.ReporterImplKey -> "test-mem"))
    val t1 = Writer.append(spark, t0, nation)
    val t2 = Writer.deleteWhereMoR(spark, t1, Expr.lt("n_nationkey", 5))

    val mor = commits.last
    assert(mor.metrics.addedDeleteFiles.exists(_.value >= 1L))
    assert(mor.metrics.addedPositionalDeleteFiles.exists(_.value >= 1L))
    assert(mor.metrics.addedDataFiles.map(_.value).contains(0L))
    assert(mor.metrics.removedDataFiles.map(_.value).contains(0L))

    // CoW delete rewrites files: removals must be reported with their stats
    Writer.deleteWhere(spark, t2, Expr.lt("n_nationkey", 10))
    val cow = commits.last
    assert(cow.metrics.removedDataFiles.exists(_.value >= 1L))
    assert(cow.metrics.removedRecords.exists(_.value > 0L))
    assert(cow.metrics.manifestEntriesProcessed.exists(_.value >= 1L))
  }

  test("scan planning emits a scan report") {
    mem.reset()
    val t = catalog.loadTable("mr_append")
    t.newScan.withFilter(Expr.lt("n_nationkey", 5)).planFiles()
    val scans = mem.reports.collect { case s: ScanReport => s }
    assert(scans.nonEmpty)
    val s = scans.last
    assert(s.tableName == "mr_append")
    assert(s.projectedFieldNames.contains("n_nationkey"))
    assert(s.metrics.resultDataFiles.exists(_.value >= 1L))
    assert(s.metrics.totalPlanningDuration.exists(_.totalDuration > 0L))
  }

  test("wire JSON matches the reference fixture shape") {
    val report = CommitReport(
      tableName = "nyc.taxis", snapshotId = 123L, sequenceNumber = 2L,
      operation = "append",
      metrics = CommitMetricsResult(
        totalDuration = Some(TimerResult.nanos(1, 1234567890L)),
        attempts = Some(CounterResult.count(1)),
        addedDataFiles = Some(CounterResult.count(4)),
        totalDataFiles = Some(CounterResult.count(4)),
        addedRecords = Some(CounterResult.count(12345)),
        totalRecords = Some(CounterResult.count(12345)),
        addedFilesSizeBytes = Some(CounterResult.bytes(4096000)),
        totalFilesSizeBytes = Some(CounterResult.bytes(4096000)),
        manifestsCreated = Some(CounterResult.count(1)),
        manifestsKept = Some(CounterResult.count(0)),
        manifestEntriesProcessed = Some(CounterResult.count(4))),
      metadata = Map("engine" -> "graft"))
    val node = new ObjectMapper().readTree(Wire.toJson(report))
    assert(node.get("report-type").asText == "commit-report")
    assert(node.get("table-name").asText == "nyc.taxis")
    assert(node.get("snapshot-id").asLong == 123L)
    assert(node.get("sequence-number").asLong == 2L)
    assert(node.get("operation").asText == "append")
    val m = node.get("metrics")
    assert(m.get("attempts").get("unit").asText == "count")
    assert(m.get("attempts").get("value").asLong == 1L)
    assert(m.get("added-data-files").get("value").asLong == 4L)
    assert(m.get("added-files-size-bytes").get("unit").asText == "bytes")
    assert(m.get("total-duration").get("time-unit").asText == "nanoseconds")
    assert(m.get("total-duration").get("total-duration").asLong == 1234567890L)
    assert(m.get("total-duration").get("count").asLong == 1L)
    // omitted counters are absent, not null (omitempty parity)
    assert(!m.has("removed-data-files") || m.get("removed-data-files") != null)
    assert(node.get("metadata").get("engine").asText == "graft")

    // scan report wire form
    val sr = ScanReport("t", 1L, 0, Seq(1, 2), Seq("a", "b"),
      ExprJson.toJson(Expr.lt("a", 5)),
      ScanMetricsResult(resultDataFiles = Some(CounterResult.count(3))))
    val sn = new ObjectMapper().readTree(Wire.toJson(sr))
    assert(sn.get("report-type").asText == "scan-report")
    assert(sn.get("projected-field-ids").size == 2)
    assert(sn.get("filter") != null && !sn.get("filter").isNull)
    assert(sn.get("metrics").get("result-data-files").get("value").asLong == 3L)
  }

  test("registry: unset is nop, unknown fails, named resolves") {
    assert(Registry.fromProperties(Map.empty) eq NopReporter)
    assert(Registry.fromProperties(Map(Registry.ReporterImplKey -> "nop")) eq NopReporter)
    intercept[IllegalArgumentException] {
      Registry.fromProperties(Map(Registry.ReporterImplKey -> "does-not-exist"))
    }
    assert(Registry.fromProperties(Map(Registry.ReporterImplKey -> "test-mem")) eq mem)
    // combine never lets one reporter break another
    val bad = new Reporter { def report(r: MetricsReport): Unit = sys.error("boom") }
    val ok = new InMemoryReporter
    Reporter.combine(bad, ok).report(CommitReport("t", 1, 1, "append", CommitMetricsResult()))
    assert(ok.reports.size == 1)
  }
}
