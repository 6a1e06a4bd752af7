package graft.metrics

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Metrics Reporting API (reference `metrics/reporter.go`,
  * `metrics/commit_report.go:29-110`, `metrics/scan_report.go:33-80`,
  * `metrics/registry.go`): a pluggable [[Reporter]] receives a
  * [[MetricsReport]] — a [[ScanReport]] after scan planning or a
  * [[CommitReport]] after a commit. Reporting is opt-in (nop by default) and
  * must never fail the operation it observes.
  */
final case class CounterResult(unit: String, value: Long)
object CounterResult {
  val UnitCount = "count"
  val UnitBytes = "bytes"
  def count(v: Long): CounterResult = CounterResult(UnitCount, v)
  def bytes(v: Long): CounterResult = CounterResult(UnitBytes, v)
}

final case class TimerResult(timeUnit: String, count: Long, totalDuration: Long)
object TimerResult {
  def nanos(count: Long, totalNanos: Long): TimerResult =
    TimerResult("nanoseconds", count, totalNanos)
}

sealed trait MetricsReport

/** Spec CommitReport metrics (reference `metrics/commit_report.go:29-71`).
  * Only the counters this engine can populate are carried; absent values are
  * omitted from the wire form, matching the reference's omitempty fields.
  */
final case class CommitMetricsResult(
    totalDuration: Option[TimerResult] = None,
    attempts: Option[CounterResult] = None,
    addedDataFiles: Option[CounterResult] = None,
    removedDataFiles: Option[CounterResult] = None,
    totalDataFiles: Option[CounterResult] = None,
    addedDeleteFiles: Option[CounterResult] = None,
    removedDeleteFiles: Option[CounterResult] = None,
    totalDeleteFiles: Option[CounterResult] = None,
    addedEqualityDeleteFiles: Option[CounterResult] = None,
    addedPositionalDeleteFiles: Option[CounterResult] = None,
    addedDVs: Option[CounterResult] = None,
    removedDVs: Option[CounterResult] = None,
    addedRecords: Option[CounterResult] = None,
    removedRecords: Option[CounterResult] = None,
    totalRecords: Option[CounterResult] = None,
    addedFilesSizeBytes: Option[CounterResult] = None,
    removedFilesSizeBytes: Option[CounterResult] = None,
    totalFilesSizeBytes: Option[CounterResult] = None,
    manifestsCreated: Option[CounterResult] = None,
    manifestsKept: Option[CounterResult] = None,
    manifestEntriesProcessed: Option[CounterResult] = None)

final case class CommitReport(
    tableName: String,
    snapshotId: Long,
    sequenceNumber: Long,
    operation: String,
    metrics: CommitMetricsResult,
    metadata: Map[String, String] = Map.empty) extends MetricsReport

/** Spec ScanReport metrics (reference `metrics/scan_report.go:33-51`). */
final case class ScanMetricsResult(
    totalPlanningDuration: Option[TimerResult] = None,
    resultDataFiles: Option[CounterResult] = None,
    resultDeleteFiles: Option[CounterResult] = None,
    totalDataManifests: Option[CounterResult] = None,
    scannedDataManifests: Option[CounterResult] = None,
    skippedDataManifests: Option[CounterResult] = None,
    skippedDataFiles: Option[CounterResult] = None,
    equalityDeleteFiles: Option[CounterResult] = None,
    positionalDeleteFiles: Option[CounterResult] = None)

final case class ScanReport(
    tableName: String,
    snapshotId: Long,
    schemaId: Int,
    projectedFieldIds: Seq[Int],
    projectedFieldNames: Seq[String],
    filterJson: String, // Expression JSON (ExprJson wire form)
    metrics: ScanMetricsResult,
    metadata: Map[String, String] = Map.empty) extends MetricsReport

/** Reporter contract (reference `metrics/reporter.go`): never block, never
  * throw into the observed scan/commit — callers route through [[Reporter.safe]].
  */
trait Reporter {
  def report(r: MetricsReport): Unit
  def close(): Unit = ()
}

object NopReporter extends Reporter {
  def report(r: MetricsReport): Unit = ()
}

/** Logs the wire JSON of each report (reference LoggingReporter). */
final class LoggingReporter(sink: String => Unit = s => System.err.println(s))
    extends Reporter {
  def report(r: MetricsReport): Unit = sink(Wire.toJson(r))
}

/** Buffers reports for tests/inspection (reference InMemoryReporter). */
final class InMemoryReporter extends Reporter {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[MetricsReport]()
  def report(r: MetricsReport): Unit = { buf.add(r); () }
  def reports: Seq[MetricsReport] = {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq
  }
  def reset(): Unit = buf.clear()
}

object Reporter {
  /** Fan-out composite; a failing member never breaks the others or the
    * observed operation (reference Combine).
    */
  def combine(rs: Reporter*): Reporter = new Reporter {
    def report(r: MetricsReport): Unit = rs.foreach(x => safe(x, r))
    override def close(): Unit = rs.foreach(x => try x.close() catch { case _: Exception => })
  }

  /** Report, swallowing reporter failures (the contract: observability must
    * never fail the operation it observes).
    */
  def safe(rep: Reporter, r: MetricsReport): Unit =
    try rep.report(r) catch { case _: Exception => () }
}

/** Named reporter registry + property-driven construction (reference
  * `metrics/registry.go`): `metrics-reporter-impl` names the reporter; absent
  * means nop (opt-in), unknown is an error so misconfiguration surfaces.
  */
object Registry {
  val ReporterImplKey = "metrics-reporter-impl"

  private val factories =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String] => Reporter]()
  register("nop", _ => NopReporter)
  register("logging", _ => new LoggingReporter())

  def register(name: String, factory: Map[String, String] => Reporter): Unit = {
    factories.put(name, factory); ()
  }

  def deregister(name: String): Unit = { factories.remove(name); () }

  def fromProperties(props: Map[String, String]): Reporter =
    props.get(ReporterImplKey).filter(_.nonEmpty) match {
      case None => NopReporter
      case Some(name) =>
        val f = factories.get(name)
        if (f == null) throw new IllegalArgumentException(
          s"unknown metrics reporter '$name' (set via $ReporterImplKey)")
        f(props)
    }
}

/** Wire JSON for reports, kebab-case keys + report-type discriminator,
  * matching the reference fixtures (`metrics/testdata/commit_report.json`).
  */
object Wire {
  private val mapper = new ObjectMapper()

  private def counter(parent: ObjectNode, key: String, c: Option[CounterResult]): Unit =
    c.foreach { v =>
      val n = parent.putObject(key)
      n.put("unit", v.unit); n.put("value", v.value); ()
    }

  private def timer(parent: ObjectNode, key: String, t: Option[TimerResult]): Unit =
    t.foreach { v =>
      val n = parent.putObject(key)
      n.put("count", v.count)
      n.put("time-unit", v.timeUnit)
      n.put("total-duration", v.totalDuration); ()
    }

  def toJson(r: MetricsReport): String = r match {
    case c: CommitReport => mapper.writeValueAsString(commitNode(c))
    case s: ScanReport => mapper.writeValueAsString(scanNode(s))
  }

  /** Parse a wire-form report (the REST reportMetrics request body). The
    * discriminator chooses the shape; unknown types are an error so a
    * malformed report surfaces at the endpoint instead of being dropped.
    */
  def fromJson(s: String): MetricsReport = {
    import com.fasterxml.jackson.databind.JsonNode
    val root = mapper.readTree(s)
    def counterOf(m: JsonNode, key: String): Option[CounterResult] =
      Option(m.get(key)).map(n => CounterResult(n.get("unit").asText(), n.get("value").asLong()))
    def timerOf(m: JsonNode, key: String): Option[TimerResult] =
      Option(m.get(key)).map(n => TimerResult(n.get("time-unit").asText(),
        n.get("count").asLong(), n.get("total-duration").asLong()))
    def metadataOf(n: JsonNode): Map[String, String] =
      Option(n.get("metadata")).map { md =>
        import scala.jdk.CollectionConverters._
        md.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty)
    root.get("report-type").asText() match {
      case "scan-report" =>
        val m = root.get("metrics")
        import scala.jdk.CollectionConverters._
        ScanReport(
          tableName = root.get("table-name").asText(),
          snapshotId = root.get("snapshot-id").asLong(),
          schemaId = root.get("schema-id").asInt(),
          projectedFieldIds = Option(root.get("projected-field-ids"))
            .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil),
          projectedFieldNames = Option(root.get("projected-field-names"))
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
          filterJson = Option(root.get("filter")).map(_.toString).getOrElse(""),
          metrics = ScanMetricsResult(
            totalPlanningDuration = timerOf(m, "total-planning-duration"),
            resultDataFiles = counterOf(m, "result-data-files"),
            resultDeleteFiles = counterOf(m, "result-delete-files"),
            totalDataManifests = counterOf(m, "total-data-manifests"),
            scannedDataManifests = counterOf(m, "scanned-data-manifests"),
            skippedDataManifests = counterOf(m, "skipped-data-manifests"),
            skippedDataFiles = counterOf(m, "skipped-data-files"),
            equalityDeleteFiles = counterOf(m, "equality-delete-files"),
            positionalDeleteFiles = counterOf(m, "positional-delete-files")),
          metadata = metadataOf(root))
      case "commit-report" =>
        val m = root.get("metrics")
        CommitReport(
          tableName = root.get("table-name").asText(),
          snapshotId = root.get("snapshot-id").asLong(),
          sequenceNumber = root.get("sequence-number").asLong(),
          operation = root.get("operation").asText(),
          metrics = CommitMetricsResult(
            totalDuration = timerOf(m, "total-duration"),
            attempts = counterOf(m, "attempts"),
            addedDataFiles = counterOf(m, "added-data-files"),
            removedDataFiles = counterOf(m, "removed-data-files"),
            totalDataFiles = counterOf(m, "total-data-files"),
            addedDeleteFiles = counterOf(m, "added-delete-files"),
            removedDeleteFiles = counterOf(m, "removed-delete-files"),
            totalDeleteFiles = counterOf(m, "total-delete-files"),
            addedEqualityDeleteFiles = counterOf(m, "added-equality-delete-files"),
            addedPositionalDeleteFiles = counterOf(m, "added-positional-delete-files"),
            addedDVs = counterOf(m, "added-dvs"),
            removedDVs = counterOf(m, "removed-dvs"),
            addedRecords = counterOf(m, "added-records"),
            removedRecords = counterOf(m, "removed-records"),
            totalRecords = counterOf(m, "total-records"),
            addedFilesSizeBytes = counterOf(m, "added-files-size-bytes"),
            removedFilesSizeBytes = counterOf(m, "removed-files-size-bytes"),
            totalFilesSizeBytes = counterOf(m, "total-files-size-bytes"),
            manifestsCreated = counterOf(m, "manifests-created"),
            manifestsKept = counterOf(m, "manifests-kept"),
            manifestEntriesProcessed = counterOf(m, "manifest-entries-processed")),
          metadata = metadataOf(root))
      case other => throw new IllegalArgumentException(s"unknown report-type '$other'")
    }
  }

  private def commitNode(c: CommitReport): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("report-type", "commit-report")
    root.put("table-name", c.tableName)
    root.put("snapshot-id", c.snapshotId)
    root.put("sequence-number", c.sequenceNumber)
    root.put("operation", c.operation)
    val m = root.putObject("metrics")
    timer(m, "total-duration", c.metrics.totalDuration)
    counter(m, "attempts", c.metrics.attempts)
    counter(m, "added-data-files", c.metrics.addedDataFiles)
    counter(m, "removed-data-files", c.metrics.removedDataFiles)
    counter(m, "total-data-files", c.metrics.totalDataFiles)
    counter(m, "added-delete-files", c.metrics.addedDeleteFiles)
    counter(m, "removed-delete-files", c.metrics.removedDeleteFiles)
    counter(m, "total-delete-files", c.metrics.totalDeleteFiles)
    counter(m, "added-equality-delete-files", c.metrics.addedEqualityDeleteFiles)
    counter(m, "added-positional-delete-files", c.metrics.addedPositionalDeleteFiles)
    counter(m, "added-dvs", c.metrics.addedDVs)
    counter(m, "removed-dvs", c.metrics.removedDVs)
    counter(m, "added-records", c.metrics.addedRecords)
    counter(m, "removed-records", c.metrics.removedRecords)
    counter(m, "total-records", c.metrics.totalRecords)
    counter(m, "added-files-size-bytes", c.metrics.addedFilesSizeBytes)
    counter(m, "removed-files-size-bytes", c.metrics.removedFilesSizeBytes)
    counter(m, "total-files-size-bytes", c.metrics.totalFilesSizeBytes)
    counter(m, "manifests-created", c.metrics.manifestsCreated)
    counter(m, "manifests-kept", c.metrics.manifestsKept)
    counter(m, "manifest-entries-processed", c.metrics.manifestEntriesProcessed)
    if (c.metadata.nonEmpty) {
      val md = root.putObject("metadata")
      c.metadata.toSeq.sortBy(_._1).foreach { case (k, v) => md.put(k, v) }
    }
    root
  }

  private def scanNode(s: ScanReport): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("report-type", "scan-report")
    root.put("table-name", s.tableName)
    root.put("snapshot-id", s.snapshotId)
    root.put("schema-id", s.schemaId)
    val ids = root.putArray("projected-field-ids")
    s.projectedFieldIds.foreach(ids.add)
    val names = root.putArray("projected-field-names")
    s.projectedFieldNames.foreach(names.add)
    root.set[ObjectNode]("filter", mapper.readTree(
      if (s.filterJson.nonEmpty) s.filterJson else "true"))
    val m = root.putObject("metrics")
    timer(m, "total-planning-duration", s.metrics.totalPlanningDuration)
    counter(m, "result-data-files", s.metrics.resultDataFiles)
    counter(m, "result-delete-files", s.metrics.resultDeleteFiles)
    counter(m, "total-data-manifests", s.metrics.totalDataManifests)
    counter(m, "scanned-data-manifests", s.metrics.scannedDataManifests)
    counter(m, "skipped-data-manifests", s.metrics.skippedDataManifests)
    counter(m, "skipped-data-files", s.metrics.skippedDataFiles)
    counter(m, "equality-delete-files", s.metrics.equalityDeleteFiles)
    counter(m, "positional-delete-files", s.metrics.positionalDeleteFiles)
    if (s.metadata.nonEmpty) {
      val md = root.putObject("metadata")
      s.metadata.toSeq.sortBy(_._1).foreach { case (k, v) => md.put(k, v) }
    }
    root
  }
}
