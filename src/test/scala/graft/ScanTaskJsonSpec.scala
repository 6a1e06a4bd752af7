package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.format.{DataFile, DataFileContent, PartitionSpec}
import graft.rest.ScanTaskJson
import graft.table.FileScanTask

/** Unit coverage for the spec FileScanTask JSON wire beyond what the REST
  * gates exercise: typed partition values (date / decimal / string /
  * binary), hex bound round-trips, envelope-scoped delete dedup, and the
  * wire-error contracts (out-of-range and unreferenced delete entries).
  */
class ScanTaskJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private val schema = IcebergSchema(Seq(
    NestedField(1, "d", IcebergTypes.DateT, required = false),
    NestedField(2, "s", IcebergTypes.StringT, required = false),
    NestedField(3, "m", IcebergTypes.DecimalT(10, 2), required = false),
    NestedField(4, "b", IcebergTypes.BinaryT, required = false)), schemaId = 0)
  private val spec = PartitionSpec.builder(schema)
    .add("d", Transforms.Identity).add("s", Transforms.Identity)
    .add("m", Transforms.Identity).add("b", Transforms.Identity).build()
  private def specById(id: Int): Option[PartitionSpec] =
    if (id == spec.specId) Some(spec) else None

  private def roundTrip(tasks: Seq[FileScanTask]): Seq[FileScanTask] = {
    val o = mapper.createObjectNode()
    ScanTaskJson.writeTasks(mapper, o, tasks, specById, schema, Expr.AlwaysTrue)
    ScanTaskJson.readTasks(o, specById, schema)
  }

  test("typed partition values and bounds survive the wire") {
    val part = Seq(Int.box(19000), "seg-a",
      new java.math.BigDecimal("12345.67"), Array[Byte](1, 2, 0xfe.toByte))
    val df = DataFile(DataFileContent.Data, "/data/a.parquet", "PARQUET",
      part, 100L, 1000L,
      columnSizes = Map(1 -> 53L, 2 -> 99L),
      lowerBounds = Map(2 -> Array[Byte](0x00, 0xab.toByte)),
      upperBounds = Map(2 -> Array[Byte](0x7f, 0xff.toByte)),
      splitOffsets = Seq(4L), sortOrderId = Some(0),
      firstRowId = Some(1000L), specId = Some(spec.specId))
    val out = roundTrip(Seq(FileScanTask(df, 0L, Nil, Nil, spec.specId))).head.file
    assert(out.partition(0) === 19000)
    assert(out.partition(1) === "seg-a")
    assert(out.partition(2) === new java.math.BigDecimal("12345.67"))
    assert(out.partition(3).asInstanceOf[Array[Byte]]
      .sameElements(Array[Byte](1, 2, 0xfe.toByte)))
    assert(out.columnSizes === Map(1 -> 53L, 2 -> 99L))
    assert(out.lowerBounds(2).sameElements(Array[Byte](0x00, 0xab.toByte)))
    assert(out.upperBounds(2).sameElements(Array[Byte](0x7f, 0xff.toByte)))
    assert(out.splitOffsets === Seq(4L) && out.firstRowId === Some(1000L))
  }

  test("temporal partition values: spec ISO strings on the wire, both forms decode") {
    // the reference's decodePartitionLiteral (scan_task_decoder.go:596-660)
    // unmarshals date/time/timestamp values into STRINGS and casts via
    // StringLiteral.To — a numeric epoch form is a wire error there, so our
    // writer must emit the ISO form; our reader keeps numerics as a lenient
    // fallback for pre-spec graft peers.
    val tschema = IcebergSchema(Seq(
      NestedField(1, "d", IcebergTypes.DateT, required = false),
      NestedField(2, "t", IcebergTypes.TimeT, required = false),
      NestedField(3, "ts", IcebergTypes.TimestampT, required = false),
      NestedField(4, "tsz", IcebergTypes.TimestampTzT, required = false),
      NestedField(5, "tsn", IcebergTypes.TimestampNsT, required = false)), schemaId = 0)
    val tspec = PartitionSpec.builder(tschema)
      .add("d", Transforms.Identity).add("t", Transforms.Identity)
      .add("ts", Transforms.Identity).add("tsz", Transforms.Identity)
      .add("tsn", Transforms.Identity).build()
    def byId(id: Int) = if (id == tspec.specId) Some(tspec) else None

    val micros = 1510871468123456L // 2017-11-16T22:31:08.123456Z
    val nanos = micros * 1000L + 789L
    val df = DataFile(DataFileContent.Data, "/data/t.parquet", "PARQUET",
      Seq(Int.box(17486), Long.box(81068123456L), Long.box(micros),
        Long.box(micros), Long.box(nanos)),
      10L, 100L, specId = Some(tspec.specId))
    val o = mapper.createObjectNode()
    ScanTaskJson.writeTasks(mapper, o, Seq(FileScanTask(df, 0L, Nil, Nil, tspec.specId)),
      byId, tschema, Expr.AlwaysTrue)
    val part = o.get("file-scan-tasks").get(0).get("data-file").get("partition")
    assert(part.get(0).asText() === "2017-11-16")
    assert(part.get(1).asText() === "22:31:08.123456")
    assert(part.get(2).asText() === "2017-11-16T22:31:08.123456")
    assert(part.get(3).asText() === "2017-11-16T22:31:08.123456+00:00")
    assert(part.get(4).asText() === "2017-11-16T22:31:08.123456789")

    // spec string form decodes to the internal epoch values
    val dec = ScanTaskJson.readTasks(o, byId, tschema).head.file.partition
    assert(dec === Seq(17486, 81068123456L, micros, micros, nanos))

    // "Z" zone spelling also accepted for the tz flavor
    part.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      .set(3, mapper.getNodeFactory.textNode("2017-11-16T22:31:08.123456Z"))
    assert(ScanTaskJson.readTasks(o, byId, tschema).head.file.partition(3) === micros)

    // lenient fallback: pre-spec numeric epoch forms still decode
    val pa = part.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    pa.set(0, mapper.getNodeFactory.numberNode(17486))
    pa.set(1, mapper.getNodeFactory.numberNode(81068123456L))
    pa.set(2, mapper.getNodeFactory.numberNode(micros))
    pa.set(3, mapper.getNodeFactory.numberNode(micros))
    pa.set(4, mapper.getNodeFactory.numberNode(nanos))
    val lenient = ScanTaskJson.readTasks(o, byId, tschema).head.file.partition
    assert(lenient === Seq(17486, 81068123456L, micros, micros, nanos))
  }

  test("shared deletes dedup per envelope; refs resolve per task") {
    def data(p: String) = DataFile(DataFileContent.Data, p, "PARQUET",
      Seq(null, null, null, null), 10L, 100L, specId = Some(spec.specId))
    val dv = DataFile(DataFileContent.PositionDeletes, "/del/dv.puffin", "PUFFIN",
      Seq(null, null, null, null), 2L, 64L,
      referencedDataFile = Some("/data/a.parquet"),
      contentOffset = Some(4L), contentSize = Some(20L), specId = Some(spec.specId))
    val eq = DataFile(DataFileContent.EqualityDeletes, "/del/eq.parquet", "PARQUET",
      Seq(null, null, null, null), 3L, 80L, equalityIds = Seq(2),
      specId = Some(spec.specId))
    val tasks = Seq(
      FileScanTask(data("/data/a.parquet"), 0L, Seq(dv), Seq((eq, 1L)), spec.specId),
      FileScanTask(data("/data/b.parquet"), 0L, Nil, Seq((eq, 1L)), spec.specId))
    val o = mapper.createObjectNode()
    ScanTaskJson.writeTasks(mapper, o, tasks, specById, schema, Expr.AlwaysTrue)
    // the shared eq-delete appears ONCE in the envelope
    assert(o.get("delete-files").size() === 2)
    val out = ScanTaskJson.readTasks(o, specById, schema)
    assert(out.head.posDeletes.map(_.path) === Seq("/del/dv.puffin"))
    assert(out.head.posDeletes.head.contentOffset === Some(4L))
    assert(out.head.eqDeletes.map(_._1.path) === Seq("/del/eq.parquet"))
    assert(out(1).posDeletes.isEmpty)
    assert(out(1).eqDeletes.map(_._1.equalityIds) === Seq(Seq(2)))
  }

  // ---- reference-authored fixtures ----------------------------------------
  // The payload JSON below is transcribed VERBATIM from the reference
  // decoder's own test corpus (catalog/rest/scan_task_decoder_test.go:35-97
  // TestDecodeScanTasksFullPayload) — the fixture IS the spec; our client
  // must decode it to the same FileScanTask the Go decoder produces.

  private val refSchema = IcebergSchema(Seq(
    NestedField(1, "id", IcebergTypes.LongT, required = true),
    NestedField(2, "category", IcebergTypes.StringT, required = false),
    NestedField(3, "event_date", IcebergTypes.DateT, required = false),
    NestedField(4, "amount", IcebergTypes.DecimalT(9, 2), required = false),
    NestedField(5, "code", IcebergTypes.FixedT(4), required = false),
    NestedField(6, "event_time", IcebergTypes.TimestampTzNsT, required = false),
    NestedField(7, "score", IcebergTypes.DoubleT, required = false),
    NestedField(8, "lower_int", IcebergTypes.IntT, required = false),
    NestedField(9, "upper_int", IcebergTypes.IntT, required = false)), schemaId = 10)
  private val refSpec = PartitionSpec.builder(refSchema, specId = 7)
    .add("id", Transforms.Identity, "id_part")
    .add("event_date", Transforms.Identity, "date_part")
    .add("code", Transforms.Identity, "code_part").build()
  private def refSpecById(id: Int): Option[PartitionSpec] =
    if (id == 7) Some(refSpec) else None

  private val refFullPayload = """{
		"file-scan-tasks": [{
			"data-file": {
				"spec-id": 7,
				"partition": [34, "2026-07-17", "78797A21"],
				"content": "data",
				"file-path": "s3://bucket/table/data.parquet",
				"file-format": "parquet",
				"file-size-in-bytes": 4096,
				"record-count": 100,
				"key-metadata": "0A0B",
				"split-offsets": [4, 128],
				"sort-order-id": 3,
				"first-row-id": 99,
				"column-sizes": {"keys": [1, 2], "values": [800, 1200]},
				"value-counts": {"keys": [1, 2], "values": [100, 100]},
				"null-value-counts": {"keys": [1, 2], "values": [0, 1]},
				"nan-value-counts": {"keys": [7], "values": [2]},
				"lower-bounds": {
					"keys": [8, 9],
					"values": ["01000000", "02000000"]
				},
				"upper-bounds": {
					"keys": [8, 9],
					"values": ["05000000", "0A000000"]
				}
			},
			"delete-file-references": [0, 1, 2],
			"residual-filter": {"type": "eq", "term": "id", "value": 34}
		}],
		"delete-files": [
			{
				"spec-id": 7,
				"partition": [34, "2026-07-17", "78797A21"],
				"content": "position-deletes",
				"file-path": "s3://bucket/table/pos-delete.parquet",
				"file-format": "parquet",
				"file-size-in-bytes": 512,
				"record-count": 5
			},
			{
				"spec-id": 7,
				"partition": [34, "2026-07-17", "78797A21"],
				"content": "equality-deletes",
				"file-path": "s3://bucket/table/eq-delete.parquet",
				"file-format": "parquet",
				"file-size-in-bytes": 256,
				"record-count": 3,
				"equality-ids": [1, 2]
			},
			{
				"spec-id": 7,
				"partition": [34, "2026-07-17", "78797A21"],
				"content": "position-deletes",
				"file-path": "s3://bucket/table/deletes.puffin",
				"file-format": "puffin",
				"file-size-in-bytes": 1024,
				"record-count": 7,
				"referenced-data-file": "s3://bucket/table/data.parquet",
				"content-offset": 25,
				"content-size-in-bytes": 50
			}
		]
	}"""

  test("reference full-payload fixture decodes to the Go decoder's FileScanTask") {
    val tasks = ScanTaskJson.readTasks(mapper.readTree(refFullPayload),
      refSpecById, refSchema)
    assert(tasks.size === 1)
    val task = tasks.head
    val f = task.file
    assert(f.path === "s3://bucket/table/data.parquet")
    assert(f.fileSize === 4096L && f.recordCount === 100L)
    // partition: long identity 34, date "2026-07-17" → epoch day 20651,
    // fixed[4] hex → the raw bytes "xyz!"
    assert(f.partition(0) === 34L)
    assert(f.partition(1) === 20651)
    assert(f.partition(2).asInstanceOf[Array[Byte]]
      .sameElements("xyz!".getBytes("UTF-8")))
    assert(f.keyMetadata.get.sameElements(Array[Byte](0x0a, 0x0b)))
    assert(f.splitOffsets === Seq(4L, 128L))
    assert(f.sortOrderId === Some(3))
    assert(f.firstRowId === Some(99L))
    assert(f.columnSizes === Map(1 -> 800L, 2 -> 1200L))
    assert(f.valueCounts === Map(1 -> 100L, 2 -> 100L))
    assert(f.nullCounts === Map(1 -> 0L, 2 -> 1L))
    assert(f.nanCounts === Map(7 -> 2L))
    // bounds are hexadecimal RAW Iceberg binary, not typed JSON values
    assert(f.lowerBounds(8).sameElements(Array[Byte](1, 0, 0, 0)))
    assert(f.lowerBounds(9).sameElements(Array[Byte](2, 0, 0, 0)))
    assert(f.upperBounds(8).sameElements(Array[Byte](5, 0, 0, 0)))
    assert(f.upperBounds(9).sameElements(Array[Byte](10, 0, 0, 0)))
    // three referenced deletes: parquet pos-delete, eq-delete, puffin DV
    assert(task.posDeletes.map(_.path).toSet === Set(
      "s3://bucket/table/pos-delete.parquet", "s3://bucket/table/deletes.puffin"))
    assert(task.eqDeletes.map(_._1.path) === Seq("s3://bucket/table/eq-delete.parquet"))
    assert(task.eqDeletes.head._1.equalityIds === Seq(1, 2))
    val dv = task.posDeletes.find(_.format == "PUFFIN").get
    assert(dv.referencedDataFile === Some("s3://bucket/table/data.parquet"))
    assert(dv.contentOffset === Some(25L) && dv.contentSize === Some(50L))
  }

  test("legacy Java content spellings accepted (reference decoder contract)") {
    // reference TestDecodeScanTasksAcceptsLegacyJavaContentValues
    val doc = mapper.readTree(refFullPayload
      .replace("\"content\": \"data\"", "\"content\": \"DATA\"")
      .replace("\"content\": \"position-deletes\"", "\"content\": \"POSITION_DELETES\"")
      .replace("\"content\": \"equality-deletes\"", "\"content\": \"EQUALITY_DELETES\""))
    val tasks = ScanTaskJson.readTasks(doc, refSpecById, refSchema)
    assert(tasks.size === 1)
    assert(tasks.head.posDeletes.size === 2 && tasks.head.eqDeletes.size === 1)
  }

  test("puffin DV without referenced-data-file derives the task's target") {
    // reference TestDecodeScanTasksDerivesDeletionVectorTargetWhenOmitted
    val doc = mapper.readTree(refFullPayload.replace(
      "\"referenced-data-file\": \"s3://bucket/table/data.parquet\",\n", ""))
    assert(!doc.get("delete-files").get(2).has("referenced-data-file"))
    val tasks = ScanTaskJson.readTasks(doc, refSpecById, refSchema)
    val dv = tasks.head.posDeletes.find(_.format == "PUFFIN").get
    assert(dv.referencedDataFile === Some("s3://bucket/table/data.parquet"))
  }

  test("wire errors: out-of-range and unreferenced delete entries rejected") {
    val o = mapper.createObjectNode()
    val df = DataFile(DataFileContent.Data, "/data/a.parquet", "PARQUET",
      Seq(null, null, null, null), 10L, 100L, specId = Some(spec.specId))
    ScanTaskJson.writeTasks(mapper, o, Seq(FileScanTask(df, 0L, Nil, Nil, spec.specId)),
      specById, schema, Expr.AlwaysTrue)
    // out-of-range reference
    val bad = o.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    bad.get("file-scan-tasks").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .putArray("delete-file-references").add(0)
    val e = intercept[IllegalArgumentException](
      ScanTaskJson.readTasks(bad, specById, schema))
    assert(e.getMessage.contains("out of range"))
    // unreferenced delete entry (a server bug a client must not mask)
    val bad2 = o.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val da = bad2.putArray("delete-files")
    val stray = mapper.createObjectNode()
    stray.put("spec-id", spec.specId)
    stray.put("content", "equality-deletes")
    stray.put("file-path", "/del/stray.parquet")
    stray.put("file-format", "PARQUET")
    stray.putArray("partition")
    stray.put("file-size-in-bytes", 1L)
    stray.put("record-count", 1L)
    da.add(stray)
    val e2 = intercept[IllegalArgumentException](
      ScanTaskJson.readTasks(bad2, specById, schema))
    assert(e2.getMessage.contains("referenced by no task"))
  }
}
