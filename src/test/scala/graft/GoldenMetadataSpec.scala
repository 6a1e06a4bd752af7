package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.format.TableMetadata

/** The reference's golden metadata-JSON conformance corpus
  * (`/root/reference/table/testdata/TableMetadata*.json`,
  * `view/testdata/view-metadata.json`, `udf/testdata/udf-metadata-*.json`;
  * expected outcomes from `table/metadata_internal_test.go:1490-2170`)
  * run against OUR parsers: every valid fixture must parse and round-trip
  * losslessly through our serializer, every invalid one must be rejected
  * with the reference's error condition. Wire-format drift insurance no
  * oracle gate can give — these files were written by a different
  * implementation.
  */
class GoldenMetadataSpec extends AnyFunSuite {

  private val dir = "/root/reference/table/testdata"

  private def parse(name: String): TableMetadata =
    TableMetadata.fromJson(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/$name")), "UTF-8"))

  private def roundTrip(m: TableMetadata): Unit = {
    val again = TableMetadata.fromJson(TableMetadata.toJson(m))
    assert(again === m, "fromJson(toJson(m)) must reproduce m")
  }

  // ---- valid fixtures -----------------------------------------------------

  test("TableMetadataV2Valid parses and round-trips") {
    val m = parse("TableMetadataV2Valid.json")
    assert(m.formatVersion === 2)
    assert(m.tableUuid === "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    assert(m.lastSequenceNumber === 34)
    assert(m.schemas.size === 2 && m.currentSchemaId === 1)
    assert(m.snapshots.size === 2)
    roundTrip(m)
  }

  test("TableMetadataV2ValidMinimal parses and round-trips") {
    val m = parse("TableMetadataV2ValidMinimal.json")
    assert(m.formatVersion === 2)
    assert(m.schema.fields.map(_.name) === Seq("x", "y", "z"))
    roundTrip(m)
  }

  test("TableMetadataV3WithPartitionStatistics parses, stats survive round-trip") {
    val m = parse("TableMetadataV3WithPartitionStatistics.json")
    assert(m.formatVersion === 3)
    assert(m.partitionStatistics.size === 2)
    val s0 = m.partitionStatistics(0)
    assert(s0.snapshotId === 3051729675574597004L)
    assert(s0.path ===
      "s3://bucket/test/location/metadata/partition-stats/snap-3051729675574597004.parquet")
    assert(s0.fileSizeInBytes === 42330L)
    val s1 = m.partitionStatistics(1)
    assert(s1.snapshotId === 3055729675574597004L)
    assert(s1.fileSizeInBytes === 65871L)
    val again = TableMetadata.fromJson(TableMetadata.toJson(m))
    assert(again.partitionStatistics === m.partitionStatistics)
    assert(again === m)
  }

  test("zstd golden fixture decompresses to the minimal metadata") {
    // suffix-sniffed decode through the same reader the catalogs use
    val json = graft.table.Locations.readMetadataJson(
      s"$dir/TableMetadataV2Valid.zstd.metadata.json")
    val m = TableMetadata.fromJson(json)
    val expected = parse("TableMetadataV2ValidMinimal.json")
    assert(m === expected)
  }

  test("V1 partition-specs without default-spec-id infer the max spec id") {
    val m = parse("TableMetadataV1PartitionSpecsWithoutDefaultId.json")
    assert(m.formatVersion === 1)
    assert(m.tableUuid === "d20125c8-7284-442c-9aea-15fee620737c")
    assert(m.partitionSpecs.size === 2)
    assert(m.defaultSpecId === 2)
    val spec = m.spec
    assert(spec.specId === 2)
    assert(spec.fields.size === 1)
    assert(spec.fields.head.name === "y")
    assert(spec.fields.head.sourceId === 2)
    assert(spec.fields.head.transform === graft.core.Transforms.Identity)
  }

  // reference partitions.go UnmarshalJSON + TestDeserializePartitionSpec
  // {WithoutFieldIDs,WithPartiallyMissingFieldIDs,AssignsAfterExisting
  // FieldIDs,WithNullFieldID}: legacy v1 specs may omit (or null) field-ids;
  // explicit ids KEEP, missing ones assign sequentially after the highest
  // of (999, explicit) — a fixed fallback hands duplicates to multi-field
  // specs
  test("partition-spec fields without ids assign after the highest explicit id") {
    def specOf(fieldsJson: String) = TableMetadata.fromJson(s"""{
      "format-version": 1,
      "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
      "location": "file:///tmp/t",
      "last-updated-ms": 1,
      "last-column-id": 3,
      "schema": {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "x", "required": true, "type": "long"},
        {"id": 2, "name": "y", "required": true, "type": "long"},
        {"id": 3, "name": "z", "required": true, "type": "long"}]},
      "partition-spec": [$fieldsJson],
      "properties": {}
    }""").spec

    // all ids missing: 1000, 1001, ...
    val s1 = specOf("""
      {"source-id": 1, "name": "x", "transform": "identity"},
      {"source-id": 2, "name": "y", "transform": "identity"}""")
    assert(s1.fields.map(_.fieldId) === Seq(1000, 1001))

    // partially missing + null: explicit kept, rest assign AFTER the max
    val s2 = specOf("""
      {"source-id": 1, "field-id": 1005, "name": "x", "transform": "identity"},
      {"source-id": 2, "field-id": null, "name": "y", "transform": "identity"},
      {"source-id": 3, "name": "z", "transform": "identity"}""")
    assert(s2.fields.map(_.fieldId) === Seq(1005, 1006, 1007))
    assert(s2.fields.map(_.fieldId).distinct.size === 3, "ids must be unique")
  }

  // reference TestUnmarshalSchemaRejectsDuplicateFieldIDs: duplicate ids are
  // corrupt metadata — the id-addressed read/prune paths would silently pick
  // one field; the parse must fail instead
  test("schema JSON with duplicate field ids is rejected") {
    val e = intercept[IllegalArgumentException](graft.core.SchemaJson.schemaFromJson("""
      {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "a", "required": true, "type": "long"},
        {"id": 1, "name": "b", "required": false, "type": "string"}]}"""))
    assert(e.getMessage.contains("duplicate field id"))
    // nested collisions detected too (struct child vs top-level)
    val e2 = intercept[IllegalArgumentException](graft.core.SchemaJson.schemaFromJson("""
      {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "a", "required": true, "type": "long"},
        {"id": 2, "name": "s", "required": false, "type":
          {"type": "struct", "fields": [
            {"id": 1, "name": "inner", "required": false, "type": "int"}]}}]}"""))
    assert(e2.getMessage.contains("duplicate field id"))
  }

  test("V1 schemas without current-schema-id resolve via the inline schema") {
    val m = parse("TableMetadataV1SchemasWithoutCurrentId.json")
    assert(m.formatVersion === 1)
    assert(m.tableUuid === "d20125c8-7284-442c-9aea-15fee620737c")
    assert(m.schema.fields.map(_.name) === Seq("x", "y", "z"))
  }

  // ---- invalid fixtures ---------------------------------------------------

  private def rejects(name: String, msgPart: String): Unit = {
    val e = intercept[IllegalArgumentException](parse(name))
    assert(e.getMessage.contains(msgPart),
      s"$name: expected '$msgPart' in '${e.getMessage}'")
  }

  test("V3 without next-row-id is rejected (row-lineage cursor required)") {
    // reference metadata.go checkNextRowID: a v3 table without the cursor
    // cannot assign non-overlapping _row_id blocks
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/TableMetadataV3WithPartitionStatistics.json")), "UTF-8")
    assert(raw.contains("next-row-id"), "reference fixture carries the cursor")
    val stripped = raw.replaceAll(""""next-row-id"\s*:\s*\d+\s*,?""", "")
    val e = intercept[IllegalArgumentException](TableMetadata.fromJson(stripped))
    assert(e.getMessage.contains("next-row-id is required"))
    val negative = raw.replaceAll(""""next-row-id"\s*:\s*\d+""", """"next-row-id": -5""")
    val e2 = intercept[IllegalArgumentException](TableMetadata.fromJson(negative))
    assert(e2.getMessage.contains("non-negative"))
  }

  test("V1 with no valid schema configuration is rejected") {
    rejects("TableMetadataV1NoValidSchema.json",
      "no valid schema configuration found in table metadata")
  }

  test("V2 current-schema-id not found is rejected") {
    rejects("TableMetadataV2CurrentSchemaNotFound.json",
      "current-schema-id 2 can't be found in any schema")
  }

  test("V2 missing schemas is rejected") {
    rejects("TableMetadataV2MissingSchemas.json",
      "no valid schema configuration found in table metadata")
  }

  test("V2 missing partition-specs is rejected") {
    rejects("TableMetadataV2MissingPartitionSpecs.json",
      "missing partition-specs")
  }

  test("V2 missing last-partition-id is rejected") {
    rejects("TableMetadataV2MissingLastPartitionId.json",
      "last-partition-id must be set for FormatVersion > 1")
  }

  test("V2 missing sort-orders is rejected") {
    rejects("TableMetadataV2MissingSortOrder.json", "missing sort-orders")
  }

  // ---- view + udf spec-format fixtures ------------------------------------

  test("view-metadata.json (Iceberg view spec spelling) parses") {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/view/testdata/view-metadata.json")), "UTF-8")
    val v = graft.catalog.ViewJson.fromJson(raw)
    assert(v.currentVersionId === 2)
    assert(v.versions.map(_.versionId) === Seq(1, 2))
    assert(v.currentVersion.sql.contains("GROUP BY 2"))
    assert(v.currentVersion.sql.contains("prod.default.events"))
    assert(v.currentVersion.dialect === "spark")
    assert(v.currentVersion.defaultCatalog === Some("prod"))
    assert(v.currentVersion.defaultNamespace === Seq("default"))
    assert(v.properties.get("view-uuid") ===
      Some("fa6506c3-7681-40c8-86dc-e36561f83385"))
    assert(v.properties.get("comment") === Some("Daily event counts"))
    // per-version schema resolved from the schemas list
    assert(v.currentVersion.schemaJson.exists(_.contains("event_count")))
    // round-trip through OUR serializer preserves the captured surface
    val again = graft.catalog.ViewJson.fromJson(graft.catalog.ViewJson.toJson(v))
    assert(again.versions.map(ver => (ver.versionId, ver.sql, ver.dialect)) ===
      v.versions.map(ver => (ver.versionId, ver.sql, ver.dialect)))
    assert(again.currentVersionId === v.currentVersionId)
    assert(again.properties === v.properties)
  }

  test("udf-metadata fixtures (Iceberg UDF spec spelling) parse") {
    def load(f: String): Seq[graft.catalog.UdfDef] =
      graft.catalog.UdfJson.fromJson(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/udf/testdata/$f")), "UTF-8"))
    val scalar = load("udf-metadata-scalar.json")
    assert(scalar.map(_.name) === Seq("int", "float"))
    val intDef = scalar.head
    assert(intDef.returnType === "int")
    // current version (2) body, not the superseded v1 "x + 2"
    assert(intDef.definition === "x + 1")
    assert(intDef.parameters === Seq("x" -> "int"))
    val table = load("udf-metadata-table.json")
    assert(table.nonEmpty)
    assert(table.forall(_.definition.nonEmpty))
  }
}
