package graft

import java.nio.ByteBuffer
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.format._

/** Manifest + manifest-list Avro WIRE conformance against the reference's
  * own schemas and fixtures. The reference publishes its exact wire schemas
  * (`internal/avro_schemas.go:196-335`) and fixture values
  * (`manifest_test.go:42-480`); this suite re-authors those bytes with
  * avro-java from the reference schemas VERBATIM — fully independent of our
  * writer's schema declaration — and asserts:
  *
  *  1. our reader decodes reference-schema v1/v2 manifests and manifest
  *     lists to the reference's expected values (incl. v1 field-absence
  *     defaults: content=data, no sequence numbers, nullable counts);
  *  2. pre-1.4 Java Iceberg LEGACY field names
  *     (`added_data_files_count` …, `manifest_test.go:850-947`) decode
  *     correctly — the silent-zero-counts interop trap;
  *  3. the reverse direction: files OUR writer produces resolve under the
  *     reference's reader schema with byte-identical stats — so a
  *     reference-schema engine can consume our tables.
  */
class ManifestGoldenSpec extends AnyFunSuite {

  // ---- reference fixture values (manifest_test.go:42-110,120-265) --------

  private val snapshotId = 9182715666859759686L
  private val entrySnapshotId = 8744736658442914487L
  private val addedRows = 237993L
  private val taxiManifestPath =
    "/home/iceberg/warehouse/nyc/taxis_partitioned/metadata/0125c686-8aa6-4502-bdcc-b6d17ca41a3b-m0.avro"
  private val entry0Path =
    "/home/iceberg/warehouse/nyc/taxis_partitioned/data/VendorID=null/00000-633-d8a4223e-dc97-45a1-86e1-adaba6e8abd7-00001.parquet"
  private val entry1Path =
    "/home/iceberg/warehouse/nyc/taxis_partitioned/data/VendorID=1/00000-633-d8a4223e-dc97-45a1-86e1-adaba6e8abd7-00002.parquet"

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val colSizes0 = Map(1 -> 53L, 2 -> 98153L, 3 -> 98693L, 4 -> 53L,
    5 -> 53L, 6 -> 53L, 7 -> 17425L, 8 -> 18528L, 9 -> 53L, 10 -> 44788L,
    11 -> 35571L, 12 -> 53L, 13 -> 1243L, 14 -> 2355L, 15 -> 12750L,
    16 -> 4029L, 17 -> 110L, 18 -> 47194L, 19 -> 2948L)
  private val valCounts0 = (1 to 19).map(_ -> 19513L).toMap
  private val nullCounts0 = (1 to 19).map(i =>
    i -> (if (Set(1, 4, 5, 6, 9, 12)(i)) 19513L else 0L)).toMap
  private val nanCounts0 = (10 to 19).map(_ -> 0L).toMap
  private val lower0: Map[Int, Array[Byte]] = Map(
    2 -> "2020-04-01 00:00".getBytes, 3 -> "2020-04-01 00:12".getBytes,
    7 -> hx("03000000"), 8 -> hx("01000000"),
    10 -> hx("f6285c8fc20553c0"), 11 -> hx("0000000000000000"),
    13 -> hx("0000000000000000"), 14 -> hx("000000000000e0bf"),
    15 -> hx("295c8fc2f52808c0"), 16 -> hx("0000000000000000"),
    17 -> hx("0000000000000000"), 18 -> hx("f6285c8fc2c553c0"),
    19 -> hx("00000000000004c0"))
  private val upper0: Map[Int, Array[Byte]] = Map(
    2 -> "2020-04-30 23:5:".getBytes, 3 -> "2020-05-01 00:41".getBytes,
    7 -> hx("09010000"), 8 -> hx("09010000"),
    10 -> hx("cdcccccccc2c5f40"), 11 -> hx("1f85eb515ce2fe40"),
    13 -> hx("0000000000001240"), 14 -> hx("000000000000e03f"),
    15 -> hx("713d0ad7a3f03140"), 16 -> hx("0000000000604240"),
    17 -> hx("333333333333d33f"), 18 -> hx("0000000000186240"),
    19 -> hx("0000000000000440"))

  // ---- reference wire schemas, ported verbatim ---------------------------

  // partition record for the taxis fixture (VendorID int, pickup ts long)
  private val partSchemaJson =
    """{"type":"record","name":"r102","fields":[
      {"name":"VendorID","type":["null","int"],"default":null,"field-id":1000},
      {"name":"tpep_pickup_datetime","type":["null",{"type":"long","logicalType":"timestamp-micros"}],"default":null,"field-id":1001}]}"""

  private def kv(name: String, kId: Int, vId: Int, vType: String) =
    s"""{"type":"array","items":{"type":"record","name":"$name","fields":[
      {"name":"key","type":"int","field-id":$kId},
      {"name":"value","type":"$vType","field-id":$vId}]},"logicalType":"map"}"""

  private val statsFields =
    s"""{"name":"column_sizes","type":["null",${kv("k117_v118", 117, 118, "long")}],"default":null,"field-id":108},
      {"name":"value_counts","type":["null",${kv("k119_v120", 119, 120, "long")}],"default":null,"field-id":109},
      {"name":"null_value_counts","type":["null",${kv("k121_v122", 121, 122, "long")}],"default":null,"field-id":110},
      {"name":"nan_value_counts","type":["null",${kv("k138_v139", 138, 139, "long")}],"default":null,"field-id":137},
      {"name":"lower_bounds","type":["null",${kv("k126_v127", 126, 127, "bytes")}],"default":null,"field-id":125},
      {"name":"upper_bounds","type":["null",${kv("k129_v130", 129, 130, "bytes")}],"default":null,"field-id":128},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
      {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132}"""

  /** data_file v1 (avro_schemas.go:240-268): no content, block_size present
    * with the 64 MB default, no equality_ids.
    */
  private val refEntryV1Schema: String =
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":"long","field-id":1},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":$partSchemaJson,"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"block_size_in_bytes","type":"long","default":67108864,"field-id":105},
        $statsFields,
        {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
      ]},"field-id":2}]}"""

  /** data_file v2 (avro_schemas.go:270-315): content first, sequence
    * numbers on the entry, equality_ids present, no block_size.
    */
  private val refEntryV2Schema: String =
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","default":0,"field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":$partSchemaJson,"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        $statsFields,
        {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
        {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
      ]},"field-id":2}]}"""

  /** manifest_file v1 (avro_schemas.go:196-216): nullable counts, no
    * content / sequence numbers.
    */
  private val refListV1Schema: String =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":["null","int"],"default":null,"field-id":504},
      {"name":"existing_files_count","type":["null","int"],"default":null,"field-id":505},
      {"name":"deleted_files_count","type":["null","int"],"default":null,"field-id":506},
      {"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[
        {"name":"contains_null","type":"boolean","field-id":509},
        {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
        {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
        {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      ]},"element-id":508}],"default":null,"field-id":507},
      {"name":"added_rows_count","type":["null","long"],"default":null,"field-id":512},
      {"name":"existing_rows_count","type":["null","long"],"default":null,"field-id":513},
      {"name":"deleted_rows_count","type":["null","long"],"default":null,"field-id":514},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}]}"""

  /** manifest_file v2 (avro_schemas.go:218-238). */
  private val refListV2Schema: String =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","default":0,"field-id":517},
      {"name":"sequence_number","type":"long","default":0,"field-id":515},
      {"name":"min_sequence_number","type":"long","default":0,"field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[
        {"name":"contains_null","type":"boolean","field-id":509},
        {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
        {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
        {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      ]},"element-id":508}],"default":null,"field-id":507},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}]}"""

  /** Pre-1.4 Java legacy names, VERBATIM from manifest_test.go:854-869. */
  private val legacyListV1Schema: String =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
      {"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
      {"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506},
      {"name":"added_rows_count","type":["null","long"],"default":null,"field-id":512},
      {"name":"existing_rows_count","type":["null","long"],"default":null,"field-id":513},
      {"name":"deleted_rows_count","type":["null","long"],"default":null,"field-id":514}]}"""

  /** Legacy names on the v2 shape, VERBATIM from manifest_test.go:925-947. */
  private val legacyListV2Schema: String =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_data_files_count","type":"int","field-id":504},
      {"name":"existing_data_files_count","type":"int","field-id":505},
      {"name":"deleted_data_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514}]}"""

  // ---- avro-java authoring helpers ---------------------------------------

  private def writeOcf(schemaJson: String, meta: Map[String, String],
      records: Seq[Schema => GenericRecord]): String = {
    val schema = new Schema.Parser().parse(schemaJson)
    val path = Files.createTempFile("graft-golden", ".avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, path.toFile)
    records.foreach(mk => w.append(mk(schema)))
    w.close()
    path.toString
  }

  private def kvArr(root: Schema, field: String, m: Map[Int, Any]): Any = {
    if (m.isEmpty) return null
    val arrSchema = root.getField(field).schema().getTypes.get(1)
    val item = arrSchema.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, arrSchema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(item)
      r.put("key", k); r.put("value", v); arr.add(r)
    }
    arr
  }

  private def mkDataFile(df: Schema, path: String, withStats: Boolean): GenericRecord = {
    val r = new GenericData.Record(df)
    if (df.getField("content") != null) r.put("content", 0)
    r.put("file_path", path)
    r.put("file_format", "PARQUET")
    val ps = df.getField("partition").schema()
    val part = new GenericData.Record(ps)
    part.put("VendorID", if (path.contains("VendorID=null")) null else Int.box(1))
    part.put("tpep_pickup_datetime", Long.box(1925000000L))
    r.put("partition", part)
    r.put("record_count", if (withStats) 19513L else 95050L)
    r.put("file_size_in_bytes", if (withStats) 388872L else 1265950L)
    if (df.getField("block_size_in_bytes") != null)
      r.put("block_size_in_bytes", 67108864L)
    if (withStats) {
      r.put("column_sizes", kvArr(df, "column_sizes", colSizes0.map { case (k, v) => k -> Long.box(v) }))
      r.put("value_counts", kvArr(df, "value_counts", valCounts0.map { case (k, v) => k -> Long.box(v) }))
      r.put("null_value_counts", kvArr(df, "null_value_counts", nullCounts0.map { case (k, v) => k -> Long.box(v) }))
      r.put("nan_value_counts", kvArr(df, "nan_value_counts", nanCounts0.map { case (k, v) => k -> Long.box(v) }))
      r.put("lower_bounds", kvArr(df, "lower_bounds", lower0.map { case (k, v) => k -> ByteBuffer.wrap(v) }))
      r.put("upper_bounds", kvArr(df, "upper_bounds", upper0.map { case (k, v) => k -> ByteBuffer.wrap(v) }))
      r.put("split_offsets", java.util.List.of(Long.box(4L)))
      r.put("sort_order_id", Int.box(0))
      if (df.getField("equality_ids") != null)
        r.put("equality_ids", java.util.List.of(Int.box(1), Int.box(2)))
    }
    r
  }

  private val entryMeta = Map(
    "schema" -> """{"type":"struct","schema-id":0,"fields":[{"id":1,"name":"VendorID","required":false,"type":"int"}]}""",
    "schema-id" -> "0",
    "partition-spec" -> """[{"source-id":1,"field-id":1000,"name":"VendorID","transform":"identity"}]""",
    "partition-spec-id" -> "0")

  // ---- 1) reference v1 manifest wire → our reader ------------------------

  test("reference v1 manifest entries decode with v1 field-absence defaults") {
    val p = writeOcf(refEntryV1Schema, entryMeta + ("format-version" -> "1"), Seq(
      { s =>
        val r = new GenericData.Record(s)
        r.put("status", 1)
        r.put("snapshot_id", entrySnapshotId) // v1: REQUIRED long
        r.put("data_file", mkDataFile(s.getField("data_file").schema(), entry0Path, withStats = true))
        r
      },
      { s =>
        val r = new GenericData.Record(s)
        r.put("status", 1)
        r.put("snapshot_id", entrySnapshotId)
        r.put("data_file", mkDataFile(s.getField("data_file").schema(), entry1Path, withStats = false))
        r
      }))
    val (entries, specId) = Manifests.readManifest(p)
    assert(specId === 0)
    assert(entries.size === 2)
    val e0 = entries.head
    assert(e0.status === 1)
    assert(e0.snapshotId === Some(entrySnapshotId))
    // v1 wire has no sequence-number fields: absent, not zero
    assert(e0.dataSequence === None && e0.fileSequence === None)
    val f0 = e0.file
    assert(f0.content === 0, "v1 wire has no content field; must default to data")
    assert(f0.path === entry0Path)
    assert(f0.format.equalsIgnoreCase("PARQUET"))
    assert(f0.recordCount === 19513L && f0.fileSize === 388872L)
    assert(f0.columnSizes === colSizes0)
    assert(f0.valueCounts === valCounts0)
    assert(f0.nullCounts === nullCounts0)
    assert(f0.nanCounts === nanCounts0)
    assert(f0.lowerBounds.keySet === lower0.keySet)
    lower0.foreach { case (k, v) => assert(f0.lowerBounds(k).sameElements(v), s"lower bound $k") }
    upper0.foreach { case (k, v) => assert(f0.upperBounds(k).sameElements(v), s"upper bound $k") }
    assert(f0.splitOffsets === Seq(4L))
    assert(f0.sortOrderId === Some(0))
    assert(f0.equalityIds === Nil)
    assert(f0.partition === Seq(null, 1925000000L))
    val f1 = entries(1).file
    assert(f1.path === entry1Path)
    assert(f1.recordCount === 95050L && f1.fileSize === 1265950L)
    // authored without stats: null unions decode to empty, not failure
    assert(f1.columnSizes.isEmpty && f1.lowerBounds.isEmpty && f1.splitOffsets.isEmpty)
    assert(f1.partition === Seq(1, 1925000000L))
  }

  test("reference v2 manifest entries decode incl. equality ids + sequences") {
    val p = writeOcf(refEntryV2Schema, entryMeta + ("format-version" -> "2"), Seq(
      { s =>
        val r = new GenericData.Record(s)
        r.put("status", 1)
        r.put("snapshot_id", Long.box(entrySnapshotId))
        r.put("sequence_number", Long.box(3L))
        r.put("file_sequence_number", Long.box(3L))
        r.put("data_file", mkDataFile(s.getField("data_file").schema(), entry0Path, withStats = true))
        r
      }))
    val (entries, _) = Manifests.readManifest(p)
    val e = entries.head
    assert(e.dataSequence === Some(3L) && e.fileSequence === Some(3L))
    assert(e.file.equalityIds === Seq(1, 2))
    assert(e.file.columnSizes === colSizes0)
    upper0.foreach { case (k, v) => assert(e.file.upperBounds(k).sameElements(v)) }
  }

  // ---- 2) reference manifest-list wire → our reader ----------------------

  private def summary(s: Schema): GenericRecord = {
    val r = new GenericData.Record(s)
    r.put("contains_null", true)
    r.put("contains_nan", Boolean.box(false))
    r.put("lower_bound", ByteBuffer.wrap(hx("01000000")))
    r.put("upper_bound", ByteBuffer.wrap(hx("02000000")))
    r
  }

  test("reference v1 manifest list decodes (nullable counts, no content/sequence)") {
    val p = writeOcf(refListV1Schema,
      Map("snapshot-id" -> snapshotId.toString, "format-version" -> "1"), Seq({ s =>
        val r = new GenericData.Record(s)
        r.put("manifest_path", taxiManifestPath)
        r.put("manifest_length", 7989L)
        r.put("partition_spec_id", 1)
        r.put("added_snapshot_id", snapshotId)
        r.put("added_files_count", Int.box(3))
        r.put("existing_files_count", Int.box(0))
        r.put("deleted_files_count", Int.box(0))
        val arrS = s.getField("partitions").schema().getTypes.get(1)
        val arr = new GenericData.Array[GenericRecord](1, arrS)
        arr.add(summary(arrS.getElementType))
        r.put("partitions", arr)
        r.put("added_rows_count", Long.box(addedRows))
        r
      }))
    val list = Manifests.readManifestList(p)
    assert(list.size === 1)
    val m = list.head
    assert(m.path === taxiManifestPath && m.length === 7989L && m.specId === 1)
    assert(m.content === 0 && m.sequenceNumber === 0L && m.minSequenceNumber === 0L)
    assert(m.addedSnapshotId === snapshotId)
    assert(m.addedFilesCount === 3 && m.existingFilesCount === 0 && m.deletedFilesCount === 0)
    assert(m.addedRowsCount === addedRows)
    assert(m.existingRowsCount === 0L && m.deletedRowsCount === 0L)
    val ps = m.partitions.head
    assert(ps.containsNull && ps.containsNan === Some(false))
    assert(ps.lowerBound.get.sameElements(hx("01000000")))
    assert(ps.upperBound.get.sameElements(hx("02000000")))
  }

  test("reference v2 manifest list decodes (content=deletes, sequences)") {
    val p = writeOcf(refListV2Schema,
      Map("snapshot-id" -> snapshotId.toString, "format-version" -> "2"), Seq({ s =>
        val r = new GenericData.Record(s)
        r.put("manifest_path", taxiManifestPath)
        r.put("manifest_length", 7989L)
        r.put("partition_spec_id", 2)
        r.put("content", 1)
        r.put("sequence_number", 3L)
        r.put("min_sequence_number", 3L)
        r.put("added_snapshot_id", snapshotId)
        r.put("added_files_count", 3)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        val arrS = s.getField("partitions").schema().getTypes.get(1)
        val arr = new GenericData.Array[GenericRecord](1, arrS)
        arr.add(summary(arrS.getElementType))
        r.put("partitions", arr)
        r.put("added_rows_count", addedRows)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        r
      }))
    val m = Manifests.readManifestList(p).head
    assert(m.specId === 2 && m.content === 1)
    assert(m.sequenceNumber === 3L && m.minSequenceNumber === 3L)
    assert(m.addedFilesCount === 3 && m.addedRowsCount === addedRows)
  }

  // ---- 3) pre-1.4 Java legacy field names --------------------------------

  test("legacy added_data_files_count spellings decode (pre-1.4 Java wire)") {
    val pv1 = writeOcf(legacyListV1Schema, Map.empty, Seq({ s =>
      val r = new GenericData.Record(s)
      r.put("manifest_path", "/path/to/manifest.avro")
      r.put("manifest_length", 1234L)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_data_files_count", Int.box(3))
      r.put("existing_data_files_count", Int.box(1))
      r.put("deleted_data_files_count", Int.box(2))
      r.put("added_rows_count", Long.box(100L))
      r
    }))
    val m1 = Manifests.readManifestList(pv1).head
    assert(m1.addedFilesCount === 3 && m1.existingFilesCount === 1 &&
      m1.deletedFilesCount === 2, "legacy v1 counts must not silently decode to 0")
    assert(m1.addedRowsCount === 100L)

    val pv2 = writeOcf(legacyListV2Schema, Map("format-version" -> "2"), Seq({ s =>
      val r = new GenericData.Record(s)
      r.put("manifest_path", "/path/to/manifest.avro")
      r.put("manifest_length", 1234L)
      r.put("partition_spec_id", 0)
      r.put("content", 0)
      r.put("sequence_number", 3L)
      r.put("min_sequence_number", 3L)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_data_files_count", 3)
      r.put("existing_data_files_count", 1)
      r.put("deleted_data_files_count", 2)
      r.put("added_rows_count", 100L)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      r
    }))
    val m2 = Manifests.readManifestList(pv2).head
    assert(m2.addedFilesCount === 3 && m2.existingFilesCount === 1 &&
      m2.deletedFilesCount === 2 && m2.sequenceNumber === 3L)
  }

  // ---- 4) our wire under the reference reader schema ---------------------

  test("our manifest wire resolves under the reference v2 reader schema") {
    import graft.core._
    val schema = IcebergSchema(Seq(
      NestedField(1, "VendorID", IcebergTypes.IntT, required = false),
      NestedField(2, "tpep_pickup_datetime", IcebergTypes.TimestampT, required = false)),
      schemaId = 0)
    val spec = PartitionSpec.builder(schema).add("VendorID", Transforms.Identity).build()
    val entry = ManifestEntry(1, Some(entrySnapshotId), Some(3L), Some(3L),
      DataFile(0, entry0Path, "PARQUET", Seq(Int.box(1)), 19513L, 388872L,
        columnSizes = colSizes0, valueCounts = valCounts0,
        nullCounts = nullCounts0, nanCounts = nanCounts0,
        lowerBounds = lower0, upperBounds = upper0,
        splitOffsets = Seq(4L), equalityIds = Seq(1, 2), sortOrderId = Some(0)))
    val path = Files.createTempDirectory("graft-golden-w").toString + "/m0.avro"
    Manifests.writeManifest(path, Seq(entry), schema, spec, entrySnapshotId)

    // reference v2 entry schema with OUR partition shape as the reader
    // schema: avro resolution by name proves a reference-schema engine can
    // consume our wire, byte-identically
    val refPart = """{"type":"record","name":"r102","fields":[
      {"name":"VendorID","type":["null","int"],"default":null,"field-id":1000}]}"""
    val readerSchema = new Schema.Parser().parse(
      refEntryV2Schema.replace(partSchemaJson, refPart))
    val rdr = new DataFileReader(new java.io.File(path),
      new GenericDatumReader[GenericRecord](null, readerSchema))
    try {
      assert(rdr.hasNext)
      val r = rdr.next()
      assert(r.get("status") === 1)
      assert(r.get("snapshot_id") === entrySnapshotId)
      assert(r.get("sequence_number") === 3L)
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      assert(df.get("content") === 0)
      assert(df.get("file_path").toString === entry0Path)
      assert(df.get("record_count") === 19513L)
      val sizes = df.get("column_sizes").asInstanceOf[java.util.List[GenericRecord]]
        .asScala.map(kv => kv.get("key").asInstanceOf[Int] -> kv.get("value").asInstanceOf[Long]).toMap
      assert(sizes === colSizes0)
      val ub = df.get("upper_bounds").asInstanceOf[java.util.List[GenericRecord]]
        .asScala.map(kv => kv.get("key").asInstanceOf[Int] ->
          kv.get("value").asInstanceOf[ByteBuffer]).toMap
      upper0.foreach { case (k, v) =>
        val bb = ub(k); val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        assert(a.sameElements(v), s"upper bound $k drifted on our wire")
      }
      val eq = df.get("equality_ids").asInstanceOf[java.util.List[Any]].asScala.map(_.asInstanceOf[Int])
      assert(eq === Seq(1, 2))
      val part = df.get("partition").asInstanceOf[GenericRecord]
      assert(part.get("VendorID") === 1)
    } finally rdr.close()
  }

  test("format-version outside [1,3] rejected; missing key defaults fine") {
    // reference manifest_test.go:1056-1160: -1/0/4 must fail loudly (a v4
    // wire decoded as v3 silently drops semantics); missing = v1-era Java
    for (bad <- Seq("-1", "0", "4")) {
      val p = writeOcf(refListV2Schema, Map("format-version" -> bad), Nil)
      val ex = intercept[IllegalArgumentException](Manifests.readManifestList(p))
      assert(ex.getMessage.contains("unsupported manifest format version"))
      val p2 = writeOcf(refEntryV1Schema, entryMeta + ("format-version" -> bad), Nil)
      val ex2 = intercept[IllegalArgumentException](Manifests.readManifest(p2))
      assert(ex2.getMessage.contains("unsupported manifest format version"))
    }
    val ok = writeOcf(refListV2Schema, Map.empty, Nil)
    assert(Manifests.readManifestList(ok).isEmpty)
    val ok2 = writeOcf(refEntryV1Schema, entryMeta, Nil)
    assert(Manifests.readManifest(ok2)._1.isEmpty)
  }

  test("day-transform partition value reads the same from int and date encodings") {
    // spec: day(...) result type is date, but engines in the wild write the
    // partition field as PLAIN avro int too — both must surface the same
    // day number (reference manifest_day_partition_test.go, iceberg-go#1200)
    val dayValue = 19000 // 2022-01-08
    def entrySchemaWith(partField: String): String =
      refEntryV2Schema.replace(partSchemaJson,
        s"""{"type":"record","name":"r102","fields":[
          {"name":"ts_day","type":["null",$partField],"default":null,"field-id":1000}]}""")
    val meta = entryMeta +
      ("partition-spec" ->
        """[{"source-id":1,"field-id":1000,"name":"ts_day","transform":"day"}]""") +
      ("format-version" -> "2")
    val decoded = Seq("\"int\"", """{"type":"int","logicalType":"date"}""").map { enc =>
      val p = writeOcf(entrySchemaWith(enc), meta, Seq({ s =>
        val r = new GenericData.Record(s)
        r.put("status", 1)
        r.put("snapshot_id", Long.box(42L))
        val dfS = s.getField("data_file").schema()
        val df = new GenericData.Record(dfS)
        df.put("content", 0)
        df.put("file_path", "s3://bucket/ns/t/data/00000-0-day.parquet")
        df.put("file_format", "PARQUET")
        val part = new GenericData.Record(dfS.getField("partition").schema())
        part.put("ts_day", Int.box(dayValue))
        df.put("partition", part)
        df.put("record_count", 100L)
        df.put("file_size_in_bytes", 1024L)
        r.put("data_file", df)
        r
      }))
      Manifests.readManifest(p)._1.head.file.partition.head
    }
    assert(decoded === Seq(dayValue, dayValue),
      s"both avro encodings must normalize to the day number, got $decoded")
  }

  test("compressed manifest wire: zstd files read; our writer emits deflate") {
    // reference TestNewManifestReaderZstdManifestEntriesV2: other engines
    // write zstd-compressed manifest avro; the codec rides the OCF header
    val schema = new Schema.Parser().parse(refEntryV2Schema)
    val path = Files.createTempFile("graft-zstd", ".avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.zstandardCodec(3))
    entryMeta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, path.toFile)
    val r = new GenericData.Record(schema)
    r.put("status", 1)
    r.put("snapshot_id", Long.box(entrySnapshotId))
    r.put("data_file", mkDataFile(schema.getField("data_file").schema(), entry0Path, withStats = true))
    w.append(r); w.close()
    val (entries, _) = Manifests.readManifest(path.toString)
    assert(entries.head.file.path === entry0Path)
    assert(entries.head.file.columnSizes === colSizes0)

    // our writer compresses by default (reference writes deflate always);
    // write.avro.compression-codec=uncompressed opts out
    import graft.core._
    val s2 = IcebergSchema(Seq(
      NestedField(1, "x", IcebergTypes.IntT, required = false)), schemaId = 0)
    val spec = PartitionSpec.Unpartitioned
    val dir = Files.createTempDirectory("graft-codec").toString
    def entryN(i: Int) = ManifestEntry(1, Some(1L), Some(1L), Some(1L),
      DataFile(0, s"/data/f$i.parquet", "PARQUET", Nil, 10L, 1000L,
        lowerBounds = Map(1 -> Array.fill(64)(0x41.toByte))))
    val es = (0 until 50).map(entryN)
    Manifests.writeManifest(s"$dir/c.avro", es, s2, spec, 1L)
    Manifests.writeManifest(s"$dir/u.avro", es, s2, spec, 1L, codec = "uncompressed")
    def codecOf(p: String): String = {
      val rd = new DataFileReader(new java.io.File(p),
        new GenericDatumReader[GenericRecord]())
      try Option(rd.getMetaString("avro.codec")).getOrElse("null")
      finally rd.close()
    }
    assert(codecOf(s"$dir/c.avro") === "deflate")
    assert(codecOf(s"$dir/u.avro") === "null")
    assert(new java.io.File(s"$dir/c.avro").length <
      new java.io.File(s"$dir/u.avro").length)
    // both spellings read back identically
    assert(Manifests.readManifest(s"$dir/c.avro")._1.map(_.file.path) ===
      Manifests.readManifest(s"$dir/u.avro")._1.map(_.file.path))
  }

  test("per-file key_metadata (field 131) survives the manifest round trip") {
    import graft.core._
    val schema = IcebergSchema(Seq(
      NestedField(1, "x", IcebergTypes.IntT, required = false)), schemaId = 0)
    val dir = Files.createTempDirectory("graft-keymeta").toString
    val km = Array[Byte](0x0a, 0x0b, 0x7f, 0xff.toByte)
    Manifests.writeManifest(s"$dir/m.avro", Seq(
      ManifestEntry(1, Some(1L), Some(1L), Some(1L),
        DataFile(0, "/data/enc.parquet", "PARQUET", Nil, 10L, 1000L,
          keyMetadata = Some(km))),
      ManifestEntry(1, Some(1L), Some(1L), Some(1L),
        DataFile(0, "/data/plain.parquet", "PARQUET", Nil, 10L, 1000L))),
      schema, PartitionSpec.Unpartitioned, 1L)
    val (entries, _) = Manifests.readManifest(s"$dir/m.avro")
    assert(entries.head.file.keyMetadata.get.sameElements(km))
    assert(entries(1).file.keyMetadata.isEmpty)
  }

  test("v3 first_row_id inheritance assigns running ids, skipping deleted entries") {
    import graft.core._
    val schema = IcebergSchema(Seq(
      NestedField(1, "x", IcebergTypes.IntT, required = false)), schemaId = 0)
    val spec = PartitionSpec.builder(schema).add("x", Transforms.Identity).build()
    def df(path: String, count: Long) = DataFile(0, path, "PARQUET",
      Seq(Int.box(1)), count, 1000L)
    val dir = Files.createTempDirectory("graft-frid").toString

    // reference TestV3DataManifestFirstRowIDInheritance: null per-file ids,
    // manifest-level 1000 → 1000, then 1000+firstCount
    val p1 = s"$dir/m1.avro"
    Manifests.writeManifest(p1, Seq(
      ManifestEntry(1, Some(entrySnapshotId), Some(1L), Some(1L), df("/data/file1.parquet", 10L)),
      ManifestEntry(1, Some(entrySnapshotId), Some(1L), Some(1L), df("/data/file2.parquet", 20L))),
      schema, spec, entrySnapshotId)
    val (e1, _) = Manifests.readManifest(p1, manifestFirstRowId = Some(1000L))
    assert(e1.map(_.file.firstRowId) === Seq(Some(1000L), Some(1010L)))
    // without a manifest-level id nothing is synthesized
    assert(Manifests.readManifest(p1)._1.forall(_.file.firstRowId.isEmpty))

    // reference ...SkipsDeletedEntries: DELETED consumes no ids — live2
    // takes the deleted file's range instead of overflowing the block
    val p2 = s"$dir/m2.avro"
    Manifests.writeManifest(p2, Seq(
      ManifestEntry(0, Some(entrySnapshotId), Some(1L), Some(1L), df("/data/live1.parquet", 10L)),
      ManifestEntry(2, Some(entrySnapshotId), Some(1L), Some(1L), df("/data/deleted.parquet", 50L)),
      ManifestEntry(0, Some(entrySnapshotId), Some(1L), Some(1L), df("/data/live2.parquet", 10L))),
      schema, spec, entrySnapshotId)
    val (e2, _) = Manifests.readManifest(p2, manifestFirstRowId = Some(1000L))
    assert(e2.map(_.file.firstRowId) === Seq(Some(1000L), None, Some(1010L)))

    // explicit per-file ids are never overwritten and consume no cursor
    val p3 = s"$dir/m3.avro"
    Manifests.writeManifest(p3, Seq(
      ManifestEntry(1, Some(entrySnapshotId), Some(1L), Some(1L),
        df("/data/a.parquet", 10L).copy(firstRowId = Some(7777L))),
      ManifestEntry(1, Some(entrySnapshotId), Some(1L), Some(1L), df("/data/b.parquet", 20L))),
      schema, spec, entrySnapshotId)
    val (e3, _) = Manifests.readManifest(p3, manifestFirstRowId = Some(1000L))
    assert(e3.map(_.file.firstRowId) === Seq(Some(7777L), Some(1000L)))

    // manifest-list row carries the block start (spec field 520) round-trip
    val lp = s"$dir/snap.avro"
    Manifests.writeManifestList(lp, Seq(
      ManifestFile(p1, 1L, 0, 0, 1L, 1L, entrySnapshotId, 2, 0, 0, 30L, 0L, 0L,
        Nil, firstRowId = Some(0L)),
      ManifestFile(p2, 1L, 0, 0, 1L, 1L, entrySnapshotId, 3, 0, 0, 70L, 0L, 0L,
        Nil)), entrySnapshotId, None, 1L)
    assert(Manifests.readManifestList(lp).map(_.firstRowId) ===
      Seq(Some(0L), None))
    // empty partition summaries encode as the ARRAY branch, never Avro null
    // (Redshift Spectrum rejects null — reference issue #1309)
    val rd = new DataFileReader(new java.io.File(lp),
      new GenericDatumReader[GenericRecord]())
    try while (rd.hasNext) {
      val parts = rd.next().get("partitions")
      assert(parts != null, "partitions must be a present empty array, not null")
      assert(parts.asInstanceOf[java.util.List[_]].isEmpty)
    } finally rd.close()
  }

  test("our manifest-list wire resolves under the reference v2 reader schema") {
    val mf = ManifestFile(taxiManifestPath, 7989L, 2, 1, 3L, 3L, snapshotId,
      3, 0, 0, addedRows, 0L, 0L,
      Seq(FieldSummary(containsNull = true, Some(false),
        Some(hx("01000000")), Some(hx("02000000")))))
    val path = Files.createTempDirectory("graft-golden-l").toString + "/snap.avro"
    Manifests.writeManifestList(path, Seq(mf), snapshotId, None, 3L)
    val rdr = new DataFileReader(new java.io.File(path),
      new GenericDatumReader[GenericRecord](null, new Schema.Parser().parse(refListV2Schema)))
    try {
      val r = rdr.next()
      assert(r.get("manifest_path").toString === taxiManifestPath)
      assert(r.get("manifest_length") === 7989L)
      assert(r.get("content") === 1)
      assert(r.get("sequence_number") === 3L && r.get("min_sequence_number") === 3L)
      assert(r.get("added_files_count") === 3)
      assert(r.get("added_rows_count") === addedRows)
      val parts = r.get("partitions").asInstanceOf[java.util.List[GenericRecord]]
      val s0 = parts.get(0)
      assert(s0.get("contains_null") === true && s0.get("contains_nan") === false)
      val lb = s0.get("lower_bound").asInstanceOf[ByteBuffer]
      val a = new Array[Byte](lb.remaining()); lb.duplicate().get(a)
      assert(a.sameElements(hx("01000000")))
    } finally rdr.close()
  }
}
