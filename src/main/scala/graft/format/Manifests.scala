package graft.format

import java.io.OutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import graft.core._
import graft.core.IcebergTypes._

/** Avro manifest + manifest-list (de)serialization per the Iceberg spec
  * (reference `manifest.go`, schemas in `internal/avro_schemas.go`). Writes
  * v2 wire format with spec field-ids so other engines can read our tables.
  */
object Manifests {

  // ---------------------------------------------------------- avro schemas

  private def partitionAvroType(t: IcebergType): String = t match {
    case IntT => "\"int\""
    case LongT => "\"long\""
    case StringT => "\"string\""
    case BooleanT => "\"boolean\""
    case FloatT => "\"float\""
    case DoubleT => "\"double\""
    case DateT => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case TimestampT | TimestampTzT => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
    case BinaryT | FixedT(_) => "\"bytes\""
    case DecimalT(p, s) =>
      s"""{"type":"bytes","logicalType":"decimal","precision":$p,"scale":$s}"""
    case other => throw new IllegalArgumentException(s"unsupported partition type $other")
  }

  /** Avro record schema for the partition tuple of a spec. */
  def partitionSchemaJson(partType: StructT): String = {
    val fields = partType.fields.map { f =>
      s"""{"name":"${f.name.replaceAll("[^A-Za-z0-9_]", "_")}","type":["null",${partitionAvroType(f.fieldType)}],"default":null,"field-id":${f.id}}"""
    }.mkString(",")
    s"""{"type":"record","name":"r102","fields":[$fields]}"""
  }

  private def kvMap(name: String, keyId: Int, valId: Int, valType: String): String =
    s"""{"type":"array","items":{"type":"record","name":"$name","fields":[
       {"name":"key","type":"int","field-id":$keyId},
       {"name":"value","type":"$valType","field-id":$valId}]},"logicalType":"map"}"""

  def manifestEntrySchemaJson(partitionSchema: String): String =
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":$partitionSchema,"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"column_sizes","type":["null",${kvMap("k117_v118", 117, 118, "long")}],"default":null,"field-id":108},
        {"name":"value_counts","type":["null",${kvMap("k119_v120", 119, 120, "long")}],"default":null,"field-id":109},
        {"name":"null_value_counts","type":["null",${kvMap("k121_v122", 121, 122, "long")}],"default":null,"field-id":110},
        {"name":"nan_value_counts","type":["null",${kvMap("k138_v139", 138, 139, "long")}],"default":null,"field-id":137},
        {"name":"lower_bounds","type":["null",${kvMap("k126_v127", 126, 127, "bytes")}],"default":null,"field-id":125},
        {"name":"upper_bounds","type":["null",${kvMap("k129_v130", 129, 130, "bytes")}],"default":null,"field-id":128},
        {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
        {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
        {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
        {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140},
        {"name":"first_row_id","type":["null","long"],"default":null,"field-id":142},
        {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
        {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
        {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}
      ]},"field-id":2}
    ]}"""

  val manifestFileSchemaJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[
        {"name":"contains_null","type":"boolean","field-id":509},
        {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
        {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
        {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      ]},"element-id":508}],"default":null,"field-id":507},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519},
      {"name":"first_row_id","type":["null","long"],"default":null,"field-id":520}
    ]}"""

  // ----------------------------------------------------------------- write

  /** Map the Iceberg `write.avro.compression-codec` spellings to an Avro
    * container codec (reference writes deflate unconditionally,
    * `manifest.go:1367,1661`; Java Iceberg's property default is gzip, which
    * IS avro deflate). Readers need nothing: the codec rides in the OCF
    * header and DataFileReader auto-decompresses — including zstd files
    * other engines write. At 100 TB a table carries 10⁴–10⁵ manifests and
    * every planner reads them; 3–5× smaller manifest bytes is planning
    * latency, not cosmetics.
    */
  private[graft] def avroCodec(name: String): org.apache.avro.file.CodecFactory =
    name.toLowerCase match {
      case "uncompressed" | "none" => org.apache.avro.file.CodecFactory.nullCodec()
      case "gzip" | "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(-1)
      case "zstd" | "zstandard" => org.apache.avro.file.CodecFactory.zstandardCodec(3)
      case "snappy" => org.apache.avro.file.CodecFactory.snappyCodec()
      case other => throw new IllegalArgumentException(
        s"unsupported write.avro.compression-codec: $other")
    }

  val AvroCodecKey = "write.avro.compression-codec"
  def codecFor(props: Map[String, String]): String =
    props.getOrElse(AvroCodecKey, "gzip")

  def writeManifest(path: String, entries: Seq[ManifestEntry], schema: IcebergSchema,
      spec: PartitionSpec, snapshotId: Long, content: Int = ManifestContent.Data,
      codec: String = "gzip", formatVersion: Int = 2): Long = {
    val partType = spec.partitionType(schema)
    val avroSchema = new Schema.Parser().parse(
      manifestEntrySchemaJson(partitionSchemaJson(partType)))
    val dataFileSchema = avroSchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()

    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    writer.setCodec(avroCodec(codec))
    writer.setMeta("schema", SchemaJson.schemaToJson(schema))
    writer.setMeta("schema-id", schema.schemaId.toString)
    writer.setMeta("partition-spec", specFieldsJson(spec))
    writer.setMeta("partition-spec-id", spec.specId.toString)
    // stamp the TABLE's format version: a v3 manifest carries v3-only
    // fields (first_row_id 142) that a version-strict reader projecting the
    // v2 schema would silently drop
    writer.setMeta("format-version", formatVersion.toString)
    writer.setMeta("content", if (content == ManifestContent.Data) "data" else "deletes")
    writer.create(avroSchema, graft.io.FileIO.create(path))
    entries.foreach { e =>
      val rec = new GenericData.Record(avroSchema)
      rec.put("status", e.status)
      rec.put("snapshot_id", e.snapshotId.map(Long.box).orNull)
      rec.put("sequence_number", e.dataSequence.map(Long.box).orNull)
      rec.put("file_sequence_number", e.fileSequence.map(Long.box).orNull)
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", e.file.content)
      df.put("file_path", e.file.path)
      df.put("file_format", e.file.format)
      val part = new GenericData.Record(partSchema)
      partType.fields.zip(e.file.partition).foreach { case (nf, v) =>
        part.put(nf.name.replaceAll("[^A-Za-z0-9_]", "_"), partitionAvroValue(nf.fieldType, v))
      }
      df.put("partition", part)
      df.put("record_count", e.file.recordCount)
      df.put("file_size_in_bytes", e.file.fileSize)
      df.put("column_sizes", kvArray(avroSchema, "column_sizes", e.file.columnSizes.map { case (k, v) => k -> Long.box(v) }))
      df.put("value_counts", kvArray(avroSchema, "value_counts", e.file.valueCounts.map { case (k, v) => k -> Long.box(v) }))
      df.put("null_value_counts", kvArray(avroSchema, "null_value_counts", e.file.nullCounts.map { case (k, v) => k -> Long.box(v) }))
      df.put("nan_value_counts", kvArray(avroSchema, "nan_value_counts", e.file.nanCounts.map { case (k, v) => k -> Long.box(v) }))
      df.put("lower_bounds", kvArray(avroSchema, "lower_bounds", e.file.lowerBounds.map { case (k, v) => k -> ByteBuffer.wrap(v) }))
      df.put("upper_bounds", kvArray(avroSchema, "upper_bounds", e.file.upperBounds.map { case (k, v) => k -> ByteBuffer.wrap(v) }))
      df.put("key_metadata", e.file.keyMetadata.map(ByteBuffer.wrap).orNull)
      df.put("split_offsets", if (e.file.splitOffsets.isEmpty) null else e.file.splitOffsets.map(Long.box).asJava)
      df.put("equality_ids", if (e.file.equalityIds.isEmpty) null else e.file.equalityIds.map(Int.box).asJava)
      df.put("sort_order_id", e.file.sortOrderId.map(Int.box).orNull)
      df.put("first_row_id", e.file.firstRowId.map(Long.box).orNull)
      df.put("referenced_data_file", e.file.referencedDataFile.orNull)
      df.put("content_offset", e.file.contentOffset.map(Long.box).orNull)
      df.put("content_size_in_bytes", e.file.contentSize.map(Long.box).orNull)
      rec.put("data_file", df)
      writer.append(rec)
    }
    writer.close()
    graft.io.FileIO.size(path)
  }

  private def partitionAvroValue(t: IcebergType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (DecimalT(_, _), bd: java.math.BigDecimal) => ByteBuffer.wrap(bd.unscaledValue.toByteArray)
    case (BinaryT | FixedT(_), b: Array[Byte]) => ByteBuffer.wrap(b)
    case (DateT, d: java.sql.Date) => Int.box(d.toLocalDate.toEpochDay.toInt)
    case (DateT, d: java.time.LocalDate) => Int.box(d.toEpochDay.toInt)
    case (TimestampT | TimestampTzT, ts: java.sql.Timestamp) =>
      Long.box(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
    case _ => v
  }

  private def kvArray(root: Schema, fieldName: String, m: Map[Int, Any]): Any = {
    if (m.isEmpty) return null
    val arrSchema = root.getField("data_file").schema()
      .getField(fieldName).schema().getTypes.get(1)
    val itemSchema = arrSchema.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, arrSchema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k)
      r.put("value", v)
      arr.add(r)
    }
    arr
  }

  private def specFieldsJson(spec: PartitionSpec): String =
    spec.fields.map { pf =>
      s"""{"source-id":${pf.sourceId},"field-id":${pf.fieldId},"name":"${pf.name}","transform":"${TableMetadata.transformName(pf.transform)}"}"""
    }.mkString("[", ",", "]")

  /** Write the manifest list for a snapshot. */
  def writeManifestList(path: String, manifests: Seq[ManifestFile],
      snapshotId: Long, parentSnapshotId: Option[Long], sequenceNumber: Long,
      codec: String = "gzip", formatVersion: Int = 2): Unit = {
    val avroSchema = new Schema.Parser().parse(manifestFileSchemaJson)
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    writer.setCodec(avroCodec(codec))
    writer.setMeta("snapshot-id", snapshotId.toString)
    writer.setMeta("parent-snapshot-id", parentSnapshotId.map(_.toString).getOrElse("null"))
    writer.setMeta("sequence-number", sequenceNumber.toString)
    writer.setMeta("format-version", formatVersion.toString)
    writer.create(avroSchema, graft.io.FileIO.create(path))
    val partsSchema = avroSchema.getField("partitions").schema().getTypes.get(1)
    val summarySchema = partsSchema.getElementType
    manifests.foreach { m =>
      val rec = new GenericData.Record(avroSchema)
      rec.put("manifest_path", m.path)
      rec.put("manifest_length", m.length)
      rec.put("partition_spec_id", m.specId)
      rec.put("content", m.content)
      rec.put("sequence_number", m.sequenceNumber)
      rec.put("min_sequence_number", m.minSequenceNumber)
      rec.put("added_snapshot_id", m.addedSnapshotId)
      rec.put("added_files_count", m.addedFilesCount)
      rec.put("existing_files_count", m.existingFilesCount)
      rec.put("deleted_files_count", m.deletedFilesCount)
      rec.put("added_rows_count", m.addedRowsCount)
      rec.put("existing_rows_count", m.existingRowsCount)
      rec.put("deleted_rows_count", m.deletedRowsCount)
      // ALWAYS the array branch, a present-but-empty [] for unpartitioned
      // manifests — Avro null is legal under the union but ecosystem
      // readers reject it (Redshift Spectrum, reference issue #1309 /
      // ensurePartitionList in manifest.go; Java writes [] too)
      val arr = new GenericData.Array[GenericRecord](m.partitions.size, partsSchema)
      m.partitions.foreach { s =>
        val r = new GenericData.Record(summarySchema)
        r.put("contains_null", s.containsNull)
        r.put("contains_nan", s.containsNan.map(Boolean.box).orNull)
        r.put("lower_bound", s.lowerBound.map(ByteBuffer.wrap).orNull)
        r.put("upper_bound", s.upperBound.map(ByteBuffer.wrap).orNull)
        arr.add(r)
      }
      rec.put("partitions", arr)
      rec.put("key_metadata", null)
      rec.put("first_row_id", m.firstRowId.map(Long.box).orNull)
      writer.append(rec)
    }
    writer.close()
  }

  // ------------------------------------------------------------------ read

  /** Reject `format-version` metadata outside [1, 3]; a MISSING key is fine
    * (optional for v1 per the spec — Java writes v1 files without it). A v4
    * wire decoded as v3 would silently drop semantics, so fail loudly
    * (reference manifest_test.go:1064-1080,1134-1160).
    */
  private def checkFormatVersion(meta: String => String): Unit =
    Option(meta("format-version")).map(_.trim).filter(_.nonEmpty).foreach { v =>
      val n = v.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"unsupported manifest format version: $v"))
      if (n < 1 || n > 3)
        throw new IllegalArgumentException(s"unsupported manifest format version: $n")
    }

  def readManifestList(path: String): Seq[ManifestFile] = {
    val reader = DataFileReader.openReader(new graft.io.FileIO.SeekableHadoopInput(path),
      new GenericDatumReader[GenericRecord]())
    try {
      reader match {
        case d: DataFileReader[_] => checkFormatVersion(d.getMetaString)
        case _ => ()
      }
      val buf = Seq.newBuilder[ManifestFile]
      while (reader.hasNext) {
        val r = reader.next()
        // the wire varies by version AND writer vintage: v1 lists have no
        // content/sequence fields at all (absent field ≠ null — avro-java
        // THROWS on a name the writer schema lacks), and pre-1.4 Java
        // Iceberg wrote added_DATA_files_count etc. — a reader that only
        // knows the current spelling would silently decode those counts as
        // 0 (reference manifest_test.go:999-1026 pins both as read
        // contracts)
        def first(names: String*): Option[Any] =
          names.view.flatMap(opt(r, _)).headOption
        buf += ManifestFile(
          path = str(r.get("manifest_path")),
          length = lng(r.get("manifest_length")),
          specId = int(r.get("partition_spec_id")),
          content = opt(r, "content").map(int).getOrElse(0),
          sequenceNumber = opt(r, "sequence_number").map(lng).getOrElse(0L),
          minSequenceNumber = opt(r, "min_sequence_number").map(lng).getOrElse(0L),
          addedSnapshotId = opt(r, "added_snapshot_id").map(lng).getOrElse(-1L),
          addedFilesCount =
            first("added_files_count", "added_data_files_count").map(int).getOrElse(0),
          existingFilesCount =
            first("existing_files_count", "existing_data_files_count").map(int).getOrElse(0),
          deletedFilesCount =
            first("deleted_files_count", "deleted_data_files_count").map(int).getOrElse(0),
          addedRowsCount = opt(r, "added_rows_count").map(lng).getOrElse(0L),
          existingRowsCount = opt(r, "existing_rows_count").map(lng).getOrElse(0L),
          deletedRowsCount = opt(r, "deleted_rows_count").map(lng).getOrElse(0L),
          firstRowId = opt(r, "first_row_id").map(lng),
          partitions = opt(r, "partitions").map { arr =>
            arr.asInstanceOf[java.util.List[GenericRecord]].asScala.map { s =>
              FieldSummary(
                containsNull = s.get("contains_null").asInstanceOf[Boolean],
                containsNan = Option(s.get("contains_nan")).map(_.asInstanceOf[Boolean]),
                lowerBound = Option(s.get("lower_bound")).map(bytes),
                upperBound = Option(s.get("upper_bound")).map(bytes))
            }.toSeq
          }.getOrElse(Nil))
      }
      buf.result()
    } finally reader.close()
  }

  /** Read entries applying v3 first_row_id INHERITANCE (reference
    * `manifest.go:920-935`, Java ManifestReader.idAssigner): when the
    * manifest-list row carries a `first_row_id` and a live DATA entry's
    * data_file lacks one, it inherits a running id starting at the
    * manifest's, advancing by each live data file's record_count. DELETED
    * entries are assigned nothing and consume nothing — the list writer
    * reserved the manifest's range as added+existing rows, so a live file
    * after a deleted one takes the deleted file's range rather than
    * overflowing into the next manifest's.
    */
  def readManifest(path: String,
      manifestFirstRowId: Option[Long]): (Seq[ManifestEntry], Int) = {
    val (entries, specId) = readManifest(path)
    manifestFirstRowId match {
      case None => (entries, specId)
      case Some(start) =>
        var cursor = start
        val assigned = entries.map { e =>
          if (e.status == ManifestEntryStatus.Deleted ||
              e.file.content != DataFileContent.Data ||
              e.file.firstRowId.isDefined) e
          else {
            // cursor advances ONLY for files actually assigned (reference:
            // "increment inside the null check") — an explicit id means the
            // writer already placed that file outside this running block
            val out = e.copy(file = e.file.copy(firstRowId = Some(cursor)))
            cursor += e.file.recordCount
            out
          }
        }
        (assigned, specId)
    }
  }

  /** Read manifest entries; partition values surface as Seq aligned with the
    * manifest's own spec (identified by `spec-id` metadata).
    */
  def readManifest(path: String): (Seq[ManifestEntry], Int) = {
    val reader = new DataFileReader(new graft.io.FileIO.SeekableHadoopInput(path),
      new GenericDatumReader[GenericRecord]())
    try {
      checkFormatVersion(reader.getMetaString)
      val specId = Option(reader.getMetaString("partition-spec-id")).map(_.toInt).getOrElse(0)
      val buf = Seq.newBuilder[ManifestEntry]
      while (reader.hasNext) {
        val r = reader.next()
        val df = r.get("data_file").asInstanceOf[GenericRecord]
        val partRec = df.get("partition").asInstanceOf[GenericRecord]
        val partVals = partRec.getSchema.getFields.asScala.map(f =>
          avroToValue(partRec.get(f.pos()))).toSeq
        // v1 entry wire: no sequence-number fields, no data_file.content /
        // equality_ids — absent fields (avro-java throws on unknown names)
        // decode to the spec defaults, not errors
        buf += ManifestEntry(
          status = int(r.get("status")),
          snapshotId = opt(r, "snapshot_id").map(lng),
          dataSequence = opt(r, "sequence_number").map(lng),
          fileSequence = opt(r, "file_sequence_number").map(lng),
          file = DataFile(
            content = opt(df, "content").map(int).getOrElse(0),
            path = str(df.get("file_path")),
            format = str(df.get("file_format")),
            partition = partVals,
            recordCount = lng(df.get("record_count")),
            fileSize = lng(df.get("file_size_in_bytes")),
            columnSizes = kvToMap(opt(df, "column_sizes").orNull).map { case (k, v) => k -> lng(v) },
            valueCounts = kvToMap(opt(df, "value_counts").orNull).map { case (k, v) => k -> lng(v) },
            nullCounts = kvToMap(opt(df, "null_value_counts").orNull).map { case (k, v) => k -> lng(v) },
            nanCounts = kvToMap(opt(df, "nan_value_counts").orNull).map { case (k, v) => k -> lng(v) },
            lowerBounds = kvToMap(opt(df, "lower_bounds").orNull).map { case (k, v) => k -> bytes(v) },
            upperBounds = kvToMap(opt(df, "upper_bounds").orNull).map { case (k, v) => k -> bytes(v) },
            splitOffsets = opt(df, "split_offsets").map(
              _.asInstanceOf[java.util.List[Any]].asScala.map(lng).toSeq).getOrElse(Nil),
            equalityIds = opt(df, "equality_ids").map(
              _.asInstanceOf[java.util.List[Any]].asScala.map(int).toSeq).getOrElse(Nil),
            sortOrderId = opt(df, "sort_order_id").map(int),
            firstRowId = opt(df, "first_row_id").map(lng),
            keyMetadata = opt(df, "key_metadata").map(bytes),
            referencedDataFile = opt(df, "referenced_data_file").map(str),
            contentOffset = opt(df, "content_offset").map(lng),
            contentSize = opt(df, "content_size_in_bytes").map(lng),
            specId = Some(specId)))
      }
      (buf.result(), specId)
    } finally reader.close()
  }

  private def avroToValue(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: ByteBuffer => bytes(bb)
    case other => other
  }

  private def kvToMap(v: Any): Map[Int, Any] = {
    if (v == null) return Map.empty
    v.asInstanceOf[java.util.List[GenericRecord]].asScala.map { r =>
      int(r.get("key")) -> r.get("value")
    }.toMap
  }

  /** Field access tolerant of older writer schemas lacking the field. */
  private def opt(r: GenericRecord, name: String): Option[Any] =
    if (r.getSchema.getField(name) == null) None else Option(r.get(name))

  private def str(v: Any): String = v.toString
  private def int(v: Any): Int = v.asInstanceOf[Number].intValue
  private def lng(v: Any): Long = v.asInstanceOf[Number].longValue
  private def bytes(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val b = new Array[Byte](bb.remaining())
      bb.duplicate().get(b)
      b
    case arr: Array[Byte] => arr
    case f: org.apache.avro.generic.GenericFixed => f.bytes()
  }
}
