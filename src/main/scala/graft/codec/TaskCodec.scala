package graft.codec

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core._
import graft.core.IcebergTypes._
import graft.format.{DataFile, PartitionSpec}
import graft.table.FileScanTask

/** Cross-process scan-task transport (reference `codec/file_scan_task.go:49-177`).
  *
  * A planned [[FileScanTask]] — the data file plus every delete artifact that
  * applies to it — serializes to a self-contained payload a remote worker can
  * turn back into the identical task without re-planning. The reference frames
  * an Avro envelope of Avro-encoded DataFiles and appends the residual as a
  * magic-prefixed JSON extension; here the envelope is a single JSON document
  * (self-delimiting, so no extension framing is needed) whose binary values
  * (partition literals, column bounds) use the spec single-value serialization
  * via [[Literals]] + base64. Partition values therefore survive with their
  * Iceberg types (timestamps, uuid, decimal) rather than JSON-lossy forms.
  *
  * Mirrored contracts from the reference:
  *  - the (spec, schema, version) triple must match between encode and decode;
  *    version and spec id are recorded and verified on decode;
  *  - every carried file must belong to the codec spec (after partition
  *    evolution the caller splits tasks per spec id and encodes per group,
  *    `file_scan_task.go:40-47`);
  *  - the scan range is validated against the file size RECORDED IN MANIFEST
  *    METADATA (not a filesystem stat), encode-side only — decode accepts
  *    foreign ranges (`file_scan_task.go:120-124`);
  *  - deletion vectors travel in their own list, separate from parquet
  *    positional deletes (`file_scan_task.go:216`).
  */
object TaskCodec {

  private val mapper = new ObjectMapper()
  private val b64 = Base64.getEncoder
  private val b64d = Base64.getDecoder

  final val MinVersion = 1
  final val MaxVersion = 3

  /** Encode one task. `start`/`length` default to the whole file; explicit
    * sub-ranges are validated against the manifest-recorded file size.
    */
  def encode(task: FileScanTask, spec: PartitionSpec, schema: IcebergSchema,
      version: Int, residual: Expr = Expr.AlwaysTrue,
      start: Long = 0L, lengthOpt: Option[Long] = None): Array[Byte] = {
    requireVersion(version)
    if (task.specId != spec.specId)
      throw new IllegalArgumentException(
        s"task spec id ${task.specId} does not match codec spec id ${spec.specId} " +
          "(partition evolution requires per-spec grouping)")
    val length = lengthOpt.getOrElse(task.file.fileSize - start)
    if (start < 0) throw new IllegalArgumentException(s"start must be non-negative: $start")
    if (length < 0) throw new IllegalArgumentException(s"length must be non-negative: $length")
    // subtraction-ordered so fileSize-start cannot underflow (reference
    // validateScanRange, file_scan_task.go:174-184)
    if (start > task.file.fileSize || length > task.file.fileSize - start)
      throw new IllegalArgumentException(
        s"scan range start=$start length=$length exceeds file size ${task.file.fileSize}")

    val partType = spec.partitionType(schema)
    val o = mapper.createObjectNode()
    o.put("format-version", version)
    o.put("spec-id", spec.specId)
    o.set[ObjectNode]("file", fileNode(task.file, partType))
    val (dvs, parquetPos) = task.posDeletes.partition(_.format == "PUFFIN")
    o.set[ArrayNode]("delete-files", filesNode(parquetPos, partType, spec.specId))
    o.set[ArrayNode]("deletion-vector-files", filesNode(dvs, partType, spec.specId))
    val eq = mapper.createArrayNode()
    task.eqDeletes.foreach { case (f, seq) =>
      checkSpec(f, partType, spec.specId)
      val e = mapper.createObjectNode()
      e.put("sequence-number", seq)
      e.set[ObjectNode]("file", fileNode(f, partType))
      eq.add(e)
    }
    o.set[ArrayNode]("equality-delete-files", eq)
    o.put("start", start)
    o.put("length", length)
    o.put("data-sequence-number", task.dataSequence)
    if (residual != Expr.AlwaysTrue)
      o.set[JsonNode]("residual", mapper.readTree(ExprJson.toJson(residual)))
    mapper.writeValueAsString(o).getBytes(StandardCharsets.UTF_8)
  }

  /** Decode reverses [[encode]]; returns the task, its residual (AlwaysTrue
    * when none travelled), and the scan range.
    */
  def decode(bytes: Array[Byte], spec: PartitionSpec, schema: IcebergSchema,
      version: Int): (FileScanTask, Expr, (Long, Long)) = {
    requireVersion(version)
    val o = mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
    val v = o.get("format-version").asInt()
    if (v != version)
      throw new IllegalArgumentException(s"payload format version $v, decoder given $version")
    val sid = o.get("spec-id").asInt()
    if (sid != spec.specId)
      throw new IllegalArgumentException(s"payload spec id $sid, decoder given ${spec.specId}")
    val start = o.get("start").asLong()
    val length = o.get("length").asLong()
    if (start < 0) throw new IllegalArgumentException(s"start must be non-negative: $start")
    if (length < 0) throw new IllegalArgumentException(s"length must be non-negative: $length")

    val partType = spec.partitionType(schema)
    val file = fileFromNode(o.get("file"), partType, sid)
    val parquetPos = filesFromNode(o.get("delete-files"), partType, sid)
    val dvs = filesFromNode(o.get("deletion-vector-files"), partType, sid)
    val eq = o.get("equality-delete-files").elements().asScala.map { e =>
      (fileFromNode(e.get("file"), partType, sid), e.get("sequence-number").asLong())
    }.toSeq
    val residual =
      if (o.has("residual")) ExprJson.fromJson(o.get("residual").toString, Some(schema))
      else Expr.AlwaysTrue
    val task = FileScanTask(file, o.get("data-sequence-number").asLong(),
      parquetPos ++ dvs, eq, sid)
    (task, residual, (start, length))
  }

  private def requireVersion(version: Int): Unit =
    if (version < MinVersion || version > MaxVersion)
      throw new IllegalArgumentException(s"unsupported format version $version")

  /** The reference's per-file SpecID check (`file_scan_task.go:274-287`):
    * a carried file tagged with a different spec id is rejected outright —
    * its partition literals would otherwise encode/decode under the wrong
    * field types and transforms silently. Files without provenance (built
    * in-memory, never round-tripped through a manifest) fall back to the
    * arity invariant. Unpartitioned delete files (global deletes) always
    * pass the arity check.
    */
  private def checkSpec(f: DataFile, partType: StructT, codecSpecId: Int): Unit = {
    // empty partition tuples (global deletes) have no literals to mis-decode,
    // and legitimately ride along from the unpartitioned spec
    if (f.partition.nonEmpty)
      f.specId.filter(_ != codecSpecId).foreach(sid =>
        throw new IllegalArgumentException(
          s"file ${f.path} was written under spec $sid but the codec spec is " +
            s"$codecSpecId (partition evolution requires per-spec grouping)"))
    if (f.partition.nonEmpty && f.partition.size != partType.fields.size)
      throw new IllegalArgumentException(
        s"file ${f.path} partition arity ${f.partition.size} does not match " +
          s"codec spec arity ${partType.fields.size}")
  }

  private def filesNode(files: Seq[DataFile], partType: StructT,
      codecSpecId: Int): ArrayNode = {
    val a = mapper.createArrayNode()
    files.foreach { f => checkSpec(f, partType, codecSpecId); a.add(fileNode(f, partType)) }
    a
  }

  private def filesFromNode(node: JsonNode, partType: StructT,
      codecSpecId: Int): Seq[DataFile] =
    node.elements().asScala.map(fileFromNode(_, partType, codecSpecId)).toSeq

  private def fileNode(f: DataFile, partType: StructT): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("content", f.content)
    o.put("file-path", f.path)
    o.put("file-format", f.format)
    val part = mapper.createArrayNode()
    f.partition.zipWithIndex.foreach { case (v, i) =>
      if (v == null) part.addNull()
      else part.add(b64.encodeToString(Literals.encode(partType.fields(i).fieldType, v)))
    }
    o.set[ArrayNode]("partition", part)
    o.put("record-count", f.recordCount)
    o.put("file-size-in-bytes", f.fileSize)
    longMap(o, "column-sizes", f.columnSizes)
    longMap(o, "value-counts", f.valueCounts)
    longMap(o, "null-value-counts", f.nullCounts)
    longMap(o, "nan-value-counts", f.nanCounts)
    bytesMap(o, "lower-bounds", f.lowerBounds)
    bytesMap(o, "upper-bounds", f.upperBounds)
    if (f.splitOffsets.nonEmpty) {
      val a = mapper.createArrayNode(); f.splitOffsets.foreach(a.add); o.set[ArrayNode]("split-offsets", a)
    }
    if (f.equalityIds.nonEmpty) {
      val a = mapper.createArrayNode(); f.equalityIds.foreach(a.add); o.set[ArrayNode]("equality-ids", a)
    }
    f.sortOrderId.foreach(o.put("sort-order-id", _))
    f.referencedDataFile.foreach(o.put("referenced-data-file", _))
    f.contentOffset.foreach(o.put("content-offset", _))
    f.contentSize.foreach(o.put("content-size-in-bytes", _))
    f.firstRowId.foreach(o.put("first-row-id", _))
    o
  }

  private def fileFromNode(o: JsonNode, partType: StructT,
      codecSpecId: Int): DataFile = {
    val part = o.get("partition").elements().asScala.zipWithIndex.map {
      case (n, i) =>
        if (n.isNull) null
        else Literals.decode(partType.fields(i).fieldType, b64d.decode(n.asText()))
    }.toSeq
    DataFile(
      content = o.get("content").asInt(),
      path = o.get("file-path").asText(),
      format = o.get("file-format").asText(),
      partition = part,
      recordCount = o.get("record-count").asLong(),
      fileSize = o.get("file-size-in-bytes").asLong(),
      columnSizes = longMapFrom(o, "column-sizes"),
      valueCounts = longMapFrom(o, "value-counts"),
      nullCounts = longMapFrom(o, "null-value-counts"),
      nanCounts = longMapFrom(o, "nan-value-counts"),
      lowerBounds = bytesMapFrom(o, "lower-bounds"),
      upperBounds = bytesMapFrom(o, "upper-bounds"),
      splitOffsets = if (o.has("split-offsets"))
        o.get("split-offsets").elements().asScala.map(_.asLong()).toSeq else Nil,
      equalityIds = if (o.has("equality-ids"))
        o.get("equality-ids").elements().asScala.map(_.asInt()).toSeq else Nil,
      sortOrderId = if (o.has("sort-order-id")) Some(o.get("sort-order-id").asInt()) else None,
      referencedDataFile = if (o.has("referenced-data-file"))
        Some(o.get("referenced-data-file").asText()) else None,
      contentOffset = if (o.has("content-offset")) Some(o.get("content-offset").asLong()) else None,
      contentSize = if (o.has("content-size-in-bytes"))
        Some(o.get("content-size-in-bytes").asLong()) else None,
      firstRowId = if (o.has("first-row-id")) Some(o.get("first-row-id").asLong()) else None,
      specId = Some(codecSpecId))
  }

  private def longMap(o: ObjectNode, name: String, m: Map[Int, Long]): Unit =
    if (m.nonEmpty) {
      val n = mapper.createObjectNode()
      m.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k.toString, v) }
      o.set[ObjectNode](name, n)
    }

  private def bytesMap(o: ObjectNode, name: String, m: Map[Int, Array[Byte]]): Unit =
    if (m.nonEmpty) {
      val n = mapper.createObjectNode()
      m.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k.toString, b64.encodeToString(v)) }
      o.set[ObjectNode](name, n)
    }

  private def longMapFrom(o: JsonNode, name: String): Map[Int, Long] =
    if (!o.has(name)) Map.empty
    else o.get(name).properties().asScala.map(e => e.getKey.toInt -> e.getValue.asLong()).toMap

  private def bytesMapFrom(o: JsonNode, name: String): Map[Int, Array[Byte]] =
    if (!o.has(name)) Map.empty
    else o.get(name).properties().asScala
      .map(e => e.getKey.toInt -> b64d.decode(e.getValue.asText())).toMap
}
