package graft.rest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core._
import graft.core.IcebergTypes._
import graft.format.{DataFile, DataFileContent, PartitionSpec}
import graft.table.FileScanTask

/** The Iceberg REST spec's FileScanTask JSON wire (reference
  * `catalog/rest/scan_task_decoder.go:40-177`, Java `ContentFileParser`):
  * a planning response envelope carries `file-scan-tasks` whose
  * `data-file` objects are PLAIN JSON (kebab-case fields, count maps as
  * parallel `{keys, values}` arrays, binary bounds as HEX strings, content
  * as a string discriminator) plus one deduplicated `delete-files` array
  * referenced by zero-based `delete-file-references` indices — so ANY
  * spec-conformant engine (Java, PyIceberg, iceberg-go) can plan against
  * this server and vice versa. References are ENVELOPE-scoped: inline
  * tasks and each fetchScanTasks shard resolve independently.
  *
  * The spec wire carries no manifest sequence numbers (reference: "the
  * REST FileScanTask schema does not carry manifest data sequence
  * numbers") — delete matching already happened server-side, so decoded
  * tasks apply every referenced delete unconditionally: dataSequence 0,
  * equality-delete sequence 1.
  */
object ScanTaskJson {

  private def contentString(c: Int): String = c match {
    case DataFileContent.Data => "data"
    case DataFileContent.PositionDeletes => "position-deletes"
    case DataFileContent.EqualityDeletes => "equality-deletes"
    case other => throw new IllegalArgumentException(s"unknown content id $other")
  }

  private def contentId(s: String): Int = s match {
    case "data" => DataFileContent.Data
    case "position-deletes" => DataFileContent.PositionDeletes
    case "equality-deletes" => DataFileContent.EqualityDeletes
    // legacy Java enum spellings (reference
    // TestDecodeScanTasksAcceptsLegacyJavaContentValues)
    case "DATA" => DataFileContent.Data
    case "POSITION_DELETES" => DataFileContent.PositionDeletes
    case "EQUALITY_DELETES" => DataFileContent.EqualityDeletes
    case other => throw new IllegalArgumentException(s"unknown content: $other")
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- typed partition values (single-value JSON) -------------------------
  //
  // Temporal values use the spec's single-value ISO-8601 STRING form — the
  // reference's decodePartitionLiteral (`scan_task_decoder.go:596-660`)
  // unmarshals date/time/timestamp(_ns)(tz) into a string and casts via
  // StringLiteral.To (`literals.go:973-1026`: date "2006-01-02", timestamp
  // ISO no-zone, timestamptz ISO with offset). Numeric epoch forms are kept
  // as a LENIENT READ fallback only (pre-spec graft peers emitted them).

  private val microsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
  private val nanosFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS")
  private val timeFmt = java.time.format.DateTimeFormatter
    .ofPattern("HH:mm:ss.SSSSSS")

  private def isoTimestamp(micros: Long, zoned: Boolean): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    val s = microsFmt.format(ldt)
    if (zoned) s + "+00:00" else s
  }

  private def isoTimestampNs(nanos: Long, zoned: Boolean): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(nanos, 1000000000L),
      Math.floorMod(nanos, 1000000000L).toInt, java.time.ZoneOffset.UTC)
    val s = nanosFmt.format(ldt)
    if (zoned) s + "+00:00" else s
  }

  private def timestampMicrosOf(v: Any): Long = v match {
    case l: Long => l
    case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  private def partValueNode(mapper: ObjectMapper, t: IcebergType, v: Any): JsonNode = {
    if (v == null) return mapper.nullNode()
    val nf = mapper.getNodeFactory
    (t, v) match {
      // temporal types FIRST: their internal rep is numeric (epoch day /
      // micros / nanos) but the wire form is the ISO string
      case (DateT, i: Int) => nf.textNode(java.time.LocalDate.ofEpochDay(i.toLong).toString)
      case (DateT, d: java.sql.Date) => nf.textNode(d.toLocalDate.toString)
      case (DateT, d: java.time.LocalDate) => nf.textNode(d.toString)
      case (TimeT, micros: Long) =>
        nf.textNode(timeFmt.format(java.time.LocalTime.ofNanoOfDay(micros * 1000L)))
      case (TimestampT, ts) => nf.textNode(isoTimestamp(timestampMicrosOf(ts), zoned = false))
      case (TimestampTzT, ts) => nf.textNode(isoTimestamp(timestampMicrosOf(ts), zoned = true))
      case (TimestampNsT, nanos: Long) => nf.textNode(isoTimestampNs(nanos, zoned = false))
      case (TimestampTzNsT, nanos: Long) => nf.textNode(isoTimestampNs(nanos, zoned = true))
      case (_, b: Boolean) => nf.booleanNode(b)
      case (_, i: Int) => nf.numberNode(i)
      case (_, l: Long) => nf.numberNode(l)
      case (_, f: Float) => nf.numberNode(f)
      case (_, d: Double) => nf.numberNode(d)
      case (_, bd: java.math.BigDecimal) => nf.textNode(bd.toPlainString)
      case (BinaryT | FixedT(_), b: Array[Byte]) => nf.textNode(hex(b))
      case (_, s: String) => nf.textNode(s)
      case (_, other) => nf.textNode(String.valueOf(other))
    }
  }

  /** Parse an ISO timestamp string: offset form ("…+00:00"/"…Z") or local
    * form, both accepted leniently in either timestamp flavor.
    */
  private def parseInstant(s: String): java.time.Instant =
    try java.time.OffsetDateTime.parse(s).toInstant
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
    }

  private def partValueFrom(t: IcebergType, n: JsonNode): Any = {
    if (n == null || n.isNull) return null
    t match {
      case BooleanT => n.asBoolean()
      case IntT => n.asInt()
      case DateT =>
        if (n.isTextual) java.time.LocalDate.parse(n.asText()).toEpochDay.toInt
        else n.asInt()
      case TimeT =>
        if (n.isTextual) java.time.LocalTime.parse(n.asText()).toNanoOfDay / 1000L
        else n.asLong()
      case TimestampT | TimestampTzT =>
        if (n.isTextual) {
          val inst = parseInstant(n.asText())
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        } else n.asLong()
      case TimestampNsT | TimestampTzNsT =>
        if (n.isTextual) {
          val inst = parseInstant(n.asText())
          inst.getEpochSecond * 1000000000L + inst.getNano
        } else n.asLong()
      case LongT => n.asLong()
      case FloatT => n.floatValue()
      case DoubleT => n.asDouble()
      case StringT | UuidT => n.asText()
      case BinaryT | FixedT(_) => unhex(n.asText())
      case DecimalT(_, _) => new java.math.BigDecimal(n.asText())
      case _ => if (n.isNumber) n.asLong() else n.asText()
    }
  }

  // ---- count/value maps ---------------------------------------------------

  private def countMap(mapper: ObjectMapper, o: ObjectNode, name: String,
      m: Map[Int, Long]): Unit =
    if (m.nonEmpty) {
      val n = o.putObject(name)
      val ks = n.putArray("keys"); val vs = n.putArray("values")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => ks.add(k); vs.add(v); () }
    }

  private def valueMap(mapper: ObjectMapper, o: ObjectNode, name: String,
      m: Map[Int, Array[Byte]]): Unit =
    if (m.nonEmpty) {
      val n = o.putObject(name)
      val ks = n.putArray("keys"); val vs = n.putArray("values")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => ks.add(k); vs.add(hex(v)); () }
    }

  private def countMapFrom(o: JsonNode, name: String): Map[Int, Long] =
    Option(o.get(name)).filterNot(_.isNull).map { n =>
      val ks = n.get("keys").elements().asScala.map(_.asInt()).toSeq
      val vs = n.get("values").elements().asScala.map(_.asLong()).toSeq
      ks.zip(vs).toMap
    }.getOrElse(Map.empty)

  private def valueMapFrom(o: JsonNode, name: String): Map[Int, Array[Byte]] =
    Option(o.get(name)).filterNot(_.isNull).map { n =>
      val ks = n.get("keys").elements().asScala.map(_.asInt()).toSeq
      val vs = n.get("values").elements().asScala.map(e => unhex(e.asText())).toSeq
      ks.zip(vs).toMap
    }.getOrElse(Map.empty)

  // ---- content-file encode/decode ----------------------------------------

  private def fileNode(mapper: ObjectMapper, f: DataFile,
      partType: StructT): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", f.specId.getOrElse(0))
    o.put("content", contentString(f.content))
    o.put("file-path", f.path)
    o.put("file-format", f.format)
    val part = o.putArray("partition")
    f.partition.zipWithIndex.foreach { case (v, i) =>
      val ft = if (i < partType.fields.length) partType.fields(i).fieldType else StringT
      part.add(partValueNode(mapper, ft, v)); ()
    }
    o.put("file-size-in-bytes", f.fileSize)
    o.put("record-count", f.recordCount)
    if (f.splitOffsets.nonEmpty) {
      val a = o.putArray("split-offsets"); f.splitOffsets.foreach(a.add)
    }
    f.sortOrderId.foreach(o.put("sort-order-id", _))
    f.keyMetadata.foreach(km => o.put("key-metadata", hex(km)))
    if (f.content == DataFileContent.Data) {
      f.firstRowId.foreach(o.put("first-row-id", _))
      countMap(mapper, o, "column-sizes", f.columnSizes)
      countMap(mapper, o, "value-counts", f.valueCounts)
      countMap(mapper, o, "null-value-counts", f.nullCounts)
      countMap(mapper, o, "nan-value-counts", f.nanCounts)
      valueMap(mapper, o, "lower-bounds", f.lowerBounds)
      valueMap(mapper, o, "upper-bounds", f.upperBounds)
    } else {
      if (f.equalityIds.nonEmpty) {
        val a = o.putArray("equality-ids"); f.equalityIds.foreach(a.add)
      }
      f.referencedDataFile.foreach(o.put("referenced-data-file", _))
      f.contentOffset.foreach(o.put("content-offset", _))
      f.contentSize.foreach(o.put("content-size-in-bytes", _))
    }
    o
  }

  private def fileFrom(o: JsonNode,
      specById: Int => Option[PartitionSpec], schema: IcebergSchema): DataFile = {
    val specId = Option(o.get("spec-id")).map(_.asInt()).getOrElse(0)
    val partType = specById(specId).getOrElse(PartitionSpec.Unpartitioned)
      .partitionType(schema)
    val part = Option(o.get("partition")).map(_.elements().asScala.zipWithIndex.map {
      case (n, i) =>
        val ft = if (i < partType.fields.length) partType.fields(i).fieldType else StringT
        partValueFrom(ft, n)
    }.toSeq).getOrElse(Nil)
    def optLong(name: String) =
      Option(o.get(name)).filterNot(_.isNull).map(_.asLong())
    DataFile(
      content = contentId(o.get("content").asText()),
      path = o.get("file-path").asText(),
      // the Java parser writes FileFormat.name() (PARQUET); the Go encoder
      // emits lowercase — normalize to our uppercase convention so format
      // dispatch (PUFFIN DVs) works for either peer
      format = o.get("file-format").asText().toUpperCase,
      partition = part,
      recordCount = o.get("record-count").asLong(),
      fileSize = o.get("file-size-in-bytes").asLong(),
      columnSizes = countMapFrom(o, "column-sizes"),
      valueCounts = countMapFrom(o, "value-counts"),
      nullCounts = countMapFrom(o, "null-value-counts"),
      nanCounts = countMapFrom(o, "nan-value-counts"),
      lowerBounds = valueMapFrom(o, "lower-bounds"),
      upperBounds = valueMapFrom(o, "upper-bounds"),
      splitOffsets = Option(o.get("split-offsets")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asLong()).toSeq).getOrElse(Nil),
      equalityIds = Option(o.get("equality-ids")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil),
      sortOrderId = Option(o.get("sort-order-id")).filterNot(_.isNull).map(_.asInt()),
      referencedDataFile = Option(o.get("referenced-data-file"))
        .filterNot(_.isNull).map(_.asText()),
      contentOffset = optLong("content-offset"),
      contentSize = optLong("content-size-in-bytes"),
      firstRowId = optLong("first-row-id"),
      keyMetadata = Option(o.get("key-metadata")).filterNot(_.isNull)
        .map(n => unhex(n.asText())),
      specId = Some(specId))
  }

  // ---- envelope -----------------------------------------------------------

  /** Write `file-scan-tasks` + `delete-files` into `o` for one envelope.
    * Delete files are deduplicated by (path, content-offset) and referenced
    * by index; the residual rides per-task as `residual-filter`.
    */
  def writeTasks(mapper: ObjectMapper, o: ObjectNode,
      tasks: Seq[FileScanTask], specById: Int => Option[PartitionSpec],
      schema: IcebergSchema, residual: Expr): Unit = {
    val deleteIndex = scala.collection.mutable.LinkedHashMap.empty[(String, Option[Long]), Int]
    def refOf(f: DataFile): Int =
      deleteIndex.getOrElseUpdate((f.path, f.contentOffset), deleteIndex.size)
    val deleteFiles = scala.collection.mutable.ArrayBuffer.empty[DataFile]
    val taskArr = o.putArray("file-scan-tasks")
    tasks.foreach { task =>
      val partType = specById(task.specId).getOrElse(PartitionSpec.Unpartitioned)
        .partitionType(schema)
      val to = taskArr.addObject()
      to.set[ObjectNode]("data-file",
        fileNode(mapper, task.file.copy(specId = Some(task.specId)), partType))
      val refs = (task.posDeletes ++ task.eqDeletes.map(_._1)).map { d =>
        val before = deleteIndex.size
        val idx = refOf(d.copy(specId = d.specId.orElse(Some(task.specId))))
        if (idx == before) deleteFiles += d.copy(specId = d.specId.orElse(Some(task.specId)))
        idx
      }
      if (refs.nonEmpty) {
        val ra = to.putArray("delete-file-references"); refs.foreach(ra.add)
      }
      if (residual != Expr.AlwaysTrue)
        to.set[JsonNode]("residual-filter", mapper.readTree(ExprJson.toJson(residual)))
      ()
    }
    if (deleteFiles.nonEmpty) {
      val da = o.putArray("delete-files")
      deleteFiles.foreach { d =>
        val partType = specById(d.specId.getOrElse(0))
          .getOrElse(PartitionSpec.Unpartitioned).partitionType(schema)
        da.add(fileNode(mapper, d, partType)); ()
      }
    }
  }

  /** Decode one envelope into domain tasks (reference DecodeScanTasks):
    * delete references resolve within THIS envelope only; out-of-range or
    * unreferenced entries are wire errors.
    */
  def readTasks(node: JsonNode, specById: Int => Option[PartitionSpec],
      schema: IcebergSchema): Seq[FileScanTask] = {
    val deleteNodes = Option(node.get("delete-files")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    val deletes = deleteNodes.map(fileFrom(_, specById, schema))
    val referenced = Array.fill(deletes.size)(false)
    val out = Option(node.get("file-scan-tasks")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Nil).map { to =>
        val df = fileFrom(to.get("data-file"), specById, schema)
        val refs = Option(to.get("delete-file-references")).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil)
        refs.foreach { r =>
          require(r >= 0 && r < deletes.size,
            s"delete-file-references[$r] out of range (${deletes.size} delete files)")
          referenced(r) = true
        }
        val refFiles = refs.map(deletes)
        val (eq, posRaw) = refFiles.partition(_.content == DataFileContent.EqualityDeletes)
        // a puffin DV referenced by exactly this task may omit its
        // referenced-data-file — the target is implied (reference
        // TestDecodeScanTasksDerivesDeletionVectorTargetWhenOmitted)
        val pos = posRaw.map { d =>
          if (d.format == "PUFFIN" && d.referencedDataFile.isEmpty)
            d.copy(referencedDataFile = Some(df.path))
          else d
        }
        FileScanTask(df, dataSequence = 0L, posDeletes = pos,
          eqDeletes = eq.map(f => (f, 1L)), specId = df.specId.getOrElse(0))
      }
    val unref = referenced.zipWithIndex.collect { case (false, i) => i }
    require(unref.isEmpty,
      s"delete-files entries ${unref.mkString(",")} referenced by no task")
    out
  }
}
