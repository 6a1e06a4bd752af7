package graft.format

import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.core._

/** Table metadata model + JSON wire format (reference `table/metadata.go`,
  * `table/snapshots.go`). Reads v1/v2, writes v2.
  */
final case class SnapshotRef(snapshotId: Long, refType: String, // "branch" | "tag"
    minSnapshotsToKeep: Option[Int] = None, maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int],
    // v3 row lineage (spec: REQUIRED on v3 snapshots — Java's builder
    // rejects a v3 snapshot without them, reference snapshots.go:266-267,
    // metadata.go:552-554): the row-id block this commit assigned
    firstRowId: Option[Long] = None,
    addedRows: Option[Long] = None)

final case class SnapshotLogEntry(snapshotId: Long, timestampMs: Long)

/** Spec statistics-file entry (v2+ `statistics` metadata list). */
final case class StatsBlobMetadata(blobType: String, snapshotId: Long,
    sequenceNumber: Long, fields: Seq[Int], properties: Map[String, String])
final case class StatisticsFile(snapshotId: Long, path: String,
    fileSizeInBytes: Long, blobMetadata: Seq[StatsBlobMetadata])
final case class PartitionStatisticsFile(snapshotId: Long, path: String,
    fileSizeInBytes: Long)
final case class MetadataLogEntry(metadataFile: String, timestampMs: Long)

/** v3 table-encryption key entry (`encryption-keys` metadata list,
  * reference `table/encryption.go:29-34`): the wrapped per-table key a
  * KMS-holding writer stored, indexed by key-id.
  */
final case class EncryptionKey(keyId: String, encryptedKeyMetadata: String,
    encryptedById: Option[String] = None,
    properties: Map[String, String] = Map.empty) {
  require(keyId.trim.nonEmpty, "encryption key-id must be non-empty")
  require(encryptedKeyMetadata.trim.nonEmpty,
    "encrypted-key-metadata must be non-empty")
}

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    nextRowId: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    currentSchemaId: Int,
    schemas: Seq[IcebergSchema],
    defaultSpecId: Int,
    partitionSpecs: Seq[PartitionSpec],
    lastPartitionId: Int,
    defaultSortOrderId: Int,
    sortOrders: Seq[SortOrder],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    snapshotLog: Seq[SnapshotLogEntry],
    metadataLog: Seq[MetadataLogEntry],
    refs: Map[String, SnapshotRef],
    statistics: Seq[StatisticsFile] = Nil,
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil,
    encryptionKeys: Seq[EncryptionKey] = Nil) {

  def schema: IcebergSchema = schemas.find(_.schemaId == currentSchemaId).get
  def schemaById(id: Int): Option[IcebergSchema] = schemas.find(_.schemaId == id)
  def spec: PartitionSpec = partitionSpecs.find(_.specId == defaultSpecId).get
  def specById(id: Int): Option[PartitionSpec] = partitionSpecs.find(_.specId == id)
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)

  /** Branch/tag ref -> snapshot. "main" falls back to current. */
  def snapshotByRef(ref: String): Option[Snapshot] =
    refs.get(ref).flatMap(r => snapshotById(r.snapshotId))
      .orElse(if (ref == "main") currentSnapshot else None)

  /** Snapshot current as-of a timestamp (snapshot-log walk,
    * `table/snapshots.go:427-446`).
    */
  def snapshotAsOf(timestampMs: Long): Option[Snapshot] = {
    val eligible = snapshotLog.filter(_.timestampMs <= timestampMs)
    // log entries can sit out of chronological order under commit clock
    // skew; take the greatest eligible timestamp — not the last list
    // position — with the FIRST entry winning ties (reference
    // snapshotLogEntryAsOf, snapshots.go:427-446)
    eligible.reduceOption((a, b) => if (b.timestampMs > a.timestampMs) b else a)
      .flatMap(e => snapshotById(e.snapshotId))
  }
}

object TableMetadata {

  def empty(location: String, schema: IcebergSchema, spec: PartitionSpec,
      sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): TableMetadata = {
    val maxFieldId = if (spec.fields.isEmpty) PartitionSpec.StartFieldId - 1
      else spec.fields.map(_.fieldId).max
    TableMetadata(
      formatVersion = 2,
      tableUuid = UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      nextRowId = 0L,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.highestFieldId,
      currentSchemaId = schema.schemaId,
      schemas = Seq(schema),
      defaultSpecId = spec.specId,
      partitionSpecs = Seq(spec),
      lastPartitionId = maxFieldId,
      defaultSortOrderId = sortOrder.orderId,
      sortOrders = Seq(sortOrder),
      properties = properties,
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil,
      metadataLog = Nil,
      refs = Map.empty)
  }

  private val mapper = new ObjectMapper().enable(SerializationFeature.INDENT_OUTPUT)

  // ------------------------------------------------------------------ write

  def toJson(m: TableMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", m.formatVersion)
    // a legacy V1 metadata loaded without a uuid round-trips without one —
    // writing "" would be worse than absence for spec readers. v2+ REQUIRES
    // table-uuid: an empty uuid reaching serialization there means some
    // path skipped the upgrade assignment — fail loudly at write time
    // rather than emit spec-invalid metadata silently
    require(m.formatVersion < 2 || m.tableUuid.nonEmpty,
      s"format-version ${m.formatVersion} metadata requires table-uuid (none assigned)")
    if (m.tableUuid.nonEmpty) root.put("table-uuid", m.tableUuid)
    root.put("location", m.location)
    root.put("last-sequence-number", m.lastSequenceNumber)
    root.put("next-row-id", m.nextRowId)
    root.put("last-updated-ms", m.lastUpdatedMs)
    root.put("last-column-id", m.lastColumnId)
    root.put("current-schema-id", m.currentSchemaId)
    val schemasArr = root.putArray("schemas")
    m.schemas.foreach(s => schemasArr.add(SchemaJson.schemaToJsonNode(s)))
    root.put("default-spec-id", m.defaultSpecId)
    val specsArr = root.putArray("partition-specs")
    m.partitionSpecs.foreach { spec =>
      val so = specsArr.addObject()
      so.put("spec-id", spec.specId)
      val fa = so.putArray("fields")
      spec.fields.foreach { pf =>
        val fo = fa.addObject()
        fo.put("source-id", pf.sourceId)
        fo.put("field-id", pf.fieldId)
        fo.put("name", pf.name)
        fo.put("transform", transformName(pf.transform))
      }
    }
    root.put("last-partition-id", m.lastPartitionId)
    root.put("default-sort-order-id", m.defaultSortOrderId)
    val ordersArr = root.putArray("sort-orders")
    m.sortOrders.foreach { o =>
      val oo = ordersArr.addObject()
      oo.put("order-id", o.orderId)
      val fa = oo.putArray("fields")
      o.fields.foreach { sf =>
        val fo = fa.addObject()
        fo.put("transform", transformName(sf.transform))
        fo.put("source-id", sf.sourceId)
        fo.put("direction", if (sf.ascending) "asc" else "desc")
        fo.put("null-order", if (sf.nullsFirst) "nulls-first" else "nulls-last")
      }
    }
    val props = root.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId match {
      case Some(id) => root.put("current-snapshot-id", id)
      case None => root.put("current-snapshot-id", -1L)
    }
    val snapsArr = root.putArray("snapshots")
    m.snapshots.foreach { s =>
      val so = snapsArr.addObject()
      so.put("snapshot-id", s.snapshotId)
      s.parentSnapshotId.foreach(so.put("parent-snapshot-id", _))
      so.put("sequence-number", s.sequenceNumber)
      so.put("timestamp-ms", s.timestampMs)
      so.put("manifest-list", s.manifestList)
      val sum = so.putObject("summary")
      s.summary.foreach { case (k, v) => sum.put(k, v) }
      s.schemaId.foreach(so.put("schema-id", _))
      s.firstRowId.foreach(so.put("first-row-id", _))
      s.addedRows.foreach(so.put("added-rows", _))
    }
    val slog = root.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      val eo = slog.addObject()
      eo.put("snapshot-id", e.snapshotId)
      eo.put("timestamp-ms", e.timestampMs)
    }
    val mlog = root.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      val eo = mlog.addObject()
      eo.put("metadata-file", e.metadataFile)
      eo.put("timestamp-ms", e.timestampMs)
    }
    val refsObj = root.putObject("refs")
    m.refs.foreach { case (name, r) =>
      val ro = refsObj.putObject(name)
      ro.put("snapshot-id", r.snapshotId)
      ro.put("type", r.refType)
      r.minSnapshotsToKeep.foreach(ro.put("min-snapshots-to-keep", _))
      r.maxSnapshotAgeMs.foreach(ro.put("max-snapshot-age-ms", _))
      r.maxRefAgeMs.foreach(ro.put("max-ref-age-ms", _))
    }
    if (m.statistics.nonEmpty) {
      val sa = root.putArray("statistics")
      m.statistics.foreach { st =>
        val so = sa.addObject()
        so.put("snapshot-id", st.snapshotId)
        so.put("statistics-path", st.path)
        so.put("file-size-in-bytes", st.fileSizeInBytes)
        so.put("file-footer-size-in-bytes", 0L)
        val ba = so.putArray("blob-metadata")
        st.blobMetadata.foreach { b =>
          val bo = ba.addObject()
          bo.put("type", b.blobType)
          bo.put("snapshot-id", b.snapshotId)
          bo.put("sequence-number", b.sequenceNumber)
          val fa = bo.putArray("fields")
          b.fields.foreach(fa.add)
          val po = bo.putObject("properties")
          b.properties.foreach { case (k, v) => po.put(k, v) }
        }
      }
    }
    if (m.partitionStatistics.nonEmpty) {
      val pa = root.putArray("partition-statistics")
      m.partitionStatistics.foreach { st =>
        val po = pa.addObject()
        po.put("snapshot-id", st.snapshotId)
        po.put("statistics-path", st.path)
        po.put("file-size-in-bytes", st.fileSizeInBytes)
      }
    }
    // version-scoped: the field was introduced in v3 (reference
    // metadata.go:2518 versionScopedField) — writing it to v1/v2 json
    // would make the file unreadable to spec-compliant parsers
    if (m.encryptionKeys.nonEmpty && m.formatVersion >= 3) {
      val ea = root.putArray("encryption-keys")
      m.encryptionKeys.foreach { k =>
        val eo = ea.addObject()
        eo.put("key-id", k.keyId)
        eo.put("encrypted-key-metadata", k.encryptedKeyMetadata)
        k.encryptedById.foreach(eo.put("encrypted-by-id", _))
        if (k.properties.nonEmpty) {
          val po = eo.putObject("properties")
          k.properties.foreach { case (key, v) => po.put(key, v) }
        }
      }
    }
    mapper.writeValueAsString(root)
  }

  def transformName(t: Transform): String = t match {
    case Transforms.Identity => "identity"
    case Transforms.Void => "void"
    case Transforms.Years => "year"
    case Transforms.Months => "month"
    case Transforms.Days => "day"
    case Transforms.Hours => "hour"
    case Transforms.Bucket(n) => s"bucket[$n]"
    case Transforms.Truncate(w) => s"truncate[$w]"
    case other => other.name
  }

  // ------------------------------------------------------------------- read

  def fromJson(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    val formatVersion = n.get("format-version").asInt
    def invalid(msg: String): Nothing =
      throw new IllegalArgumentException(s"invalid metadata: $msg")
    // Schema resolution (reference `table/metadata.go` preValidate, golden
    // corpus `TableMetadataV1NoValidSchema` / `V2CurrentSchemaNotFound` /
    // `V2MissingSchemas`): v2+ requires the schemas list and a resolvable
    // current-schema-id; v1 may instead carry the single inline `schema`,
    // and a schemas list WITHOUT current-schema-id is only valid when the
    // inline schema identifies the current entry by field equality.
    val schemaList: Seq[IcebergSchema] =
      if (n.has("schemas")) n.get("schemas").elements().asScala.map(SchemaJson.schemaFromJsonNode).toSeq
      else Nil
    val inlineSchema: Option[IcebergSchema] =
      if (formatVersion == 1 && n.has("schema"))
        Some(SchemaJson.schemaFromJsonNode(n.get("schema")))
      else None
    val (schemas: Seq[IcebergSchema], currentSchemaId: Int) =
      if (schemaList.nonEmpty) {
        Option(n.get("current-schema-id")).map(_.asInt) match {
          case Some(id) =>
            if (!schemaList.exists(_.schemaId == id))
              invalid(s"current-schema-id $id can't be found in any schema")
            (schemaList, id)
          case None =>
            inlineSchema.flatMap(inl =>
              schemaList.find(_.fields == inl.fields)) match {
              case Some(matched) => (schemaList, matched.schemaId)
              case None =>
                invalid("no valid schema configuration found in table metadata")
            }
        }
      } else inlineSchema match {
        case Some(s) => (Seq(s), s.schemaId)
        case None =>
          invalid("no valid schema configuration found in table metadata")
      }
    // v2+ structural requirements (golden corpus `V2MissingPartitionSpecs`,
    // `V2MissingLastPartitionId`, `V2MissingSortOrder`)
    if (formatVersion > 1) {
      if (!n.has("partition-specs")) invalid("missing partition-specs")
      if (!n.has("last-partition-id"))
        invalid("last-partition-id must be set for FormatVersion > 1")
      if (!n.has("sort-orders")) invalid("missing sort-orders")
    }
    // v3 row lineage is not optional: without the cursor a writer cannot
    // assign non-overlapping _row_id blocks (reference metadata.go
    // checkNextRowID — "next-row-id is required for v3 tables"; negative
    // values rejected there too)
    if (formatVersion >= 3) {
      if (!n.has("next-row-id")) invalid("next-row-id is required for v3 tables")
      if (n.get("next-row-id").asLong < 0)
        invalid(s"next-row-id must be non-negative, got ${n.get("next-row-id").asLong}")
    }
    val specs: Seq[PartitionSpec] =
      if (n.has("partition-specs"))
        n.get("partition-specs").elements().asScala.map(specFromJson).toSeq
      else if (n.has("partition-spec")) // v1 inline fields
        Seq(PartitionSpec(0,
          fieldsFromJson(n.get("partition-spec").elements().asScala.toSeq)))
      else Seq(PartitionSpec.Unpartitioned)
    val sortOrders: Seq[SortOrder] =
      if (n.has("sort-orders")) n.get("sort-orders").elements().asScala.map { o =>
        SortOrder(o.get("order-id").asInt,
          o.get("fields").elements().asScala.map { f =>
            SortField(f.get("source-id").asInt, Transforms.parse(f.get("transform").asText),
              ascending = f.get("direction").asText == "asc",
              nullsFirst = f.get("null-order").asText == "nulls-first")
          }.toSeq)
      }.toSeq else Seq(SortOrder.Unsorted)
    val snapshots: Seq[Snapshot] =
      if (n.has("snapshots")) n.get("snapshots").elements().asScala.map { s =>
        Snapshot(
          snapshotId = s.get("snapshot-id").asLong,
          parentSnapshotId = Option(s.get("parent-snapshot-id")).map(_.asLong),
          sequenceNumber = if (s.has("sequence-number")) s.get("sequence-number").asLong else 0L,
          timestampMs = s.get("timestamp-ms").asLong,
          manifestList = s.get("manifest-list").asText,
          summary = Option(s.get("summary")).map(su =>
            su.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty),
          schemaId = Option(s.get("schema-id")).map(_.asInt),
          firstRowId = Option(s.get("first-row-id")).map(_.asLong),
          addedRows = Option(s.get("added-rows")).map(_.asLong))
      }.toSeq else Nil
    val currentSnapshotId = Option(n.get("current-snapshot-id")).map(_.asLong).filter(_ != -1L)
    TableMetadata(
      formatVersion = formatVersion,
      // absent uuid (legacy v1) stays ABSENT ("") — synthesizing a random
      // one here would make two loads of the same metadata disagree and
      // trip the refresh drop+recreate guard on an unchanged table
      tableUuid = Option(n.get("table-uuid")).map(_.asText).getOrElse(""),
      location = n.get("location").asText,
      lastSequenceNumber = Option(n.get("last-sequence-number")).map(_.asLong).getOrElse(0L),
      nextRowId = Option(n.get("next-row-id")).map(_.asLong).getOrElse(0L),
      lastUpdatedMs = Option(n.get("last-updated-ms")).map(_.asLong).getOrElse(0L),
      lastColumnId = Option(n.get("last-column-id")).map(_.asInt)
        .getOrElse(schemas.map(_.highestFieldId).max),
      currentSchemaId = currentSchemaId,
      schemas = schemas,
      // v1 without default-spec-id infers the MAX spec id (golden corpus
      // `TableMetadataV1PartitionSpecsWithoutDefaultId`)
      defaultSpecId = Option(n.get("default-spec-id")).map(_.asInt).getOrElse(
        specs.map(_.specId).maxOption.getOrElse(0)),
      partitionSpecs = specs,
      lastPartitionId = Option(n.get("last-partition-id")).map(_.asInt).getOrElse(
        specs.flatMap(_.fields.map(_.fieldId)).foldLeft(PartitionSpec.StartFieldId - 1)(_ max _)),
      defaultSortOrderId = Option(n.get("default-sort-order-id")).map(_.asInt).getOrElse(0),
      sortOrders = sortOrders,
      properties = Option(n.get("properties")).map(p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty),
      currentSnapshotId = currentSnapshotId,
      snapshots = snapshots,
      snapshotLog = Option(n.get("snapshot-log")).map(_.elements().asScala.map(e =>
        SnapshotLogEntry(e.get("snapshot-id").asLong, e.get("timestamp-ms").asLong)).toSeq)
        .getOrElse(Nil),
      metadataLog = Option(n.get("metadata-log")).map(_.elements().asScala.map(e =>
        MetadataLogEntry(e.get("metadata-file").asText, e.get("timestamp-ms").asLong)).toSeq)
        .getOrElse(Nil),
      refs = Option(n.get("refs")).map(r =>
        r.properties().asScala.map { e =>
          val ro = e.getValue
          e.getKey -> SnapshotRef(ro.get("snapshot-id").asLong, ro.get("type").asText,
            Option(ro.get("min-snapshots-to-keep")).map(_.asInt),
            Option(ro.get("max-snapshot-age-ms")).map(_.asLong),
            Option(ro.get("max-ref-age-ms")).map(_.asLong))
        }.toMap).getOrElse(Map.empty),
      statistics = Option(n.get("statistics")).map(_.elements().asScala.map { st =>
        StatisticsFile(
          st.get("snapshot-id").asLong,
          st.get("statistics-path").asText,
          st.get("file-size-in-bytes").asLong,
          Option(st.get("blob-metadata")).map(_.elements().asScala.map { b =>
            StatsBlobMetadata(b.get("type").asText, b.get("snapshot-id").asLong,
              b.get("sequence-number").asLong,
              Option(b.get("fields")).map(_.elements().asScala.map(_.asInt).toSeq).getOrElse(Nil),
              Option(b.get("properties")).map(p =>
                p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
                .getOrElse(Map.empty))
          }.toSeq).getOrElse(Nil))
      }.toSeq).getOrElse(Nil),
      partitionStatistics = Option(n.get("partition-statistics")).map(_.elements().asScala.map { st =>
        PartitionStatisticsFile(st.get("snapshot-id").asLong,
          st.get("statistics-path").asText, st.get("file-size-in-bytes").asLong)
      }.toSeq).getOrElse(Nil),
      encryptionKeys = Option(n.get("encryption-keys")).map { ks =>
        require(n.get("format-version").asInt >= 3,
          "encryption-keys is a v3 metadata field")
        ks.elements().asScala.map { k =>
          EncryptionKey(k.get("key-id").asText,
            k.get("encrypted-key-metadata").asText,
            Option(k.get("encrypted-by-id")).map(_.asText),
            Option(k.get("properties")).map(p =>
              p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
              .getOrElse(Map.empty))
        }.toSeq
      }.getOrElse(Nil))
  }

  private def specFromJson(o: JsonNode): PartitionSpec =
    PartitionSpec(o.get("spec-id").asInt,
      fieldsFromJson(o.get("fields").elements().asScala.toSeq))

  /** Legacy v1 spec JSON may omit (or null) partition field-ids; per the
    * reference parser (partitions.go UnmarshalJSON,
    * TestDeserializePartitionSpec{WithoutFieldIDs,WithPartiallyMissingFieldIDs,
    * AssignsAfterExistingFieldIDs,WithNullFieldID}) explicit ids are kept and
    * missing ones assign sequentially AFTER the highest of (999, explicit
    * ids) — a fixed fallback would hand duplicate ids to multi-field specs.
    */
  private def fieldsFromJson(raw: Seq[JsonNode]): Seq[PartitionField] = {
    def explicit(f: JsonNode): Option[Int] =
      Option(f.get("field-id")).filterNot(_.isNull).map(_.asInt)
    var next = math.max(PartitionSpec.StartFieldId - 1,
      raw.flatMap(explicit).foldLeft(PartitionSpec.StartFieldId - 1)(math.max))
    raw.map { f =>
      val fid = explicit(f).getOrElse { next += 1; next }
      PartitionField(
        sourceId = f.get("source-id").asInt,
        fieldId = fid,
        name = f.get("name").asText,
        transform = Transforms.parse(f.get("transform").asText))
    }
  }

}
