package graft.rest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.{IcebergSchema, SchemaJson, Transforms}
import graft.format._

/** REST commit protocol model (reference `catalog/rest/rest.go` commit body,
  * Iceberg REST spec `CommitTableRequest`): a commit ships REQUIREMENTS (the
  * optimistic-concurrency asserts validated against the server's CURRENT
  * metadata) plus UPDATES (the deltas applied to it). The server never
  * receives whole metadata — that is the point of the protocol: two writers
  * changing disjoint state can both win.
  *
  * Wire type names follow the public REST spec (`assert-table-uuid`,
  * `add-snapshot`, `set-snapshot-ref`, ...). One extension: `add-snapshot`
  * carries `next-row-id`, the writer-assigned v3 row-lineage cursor after
  * this snapshot's first_row_id blocks were carved (the public v3 protocol
  * assigns row ids server-side; we preserve the writer's assignment).
  */
sealed trait Requirement
object Requirement {
  case object AssertCreate extends Requirement
  final case class AssertTableUuid(uuid: String) extends Requirement
  /** `snapshotId = None` asserts the ref must NOT exist. */
  final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long]) extends Requirement
  final case class AssertLastAssignedFieldId(id: Int) extends Requirement
  final case class AssertCurrentSchemaId(id: Int) extends Requirement
  final case class AssertLastAssignedPartitionId(id: Int) extends Requirement
  final case class AssertDefaultSpecId(id: Int) extends Requirement
  final case class AssertDefaultSortOrderId(id: Int) extends Requirement

  /** Validate against the server's current metadata (None = table does not
    * exist yet). Returns a failure message, or None when satisfied.
    */
  def check(r: Requirement, current: Option[TableMetadata]): Option[String] = r match {
    case AssertCreate =>
      if (current.isEmpty) None else Some("table already exists")
    case AssertTableUuid(u) =>
      current.flatMap(m => if (m.tableUuid == u) None
        else Some(s"table uuid changed: expected $u, found ${m.tableUuid}"))
    case AssertRefSnapshotId(ref, expected) =>
      val actual = current.flatMap { m =>
        m.refs.get(ref).map(_.snapshotId)
          .orElse(if (ref == "main") m.currentSnapshotId else None)
      }
      if (actual == expected) None
      else Some(s"ref $ref: expected ${expected.getOrElse("<absent>")}, " +
        s"found ${actual.getOrElse("<absent>")}")
    case AssertLastAssignedFieldId(id) =>
      current.flatMap(m => if (m.lastColumnId == id) None
        else Some(s"last assigned field id changed: expected $id, found ${m.lastColumnId}"))
    case AssertCurrentSchemaId(id) =>
      current.flatMap(m => if (m.currentSchemaId == id) None
        else Some(s"current schema changed: expected $id, found ${m.currentSchemaId}"))
    case AssertLastAssignedPartitionId(id) =>
      current.flatMap(m => if (m.lastPartitionId == id) None
        else Some(s"last assigned partition id changed: expected $id, found ${m.lastPartitionId}"))
    case AssertDefaultSpecId(id) =>
      current.flatMap(m => if (m.defaultSpecId == id) None
        else Some(s"default spec changed: expected $id, found ${m.defaultSpecId}"))
    case AssertDefaultSortOrderId(id) =>
      current.flatMap(m => if (m.defaultSortOrderId == id) None
        else Some(s"default sort order changed: expected $id, found ${m.defaultSortOrderId}"))
  }
}

sealed trait MetadataUpdate
object MetadataUpdate {
  final case class AssignUuid(uuid: String) extends MetadataUpdate
  final case class UpgradeFormatVersion(v: Int) extends MetadataUpdate
  final case class AddSchema(schema: IcebergSchema) extends MetadataUpdate
  final case class SetCurrentSchema(id: Int) extends MetadataUpdate
  final case class AddPartitionSpec(spec: PartitionSpec) extends MetadataUpdate
  final case class SetDefaultSpec(id: Int) extends MetadataUpdate
  final case class AddSortOrder(order: SortOrder) extends MetadataUpdate
  final case class SetDefaultSortOrder(id: Int) extends MetadataUpdate
  final case class AddSnapshot(snap: Snapshot, nextRowId: Long) extends MetadataUpdate
  final case class SetSnapshotRef(name: String, ref: SnapshotRef) extends MetadataUpdate
  final case class RemoveSnapshots(ids: Seq[Long]) extends MetadataUpdate
  final case class RemoveSnapshotRef(name: String) extends MetadataUpdate
  final case class SetLocation(location: String) extends MetadataUpdate
  final case class SetProperties(props: Map[String, String]) extends MetadataUpdate
  final case class RemoveProperties(keys: Seq[String]) extends MetadataUpdate
  final case class SetStatistics(stats: StatisticsFile) extends MetadataUpdate
  final case class RemoveStatistics(snapshotId: Long) extends MetadataUpdate
  final case class SetPartitionStatistics(stats: PartitionStatisticsFile) extends MetadataUpdate
  final case class RemovePartitionStatistics(snapshotId: Long) extends MetadataUpdate
  final case class RemovePartitionSpecs(specIds: Seq[Int]) extends MetadataUpdate
  final case class RemoveSchemas(schemaIds: Seq[Int]) extends MetadataUpdate
  final case class AddEncryptionKey(key: EncryptionKey) extends MetadataUpdate
  final case class RemoveEncryptionKey(keyId: String) extends MetadataUpdate

  /** Apply one update to metadata (the server side of the protocol). The
    * side-effects the spec mandates ride along: `add-schema` advances
    * last-column-id, `add-spec` advances last-partition-id, `add-snapshot`
    * advances last-sequence-number (and our row-lineage cursor), a branch
    * `set-snapshot-ref` moves current-snapshot-id and appends the snapshot
    * log.
    */
  def apply(m: TableMetadata, u: MetadataUpdate): TableMetadata = u match {
    case AssignUuid(uuid) => m.copy(tableUuid = uuid)
    case UpgradeFormatVersion(v) =>
      require(v >= m.formatVersion, s"cannot downgrade format version to $v")
      // table-uuid is required from v2 (serialization enforces it): a
      // legacy uuid-less v1 table upgraded over the REST wire without an
      // accompanying assign-uuid gets one at the boundary, same as
      // Evolve.upgradeFormatVersion — otherwise the commit would fail at
      // write time on every retry
      m.copy(formatVersion = v,
        tableUuid = if (v >= 2 && m.tableUuid.isEmpty)
          java.util.UUID.randomUUID().toString else m.tableUuid)
    case AddSchema(s) =>
      val kept = m.schemas.filterNot(_.schemaId == s.schemaId) :+ s
      m.copy(schemas = kept, lastColumnId = math.max(m.lastColumnId, s.highestFieldId))
    case SetCurrentSchema(id) =>
      require(m.schemas.exists(_.schemaId == id), s"no schema with id $id")
      m.copy(currentSchemaId = id)
    case AddPartitionSpec(s) =>
      val kept = m.partitionSpecs.filterNot(_.specId == s.specId) :+ s
      val maxField = (s.fields.map(_.fieldId) :+ m.lastPartitionId).max
      m.copy(partitionSpecs = kept, lastPartitionId = maxField)
    case SetDefaultSpec(id) =>
      require(m.partitionSpecs.exists(_.specId == id), s"no spec with id $id")
      m.copy(defaultSpecId = id)
    case AddSortOrder(o) =>
      m.copy(sortOrders = m.sortOrders.filterNot(_.orderId == o.orderId) :+ o)
    case SetDefaultSortOrder(id) =>
      require(m.sortOrders.exists(_.orderId == id), s"no sort order with id $id")
      m.copy(defaultSortOrderId = id)
    case AddSnapshot(s, nextRowId) =>
      m.copy(snapshots = m.snapshots :+ s,
        lastSequenceNumber = math.max(m.lastSequenceNumber, s.sequenceNumber),
        nextRowId = math.max(m.nextRowId, nextRowId),
        lastUpdatedMs = math.max(m.lastUpdatedMs, s.timestampMs))
    case SetSnapshotRef(name, ref) =>
      require(m.snapshots.exists(_.snapshotId == ref.snapshotId),
        s"ref $name points at unknown snapshot ${ref.snapshotId}")
      val withRef = m.copy(refs = m.refs.updated(name, ref))
      if (name == "main" && ref.refType == "branch") {
        val ts = m.snapshotById(ref.snapshotId).map(_.timestampMs)
          .getOrElse(m.lastUpdatedMs)
        withRef.copy(currentSnapshotId = Some(ref.snapshotId),
          snapshotLog = m.snapshotLog :+ SnapshotLogEntry(ref.snapshotId, ts))
      } else withRef
    case RemoveSnapshots(ids) =>
      val gone = ids.toSet
      m.copy(snapshots = m.snapshots.filterNot(s => gone(s.snapshotId)),
        snapshotLog = m.snapshotLog.filterNot(e => gone(e.snapshotId)),
        statistics = m.statistics.filterNot(s => gone(s.snapshotId)),
        partitionStatistics = m.partitionStatistics.filterNot(s => gone(s.snapshotId)))
    case RemoveSnapshotRef(name) =>
      val cleared = m.copy(refs = m.refs - name)
      if (name == "main") cleared.copy(currentSnapshotId = None) else cleared
    case SetLocation(l) => m.copy(location = l)
    case SetProperties(p) => m.copy(properties = m.properties ++ p)
    case RemoveProperties(ks) => m.copy(properties = m.properties -- ks)
    case SetStatistics(st) =>
      m.copy(statistics = m.statistics.filterNot(_.snapshotId == st.snapshotId) :+ st)
    case RemoveStatistics(id) =>
      m.copy(statistics = m.statistics.filterNot(_.snapshotId == id))
    case SetPartitionStatistics(st) =>
      m.copy(partitionStatistics =
        m.partitionStatistics.filterNot(_.snapshotId == st.snapshotId) :+ st)
    case RemovePartitionStatistics(id) =>
      m.copy(partitionStatistics = m.partitionStatistics.filterNot(_.snapshotId == id))
    case RemovePartitionSpecs(ids) =>
      require(!ids.contains(m.defaultSpecId),
        s"cannot remove default partition spec ${m.defaultSpecId}")
      m.copy(partitionSpecs = m.partitionSpecs.filterNot(s => ids.contains(s.specId)))
    case RemoveSchemas(ids) =>
      require(!ids.contains(m.currentSchemaId),
        s"cannot remove current schema ${m.currentSchemaId}")
      m.copy(schemas = m.schemas.filterNot(s => ids.contains(s.schemaId)))
    case AddEncryptionKey(k) =>
      m.copy(encryptionKeys =
        m.encryptionKeys.filterNot(_.keyId == k.keyId) :+ k)
    case RemoveEncryptionKey(id) =>
      m.copy(encryptionKeys = m.encryptionKeys.filterNot(_.keyId == id))
  }

  /** Compute the (requirements, updates) a client must send so the server's
    * CURRENT metadata becomes `updated`, given the client last saw `base` —
    * the client side of the protocol. Deltas are keyed by id, so a
    * concurrent writer that added DIFFERENT snapshots/schemas does not
    * conflict spuriously; the requirements pin exactly what this commit
    * depends on (uuid always, the main branch head always, plus schema/spec
    * pins only when this commit changes them).
    */
  def diff(base: TableMetadata, updated: TableMetadata): (Seq[Requirement], Seq[MetadataUpdate]) = {
    import Requirement._
    val req = Seq.newBuilder[Requirement]
    val up = Seq.newBuilder[MetadataUpdate]
    req += AssertTableUuid(base.tableUuid)

    if (updated.formatVersion != base.formatVersion)
      up += UpgradeFormatVersion(updated.formatVersion)
    if (updated.tableUuid != base.tableUuid) up += AssignUuid(updated.tableUuid)

    updated.schemas.filterNot(s => base.schemas.exists(b => b.schemaId == s.schemaId && b == s))
      .foreach(s => up += AddSchema(s))
    if (updated.currentSchemaId != base.currentSchemaId) {
      req += AssertCurrentSchemaId(base.currentSchemaId)
      up += SetCurrentSchema(updated.currentSchemaId)
    }

    updated.partitionSpecs
      .filterNot(s => base.partitionSpecs.exists(b => b.specId == s.specId && b == s))
      .foreach(s => up += AddPartitionSpec(s))
    if (updated.defaultSpecId != base.defaultSpecId) {
      req += AssertDefaultSpecId(base.defaultSpecId)
      up += SetDefaultSpec(updated.defaultSpecId)
    }

    updated.sortOrders.filterNot(o => base.sortOrders.exists(b => b.orderId == o.orderId && b == o))
      .foreach(o => up += AddSortOrder(o))
    if (updated.defaultSortOrderId != base.defaultSortOrderId) {
      req += AssertDefaultSortOrderId(base.defaultSortOrderId)
      up += SetDefaultSortOrder(updated.defaultSortOrderId)
    }

    val removed = base.snapshots.map(_.snapshotId)
      .filterNot(id => updated.snapshots.exists(_.snapshotId == id))
    if (removed.nonEmpty) up += RemoveSnapshots(removed)
    updated.snapshots.filterNot(s => base.snapshots.exists(_.snapshotId == s.snapshotId))
      .sortBy(_.sequenceNumber)
      .foreach(s => up += AddSnapshot(s, updated.nextRowId))

    updated.refs.foreach { case (name, r) =>
      if (!base.refs.get(name).contains(r)) up += SetSnapshotRef(name, r)
    }
    base.refs.keys.filterNot(updated.refs.contains)
      .foreach(n => up += RemoveSnapshotRef(n))
    // a writer that moved current-snapshot-id without touching refs still
    // needs the branch to advance on the server
    if (updated.currentSnapshotId != base.currentSnapshotId &&
        updated.refs.get("main") == base.refs.get("main"))
      updated.currentSnapshotId.foreach(id =>
        up += SetSnapshotRef("main", SnapshotRef(id, "branch")))

    val changedProps = updated.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v)
    }
    if (changedProps.nonEmpty) up += SetProperties(changedProps)
    val removedProps = base.properties.keys.filterNot(updated.properties.contains).toSeq
    if (removedProps.nonEmpty) up += RemoveProperties(removedProps)

    if (updated.location != base.location) up += SetLocation(updated.location)

    updated.statistics.filterNot(base.statistics.contains)
      .foreach(s => up += SetStatistics(s))
    base.statistics.map(_.snapshotId)
      .filterNot(id => updated.statistics.exists(_.snapshotId == id))
      .foreach(id => up += RemoveStatistics(id))
    updated.partitionStatistics.filterNot(base.partitionStatistics.contains)
      .foreach(s => up += SetPartitionStatistics(s))
    base.partitionStatistics.map(_.snapshotId)
      .filterNot(id => updated.partitionStatistics.exists(_.snapshotId == id))
      .foreach(id => up += RemovePartitionStatistics(id))

    val droppedSpecs = base.partitionSpecs.map(_.specId)
      .filterNot(id => updated.partitionSpecs.exists(_.specId == id))
    if (droppedSpecs.nonEmpty) up += RemovePartitionSpecs(droppedSpecs)
    val droppedSchemas = base.schemas.map(_.schemaId)
      .filterNot(id => updated.schemas.exists(_.schemaId == id))
    if (droppedSchemas.nonEmpty) up += RemoveSchemas(droppedSchemas)

    updated.encryptionKeys
      .filterNot(k => base.encryptionKeys.exists(b => b.keyId == k.keyId && b == k))
      .foreach(k => up += AddEncryptionKey(k))
    base.encryptionKeys.map(_.keyId)
      .filterNot(id => updated.encryptionKeys.exists(_.keyId == id))
      .foreach(id => up += RemoveEncryptionKey(id))

    // Pin the main branch head ONLY when this commit moves it: a property-
    // or stats-only commit pinned to main would conflict spuriously with a
    // concurrent snapshot commit — two writers changing disjoint state must
    // both win (the file's contract, and REST-spec practice).
    val updates = up.result()
    val movesMain = updates.exists {
      case _: MetadataUpdate.AddSnapshot => true
      case _: MetadataUpdate.RemoveSnapshots => true
      case MetadataUpdate.SetSnapshotRef("main", _) => true
      case MetadataUpdate.RemoveSnapshotRef("main") => true
      case _ => false
    }
    if (movesMain)
      req += AssertRefSnapshotId("main",
        base.refs.get("main").map(_.snapshotId).orElse(base.currentSnapshotId))

    (req.result(), updates)
  }
}

/** JSON wire forms for requirements and updates (REST spec shapes). */
object UpdateJson {
  private val mapper = new ObjectMapper()

  // ---- requirements ------------------------------------------------------

  def requirementToNode(r: Requirement): ObjectNode = {
    import Requirement._
    val o = mapper.createObjectNode()
    r match {
      case AssertCreate => o.put("type", "assert-create")
      case AssertTableUuid(u) => o.put("type", "assert-table-uuid"); o.put("uuid", u)
      case AssertRefSnapshotId(ref, id) =>
        o.put("type", "assert-ref-snapshot-id"); o.put("ref", ref)
        id match { case Some(v) => o.put("snapshot-id", v); case None => o.putNull("snapshot-id") }
      case AssertLastAssignedFieldId(id) =>
        o.put("type", "assert-last-assigned-field-id"); o.put("last-assigned-field-id", id)
      case AssertCurrentSchemaId(id) =>
        o.put("type", "assert-current-schema-id"); o.put("current-schema-id", id)
      case AssertLastAssignedPartitionId(id) =>
        o.put("type", "assert-last-assigned-partition-id"); o.put("last-assigned-partition-id", id)
      case AssertDefaultSpecId(id) =>
        o.put("type", "assert-default-spec-id"); o.put("default-spec-id", id)
      case AssertDefaultSortOrderId(id) =>
        o.put("type", "assert-default-sort-order-id"); o.put("default-sort-order-id", id)
    }
    o
  }

  def requirementFromNode(o: JsonNode): Requirement = {
    import Requirement._
    o.get("type").asText() match {
      case "assert-create" => AssertCreate
      case "assert-table-uuid" => AssertTableUuid(o.get("uuid").asText())
      case "assert-ref-snapshot-id" =>
        val id = Option(o.get("snapshot-id")).filterNot(_.isNull).map(_.asLong())
        AssertRefSnapshotId(o.get("ref").asText(), id)
      case "assert-last-assigned-field-id" =>
        AssertLastAssignedFieldId(o.get("last-assigned-field-id").asInt())
      case "assert-current-schema-id" =>
        AssertCurrentSchemaId(o.get("current-schema-id").asInt())
      case "assert-last-assigned-partition-id" =>
        AssertLastAssignedPartitionId(o.get("last-assigned-partition-id").asInt())
      case "assert-default-spec-id" => AssertDefaultSpecId(o.get("default-spec-id").asInt())
      case "assert-default-sort-order-id" =>
        AssertDefaultSortOrderId(o.get("default-sort-order-id").asInt())
      case t => throw new IllegalArgumentException(s"unknown requirement type: $t")
    }
  }

  // ---- updates -----------------------------------------------------------

  def updateToNode(u: MetadataUpdate): ObjectNode = {
    import MetadataUpdate._
    val o = mapper.createObjectNode()
    u match {
      case AssignUuid(uuid) => o.put("action", "assign-uuid"); o.put("uuid", uuid)
      case UpgradeFormatVersion(v) =>
        o.put("action", "upgrade-format-version"); o.put("format-version", v)
      case AddSchema(s) =>
        o.put("action", "add-schema")
        o.set[ObjectNode]("schema", SchemaJson.schemaToJsonNode(s))
        o.put("last-column-id", s.highestFieldId)
      case SetCurrentSchema(id) => o.put("action", "set-current-schema"); o.put("schema-id", id)
      case AddPartitionSpec(s) =>
        o.put("action", "add-spec"); o.set[ObjectNode]("spec", specToNode(s))
      case SetDefaultSpec(id) => o.put("action", "set-default-spec"); o.put("spec-id", id)
      case AddSortOrder(so) =>
        o.put("action", "add-sort-order"); o.set[ObjectNode]("sort-order", sortOrderToNode(so))
      case SetDefaultSortOrder(id) =>
        o.put("action", "set-default-sort-order"); o.put("sort-order-id", id)
      case AddSnapshot(s, nextRowId) =>
        o.put("action", "add-snapshot")
        o.set[ObjectNode]("snapshot", snapshotToNode(s))
        o.put("next-row-id", nextRowId)
      case SetSnapshotRef(name, r) =>
        o.put("action", "set-snapshot-ref")
        o.put("ref-name", name); o.put("type", r.refType); o.put("snapshot-id", r.snapshotId)
        r.minSnapshotsToKeep.foreach(o.put("min-snapshots-to-keep", _))
        r.maxSnapshotAgeMs.foreach(o.put("max-snapshot-age-ms", _))
        r.maxRefAgeMs.foreach(o.put("max-ref-age-ms", _))
      case RemoveSnapshots(ids) =>
        o.put("action", "remove-snapshots")
        val a = o.putArray("snapshot-ids"); ids.foreach(a.add)
      case RemoveSnapshotRef(name) =>
        o.put("action", "remove-snapshot-ref"); o.put("ref-name", name)
      case SetLocation(l) => o.put("action", "set-location"); o.put("location", l)
      case SetProperties(p) =>
        o.put("action", "set-properties")
        val n = o.putObject("updates"); p.foreach { case (k, v) => n.put(k, v) }
      case RemoveProperties(ks) =>
        o.put("action", "remove-properties")
        val a = o.putArray("removals"); ks.foreach(a.add)
      case SetStatistics(st) =>
        o.put("action", "set-statistics")
        o.put("snapshot-id", st.snapshotId)
        o.set[ObjectNode]("statistics", statsToNode(st))
      case RemoveStatistics(id) => o.put("action", "remove-statistics"); o.put("snapshot-id", id)
      case SetPartitionStatistics(st) =>
        o.put("action", "set-partition-statistics")
        val n = o.putObject("partition-statistics")
        n.put("snapshot-id", st.snapshotId)
        n.put("statistics-path", st.path)
        n.put("file-size-in-bytes", st.fileSizeInBytes)
      case RemovePartitionStatistics(id) =>
        o.put("action", "remove-partition-statistics"); o.put("snapshot-id", id)
      case RemovePartitionSpecs(ids) =>
        o.put("action", "remove-partition-specs")
        val a = o.putArray("spec-ids"); ids.foreach(a.add)
      case RemoveSchemas(ids) =>
        o.put("action", "remove-schemas")
        val a = o.putArray("schema-ids"); ids.foreach(a.add)
      case AddEncryptionKey(k) =>
        o.put("action", "add-encryption-key")
        val n = o.putObject("encryption-key")
        n.put("key-id", k.keyId)
        n.put("encrypted-key-metadata", k.encryptedKeyMetadata)
        k.encryptedById.foreach(n.put("encrypted-by-id", _))
        if (k.properties.nonEmpty) {
          val p = n.putObject("properties")
          k.properties.foreach { case (key, v) => p.put(key, v) }
        }
      case RemoveEncryptionKey(id) =>
        o.put("action", "remove-encryption-key"); o.put("key-id", id)
    }
    o
  }

  def updateFromNode(o: JsonNode): MetadataUpdate = {
    import MetadataUpdate._
    o.get("action").asText() match {
      case "assign-uuid" => AssignUuid(o.get("uuid").asText())
      case "upgrade-format-version" => UpgradeFormatVersion(o.get("format-version").asInt())
      case "add-schema" => AddSchema(SchemaJson.schemaFromJsonNode(o.get("schema")))
      case "set-current-schema" => SetCurrentSchema(o.get("schema-id").asInt())
      case "add-spec" => AddPartitionSpec(specFromNode(o.get("spec")))
      case "set-default-spec" => SetDefaultSpec(o.get("spec-id").asInt())
      case "add-sort-order" => AddSortOrder(sortOrderFromNode(o.get("sort-order")))
      case "set-default-sort-order" => SetDefaultSortOrder(o.get("sort-order-id").asInt())
      case "add-snapshot" =>
        AddSnapshot(snapshotFromNode(o.get("snapshot")),
          Option(o.get("next-row-id")).map(_.asLong()).getOrElse(0L))
      case "set-snapshot-ref" =>
        SetSnapshotRef(o.get("ref-name").asText(), SnapshotRef(
          o.get("snapshot-id").asLong(), o.get("type").asText(),
          Option(o.get("min-snapshots-to-keep")).map(_.asInt()),
          Option(o.get("max-snapshot-age-ms")).map(_.asLong()),
          Option(o.get("max-ref-age-ms")).map(_.asLong())))
      case "remove-snapshots" =>
        RemoveSnapshots(o.get("snapshot-ids").elements().asScala.map(_.asLong()).toSeq)
      case "remove-snapshot-ref" => RemoveSnapshotRef(o.get("ref-name").asText())
      case "set-location" => SetLocation(o.get("location").asText())
      case "set-properties" =>
        SetProperties(o.get("updates").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
      case "remove-properties" =>
        RemoveProperties(o.get("removals").elements().asScala.map(_.asText()).toSeq)
      case "set-statistics" => SetStatistics(statsFromNode(o.get("statistics")))
      case "remove-statistics" => RemoveStatistics(o.get("snapshot-id").asLong())
      case "set-partition-statistics" =>
        val n = o.get("partition-statistics")
        SetPartitionStatistics(PartitionStatisticsFile(n.get("snapshot-id").asLong(),
          n.get("statistics-path").asText(), n.get("file-size-in-bytes").asLong()))
      case "remove-partition-statistics" =>
        RemovePartitionStatistics(o.get("snapshot-id").asLong())
      case "remove-partition-specs" =>
        RemovePartitionSpecs(o.get("spec-ids").elements().asScala.map(_.asInt()).toSeq)
      case "remove-schemas" =>
        RemoveSchemas(o.get("schema-ids").elements().asScala.map(_.asInt()).toSeq)
      case "add-encryption-key" =>
        val n = o.get("encryption-key")
        AddEncryptionKey(EncryptionKey(
          n.get("key-id").asText(), n.get("encrypted-key-metadata").asText(),
          Option(n.get("encrypted-by-id")).map(_.asText()),
          Option(n.get("properties")).map(_.properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)))
      case "remove-encryption-key" => RemoveEncryptionKey(o.get("key-id").asText())
      case a => throw new IllegalArgumentException(s"unknown update action: $a")
    }
  }

  // ---- shared fragments --------------------------------------------------

  def specToNode(spec: PartitionSpec): ObjectNode = {
    val so = mapper.createObjectNode()
    so.put("spec-id", spec.specId)
    val fa = so.putArray("fields")
    spec.fields.foreach { pf =>
      val fo = fa.addObject()
      fo.put("source-id", pf.sourceId)
      fo.put("field-id", pf.fieldId)
      fo.put("name", pf.name)
      fo.put("transform", TableMetadata.transformName(pf.transform))
    }
    so
  }

  def specFromNode(o: JsonNode): PartitionSpec =
    PartitionSpec(o.get("spec-id").asInt(),
      o.get("fields").elements().asScala.map { f =>
        PartitionField(f.get("source-id").asInt(), f.get("field-id").asInt(),
          f.get("name").asText(), Transforms.parse(f.get("transform").asText()))
      }.toSeq)

  def sortOrderToNode(o: SortOrder): ObjectNode = {
    val oo = mapper.createObjectNode()
    oo.put("order-id", o.orderId)
    val fa = oo.putArray("fields")
    o.fields.foreach { sf =>
      val fo = fa.addObject()
      fo.put("transform", TableMetadata.transformName(sf.transform))
      fo.put("source-id", sf.sourceId)
      fo.put("direction", if (sf.ascending) "asc" else "desc")
      fo.put("null-order", if (sf.nullsFirst) "nulls-first" else "nulls-last")
    }
    oo
  }

  def sortOrderFromNode(o: JsonNode): SortOrder =
    SortOrder(o.get("order-id").asInt(),
      o.get("fields").elements().asScala.map { f =>
        SortField(f.get("source-id").asInt(), Transforms.parse(f.get("transform").asText()),
          ascending = f.get("direction").asText() == "asc",
          nullsFirst = f.get("null-order").asText() == "nulls-first")
      }.toSeq)

  def snapshotToNode(s: Snapshot): ObjectNode = {
    val so = mapper.createObjectNode()
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
    so
  }

  def snapshotFromNode(o: JsonNode): Snapshot =
    Snapshot(
      snapshotId = o.get("snapshot-id").asLong(),
      parentSnapshotId = Option(o.get("parent-snapshot-id")).map(_.asLong()),
      sequenceNumber = o.get("sequence-number").asLong(),
      timestampMs = o.get("timestamp-ms").asLong(),
      manifestList = o.get("manifest-list").asText(),
      summary = Option(o.get("summary")).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
      schemaId = Option(o.get("schema-id")).map(_.asInt()),
      firstRowId = Option(o.get("first-row-id")).map(_.asLong()),
      addedRows = Option(o.get("added-rows")).map(_.asLong()))

  def statsToNode(st: StatisticsFile): ObjectNode = {
    val so = mapper.createObjectNode()
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
      val fa = bo.putArray("fields"); b.fields.foreach(fa.add)
      val po = bo.putObject("properties")
      b.properties.foreach { case (k, v) => po.put(k, v) }
    }
    so
  }

  def statsFromNode(o: JsonNode): StatisticsFile =
    StatisticsFile(
      o.get("snapshot-id").asLong(),
      o.get("statistics-path").asText(),
      o.get("file-size-in-bytes").asLong(),
      Option(o.get("blob-metadata")).map(_.elements().asScala.map { b =>
        StatsBlobMetadata(b.get("type").asText(), b.get("snapshot-id").asLong(),
          b.get("sequence-number").asLong(),
          Option(b.get("fields")).map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil),
          Option(b.get("properties")).map(_.properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty))
      }.toSeq).getOrElse(Nil))
}
