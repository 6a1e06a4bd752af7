package graft.format

import graft.core._
import graft.core.IcebergTypes._

/** Partition specs & sort orders (reference `partitions.go`, `table/sorting.go`). */
final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty

  /** The partition struct type derived from a schema (`partitions.go:687-707`).
    * `day` yields an int ordinal here (stored as int in Avro either way).
    */
  def partitionType(schema: IcebergSchema): StructT =
    StructT(fields.map { pf =>
      val src = schema.idToField(pf.sourceId)
      NestedField(pf.fieldId, pf.name, icebergResultType(pf, src.fieldType), required = false)
    })

  private def icebergResultType(pf: PartitionField, srcT: IcebergType): IcebergType =
    pf.transform match {
      case Transforms.Identity => srcT
      case Transforms.Void => srcT
      case Transforms.Bucket(_) => IntT
      case Transforms.Truncate(_) => srcT
      case Transforms.Years | Transforms.Months | Transforms.Hours | Transforms.Days => IntT
      // forward-compat: unknown transforms surface their partition values
      // as strings (reference `transforms.go:253-310` permissive reads)
      case Transforms.Unknown(_) => StringT
      case _ => IntT
    }

  /** Hive-style escaped partition path (`partitions.go:709-744`). */
  def partitionToPath(values: Seq[Any], schema: IcebergSchema): String =
    fields.zip(values).map { case (pf, v) =>
      s"${escape(pf.name)}=${escape(valueString(pf, v))}"
    }.mkString("/")

  private def valueString(pf: PartitionField, v: Any): String =
    if (v == null) "null" else v.toString

  private def escape(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}

object PartitionSpec {
  val Unpartitioned: PartitionSpec = PartitionSpec(0, Nil)
  /** Partition field IDs start at 1000 per spec. */
  val StartFieldId = 1000

  def builder(schema: IcebergSchema, specId: Int = 0): Builder = new Builder(schema, specId)

  final class Builder(schema: IcebergSchema, specId: Int) {
    private var nextId = StartFieldId - 1
    private val fields = Seq.newBuilder[PartitionField]
    private def alloc(): Int = { nextId += 1; nextId }

    def add(sourceName: String, transform: Transform, name: String = null): Builder = {
      val src = schema.findField(sourceName).getOrElse(
        throw new IllegalArgumentException(s"no such column: $sourceName"))
      val pname = Option(name).getOrElse(transform match {
        case Transforms.Identity => src.name
        case Transforms.Bucket(n) => s"${src.name}_bucket"
        case Transforms.Truncate(w) => s"${src.name}_trunc"
        case t => s"${src.name}_${t.name}"
      })
      fields += PartitionField(src.id, alloc(), pname, transform)
      this
    }
    def build(): PartitionSpec = PartitionSpec(specId, fields.result())
  }
}

final case class SortField(sourceId: Int, transform: Transform, ascending: Boolean, nullsFirst: Boolean)
final case class SortOrder(orderId: Int, fields: Seq[SortField])
object SortOrder { val Unsorted: SortOrder = SortOrder(0, Nil) }

/** Per-file stats + location — one manifest row (reference `manifest.go`). */
final case class DataFile(
    content: Int, // 0=data 1=position deletes 2=equality deletes
    path: String,
    format: String,
    partition: Seq[Any], // aligned with spec.fields
    recordCount: Long,
    fileSize: Long,
    columnSizes: Map[Int, Long] = Map.empty,
    valueCounts: Map[Int, Long] = Map.empty,
    nullCounts: Map[Int, Long] = Map.empty,
    nanCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Array[Byte]] = Map.empty,
    upperBounds: Map[Int, Array[Byte]] = Map.empty,
    splitOffsets: Seq[Long] = Nil,
    equalityIds: Seq[Int] = Nil,
    sortOrderId: Option[Int] = None,
    // v3 deletion-vector fields (content == PositionDeletes, format PUFFIN)
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSize: Option[Long] = None,
    // v3 row lineage: first _row_id assigned to this file's rows at commit
    firstRowId: Option[Long] = None,
    // per-file encryption key metadata (manifest field 131): opaque bytes
    // another engine's encrypting writer stamped; carried losslessly so an
    // encrypted table's manifests survive our rewrites and the plan wire
    keyMetadata: Option[Array[Byte]] = None,
    // provenance, not manifest payload: the spec this file's partition tuple
    // was written under (tagged from the manifest header on read) — lets the
    // task codec reject a file whose literals would decode under the wrong
    // transforms (reference file_scan_task.go:274-287 per-file SpecID check)
    specId: Option[Int] = None)

object DataFileContent {
  val Data = 0
  val PositionDeletes = 1
  val EqualityDeletes = 2
}

final case class ManifestEntry(
    status: Int, // 0 existing, 1 added, 2 deleted
    snapshotId: Option[Long],
    dataSequence: Option[Long], // None => inherit from manifest/commit
    fileSequence: Option[Long],
    file: DataFile)

object ManifestEntryStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

final case class FieldSummary(
    containsNull: Boolean,
    containsNan: Option[Boolean],
    lowerBound: Option[Array[Byte]],
    upperBound: Option[Array[Byte]])

final case class ManifestFile(
    path: String,
    length: Long,
    specId: Int,
    content: Int, // 0 data, 1 deletes
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long,
    partitions: Seq[FieldSummary],
    // v3 row lineage (spec field 520): first _row_id assigned to this DATA
    // manifest's rows; entries whose data_file.first_row_id is null inherit
    // a running id from here (reference manifest.go:920-935)
    firstRowId: Option[Long] = None)

object ManifestContent {
  val Data = 0
  val Deletes = 1
}
