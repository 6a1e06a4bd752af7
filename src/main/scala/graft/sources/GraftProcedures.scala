package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.{Catalog => GraftCatalog}
import graft.table.{Analyze, Evolve, Maintenance, Table => GraftTable}

/** SQL stored procedures — `CALL g.system.<proc>(...)` — the maintenance
  * surface every Iceberg SQL user expects, expressed through Spark 4's
  * native DSv2 procedure binding (no parser extension needed; named and
  * positional arguments, defaults, and type coercion are Spark's own
  * analysis). Each procedure wraps the library API the engine already
  * ships — [[graft.table.Maintenance]], [[graft.table.Evolve]],
  * [[graft.table.Analyze]] — and returns its result as rows through a
  * driver-local scan (results are per-call summaries, bounded by design;
  * the distributed work happens inside the wrapped action).
  *
  * Reference basis: the reference exposes these as library calls
  * (`table/maintenance.go`, `table/metadata.go` refs); the procedure
  * names/arguments follow the Iceberg Spark procedure conventions so a
  * user's existing `CALL` scripts port unchanged.
  */
object GraftProcedures {

  def names: Seq[String] = Seq(
    "rollback_to_snapshot", "rollback_to_timestamp", "expire_snapshots",
    "rewrite_data_files", "rewrite_position_delete_files",
    "rewrite_manifests", "remove_orphan_files",
    "fast_forward", "cherrypick_snapshot", "publish_changes",
    "create_branch", "create_tag", "drop_ref",
    "ancestors_of", "compute_table_stats", "compute_partition_stats",
    "add_partition_field", "drop_partition_field", "replace_sort_order",
    "snapshot", "add_files", "set_current_snapshot",
    "remove_unused_specs", "remove_unused_schemas")

  /** `"bucket(8, k)"` / `"months(ts)"` / `"truncate(4, name)"` / `"k"` →
    * (source column, transform) — the DDL spelling Spark users write in
    * `PARTITIONED BY`.
    */
  def parseTransformField(s: String): (String, graft.core.Transform) = {
    import graft.core.Transforms
    val Fn = """(\w+)\s*\(([^)]*)\)""".r
    s.trim match {
      case Fn(fn, args0) =>
        val args = args0.split(',').map(_.trim).filter(_.nonEmpty)
        fn.toLowerCase match {
          case "identity" => (args(0), Transforms.Identity)
          case "bucket" => (args(1), Transforms.Bucket(args(0).toInt))
          case "truncate" => (args(1), Transforms.Truncate(args(0).toInt))
          case "years" | "year" => (args(0), Transforms.Years)
          case "months" | "month" => (args(0), Transforms.Months)
          case "days" | "day" => (args(0), Transforms.Days)
          case "hours" | "hour" => (args(0), Transforms.Hours)
          case "void" => (args(0), Transforms.Void)
          case other => throw new IllegalArgumentException(
            s"unsupported partition transform $other")
        }
      case col if col.nonEmpty => (col, Transforms.Identity)
      case _ => throw new IllegalArgumentException("empty partition field")
    }
  }

  def load(name: String, cat: GraftCatalog, catName: String): Option[UnboundProcedure] =
    if (names.contains(name)) Some(new GraftProcedure(name, cat, catName)) else None

  /** Iceberg sort-order text (`a DESC NULLS LAST, truncate(4, b)`) →
    * resolved [[graft.format.SortField]]s against the table schema —
    * shared by the `replace_sort_order` procedure and the
    * `ALTER TABLE ... WRITE ORDERED BY` SQL extension.
    */
  def parseSortOrder(t: GraftTable, text: String): Seq[graft.format.SortField] = {
    // split on commas OUTSIDE parens (transforms carry their own commas)
    val parts = text.split(",(?![^(]*\\))").map(_.trim).filter(_.nonEmpty)
    val Part = """(?i)^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$""".r
    parts.map { part =>
      val Part(expr, dir, nulls) = part
      val asc = dir == null || dir.equalsIgnoreCase("ASC")
      // Iceberg default: ASC → nulls-first, DESC → nulls-last
      val nullsFirst =
        if (nulls == null) asc else nulls.equalsIgnoreCase("FIRST")
      val (colName, tr) = parseTransformField(expr)
      val src = t.schema.findField(colName).getOrElse(
        throw new IllegalArgumentException(s"no such column $colName"))
      graft.format.SortField(src.id, tr, asc, nullsFirst)
    }.toSeq
  }
}

/** One procedure: unbound and bound are the same object (parameters are
  * static; Spark coerces arguments to the declared types and fills
  * defaults before `call`).
  */
final class GraftProcedure(procName: String, cat: GraftCatalog, catName: String)
    extends UnboundProcedure with BoundProcedure {

  import GraftProcedure._

  override def name(): String = procName
  override def description(): String = s"graft $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  private def in(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
  private def inDef(n: String, dt: DataType, sql: String) =
    ProcedureParameter.in(n, dt).defaultValue(sql).build()

  override def parameters(): Array[ProcedureParameter] = procName match {
    case "rollback_to_snapshot" =>
      Array(in("table", StringType), in("snapshot_id", LongType))
    case "rollback_to_timestamp" =>
      Array(in("table", StringType), in("timestamp_ms", LongType))
    case "expire_snapshots" =>
      Array(in("table", StringType),
        inDef("older_than_ms", LongType, Long.MaxValue.toString + "L"),
        inDef("retain_last", IntegerType, "1"))
    case "rewrite_data_files" =>
      Array(in("table", StringType),
        inDef("target_file_size_bytes", LongType, "0L"),
        inDef("min_input_files", IntegerType, "2"),
        inDef("rewrite_all", BooleanType, "false"),
        inDef("zorder_by", StringType, "NULL"),
        // iceberg partial-progress.max-commits: >1 splits the rewrite into
        // independent commits along bin-pack group boundaries
        inDef("max_commits", IntegerType, "1"))
    case "rewrite_position_delete_files" =>
      Array(in("table", StringType),
        inDef("target_file_size_bytes", LongType, "0L"))
    case "rewrite_manifests" =>
      Array(in("table", StringType), inDef("target_count", IntegerType, "1"))
    case "remove_orphan_files" =>
      Array(in("table", StringType),
        inDef("older_than_ms", LongType, Long.MaxValue.toString + "L"),
        inDef("dry_run", BooleanType, "true"))
    case "fast_forward" =>
      Array(in("table", StringType), in("branch", StringType),
        in("source", StringType))
    case "cherrypick_snapshot" =>
      Array(in("table", StringType), in("snapshot_id", LongType))
    case "publish_changes" =>
      Array(in("table", StringType), in("wap_id", StringType))
    case "create_branch" | "create_tag" =>
      Array(in("table", StringType), in("name", StringType),
        inDef("snapshot_id", LongType, "NULL"))
    case "drop_ref" =>
      Array(in("table", StringType), in("name", StringType))
    case "ancestors_of" =>
      Array(in("table", StringType), inDef("snapshot_id", LongType, "NULL"))
    case "compute_table_stats" =>
      Array(in("table", StringType), inDef("columns", StringType, "NULL"))
    case "compute_partition_stats" =>
      Array(in("table", StringType))
    case "add_partition_field" =>
      Array(in("table", StringType), in("field", StringType))
    case "drop_partition_field" =>
      Array(in("table", StringType), in("name", StringType))
    case "replace_sort_order" =>
      Array(in("table", StringType), in("order", StringType))
    case "snapshot" =>
      Array(in("source_location", StringType), in("table", StringType))
    case "add_files" =>
      Array(in("table", StringType), in("source_location", StringType),
        inDef("check_duplicate_files", BooleanType, "true"))
    case "set_current_snapshot" =>
      Array(in("table", StringType),
        inDef("snapshot_id", LongType, "NULL"),
        inDef("ref", StringType, "NULL"))
    case "remove_unused_specs" | "remove_unused_schemas" =>
      Array(in("table", StringType))
  }

  private def load(input: InternalRow): GraftTable = {
    val name = input.getUTF8String(0).toString
    require(cat.tableExists(name), s"$catName: no such table $name")
    cat.loadTable(name)
  }

  override def call(input: InternalRow): JIterator[Scan] = {
    // `snapshot` creates its table — arg0 is a source path, not a table
    if (procName == "snapshot") {
      val src = input.getUTF8String(0).toString
      val dest = input.getUTF8String(1).toString
      val t2 = graft.table.Writer.snapshotImport(SparkSession.active, cat, src, dest)
      return Collections.singletonList(rows(
        Seq("imported_files" -> LongType, "current_snapshot_id" -> LongType),
        Seq(Array[Any](
          t2.newScan.planFiles().size.toLong,
          t2.metadata.currentSnapshotId.getOrElse(-1L)))): Scan).iterator()
    }
    val t = load(input)
    val out: GraftResultScan = procName match {

      case "rollback_to_snapshot" | "rollback_to_timestamp" =>
        val prev = t.metadata.currentSnapshotId.getOrElse(-1L)
        val snapId =
          if (procName == "rollback_to_snapshot") input.getLong(1)
          else t.metadata.snapshotAsOf(input.getLong(1)).getOrElse(
            throw new IllegalArgumentException(
              s"$catName: no snapshot at or before timestamp")).snapshotId
        val t2 = Evolve.rollbackTo(t, snapId)
        rows(Seq("previous_snapshot_id" -> LongType,
          "current_snapshot_id" -> LongType),
          Seq(Array[Any](prev, t2.metadata.currentSnapshotId.getOrElse(-1L))))

      case "expire_snapshots" =>
        val r = Maintenance.expireSnapshots(t, input.getLong(1), input.getInt(2))
        rows(Seq("expired_snapshots" -> IntegerType,
          "deleted_files" -> IntegerType),
          Seq(Array[Any](r.expiredSnapshots.length, r.deletedFiles.length)))

      case "rewrite_data_files" =>
        val zorder = if (input.isNullAt(4)) Nil
          else input.getUTF8String(4).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq
        val r = Maintenance.rewriteDataFiles(SparkSession.active, t,
          targetFileSizeBytes = input.getLong(1),
          minInputFiles = input.getInt(2),
          rewriteAll = input.getBoolean(3), zorderBy = zorder,
          maxCommits = input.getInt(5))
        rows(Seq("rewritten_data_files" -> IntegerType,
          "added_data_files" -> IntegerType,
          "removed_delete_files" -> IntegerType),
          Seq(Array[Any](r.rewrittenDataFiles, r.addedDataFiles,
            r.removedDeleteFiles)))

      case "rewrite_position_delete_files" =>
        val r = Maintenance.rewritePositionDeleteFiles(SparkSession.active, t,
          targetFileSizeBytes = input.getLong(1))
        rows(Seq("rewritten_delete_files" -> IntegerType,
          "added_delete_files" -> IntegerType,
          "dropped_dangling_files" -> IntegerType),
          Seq(Array[Any](r.rewrittenDeleteFiles, r.addedDeleteFiles,
            r.droppedDanglingFiles)))

      case "rewrite_manifests" =>
        def manifestCount(tt: GraftTable): Int =
          tt.metadata.currentSnapshot.map(s =>
            graft.format.Manifests.readManifestList(s.manifestList).length).getOrElse(0)
        val before = manifestCount(t)
        val t2 = Maintenance.rewriteManifests(t, input.getInt(1))
        rows(Seq("manifests_before" -> IntegerType,
          "manifests_after" -> IntegerType),
          Seq(Array[Any](before, manifestCount(t2))))

      case "remove_orphan_files" =>
        val paths = Maintenance.removeOrphanFiles(t, input.getLong(1),
          dryRun = input.getBoolean(2))
        rows(Seq("orphan_file_path" -> StringType),
          paths.sorted.map(p => Array[Any](UTF8String.fromString(p))))

      case "fast_forward" =>
        val t2 = Evolve.fastForward(t, input.getUTF8String(1).toString,
          input.getUTF8String(2).toString)
        val target = input.getUTF8String(1).toString
        rows(Seq("branch" -> StringType, "current_snapshot_id" -> LongType),
          Seq(Array[Any](UTF8String.fromString(target),
            t2.metadata.refs(target).snapshotId)))

      case "cherrypick_snapshot" =>
        val src = input.getLong(1)
        val t2 = Evolve.cherrypick(t, src)
        rows(Seq("source_snapshot_id" -> LongType,
          "current_snapshot_id" -> LongType),
          Seq(Array[Any](src, t2.metadata.currentSnapshotId.getOrElse(-1L))))

      case "publish_changes" =>
        val (src, t2) = Evolve.publishChanges(t,
          input.getUTF8String(1).toString)
        rows(Seq("source_snapshot_id" -> LongType,
          "current_snapshot_id" -> LongType),
          Seq(Array[Any](src, t2.metadata.currentSnapshotId.getOrElse(-1L))))

      case "create_branch" | "create_tag" =>
        val refType = if (procName == "create_branch") "branch" else "tag"
        val snapId = if (input.isNullAt(2))
          t.metadata.currentSnapshotId.getOrElse(throw new IllegalStateException(
            s"$catName: table has no current snapshot to $procName from"))
          else input.getLong(2)
        val refName = input.getUTF8String(1).toString
        Evolve.setRef(t, refName, snapId, refType)
        rows(Seq("name" -> StringType, "snapshot_id" -> LongType),
          Seq(Array[Any](UTF8String.fromString(refName), snapId)))

      case "drop_ref" =>
        val refName = input.getUTF8String(1).toString
        val existed = t.metadata.refs.contains(refName)
        if (existed) Evolve.removeRef(t, refName)
        rows(Seq("name" -> StringType, "dropped" -> BooleanType),
          Seq(Array[Any](UTF8String.fromString(refName), existed)))

      case "ancestors_of" =>
        val start = if (input.isNullAt(1)) t.metadata.currentSnapshotId
          else Some(input.getLong(1))
        val chain = Iterator.iterate(start.flatMap(t.metadata.snapshotById))(
          _.flatMap(_.parentSnapshotId).flatMap(t.metadata.snapshotById))
          .takeWhile(_.isDefined).flatten.toSeq
        rows(Seq("snapshot_id" -> LongType, "timestamp_ms" -> LongType),
          chain.map(s => Array[Any](s.snapshotId, s.timestampMs)))

      case "compute_table_stats" =>
        import graft.core.IcebergTypes.{ListT, MapT, StructT, VariantT}
        val cols = if (input.isNullAt(1))
          t.schema.fields.filterNot(_.fieldType match {
            case _: StructT | _: ListT | _: MapT | VariantT => true
            case _ => false
          }).map(_.name)
          else input.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq
        val t2 = Analyze.computeNdv(SparkSession.active, t, cols)
        val stats = t2.metadata.statistics.last
        rows(Seq("statistics_file" -> StringType, "columns" -> IntegerType),
          Seq(Array[Any](UTF8String.fromString(stats.path), cols.length)))

      case "compute_partition_stats" =>
        val t2 = Analyze.computePartitionStats(SparkSession.active, t)
        rows(Seq("partition_stats_file" -> StringType),
          Seq(Array[Any](UTF8String.fromString(
            t2.metadata.partitionStatistics.last.path))))

      // partition-spec evolution — not expressible in Spark's ALTER TABLE;
      // old files keep reading under their original spec, new writes use
      // the evolved one (the library's multi-spec planning)
      case "add_partition_field" =>
        val (colName, tr) =
          GraftProcedures.parseTransformField(input.getUTF8String(1).toString)
        val t2 = Evolve.updateSpec(t, b => {
          val withExisting = t.spec.fields.foldLeft(b)((bb, pf) =>
            bb.add(t.schema.idToField(pf.sourceId).name, pf.transform, pf.name))
          withExisting.add(colName, tr)
        })
        rows(Seq("spec_id" -> IntegerType, "fields" -> StringType),
          Seq(Array[Any](t2.spec.specId,
            UTF8String.fromString(t2.spec.fields.map(_.name).mkString(", ")))))

      case "drop_partition_field" =>
        val t2 = Evolve.removeSpecFields(t,
          Seq(input.getUTF8String(1).toString))
        rows(Seq("spec_id" -> IntegerType, "fields" -> StringType),
          Seq(Array[Any](t2.spec.specId,
            UTF8String.fromString(t2.spec.fields.map(_.name).mkString(", ")))))

      case "replace_sort_order" =>
        val fields = GraftProcedures.parseSortOrder(t,
          input.getUTF8String(1).toString)
        val t2 = Evolve.replaceSortOrder(t, fields)
        rows(Seq("order_id" -> IntegerType, "fields" -> IntegerType),
          Seq(Array[Any](t2.metadata.defaultSortOrderId, fields.length)))

      // AddFiles import: register in-place parquet (hive dirs ok on
      // identity-partitioned tables) without rewriting — the zero-copy
      // on-ramp for data already in the lake
      case "add_files" =>
        val src = input.getUTF8String(1).toString
        val found = graft.table.Writer.listParquet(src)
        require(found.nonEmpty, s"no parquet files under $src")
        val files =
          if (!input.getBoolean(2)) found
          else {
            val existing = t.newScan.planFiles().map(_.file.path).toSet
            val dups = found.filter(existing)
            require(dups.isEmpty,
              s"${dups.length} file(s) already referenced by the table " +
              s"(first: ${dups.head}); pass check_duplicate_files => false " +
              "to skip this check")
            found
          }
        val t2 = graft.table.Writer.addFiles(SparkSession.active, t, files)
        rows(Seq("added_files_count" -> LongType,
          "current_snapshot_id" -> LongType),
          Seq(Array[Any](files.length.toLong,
            t2.metadata.currentSnapshotId.getOrElse(-1L))))

      case "set_current_snapshot" =>
        require(input.isNullAt(1) != input.isNullAt(2),
          "set_current_snapshot: pass exactly one of snapshot_id, ref")
        val target =
          if (!input.isNullAt(1)) input.getLong(1)
          else {
            val ref = input.getUTF8String(2).toString
            t.metadata.refs.getOrElse(ref, throw new IllegalArgumentException(
              s"$catName: no such ref $ref")).snapshotId
          }
        val prev = t.metadata.currentSnapshotId.getOrElse(-1L)
        val t2 = Evolve.setCurrentSnapshot(t, target)
        rows(Seq("previous_snapshot_id" -> LongType,
          "current_snapshot_id" -> LongType),
          Seq(Array[Any](prev, t2.metadata.currentSnapshotId.getOrElse(-1L))))

      case "remove_unused_specs" =>
        val before = t.metadata.partitionSpecs.map(_.specId)
        val t2 = Evolve.removeUnusedSpecs(t)
        val kept = t2.metadata.partitionSpecs.map(_.specId).toSet
        rows(Seq("removed_spec_ids" -> StringType,
          "kept_specs" -> IntegerType),
          Seq(Array[Any](UTF8String.fromString(
            before.filterNot(kept).mkString(",")), kept.size)))

      case "remove_unused_schemas" =>
        val before = t.metadata.schemas.map(_.schemaId)
        val t2 = Evolve.removeUnusedSchemas(t)
        val kept = t2.metadata.schemas.map(_.schemaId).toSet
        rows(Seq("removed_schema_ids" -> StringType,
          "kept_schemas" -> IntegerType),
          Seq(Array[Any](UTF8String.fromString(
            before.filterNot(kept).mkString(",")), kept.size)))
    }
    Collections.singletonList(out: Scan).iterator()
  }

  private def rows(schema: Seq[(String, DataType)],
      data: Seq[Array[Any]]): GraftResultScan =
    GraftResultScan(
      StructType(schema.map { case (n, dt) => StructField(n, dt) }),
      data.map(a => new GenericInternalRow(a): InternalRow).toArray)
}

object GraftProcedure

/** Driver-local result rows for a procedure call. */
final case class GraftResultScan(schema: StructType,
    resultRows: Array[InternalRow]) extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = resultRows
  override def description(): String = "graft procedure result"
}
