package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table => V2Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.graft.ParquetRowReadBridge
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.Catalogs
import graft.core.{Expr, SchemaBridge, Transforms}
import graft.table.{Table => GraftTable, Writer}

/** DSv2 read over an identity-partitioned Iceberg table that reports
  * `KeyGroupedPartitioning` — the storage-partitioned-join path: two tables
  * partitioned on their join key scan as key-grouped partitions, and Spark
  * plans the join with ZERO shuffle exchanges (each partition pair joins
  * where it sits). At 100 TB this is the difference between a join that
  * moves both tables over the network and one that moves nothing.
  *
  * `spark.read.format("graft-iceberg-spj").option("catalog", uri)
  * .option("table", name)` with session confs
  * `spark.sql.sources.v2.bucketing.enabled=true` (and
  * `...pushPartValues.enabled=true` for sides whose partition-value sets
  * differ). The source is deliberately scoped to the co-located-join fast
  * path; everything it does not handle fails loudly toward the full
  * [[graft.table.SparkRead]] reader:
  *   - identity transforms only (bucket SPJ additionally needs a
  *     FunctionCatalog so Spark can prove both sides hash identically);
  *   - merge-on-read state applies in the reader: DV bitmaps, positional
  *     deletes, and equality-delete key sets filter per-row (deletes only
  *     remove rows, so key-grouped claims hold).
  * Column pruning and filter pushdown are full-fidelity: see
  * [[SpjScanBuilder]].
  *
  * The same table class, loaded through [[GraftSpjCatalog]] (strict=false),
  * is the full SQL DDL/DML surface: general reads over ANY partition spec
  * (the SPJ claim is made only when provable — identity/bucket specs — and
  * otherwise the scan plans per-file partitions under UnknownPartitioning),
  * `INSERT INTO` (append snapshot), `INSERT OVERWRITE` (atomic replace),
  * `DELETE FROM ... WHERE` (copy-on-write via the strict/inclusive
  * classifiers), and time travel (`VERSION AS OF` / `TIMESTAMP AS OF`).
  *
  * Reference basis: scan planning + partition tuples
  * (`table/scanner.go:809-950`); the key-grouped layout is the Spark-native
  * expression of the reference's partition-file grouping.
  */
final class SpjSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-spj"

  private def load(options: util.Map[String, String]): GraftTable = {
    def req(k: String) = Option(options.get(k)).getOrElse(
      throw new IllegalArgumentException(s"graft-iceberg-spj requires option '$k'"))
    Catalogs.load(req("catalog")).loadTable(req("table"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SchemaBridge.toSpark(load(options).schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): V2Table =
    new SpjTable(load(properties), schema, strict = true)
}

/** V2 table over a graft Iceberg table.
  *
  * `strict = true` (the bare `graft-iceberg-spj` format): SPJ fast path
  * only — refuses non-identity transforms loudly (bucket with directions to
  * the function catalog), so a user never silently loses the zero-shuffle
  * plan they asked for.
  *
  * `strict = false` (the [[GraftSpjCatalog]] SQL path): general table —
  * any spec reads (SPJ claimed only when provable), and when `writable`
  * the table accepts `INSERT INTO` / `INSERT OVERWRITE` (V1 write funneled
  * into [[Writer.append]] / [[Writer.overwriteAll]] — fanout, footer stats,
  * commit protocol with retry/rebase all apply) and `DELETE FROM` (CoW
  * [[Writer.deleteWhere]]; metadata-only when the strict evaluator proves
  * whole files match). `snapshotId` pins time-travel reads; time-travel
  * tables refuse writes.
  */
final class SpjTable(table: GraftTable, sparkSchema: StructType,
    allowBucket: Boolean = false, strict: Boolean = true,
    snapshotId: Option[Long] = None, writable: Boolean = false,
    branch: Option[String] = None)
    extends V2Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  /** `_file`: the data file each row came from — queryable directly
    * (`SELECT _file, ...`) and the carrier that engages Spark's projecting
    * write task for row-level operations.
    */
  override def metadataColumns(): Array[MetadataColumn] = {
    val base = Array[MetadataColumn](SpjTable.FileMetaColumn, SpjTable.PosMetaColumn)
    // row lineage exists from format v3; advertising the columns below v3
    // would promise ids the metadata cannot provide
    if (table.metadata.formatVersion >= 3)
      base ++ Array[MetadataColumn](SpjTable.RowIdMetaColumn, SpjTable.LastUpdatedMetaColumn)
    else base
  }

  /** Table properties surface to SQL (`SHOW TBLPROPERTIES`,
    * `SHOW CREATE TABLE`): the graft table's own properties plus the
    * provider and current format version.
    */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    table.metadata.properties.foreach { case (k, v) => m.put(k, v) }
    m.put("provider", "graft-iceberg")
    m.put("format-version", table.metadata.formatVersion.toString)
    m
  }

  private val spec = table.spec
  if (strict) require(spec.fields.nonEmpty,
    s"graft-iceberg-spj: table ${table.name} must be partitioned " +
      "(use graft.table.SparkRead for general reads)")

  /** The SPJ partitioning claim — made only when every partition field is
    * provably Spark-visible: identity always; bucket, time transforms
    * (`years`/`months`/`days`/`hours`) and `truncate` only with the owning
    * FunctionCatalog (Spark must bind both join sides to the same
    * canonical arithmetic) AND a source type the V2 function binds
    * (ns-long time sources and decimal/binary bucket/truncate sources
    * claim nothing — a claim that fails to bind would fail the query, not
    * just lose the optimization).
    */
  private def srcSparkType(name: String): Option[org.apache.spark.sql.types.DataType] =
    sparkSchema.fields.find(_.name == name).map(_.dataType)

  private val claimKeys: Option[Seq[Transform]] = {
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}
    if (spec.fields.isEmpty) None
    else {
      val mapped: Seq[Option[Transform]] = spec.fields.map { pf =>
        val src = table.schema.idToField(pf.sourceId).name
        def dateOrTs = srcSparkType(src).exists {
          case DateType | TimestampType | TimestampNTZType => true; case _ => false
        }
        def tsOnly = srcSparkType(src).exists {
          case TimestampType | TimestampNTZType => true; case _ => false
        }
        def bucketable = srcSparkType(src).exists {
          case IntegerType | LongType | DateType | StringType => true; case _ => false
        }
        def truncable = srcSparkType(src).exists {
          case IntegerType | LongType | StringType => true; case _ => false
        }
        pf.transform match {
          case Transforms.Identity => Some(Expressions.identity(src))
          case Transforms.Bucket(n) if allowBucket && bucketable =>
            Some(Expressions.bucket(n, src))
          case Transforms.Bucket(_) if strict => throw new IllegalArgumentException(
            s"graft-iceberg-spj: bucket SPJ on ${table.name} needs the function " +
              "catalog — register spark.sql.catalog.<name>=graft.sources.GraftSpjCatalog " +
              "and read through spark.table(\"<name>.<table>\")")
          case Transforms.Years if allowBucket && dateOrTs => Some(Expressions.years(src))
          case Transforms.Months if allowBucket && dateOrTs => Some(Expressions.months(src))
          case Transforms.Days if allowBucket && dateOrTs => Some(Expressions.days(src))
          case Transforms.Hours if allowBucket && tsOnly => Some(Expressions.hours(src))
          // width-embedded single-arg form: Spark's KeyGroupedPartitioning
          // rejects any transform expression with a literal child
          // (`KeyGroupedPartitioning.supportsExpressions` demands exactly
          // one REFERENCE child; only bucket's width gets a special slot),
          // so the claim binds `truncate_<W>(col)` from the FunctionCatalog
          case Transforms.Truncate(w) if allowBucket && truncable =>
            Some(Expressions.apply(s"truncate_$w", Expressions.column(src)))
          case other if strict => throw new IllegalArgumentException(
            s"graft-iceberg-spj: table ${table.name} has unsupported partition " +
              s"transform ${other.name}; use graft.table.SparkRead for general reads")
          case _ => None
        }
      }
      if (mapped.forall(_.isDefined)) Some(mapped.map(_.get)) else None
    }
  }

  override def name(): String = s"graft-spj:${table.name}"
  override def schema(): StructType = sparkSchema

  /** Informational spec (DESCRIBE, write distribution hints): the full
    * transform list, including the ones the scan does not claim for SPJ.
    */
  override def partitioning(): Array[Transform] = spec.fields.map { pf =>
    val src = table.schema.idToField(pf.sourceId).name
    pf.transform match {
      case Transforms.Identity => Expressions.identity(src)
      case Transforms.Bucket(n) => Expressions.bucket(n, src)
      case Transforms.Years => Expressions.years(src)
      case Transforms.Months => Expressions.months(src)
      case Transforms.Days => Expressions.days(src)
      case Transforms.Hours => Expressions.hours(src)
      case Transforms.Truncate(w) =>
        Expressions.apply("truncate", Expressions.literal(w), Expressions.column(src))
      case other => Expressions.apply(other.name, Expressions.column(src))
    }
  }.toArray

  override def capabilities(): util.Set[TableCapability] =
    if (writable && snapshotId.isEmpty) {
      val caps = util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
        // BATCH_WRITE satisfies the dynamic-overwrite capability check;
        // append/filtered-overwrite still plan through the V1 funnel
        // because build() returns a V1Write for them
        TableCapability.BATCH_WRITE, TableCapability.OVERWRITE_DYNAMIC,
        TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
      // `write.spark.accept-any-schema=true` (the Iceberg-Spark contract):
      // let analysis admit a frame whose columns don't match the table, so
      // the writer-side mergeSchema option can union-by-name evolve first
      if (table.metadata.properties.get("write.spark.accept-any-schema")
          .contains("true"))
        caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
      caps
    }
    else if (branch.isDefined && writable)
      // branch identifier: reads pin the branch head, INSERT appends to it
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)
    else if (snapshotId.isEmpty)
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpjScanBuilder(table, sparkSchema, claimKeys, snapshotId,
      options.asCaseSensitiveMap().asScala.toMap)

  private def requireWritable(op: String): Unit = {
    if (!writable) throw new UnsupportedOperationException(
      s"${name()}: $op needs the catalog path — register " +
        "spark.sql.catalog.<name>=graft.sources.GraftSpjCatalog and target " +
        "<name>.<table>")
    if (snapshotId.nonEmpty && branch.isEmpty)
      throw new UnsupportedOperationException(
        s"${name()}: cannot $op a time-travel snapshot")
    if (branch.isDefined && op != "write") throw new UnsupportedOperationException(
      s"${name()}: branch identifiers support INSERT INTO only; " +
        "use the library API or main for " + op)
  }

  /** V1 write funnel: Spark resolves/casts the query to the table schema,
    * then hands a DataFrame — append and overwrite-all both go through the
    * full graft write path (AQE-rebalanced fanout, rolling target file
    * size, footer stats, commit retry/rebase), so SQL INSERT produces
    * exactly the files and snapshot the programmatic API does.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireWritable("write")
    new WriteBuilder with SupportsOverwrite
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      private var replaceAll = false
      private var dynamic = false
      private var deleteFirst: Option[Expr] = None

      override def truncate(): WriteBuilder = {
        require(branch.isEmpty, s"${name()}: cannot truncate a branch identifier")
        replaceAll = true; this
      }

      override def overwriteDynamicPartitions(): WriteBuilder = {
        require(branch.isEmpty, s"${name()}: cannot overwrite a branch identifier")
        dynamic = true; this
      }

      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        require(branch.isEmpty, s"${name()}: cannot overwrite a branch identifier")
        val exprs = filters.map(f => SpjScanBuilder.toExpr(f).getOrElse(
          throw new UnsupportedOperationException(
            s"${name()}: cannot overwrite by filter $f")))
        if (exprs.isEmpty || exprs.contains(Expr.AlwaysTrue)) replaceAll = true
        else deleteFirst = Some(exprs.foldLeft(Expr.AlwaysTrue: Expr)(Expr.and))
        this
      }

      override def build(): Write =
        if (dynamic) new Write with GraftPartitionClusteredWrite {
          // no V1 fallback exec exists for dynamic overwrite: rows land
          // through the executor-side DSv2 fanout writers (clustered +
          // sorted by the partition transforms — one open writer per
          // task), one atomic ReplacePartitions-style snapshot at commit
          private val fresh = table.refresh()
          override def clusterTable: GraftTable = fresh
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new GraftDynamicOverwriteBatchWrite(fresh)
        }
        else new V1Write {
        // `df.writeStream.toTable(...)`: epoch-per-snapshot streaming
        // append (Complete mode → truncate → overwrite-per-epoch)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftStreamingWrite(table, replaceAll)
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val spark = data.sparkSession
              // writer-side schema merge (`.option("mergeSchema","true")` /
              // session conf, honored only when the table opted into
              // accept-any-schema): union-by-name evolve FIRST — new
              // columns add as optional, compatible types promote — then
              // the write aligns to the evolved schema. One metadata
              // commit, then the data commit.
              val wantMerge =
                Option(info.options().get("mergeSchema")).exists(_.toBoolean) ||
                Option(info.options().get("merge-schema")).exists(_.toBoolean) ||
                spark.conf.getOption("spark.sql.graft.mergeSchema")
                  .exists(_.toBoolean)
              val fresh0 = table.refresh()
              val fresh =
                if (!wantMerge) fresh0
                else {
                  require(fresh0.metadata.properties
                      .get("write.spark.accept-any-schema").contains("true"),
                    s"${name()}: mergeSchema requires the table property " +
                      "write.spark.accept-any-schema=true")
                  graft.table.Evolve.unionByName(fresh0,
                    SchemaBridge.fromSpark(data.schema))
                }
              // ACCEPT_ANY_SCHEMA makes Spark skip output resolution for
              // EVERY write to this table — a plain SQL `INSERT ... VALUES`
              // arrives with its literal column names (col1, col2, …). A
              // frame with the table's arity and NO name overlap is that
              // positional shape: restore the by-position alignment Spark
              // itself applies absent the capability. Frames sharing any
              // real column name align by name downstream.
              val tcols = fresh.schema.fields.map(_.name)
              val data2 =
                if (data.columns.length == tcols.length &&
                    !data.columns.sameElements(tcols) &&
                    data.columns.intersect(tcols).isEmpty)
                  data.toDF(tcols: _*)
                else data
              // `spark.wap.id` (Iceberg WAP staging): when the table opts
              // in via write.wap.enabled, INSERT INTO commits a STAGED
              // snapshot — recorded in metadata, tagged wap.id, no ref
              // moved — published later by CALL publish_changes /
              // cherrypick_snapshot. Append-only: cherry-pick can replay
              // only appends, so staging an overwrite refuses loudly.
              val wapId = spark.conf.getOption("spark.wap.id")
                .filter(_.nonEmpty).filter(_ => fresh.metadata.properties
                  .get("write.wap.enabled").contains("true"))
              require(wapId.isEmpty || branch.isEmpty,
                s"${name()}: spark.wap.id and a branch target cannot combine")
              require(wapId.isEmpty ||
                  (!replaceAll && deleteFirst.isEmpty && !dynamic),
                s"${name()}: spark.wap.id stages INSERT INTO only " +
                  "(overwrites cannot be cherry-picked)")
              if (dynamic) { Writer.overwriteDynamic(spark, fresh, data2); () }
              else if (replaceAll) { Writer.overwriteAll(spark, fresh, data2); () }
              else deleteFirst match {
                case Some(del) =>
                  // filtered overwrite (INSERT OVERWRITE ... PARTITION):
                  // ONE atomic conflict-validated snapshot — readers never
                  // see the deleted-but-not-replaced intermediate
                  Writer.overwriteWhere(spark, fresh, data2, del); ()
                case None => wapId match {
                  case Some(id) =>
                    Writer.append(spark, fresh, data2,
                      extraSummary = Map("wap.id" -> id), stageOnly = true); ()
                  case None =>
                    Writer.append(spark, fresh, data2, toBranch = branch); ()
                }
              }
            }
          }
      }
    }
  }

  /** SQL `DELETE FROM ... WHERE`: the answer decides whether Spark runs
    * the filter-based [[deleteWhere]] or builds a row-level plan.
    *
    * - `write.delete.mode = merge-on-read`: accept ONLY strict-evaluator-
    *   proven full-file matches (the metadata-only contract of Iceberg's
    *   SparkTable.canDeleteWhere) — a partially-matching file must fall to
    *   the DELTA plan so the delete is a DV / pos-delete write, never a
    *   file rewrite. The previous translatability-only answer silently ran
    *   every simple-predicate DELETE through CoW — a one-row delete rewrote
    *   a whole data file and destroyed every survivor's v3 `_row_id`
    *   (caught by RowLineageRewriteSpec's pruned-row-group pin).
    * - copy-on-write (the default): accept any translatable predicate —
    *   [[graft.table.Writer.deleteWhere]] IS the complete CoW delete
    *   (full-match files drop metadata-only, partial files rewrite without
    *   the matching rows AND with `_row_id` carried through as explicit
    *   columns), so the group-based rewrite plan would only add runtime
    *   `_file` filtering for work the metadata classification already did.
    */
  // the handle canDeleteWhere classified against, reused by deleteWhere so
  // classification and execution see ONE snapshot (the commit's own
  // retry/rebase absorbs any staleness between analysis and execution)
  @volatile private var deleteClassified: GraftTable = _

  override def canDeleteWhere(filters: Array[Filter]): Boolean = {
    if (!writable || snapshotId.nonEmpty) return false
    val exprs = filters.map(SpjScanBuilder.toExpr)
    if (exprs.exists(_.isEmpty)) return false
    // a capability check must DECLINE, not crash: refresh can refuse a
    // cross-incarnation pointer (drop+recreate uuid guard) — answer false
    // and let the row-level plan's own refresh surface the real error with
    // execution context
    val t = try table.refresh() catch { case _: IllegalStateException => return false }
    deleteClassified = t
    if (t.metadata.properties.get("write.delete.mode").contains("merge-on-read")) {
      val expr = exprs.flatten.foldLeft(Expr.AlwaysTrue: Expr)(Expr.and)
      val strict = Expr.rewriteNot(expr)
      t.newScan.withFilter(expr).planFiles()
        .forall(task => graft.core.Evaluators.fileMustMatch(t.schema, strict, task.file))
    } else true
  }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    requireWritable("delete from")
    val expr = filters.flatMap(SpjScanBuilder.toExpr)
      .foldLeft(Expr.AlwaysTrue: Expr)(Expr.and)
    val t = { val c = deleteClassified; deleteClassified = null
      if (c != null) c else table.refresh() }
    Writer.deleteWhere(SparkSession.active, t, expr)
    ()
  }

  /** SQL UPDATE / MERGE INTO / rewrite-path DELETE. Mode per command from
    * table properties (`write.{delete,update,merge}.mode`, Iceberg
    * convention): `copy-on-write` (default) rewrites affected files via
    * [[GraftRowLevelOperation]]; `merge-on-read` writes deletion vectors +
    * insert files via [[GraftDeltaOperation]] — sparse DML on huge tables
    * without rewriting anything.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    requireWritable(info.command.toString.toLowerCase)
    new RowLevelOperationBuilder {
      override def build() = {
        val fresh = table.refresh()
        val modeKey = info.command match {
          case org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE =>
            "write.delete.mode"
          case org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE =>
            "write.update.mode"
          case _ => "write.merge.mode"
        }
        fresh.metadata.properties.getOrElse(modeKey, "copy-on-write") match {
          case "merge-on-read" => new GraftDeltaOperation(fresh, info.command)
          case _ => new GraftRowLevelOperation(fresh, info.command)
        }
      }
    }
  }
}

object SpjTable {
  val FileColumnName = "_file"
  val PosColumnName = "_pos"
  val RowIdColumnName: String = SchemaBridge.RowIdCol
  val LastUpdatedColumnName: String = SchemaBridge.LastUpdatedSeqCol

  object FileMetaColumn extends MetadataColumn {
    override def name(): String = FileColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType
    override def isNullable: Boolean = false
    override def comment(): String = "data file path of the row"
  }

  object PosMetaColumn extends MetadataColumn {
    override def name(): String = PosColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment(): String = "row position within the data file"
  }

  /** v3 row lineage on the SQL surface: `SELECT _row_id, ... FROM t`.
    * Explicit file columns win; otherwise synthesized first_row_id +
    * position executor-side. Nullable: pre-upgrade files have no block.
    */
  object RowIdMetaColumn extends MetadataColumn {
    override def name(): String = RowIdColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = true
    override def comment(): String = "v3 row lineage: stable row id"
    /** v3 contract for row-level plans: an UPDATE keeps the row's identity
      * (preserve on update — group path; preserve on REINSERT — the delta
      * path splits an update into delete + reinsert, and the reinserted
      * row is the SAME row). A MERGE-inserted row is a NEW row: inserts
      * carry no source metadata, so it takes a fresh id from the written
      * file's lineage block at read regardless of these flags.
      */
    override def metadataInJSON(): String =
      """{"__preserve_on_update": true, "__preserve_on_delete": true, "__preserve_on_reinsert": true}"""
  }

  object LastUpdatedMetaColumn extends MetadataColumn {
    override def name(): String = LastUpdatedColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = true
    override def comment(): String =
      "v3 row lineage: sequence number of the committing snapshot that last updated the row"
    /** NOT preserved on update: a group-based UPDATE/MERGE nulls the
      * value for updated rows, and the null synthesizes at read as the
      * rewritten file's data sequence — i.e. the committing snapshot's
      * sequence, exactly the v3 re-stamp contract. Carried-over rows keep
      * their explicit original.
      */
    override def metadataInJSON(): String =
      """{"__preserve_on_update": false}"""
  }

  /** Requested-schema split: data columns in table order + which metadata
    * columns ride along. The scan's output layout is canonical regardless
    * of request order: data columns, then `_file`, `_pos`, `_row_id`,
    * `_last_updated_sequence_number` — `readSchema()` declares the same
    * layout, so Spark's by-name projection realigns whatever order the
    * plan asked in.
    */
  final case class RequestedMeta(data: StructType, withFile: Boolean,
      withPos: Boolean, withRowId: Boolean, withLastUpd: Boolean) {
    def anyMeta: Boolean = withFile || withPos || withRowId || withLastUpd
    def lineage: Boolean = withRowId || withLastUpd
  }

  def splitRequested(fullSchema: StructType,
      requested: StructType): RequestedMeta = {
    val names = requested.fieldNames.toSet
    val withFile = names(FileColumnName)
    val withPos = names(PosColumnName)
    val withRowId = names(RowIdColumnName)
    val withLastUpd = names(LastUpdatedColumnName)
    val kept = StructType(fullSchema.fields.filter(f => names(f.name)))
    val data = if (kept.isEmpty && !withFile && !withPos && !withRowId && !withLastUpd)
      StructType(fullSchema.fields.take(1)) else kept
    RequestedMeta(data, withFile, withPos, withRowId, withLastUpd)
  }
}

/** Column pruning + filter pushdown for the SPJ scan: required columns
  * reach the parquet reader's requested schema (a 2-column projection
  * reads 2 columns), and pushed filters prune at THREE levels — Iceberg
  * file metrics (via the [[graft.core.Expr]] translation, whole files
  * skipped at plan time), parquet row groups (the `sources.Filter`s ride
  * into the reader), and rows. Every filter is also kept by Spark
  * (returned from `pushFilters`), so an untranslatable residual can never
  * change results.
  */
final class SpjScanBuilder(table: GraftTable, fullSchema: StructType,
    claimKeys: Option[Seq[Transform]], snapshotId: Option[Long],
    options: Map[String, String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var withFile: Boolean = false
  private var withPos: Boolean = false
  private var withRowId: Boolean = false
  private var withLastUpd: Boolean = false
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var aggResult: Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = None

  /** LIMIT n truncates the planned FILE list once manifest row counts
    * cover n — `SELECT * FROM t LIMIT 10` reads one file, not the table.
    * Partial push: Spark keeps its own limit above the scan, so the file
    * set only needs to GUARANTEE ≥ n live rows — which manifest counts do
    * only on filter-free, delete-free scans; [[SpjScan]] checks both and
    * skips truncation otherwise.
    */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  private def baseScan = {
    val s = table.newScan
    snapshotId.map(s.useSnapshot).getOrElse(s)
  }

  // COUNT/MIN/MAX from manifest stats — zero data bytes read; only when no
  // filters are in play (ours are all residual, which a one-row complete
  // result cannot satisfy) and every term is provably exact
  private def probeAgg(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (aggResult.isEmpty && pushed.isEmpty)
      aggResult = SpjAggPushdown.tryPush(table, baseScan.planFiles(), agg)
    aggResult.isDefined
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    probeAgg(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    probeAgg(agg)

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve table column order; an empty projection (COUNT(*)) keeps one
    // narrow column so the reader has a concrete schema to materialize
    val req = SpjTable.splitRequested(fullSchema, requiredSchema)
    required = req.data
    withFile = req.withFile
    withPos = req.withPos
    withRowId = req.withRowId
    withLastUpd = req.withLastUpd
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: Spark re-evaluates everything above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Σ distinct eq-delete file bytes above which the scan abandons
    * executor-side key sets for the distributed anti-join pipeline (see
    * [[SpjAntiJoinScan]]). Key sets are O(delete bytes) of EXECUTOR MEMORY
    * per file — fine for the bounded CDC-upsert pattern, an OOM for an
    * uncompacted backlog. Option `eq-delete-fallback-bytes` or session conf
    * `spark.graft.eqDeleteFallbackBytes`; default 64 MB.
    */
  private def eqFallbackBytes: Long =
    options.get("eq-delete-fallback-bytes").map(_.toLong).getOrElse(
      SparkSession.active.conf.getOption("spark.graft.eqDeleteFallbackBytes")
        .map(_.toLong).getOrElse(64L * 1024 * 1024))

  override def build(): Scan = aggResult match {
    case Some((aggSchema, row)) => new SpjAggScan(aggSchema, row)
    case None =>
      val fileExpr = pushed.flatMap(SpjScanBuilder.toExpr)
        .foldLeft(graft.core.Expr.AlwaysTrue: graft.core.Expr)(graft.core.Expr.and)
      // plan HERE (once — SpjScan reuses the result) so the eq-delete
      // backlog for this exact scan is measurable before choosing readers
      val planned = baseScan.withFilter(fileExpr).planFiles()
      val eqBytes = planned.flatMap(_.eqDeletes.map(_._1))
        .distinctBy(_.path).map(_.fileSize).sum
      // imported (addFiles/snapshot) tables carry a name mapping: their
      // files may lack field IDs, carry pre-rename column names, or omit
      // hive-partition columns entirely — resolutions the stock
      // name-based parquet reader can't do. Route those reads through the
      // SparkRead pipeline (field-ID/name-mapping rebind + identity
      // partition fill), same V1 escape hatch as the eq-delete fallback.
      val needsNameResolution = table.metadata.properties
        .contains(graft.format.NameMapping.PropertyKey)
      val anyMeta = withFile || withPos || withRowId || withLastUpd
      val metaReq = SpjTable.RequestedMeta(required, withFile, withPos,
        withRowId, withLastUpd)
      if (needsNameResolution) {
        // imported files may carry pre-rename names the stock DSv2 reader
        // silently null-fills — metadata-column requests ride the SAME V1
        // name-mapping route (it computes file/pos/lineage natively)
        // instead of mis-reading through SpjScan
        SpjRouting.record(table.name, "name-mapping", eqBytes)
        emitRouteReport("name-mapping", eqBytes)
        new SpjAntiJoinScan(table, snapshotId, planned, required, options, metaReq)
      } else if (eqBytes > eqFallbackBytes && !anyMeta) {
        // executor key sets would hold eqBytes of decoded keys in memory;
        // route this scan through the SparkRead anti-join pipeline instead
        // (unbounded backlog = shuffle-join territory, not hash-set
        // territory). Row-level operations request `_file`/`_pos` and keep
        // the key-set route: their group-filtered scans are file-scoped.
        SpjRouting.record(table.name, "anti-join", eqBytes)
        emitRouteReport("anti-join", eqBytes)
        new SpjAntiJoinScan(table, snapshotId, planned, required, options)
      } else {
        if (planned.exists(_.eqDeletes.nonEmpty)) {
          SpjRouting.record(table.name, "keyset", eqBytes)
          emitRouteReport("keyset", eqBytes)
        }
        new SpjScan(table, required, claimKeys, snapshotId, options,
          fileExpr, pushed.toSeq, withFile = withFile, withPos = withPos,
          withRowId = withRowId, withLastUpd = withLastUpd,
          pushedLimit = if (pushed.isEmpty) limit else None,
          prePlanned = Some(planned))
      }
  }

  /** Supplementary ScanReport naming the equality-delete application route
    * and the measured backlog vs the routing threshold, so a 100 TB
    * operator watching the i40 metrics wire can see cliff proximity (an
    * upcoming route flip = time to run rewrite_position_delete_files /
    * compaction) without reading query plans.
    */
  private def emitRouteReport(route: String, eqBytes: Long): Unit = {
    try {
      val rep = table.reporter
      if (rep eq graft.metrics.NopReporter) return
      val snap = snapshotId.flatMap(table.metadata.snapshotById)
        .orElse(table.metadata.currentSnapshot)
      graft.metrics.Reporter.safe(rep, graft.metrics.ScanReport(
        tableName = table.name,
        snapshotId = snap.map(_.snapshotId).getOrElse(-1L),
        schemaId = table.metadata.currentSchemaId,
        projectedFieldIds = Nil,
        projectedFieldNames = Nil,
        filterJson = "",
        metrics = graft.metrics.ScanMetricsResult(),
        metadata = Map(
          "eq-delete-route" -> route,
          "eq-delete-bytes" -> eqBytes.toString,
          "eq-delete-fallback-bytes" -> eqFallbackBytes.toString)))
    } catch { case _: Exception => () } // diagnostics never fail the scan
  }
}

/** Records, per graft table name, which equality-delete application route
  * the most recently built scan chose: `"keyset"` (executor-cached key
  * sets, the bounded-backlog fast path) or `"anti-join"` (the
  * [[SpjAntiJoinScan]] fallback for oversized backlogs). Driver-side
  * diagnostic — gates assert the routing decision through it.
  */
object SpjRouting {
  private val routes =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  def record(table: String, route: String, eqBytes: Long = -1L): Unit = {
    routes.put(table, (route, eqBytes)); ()
  }
  def lastRoute(table: String): Option[String] =
    Option(routes.get(table)).map(_._1)
  def lastEqBytes(table: String): Option[Long] =
    Option(routes.get(table)).map(_._2).filter(_ >= 0)
}

/** The oversized-equality-delete-backlog read: a V1 scan whose relation
  * executes [[graft.table.SparkRead.readTasks]] — data files anti-joined
  * against the delete files as a DISTRIBUTED join (null-safe on the
  * equality ids, sequence-scoped by the planner), with parquet
  * pos-deletes and DV bitmaps applied in the same pipeline. No executor
  * ever materializes a delete key set: AQE picks the join strategy from
  * the delete side's actual size, so a 10 GB CDC backlog reads with
  * shuffle-join memory behavior instead of an executor OOM. This beats
  * the reference's own documented weakness (its eq-delete reader is
  * in-memory: `table/equality_delete_reader.go:43-52`).
  *
  * Chosen at plan time by [[SpjScanBuilder.build]] when Σ eq-delete bytes
  * exceeds the fallback threshold; the file set was already pruned by the
  * pushed filters, and Spark re-applies every filter above the scan (all
  * pushdown is residual), so routing can never change results — only the
  * execution strategy. Trade-offs vs the key-set route: no SPJ claim, no
  * runtime file pruning, no parquet row-group pushdown — all dominated by
  * not OOMing.
  */
final class SpjAntiJoinScan(table: GraftTable, snapshotId: Option[Long],
    tasks: Seq[graft.table.FileScanTask], dataSchema: StructType,
    options: Map[String, String],
    meta: SpjTable.RequestedMeta = SpjTable.RequestedMeta(
      new StructType(), false, false, false, false))
    extends org.apache.spark.sql.connector.read.V1Scan {

  override def readSchema(): StructType = {
    var fields = dataSchema.fields
    if (meta.withFile) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.FileColumnName,
        org.apache.spark.sql.types.StringType, nullable = false)
    if (meta.withPos) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.PosColumnName,
        org.apache.spark.sql.types.LongType, nullable = false)
    if (meta.withRowId) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.RowIdColumnName,
        org.apache.spark.sql.types.LongType, nullable = true)
    if (meta.withLastUpd) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.LastUpdatedColumnName,
        org.apache.spark.sql.types.LongType, nullable = true)
    StructType(fields)
  }

  override def description(): String =
    s"GraftEqDeleteAntiJoin(${table.name}, files=${tasks.length})"

  /** Streaming reads keep working on backlogged tables: micro-batches plan
    * per offset range through the same stream source as [[SpjScan]].
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SpjMicroBatchStream(table, dataSchema, options)

  override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
      with org.apache.spark.sql.sources.TableScan](
      context: org.apache.spark.sql.SQLContext): T = {
    val tbl = table
    val snapId = snapshotId
    val planned = tasks
    val outSchema = readSchema()
    val m = meta
    new org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan {
      override def sqlContext: org.apache.spark.sql.SQLContext = context
      override def schema: StructType = outSchema
      override def toString: String = "GraftEqDeleteAntiJoin"
      override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
        val spark = context.sparkSession
        val tm = tbl.metadata
        // time travel pins the snapshot's schema; current reads use the
        // current schema (mirrors SparkRead.read's resolution)
        val schemaId =
          if (snapId.isDefined)
            snapId.map(id => tbl.newScan.useSnapshot(id)).get
              .snapshot.flatMap(_.schemaId).getOrElse(tm.currentSchemaId)
          else tm.currentSchemaId
        val gSchema = tm.schemaById(schemaId).getOrElse(tm.schema)
        val df = graft.table.SparkRead.readTasks(spark, planned, gSchema,
          tbl.nameMapping, rowLineage = m.lineage, specById = tm.specById,
          ioOptions = tbl.refreshIoCredentials(),
          keepFilePos = m.withFile || m.withPos)
        // canonical output order: data cols, then the requested metadata
        // columns (the V1 pipeline computes __file/__pos internally and
        // _row_id/_last_updated under their public names)
        val cols = outSchema.fieldNames.map {
          case SpjTable.FileColumnName => df.col("__file").as(SpjTable.FileColumnName)
          case SpjTable.PosColumnName => df.col("__pos").as(SpjTable.PosColumnName)
          case n => df.col(s"`$n`")
        }
        df.select(cols.toSeq: _*).rdd
      }
    }.asInstanceOf[T]
  }
}

object SpjScanBuilder {
  import graft.core.Expr

  /** Spark source filter → Iceberg expression for file-level pruning.
    * Conservative: unsupported shapes translate to None (no pruning, still
    * row-filtered above the scan).
    */
  // only literal types the metrics evaluators compare natively; anything
  // exotic (Decimal, Timestamp object forms) skips file pruning rather than
  // risking a wrong comparison
  private def lit(v: Any): Boolean = v match {
    case _: Int | _: Long | _: String | _: Boolean | _: Double | _: Float => true
    case _ => false
  }

  def toExpr(f: Filter): Option[Expr] = f match {
    case org.apache.spark.sql.sources.AlwaysTrue() => Some(Expr.AlwaysTrue)
    case org.apache.spark.sql.sources.AlwaysFalse() => Some(Expr.AlwaysFalse)
    case org.apache.spark.sql.sources.EqualTo(a, v) if lit(v) => Some(Expr.eq(a, v))
    // null-safe equality: Spark emits <=> for static partition values
    // (INSERT OVERWRITE ... PARTITION (p = v)); against a non-null literal
    // it filters identically to eq (null rows match neither)
    case org.apache.spark.sql.sources.EqualNullSafe(a, null) => Some(Expr.isNull(a))
    case org.apache.spark.sql.sources.EqualNullSafe(a, v) if lit(v) => Some(Expr.eq(a, v))
    case org.apache.spark.sql.sources.GreaterThan(a, v) if lit(v) => Some(Expr.gt(a, v))
    case org.apache.spark.sql.sources.GreaterThanOrEqual(a, v) if lit(v) => Some(Expr.gtEq(a, v))
    case org.apache.spark.sql.sources.LessThan(a, v) if lit(v) => Some(Expr.lt(a, v))
    case org.apache.spark.sql.sources.LessThanOrEqual(a, v) if lit(v) => Some(Expr.ltEq(a, v))
    case org.apache.spark.sql.sources.IsNull(a) => Some(Expr.isNull(a))
    case org.apache.spark.sql.sources.IsNotNull(a) => Some(Expr.notNull(a))
    case org.apache.spark.sql.sources.In(a, vs) if vs.forall(lit) => Some(Expr.in(a, vs.toSeq))
    case org.apache.spark.sql.sources.StringStartsWith(a, v) => Some(Expr.startsWith(a, v))
    case org.apache.spark.sql.sources.And(l, r) =>
      for (le <- toExpr(l); re <- toExpr(r)) yield Expr.and(le, re)
    case org.apache.spark.sql.sources.Or(l, r) =>
      for (le <- toExpr(l); re <- toExpr(r)) yield Expr.or(le, re)
    case org.apache.spark.sql.sources.Not(c) => toExpr(c).map(Expr.not)
    case _ => None
  }
}

final class SpjScan(table: GraftTable, sparkSchema: StructType,
    claimKeys: Option[Seq[Transform]], snapshotId: Option[Long],
    options: Map[String, String],
    fileFilter: graft.core.Expr = graft.core.Expr.AlwaysTrue,
    rowGroupFilters: Seq[Filter] = Nil,
    withFile: Boolean = false,
    withPos: Boolean = false,
    withRowId: Boolean = false,
    withLastUpd: Boolean = false,
    pushedLimit: Option[Int] = None,
    prePlanned: Option[Seq[graft.table.FileScanTask]] = None)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** Manifest-derived scan statistics (post static-pushdown file set) —
    * without these a DSv2 scan defaults to "unknown = huge" and Spark
    * never auto-broadcasts a small catalog table; with them a pruned dim
    * scan broadcasts and the fact side gets runtime filtering too.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    grouped // ensure planned (fills the row/byte totals below)
    val (bytes, rows) = plannedTotals
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }
  @volatile private var plannedTotals: (Long, Long) = (0L, 0L)

  // Runtime (dynamic-partition-pruning) filters: Spark derives them from
  // the other side of a join at execution time — a dim-side filter prunes
  // fact FILES before any fact IO, the flagship 100 TB join shape. The
  // filter lands in the same file-level expression pipeline as static
  // pushdown (inclusive projection into partition space + file metrics),
  // so EVERY spec transform prunes, not just identity. Pruning-only:
  // Spark re-applies the join itself, so a too-wide file never yields
  // wrong rows.
  @volatile private var runtimeFilter: graft.core.Expr = graft.core.Expr.AlwaysTrue
  @volatile private var plannedCache: Array[SpjInputPartition] = _

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    // only partition source columns the scan actually OUTPUTS — Spark
    // resolves these against the scan's schema and fails hard on a
    // reference a pruned projection dropped
    val present = sparkSchema.fieldNames.toSet
    table.spec.fields.map(pf => table.schema.idToField(pf.sourceId).name)
      .distinct.filter(present).map(Expressions.column).toArray
  }

  override def filter(filters: Array[Filter]): Unit = {
    val exprs = filters.flatMap(SpjScanBuilder.toExpr)
    if (exprs.nonEmpty) {
      runtimeFilter = exprs.foldLeft(runtimeFilter)(graft.core.Expr.and)
      plannedCache = null // re-plan with the tightened filter
    }
  }

  /** The claim actually reported to Spark, sound under PARTITION-SPEC
    * EVOLUTION: `claimKeys` is derived from the CURRENT default spec, but a
    * table's live files may have been written under older specs whose
    * partition tuples carry different transforms (or a different arity) —
    * grouping those raw tuples under the default-spec claim either crashes
    * (arity mismatch) or silently co-groups values with DIFFERENT
    * semantics (bucket2(k) beside bucket4(k)), and a zero-exchange join
    * then drops matches. Mirrors iceberg-java's
    * `SparkPartitioningAwareScan.groupingKeyType()`: the claim is narrowed
    * to the default-spec fields present with an IDENTICAL (sourceId,
    * transform) in EVERY spec contributing planned files; tasks group by
    * that common key, projected per-spec from each file's own tuple
    * positions. Single-spec tables keep the full claim; a bucket-width
    * change or unpartitioned history empties the intersection and the scan
    * degrades to one-partition-per-file under `UnknownPartitioning` —
    * Spark shuffles, answers stay right. Decided ONCE from the static
    * (pre-runtime-filter) file set so the reported partitioning never
    * changes mid-execution; runtime filters only prune that set, so a
    * static single-spec decision holds for every re-plan.
    */
  private lazy val effectiveClaim: Option[(Seq[Transform], Map[Int, Array[Int]])] =
    claimKeys.flatMap { keys =>
      val staticTasks = prePlanned.getOrElse {
        val base = snapshotId.map(table.newScan.useSnapshot).getOrElse(table.newScan)
        base.withFilter(fileFilter).planFiles()
      }
      val defSpec = table.spec
      val specIds = staticTasks.map(_.specId).distinct
      if (specIds.isEmpty || specIds == Seq(defSpec.specId))
        Some((keys, Map(defSpec.specId -> defSpec.fields.indices.toArray)))
      else {
        val specs = specIds.map { id =>
          id -> table.metadata.specById(id).getOrElse(graft.format.PartitionSpec.Unpartitioned)
        }
        // claimKeys(i) is positional with defSpec.fields(i) (the claim is
        // all-or-none over the default spec's fields)
        val keptIdx = defSpec.fields.indices.filter { i =>
          val f = defSpec.fields(i)
          specs.forall { case (_, sp) =>
            sp.fields.exists(g => g.sourceId == f.sourceId && g.transform == f.transform)
          }
        }
        if (keptIdx.isEmpty) None
        else {
          val kept = keptIdx.map(defSpec.fields)
          val proj = specs.map { case (id, sp) =>
            id -> kept.map(f => sp.fields.indexWhere(
              g => g.sourceId == f.sourceId && g.transform == f.transform)).toArray
          }.toMap
          Some((keptIdx.map(keys), proj))
        }
      }
    }

  /** Project a task's raw partition tuple onto the claimed common key.
    * A spec id outside the static plan would mean the claim was decided on
    * a different file population than is being read — fail loudly rather
    * than group unsoundly.
    */
  private def claimKey(proj: Map[Int, Array[Int]],
      t: graft.table.FileScanTask): Seq[Any] = {
    val idx = proj.getOrElse(t.specId, throw new IllegalStateException(
      s"graft-iceberg-spj: task under spec ${t.specId} appeared after the " +
        s"partitioning claim was fixed over specs ${proj.keys.toSeq.sorted.mkString(",")}"))
    idx.toSeq.map(t.file.partition(_))
  }

  override def readSchema(): StructType = {
    var fields = sparkSchema.fields
    if (withFile) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.FileColumnName,
        org.apache.spark.sql.types.StringType, nullable = false)
    if (withPos) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.PosColumnName,
        org.apache.spark.sql.types.LongType, nullable = false)
    if (withRowId) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.RowIdColumnName,
        org.apache.spark.sql.types.LongType, nullable = true)
    if (withLastUpd) fields = fields :+
      org.apache.spark.sql.types.StructField(SpjTable.LastUpdatedColumnName,
        org.apache.spark.sql.types.LongType, nullable = true)
    StructType(fields)
  }
  override def toBatch: Batch = this

  /** `spark.readStream.table(...)`: snapshot-log micro-batches. Pruned
    * columns carry through (`sparkSchema` is already the pruned read
    * schema); pushed file filters don't — appended files are planned from
    * manifests per offset range, row filters re-apply in Spark's plan.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SpjMicroBatchStream(table, sparkSchema, options)

  /** Data files in the current plan — diagnostic: after a runtime filter
    * fires this reflects the PRUNED set (Spark keeps the key-grouped
    * partition COUNT by leaving pruned groups empty, so RDD partition
    * counts can't show the pruning; file counts do).
    */
  def plannedFileCount: Int = {
    val c = plannedCache
    if (c == null) 0 else c.map(_.files.length).sum
  }

  // planned once per filter state: partitioning metadata and input
  // partitions must agree (a runtime filter invalidates the cache and
  // re-plans). MoR deletes (DVs, positional, equality) apply per-row
  // inside each partition — grouping by key is preserved, deletes only
  // remove rows.
  private def grouped: Array[SpjInputPartition] = {
    val cached = plannedCache
    if (cached != null) return cached
    val computed = planPartitions()
    plannedCache = computed
    computed
  }

  private def planPartitions(): Array[SpjInputPartition] = {
    // the builder already planned this exact (static-filter) file set when
    // it sized the eq-delete backlog — reuse it; a runtime filter tightens
    // the plan and forces a fresh pass
    val allTasks = prePlanned match {
      case Some(ts) if runtimeFilter == graft.core.Expr.AlwaysTrue => ts
      case _ =>
        val base = snapshotId.map(table.newScan.useSnapshot).getOrElse(table.newScan)
        base.withFilter(graft.core.Expr.and(fileFilter, runtimeFilter)).planFiles()
    }
    // pushed LIMIT: keep files only until manifest row counts cover it —
    // safe only when nothing above the scan drops rows (no filters of any
    // kind, no MoR deletes on the kept prefix)
    val tasks = pushedLimit match {
      case Some(n) if fileFilter == graft.core.Expr.AlwaysTrue &&
          runtimeFilter == graft.core.Expr.AlwaysTrue &&
          rowGroupFilters.isEmpty &&
          allTasks.forall(t => t.posDeletes.isEmpty && t.eqDeletes.isEmpty) =>
        var covered = 0L
        allTasks.takeWhile { t =>
          val need = covered < n
          covered += t.file.recordCount
          need
        }
      case _ => allTasks
    }
    plannedTotals = (tasks.map(_.file.fileSize).sum,
      tasks.map(_.file.recordCount).sum)
    effectiveClaim match {
      case Some((_, proj)) =>
        tasks.groupBy(claimKey(proj, _)).toSeq
          .map { case (partValues, ts) =>
            SpjInputPartition(partValues.map(SpjScan.toCatalyst).toArray,
              ts.map(t => SpjFileInfo.from(t, "graft-iceberg-spj")).toArray)
          }
          .sortBy(_.key.toSeq.map(String.valueOf).mkString(" "))
          .toArray
      case None =>
        // no partitioning claim to honor → one input partition per FILE
        // for maximal parallelism (files are rolling-writer target-sized)
        tasks.map(t => SpjInputPartition(Array.empty,
          Array(SpjFileInfo.from(t, "graft-iceberg-spj")))).toArray
    }
  }

  override def outputPartitioning(): Partitioning = effectiveClaim match {
    case Some((keys, _)) => new KeyGroupedPartitioning(
      keys.map(t => t: org.apache.spark.sql.connector.expressions.Expression).toArray,
      grouped.length)
    case None => new UnknownPartitioning(grouped.length)
  }

  override def planInputPartitions(): Array[InputPartition] =
    grouped.map(identity[InputPartition])

  override def createReaderFactory(): PartitionReaderFactory =
    SpjScan.readerFactory(table, grouped, sparkSchema, options,
      rowGroupFilters, withFile, withPos, withRowId, withLastUpd)
}

object SpjScan {

  /** Build the executor reader closures a partition set needs: the plain
    * data reader always; delete-application machinery (position-carrying
    * data reader over a schema widened with any equality-key columns,
    * pos-delete and eq-delete file readers) only when some file actually
    * carries deletes — zero overhead on clean tables.
    */
  def readerFactory(table: GraftTable, parts: Array[SpjInputPartition],
      dataSchema: StructType, options: Map[String, String],
      rowGroupFilters: Seq[Filter], withFile: Boolean,
      withPos: Boolean = false, withRowId: Boolean = false,
      withLastUpd: Boolean = false): SpjReaderFactory = {
    val spark = SparkSession.active
    val needLineage = withRowId || withLastUpd
    val anyDeletes = parts.exists(_.files.exists(_.deletes.nonEmpty))
    val anyPosFiles = parts.exists(_.files.exists(
      _.deletes.exists(_.posFiles.nonEmpty)))
    val eqIdSets: Seq[Seq[Int]] = parts.flatMap(_.files)
      .flatMap(_.deletes.toSeq.flatMap(_.eqFiles.map(_._3))).distinct.toSeq
    val reader = ParquetRowReadBridge.rowReader(
      spark, dataSchema, options, rowGroupFilters)
    if (!anyDeletes && !withPos && !needLineage)
      return new SpjReaderFactory(reader, withFile)

    // equality-key columns the pruned projection may lack: widen the
    // delete-path read schema (appended AFTER the data columns, so the
    // strip projection is a prefix take)
    val eqFieldsById: Map[Int, org.apache.spark.sql.types.StructField] =
      eqIdSets.flatten.distinct.map { id =>
        id -> SchemaBridge.toSparkField(table.schema.idToField(id))
      }.toMap
    val present = dataSchema.fieldNames.toSet
    val widenedEq = StructType(dataSchema.fields ++
      eqFieldsById.values.filterNot(f => present(f.name)).toSeq.sortBy(_.name))
    // explicit lineage columns (lineage-preserving rewrites materialized
    // them): appended LAST so eq-extract indexes stay valid. Requested by
    // NAME, no field ids — files without the column null-fill, and the
    // per-row fallback synthesizes first_row_id + position
    val widened =
      if (!needLineage) widenedEq
      else StructType(widenedEq.fields ++ Seq(
        org.apache.spark.sql.types.StructField(SpjTable.RowIdColumnName,
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField(SpjTable.LastUpdatedColumnName,
          org.apache.spark.sql.types.LongType, nullable = true)))

    // row-group pruning composes with delete filtering: skipped row groups
    // don't shift positions (the row-index generator honors row-group
    // offsets), so surviving rows keep the absolute positions the delete
    // sets refer to
    val dataPos = ParquetRowReadBridge.rowReaderWithPos(
      spark, widened, options, rowGroupFilters)
    val delSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val del =
      if (anyPosFiles) Some(ParquetRowReadBridge.rowReader(
        spark, delSchema, options, Nil))
      else None
    // per distinct equality-id set: a reader over the key columns (in id
    // order) and the matching (index, type) extractors into the widened
    // data row
    val eqReaders: Map[Seq[Int], (String, Long) => Iterator[InternalRow]] =
      eqIdSets.map { ids =>
        // read delete files by NAME: they may lack parquet field ids, and
        // an id-carrying read schema makes the reader reject such files
        val fields = ids.map(eqFieldsById).map(f =>
          org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable))
        ids -> ParquetRowReadBridge.rowReader(
          spark, StructType(fields), options, Nil)
      }.toMap
    val eqExtract: Map[Seq[Int], Array[(Int, org.apache.spark.sql.types.DataType)]] =
      eqIdSets.map { ids =>
        ids -> ids.map { id =>
          val name = eqFieldsById(id).name
          val idx = widened.fieldIndex(name)
          (idx, widened.fields(idx).dataType)
        }.toArray
      }.toMap
    new SpjReaderFactory(reader, withFile, Some(dataPos), del,
      dataSchema, options, widened, eqReaders, eqExtract, withPos,
      withRowId, withLastUpd)
  }
  /** Manifest-stored partition values → catalyst representations (the key
    * row Spark groups/compares on). Loud on anything exotic.
    */
  def toCatalyst(v: Any): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case i: java.lang.Integer => i.intValue
    case l: java.lang.Long => l.longValue
    case b: java.lang.Boolean => b.booleanValue
    case f: java.lang.Float => f.floatValue
    case d: java.lang.Double => d.doubleValue
    case other => throw new IllegalArgumentException(
      s"graft-iceberg-spj: unsupported partition value type ${other.getClass}")
  }
}

/** MoR deletes attached to one data file: deletion-vector blobs (puffin
  * path, offset, length — bitmaps read and LRU-cached executor-side),
  * parquet positional-delete files (path, size — read executor-side,
  * filtered to this data file), and equality-delete files (path, size,
  * equality field ids — key sets read and LRU-cached executor-side; rows
  * whose key tuple appears are dropped, null-safe per the spec). The
  * planner already scoped applicability (sequence rules, DV supersedence).
  *
  * Scale note: equality key sets are held in executor memory per delete
  * file — the CDC upsert pattern keeps them bounded and compaction folds
  * them. Oversized backlogs never reach this path: the scan builder
  * measures Σ eq-delete bytes at plan time and routes past-threshold scans
  * through [[SpjAntiJoinScan]] (the distributed anti-join pipeline).
  */
final case class SpjFileDeletes(dvs: Array[(String, Long, Long)],
    posFiles: Array[(String, Long)],
    eqFiles: Array[(String, Long, Seq[Int])] = Array.empty) {
  def isEmpty: Boolean = dvs.isEmpty && posFiles.isEmpty && eqFiles.isEmpty
}

final case class SpjFileInfo(path: String, len: Long,
    deletes: Option[SpjFileDeletes],
    // v3 row-lineage synthesis inputs: the file's assigned first_row_id
    // block (-1 = none, pre-upgrade file) and its data sequence number —
    // readers compute _row_id = first_row_id + position where the file
    // carries no explicit column
    firstRowId: Long = -1L, dataSeq: Long = -1L)

object SpjFileInfo {
  def from(t: graft.table.FileScanTask, context: String): SpjFileInfo = {
    // the executor readers behind this route are parquet bridges; an ORC
    // file reaching them (a position-carrying row-level op on an
    // ORC-imported table — plain reads of imported tables take the V1
    // name-mapping route) must fail HERE with a plain answer, not deep in
    // a parquet footer parse
    require(t.file.format.equalsIgnoreCase("PARQUET"),
      s"$context: ${t.file.format} data file ${t.file.path} is not readable " +
        "by this route; ORC tables support reads, filters, equality deletes " +
        "and CoW rewrites, but not position-carrying row-level operations")
    val dvs = t.posDeletes.filter(_.format == "PUFFIN")
      .map(d => (d.path, d.contentOffset.get, d.contentSize.get))
      .distinct.toArray
    val pos = t.posDeletes.filter(_.format != "PUFFIN")
      .map(d => (d.path, d.fileSize)).distinct.toArray
    val eqs = t.eqDeletes
      .map { case (d, _) => (d.path, d.fileSize, d.equalityIds) }
      .distinct.toArray
    val del = SpjFileDeletes(dvs, pos, eqs)
    SpjFileInfo(t.file.path, t.file.fileSize,
      if (del.isEmpty) None else Some(del),
      firstRowId = t.file.firstRowId.getOrElse(-1L),
      dataSeq = t.dataSequence)
  }
}

final case class SpjInputPartition(key: Array[Any],
    files: Array[SpjFileInfo]) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(key)
}

/** Row values normalized to structurally-comparable JVM values, for
  * equality-delete key tuples (UTF8String → String, byte[] → Seq, Decimal
  * → BigDecimal). Null-safe: nulls compare equal per the spec's canonical
  * key encoding.
  */
object SpjValues {
  def normalize(row: InternalRow, idx: Int,
      dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (row.isNullAt(idx)) null
    else dt match {
      case IntegerType | DateType => row.getInt(idx)
      case LongType | TimestampType | TimestampNTZType => row.getLong(idx)
      case StringType => row.getUTF8String(idx).toString
      case BooleanType => row.getBoolean(idx)
      case DoubleType => row.getDouble(idx)
      case FloatType => row.getFloat(idx)
      case d: DecimalType =>
        row.getDecimal(idx, d.precision, d.scale).toJavaBigDecimal
      case BinaryType => row.getBinary(idx).toSeq
      case other => throw new IllegalArgumentException(
        s"equality-delete key type $other unsupported")
    }
  }
}

/** Executor-wide LRU of parsed positional-delete parquet files — the full
  * (referenced data file → deleted positions) map, parsed ONCE per
  * (executor, delete file) no matter how many data files reference the
  * delete file. Without it a partition-scoped pos-delete file referenced
  * by K data files costs K full parquet reads per executor (the DV and
  * eq-key caches already avoided this; this closes the last re-read).
  * Entries are immutable; eviction only costs a re-read. `loads` counts
  * loader invocations for the one-read-per-(executor, file) test.
  */
object PosDeleteCache {
  private val MaxEntries = 64
  private[graft] val loads = new java.util.concurrent.atomic.AtomicLong(0)
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, java.util.Map[String, java.util.HashSet[java.lang.Long]]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.Map[String, java.util.HashSet[java.lang.Long]]]): Boolean =
        size() > MaxEntries
    })

  // in-flight load de-duplication: K reader threads hitting the same
  // uncached delete file must trigger ONE parse, with the other K-1
  // joining the winner's future — without this, simultaneous first touches
  // all miss and all parse (the whole cost the cache exists to avoid)
  private val inflight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[
      java.util.Map[String, java.util.HashSet[java.lang.Long]]]]()

  def get(path: String,
      load: () => java.util.Map[String, java.util.HashSet[java.lang.Long]])
      : java.util.Map[String, java.util.HashSet[java.lang.Long]] = {
    val hit = cache.get(path)
    if (hit != null) return hit
    val fut = new java.util.concurrent.CompletableFuture[
      java.util.Map[String, java.util.HashSet[java.lang.Long]]]()
    val prior = inflight.putIfAbsent(path, fut)
    if (prior != null) return prior.join()
    try {
      val again = cache.get(path) // won the slot after a racer completed
      if (again != null) { fut.complete(again); return again }
      loads.incrementAndGet()
      val v = load()
      cache.put(path, v)
      fut.complete(v)
      v
    } catch {
      case e: Throwable => fut.completeExceptionally(e); throw e
    } finally {
      inflight.remove(path)
      ()
    }
  }

  private[graft] def clear(): Unit = { cache.clear(); loads.set(0) }
}

/** Executor-wide LRU of equality-delete key sets — each executor reads
  * each eq-delete file once per (file, key-set) no matter how many data
  * files it applies to (entries immutable; eviction is re-read cost).
  * In-flight loads de-duplicate: concurrent first touches join one parse
  * (same discipline as [[PosDeleteCache]]).
  */
object EqDeleteCache {
  private val MaxEntries = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Seq[Int]), Set[List[Any]]](
        32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Seq[Int]), Set[List[Any]]]): Boolean =
        size() > MaxEntries
    })
  private val inflight = new java.util.concurrent.ConcurrentHashMap[
    (String, Seq[Int]), java.util.concurrent.CompletableFuture[Set[List[Any]]]]()

  def get(path: String, ids: Seq[Int], load: () => Set[List[Any]]): Set[List[Any]] = {
    val key = (path, ids)
    val hit = cache.get(key)
    if (hit != null) return hit
    val fut = new java.util.concurrent.CompletableFuture[Set[List[Any]]]()
    val prior = inflight.putIfAbsent(key, fut)
    if (prior != null) return prior.join()
    try {
      val again = cache.get(key)
      if (again != null) { fut.complete(again); return again }
      val v = load()
      cache.put(key, v)
      fut.complete(v)
      v
    } catch {
      case e: Throwable => fut.completeExceptionally(e); throw e
    } finally {
      inflight.remove(key)
      ()
    }
  }
}

/** Executor-side row production: per file, either the plain reader or —
  * when MoR deletes are attached — the position-carrying reader over the
  * eq-key-widened schema with a delete filter (DV bitmaps via the executor
  * LRU cache, positional-delete parquet scoped to the file, equality-key
  * membership against cached key sets), then a codegen'd prefix projection
  * back to the requested columns. `_file`, when requested, is appended
  * last.
  */
final class SpjReaderFactory(
    reader: (String, Long) => Iterator[InternalRow],
    withFile: Boolean = false,
    dataPosReader: Option[(String, Long) => Iterator[InternalRow]] = None,
    delReader: Option[(String, Long) => Iterator[InternalRow]] = None,
    dataSchema: StructType = new StructType(),
    ioOptions: Map[String, String] = Map.empty,
    widenedSchema: StructType = new StructType(),
    eqReaders: Map[Seq[Int], (String, Long) => Iterator[InternalRow]] = Map.empty,
    eqExtract: Map[Seq[Int], Array[(Int, org.apache.spark.sql.types.DataType)]] = Map.empty,
    withPos: Boolean = false,
    withRowId: Boolean = false,
    withLastUpd: Boolean = false)
    extends PartitionReaderFactory {

  // positions targeting `dataPath`, from pos-delete parquets (schema:
  // file_path string, pos long). Each delete file parses ONCE per executor
  // into a (referenced file → positions) map via [[PosDeleteCache]]; this
  // lookup is then a hash probe regardless of how many data files share
  // the delete file.
  private def posDeleteSet(files: Array[(String, Long)], dataPath: String): java.util.HashSet[java.lang.Long] = {
    val want = graft.io.FileIO.canonical(dataPath)
    val rd = delReader.getOrElse(throw new IllegalStateException(
      "pos-delete files present but no pos-delete reader was planned"))
    val out = new java.util.HashSet[java.lang.Long]()
    files.foreach { case (p, len) =>
      val byFile = PosDeleteCache.get(p, () => {
        val m = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
        rd(p, len).foreach { r =>
          // a null file_path or pos means the delete file is corrupt; a
          // skipped row would RESURRECT the row it should delete — fail
          // closed (reference TestReadDeletesRejectsNullPos /
          // RejectsMissingFilePath)
          require(!r.isNullAt(0) && !r.isNullAt(1),
            s"corrupt positional delete file $p: null file_path or pos")
          m.computeIfAbsent(
              graft.io.FileIO.canonical(r.getUTF8String(0).toString),
              _ => new java.util.HashSet[java.lang.Long]())
            .add(r.getLong(1))
          ()
        }
        m
      })
      val s = byFile.get(want)
      if (s != null) out.addAll(s)
      ()
    }
    out
  }

  private def eqKeySet(path: String, len: Long, ids: Seq[Int]): Set[List[Any]] =
    EqDeleteCache.get(path, ids, () => {
      val rd = eqReaders(ids)
      val types = eqExtract(ids).map(_._2) // delete-file columns ride in id order
      rd(path, len).map { r =>
        var i = 0
        val b = List.newBuilder[Any]
        while (i < ids.length) {
          b += SpjValues.normalize(r, i, types(i))
          i += 1
        }
        b.result()
      }.toSet
    })

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SpjInputPartition]
    new PartitionReader[InternalRow] {
      private val it = p.files.iterator.flatMap { f =>
        val needLineage = withRowId || withLastUpd
        val needPosReader = withPos || needLineage || f.deletes.nonEmpty
        if (!needPosReader) {
          val base = reader(f.path, f.len)
          if (!withFile) base
          else {
            val fileRow = new GenericInternalRow(
              Array[Any](UTF8String.fromString(f.path)))
            val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
            base.map(r => joined(r, fileRow))
          }
        } else {
          // pos-carrying read (widened with any eq-key columns, trailing
          // row index); MoR deletes filter here, then the output projects
          // back to data columns + the requested metadata columns
          val posIdx = widenedSchema.fields.length
          import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
          val strip = UnsafeProjection.create(
            dataSchema.fields.zipWithIndex.map { case (sf, i) =>
              BoundReference(i, sf.dataType, sf.nullable)
            }.toSeq)
          val stream = dataPosReader.getOrElse(throw new IllegalStateException(
            "position reader was not planned")).apply(f.path, f.len)
          val filtered = f.deletes match {
            case None => stream
            case Some(del) =>
              val bitmaps = del.dvs.map { case (path, off, len) =>
                graft.table.SparkRead.DvCache.get(path, off, len, ioOptions)
              }
              val posSet =
                if (del.posFiles.isEmpty) null
                else posDeleteSet(del.posFiles, f.path)
              // per eq-delete group: (data-row extractors, key set)
              val eqGroups: Array[(Array[(Int, org.apache.spark.sql.types.DataType)], Set[List[Any]])] =
                del.eqFiles.map { case (path, len, ids) =>
                  (eqExtract(ids), eqKeySet(path, len, ids))
                }
              stream.filter { r =>
                val pos = r.getLong(posIdx)
                !bitmaps.exists(_.contains(pos)) &&
                  (posSet == null || !posSet.contains(pos)) &&
                  !eqGroups.exists { case (extract, keys) =>
                    keys.contains(extract.map { case (idx, dt) =>
                      SpjValues.normalize(r, idx, dt) }.toList)
                  }
              }
          }
          val metaArity = (if (withFile) 1 else 0) + (if (withPos) 1 else 0) +
            (if (withRowId) 1 else 0) + (if (withLastUpd) 1 else 0)
          if (metaArity == 0) filtered.map(strip)
          else {
            val meta = new GenericInternalRow(metaArity)
            if (withFile) meta.update(0, UTF8String.fromString(f.path))
            val posSlot = if (withFile) 1 else 0
            val rowIdSlot = posSlot + (if (withPos) 1 else 0)
            val lastUpdSlot = rowIdSlot + (if (withRowId) 1 else 0)
            // explicit lineage columns ride at the tail of the widened read
            // schema (before the appended row index); explicit wins,
            // synthesis only where the file carries a first_row_id block
            val rowIdReadIdx =
              if (needLineage) widenedSchema.fieldIndex(SpjTable.RowIdColumnName) else -1
            val lastReadIdx =
              if (needLineage) widenedSchema.fieldIndex(SpjTable.LastUpdatedColumnName) else -1
            val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
            filtered.map { r =>
              if (withPos) meta.setLong(posSlot, r.getLong(posIdx))
              if (withRowId) meta.update(rowIdSlot,
                if (!r.isNullAt(rowIdReadIdx)) java.lang.Long.valueOf(r.getLong(rowIdReadIdx))
                else if (f.firstRowId >= 0)
                  java.lang.Long.valueOf(f.firstRowId + r.getLong(posIdx))
                else null)
              if (withLastUpd) meta.update(lastUpdSlot,
                if (!r.isNullAt(lastReadIdx)) java.lang.Long.valueOf(r.getLong(lastReadIdx))
                else if (f.firstRowId >= 0) java.lang.Long.valueOf(f.dataSeq)
                else null)
              joined(strip(r), meta)
            }
          }
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
