package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table => V2Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.graft.ParquetRowReadBridge
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.Catalogs
import graft.core.{SchemaBridge, Transforms}
import graft.table.{Table => GraftTable}

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
  *   - clean tables only (no pos/eq-deletes/DVs — MoR delete application
  *     would change row counts AFTER the partitioning claim).
  * Column pruning and filter pushdown are full-fidelity: see
  * [[SpjScanBuilder]].
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
    new SpjTable(load(properties), schema)
}

final class SpjTable(table: GraftTable, sparkSchema: StructType,
    allowBucket: Boolean = false)
    extends V2Table with SupportsRead {

  private val spec = table.spec
  require(spec.fields.nonEmpty,
    s"graft-iceberg-spj: table ${table.name} must be partitioned " +
      "(use graft.table.SparkRead for general reads)")

  private val keyTransforms: Seq[Transform] = spec.fields.map { pf =>
    val src = table.schema.idToField(pf.sourceId).name
    pf.transform match {
      case Transforms.Identity => Expressions.identity(src)
      case Transforms.Bucket(n) if allowBucket => Expressions.bucket(n, src)
      case Transforms.Bucket(_) => throw new IllegalArgumentException(
        s"graft-iceberg-spj: bucket SPJ on ${table.name} needs the function " +
          "catalog — register spark.sql.catalog.<name>=graft.sources.GraftSpjCatalog " +
          "and read through spark.table(\"<name>.<table>\")")
      case other => throw new IllegalArgumentException(
        s"graft-iceberg-spj: table ${table.name} has unsupported partition " +
          s"transform ${other.name}; use graft.table.SparkRead for general reads")
    }
  }

  override def name(): String = s"graft-spj:${table.name}"
  override def schema(): StructType = sparkSchema
  override def partitioning(): Array[Transform] = keyTransforms.toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpjScanBuilder(table, sparkSchema, keyTransforms,
      options.asCaseSensitiveMap().asScala.toMap)
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
    keyTransforms: Seq[Transform], options: Map[String, String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggResult: Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = None

  // COUNT/MIN/MAX from manifest stats — zero data bytes read; only when no
  // filters are in play (ours are all residual, which a one-row complete
  // result cannot satisfy) and every term is provably exact
  private def probeAgg(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (aggResult.isEmpty && pushed.isEmpty)
      aggResult = SpjAggPushdown.tryPush(table, table.newScan.planFiles(), agg)
    aggResult.isDefined
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    probeAgg(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    probeAgg(agg)

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve table column order; an empty projection (COUNT(*)) keeps one
    // narrow column so the reader has a concrete schema to materialize
    required = {
      val keep = requiredSchema.fieldNames.toSet
      val kept = StructType(fullSchema.fields.filter(f => keep(f.name)))
      if (kept.isEmpty) StructType(fullSchema.fields.take(1)) else kept
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: Spark re-evaluates everything above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggResult match {
    case Some((aggSchema, row)) => new SpjAggScan(aggSchema, row)
    case None =>
      new SpjScan(table, required, keyTransforms, options,
        pushed.flatMap(SpjScanBuilder.toExpr)
          .foldLeft(graft.core.Expr.AlwaysTrue: graft.core.Expr)(graft.core.Expr.and),
        pushed.toSeq)
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
    case org.apache.spark.sql.sources.EqualTo(a, v) if lit(v) => Some(Expr.eq(a, v))
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
    keyTransforms: Seq[Transform], options: Map[String, String],
    fileFilter: graft.core.Expr = graft.core.Expr.AlwaysTrue,
    rowGroupFilters: Seq[Filter] = Nil)
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = sparkSchema
  override def toBatch: Batch = this

  // planned once: partitioning metadata and input partitions must agree
  private lazy val grouped: Array[SpjInputPartition] = {
    val tasks = table.newScan.withFilter(fileFilter).planFiles()
    tasks.foreach { t =>
      require(t.posDeletes.isEmpty && t.eqDeletes.isEmpty,
        s"graft-iceberg-spj: ${t.file.path} carries MoR deletes; " +
          "delete application changes row counts after the partitioning " +
          "claim — compact first or use graft.table.SparkRead")
    }
    tasks.groupBy(_.file.partition).toSeq
      .map { case (partValues, ts) =>
        SpjInputPartition(partValues.map(SpjScan.toCatalyst).toArray,
          ts.map(t => (t.file.path, t.file.fileSize)).toArray)
      }
      .sortBy(_.key.toSeq.map(String.valueOf).mkString(" "))
      .toArray
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      keyTransforms.map(t => t: org.apache.spark.sql.connector.expressions.Expression).toArray,
      grouped.length)

  override def planInputPartitions(): Array[InputPartition] =
    grouped.map(identity[InputPartition])

  override def createReaderFactory(): PartitionReaderFactory = {
    val reader = ParquetRowReadBridge.rowReader(
      SparkSession.active, sparkSchema, options, rowGroupFilters)
    new SpjReaderFactory(reader)
  }
}

object SpjScan {
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

final case class SpjInputPartition(key: Array[Any],
    files: Array[(String, Long)]) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(key)
}

final class SpjReaderFactory(
    reader: (String, Long) => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SpjInputPartition]
    new PartitionReader[InternalRow] {
      private val it = p.files.iterator.flatMap { case (path, len) => reader(path, len) }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
