package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.core.{IcebergTypes, Literals, SchemaBridge}
import graft.table.{FileScanTask, Table => GraftTable}

/** Metadata-only aggregate answering for the SPJ source: COUNT(*),
  * COUNT(col), MIN(col), MAX(col) over a clean table fold entirely from
  * manifest statistics — record counts, null/value counts, and column
  * bounds — so the query reads ZERO data bytes. At 100 TB, `SELECT
  * COUNT(*)` is a manifest walk, not a table scan.
  *
  * Only pushes when the answer is provably exact:
  *   - no filters (every pushed filter stays residual, which a one-row
  *     complete-pushdown result cannot satisfy) and no GROUP BY;
  *   - no MoR deletes (positions removed after stats were written);
  *   - MIN/MAX on int/long/float/double/date only — string/binary bounds
  *     are TRUNCATED by metrics modes, decimals carry scale pitfalls;
  *   - floating MIN/MAX additionally require a recorded zero NaN count
  *     (NaN orders above every value in Spark; bounds exclude it);
  *   - every file must carry the needed stat, or contribute provably
  *     nothing (all-null column in that file).
  * Anything else falls back to the normal scan.
  *
  * Reference basis: per-file metrics harvested at write
  * (`table/internal/parquet_files.go:733-1150`); the fold mirrors the
  * manifest-eval arithmetic in `core/Evaluators`.
  */
object SpjAggPushdown {

  /** Try to answer `agg` from `tasks`' file stats. Returns the output
    * schema and the single result row, or None when any term is not
    * provably exact.
    */
  def tryPush(table: GraftTable, tasks: Seq[FileScanTask],
      agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    if (tasks.exists(t => t.posDeletes.nonEmpty || t.eqDeletes.nonEmpty)) return None
    val schema = table.schema
    val files = tasks.map(_.file)

    def fieldOf(ref: NamedReference): Option[graft.core.NestedField] =
      if (ref.fieldNames.length != 1) None
      else schema.fields.find(_.name == ref.fieldNames.head)

    def colRef(f: AggregateFunc): Option[NamedReference] = f match {
      case c: Count if !c.isDistinct => c.column match {
        case r: NamedReference => Some(r); case _ => None
      }
      case m: Min => m.column match { case r: NamedReference => Some(r); case _ => None }
      case m: Max => m.column match { case r: NamedReference => Some(r); case _ => None }
      case _ => None
    }

    val results = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count(*)", org.apache.spark.sql.types.LongType, nullable = false),
          Long.box(files.map(_.recordCount).sum): Any))

      case c: Count if !c.isDistinct =>
        for {
          ref <- colRef(c)
          field <- fieldOf(ref)
          counts <- foldAll(files)(f =>
            for {
              vc <- f.valueCounts.get(field.id)
              nc <- f.nullCounts.get(field.id)
            } yield vc - nc)
        } yield (StructField(s"count(${field.name})",
          org.apache.spark.sql.types.LongType, nullable = false),
          Long.box(counts.sum): Any)

      case m: Min => boundAgg(m.column, fieldOf, files, lower = true)
      case m: Max => boundAgg(m.column, fieldOf, files, lower = false)
      case _ => None
    }
    if (results.exists(_.isEmpty)) return None
    val cols = results.flatten
    Some((StructType(cols.map(_._1)),
      new GenericInternalRow(cols.map(_._2).toArray)))
  }

  /** Per-file stat fold: every file must yield the stat or the whole
    * pushdown is off.
    */
  private def foldAll[A](files: Seq[graft.format.DataFile])(
      f: graft.format.DataFile => Option[A]): Option[Seq[A]] = {
    val vals = files.map(f)
    if (vals.exists(_.isEmpty)) None else Some(vals.flatten)
  }

  private def boundAgg(column: org.apache.spark.sql.connector.expressions.Expression,
      fieldOf: NamedReference => Option[graft.core.NestedField],
      files: Seq[graft.format.DataFile],
      lower: Boolean): Option[(StructField, Any)] = {
    val ref = column match { case r: NamedReference => r; case _ => return None }
    val field = fieldOf(ref).getOrElse(return None)
    val safeType = field.fieldType match {
      case IcebergTypes.IntT | IcebergTypes.LongT | IcebergTypes.DateT => true
      case IcebergTypes.FloatT | IcebergTypes.DoubleT => true
      case _ => false // string/binary bounds truncate; decimal/ts left out
    }
    if (!safeType) return None
    val floating = field.fieldType == IcebergTypes.FloatT ||
      field.fieldType == IcebergTypes.DoubleT

    // per file: Some(Some(v)) = bound v; Some(None) = provably no non-null
    // (contributes nothing); None = unknown -> no pushdown
    val perFile: Seq[Option[Option[Any]]] = files.map { f =>
      if (floating && !f.nanCounts.get(field.id).contains(0L)) None
      else {
        val bytes = if (lower) f.lowerBounds.get(field.id) else f.upperBounds.get(field.id)
        bytes match {
          case Some(b) => Some(Some(Literals.decode(field.fieldType, b)))
          case None =>
            val nonNull = for {
              vc <- f.valueCounts.get(field.id)
              nc <- f.nullCounts.get(field.id)
            } yield vc - nc
            if (nonNull.contains(0L)) Some(None) else None
        }
      }
    }
    if (perFile.exists(_.isEmpty)) return None
    val bounds = perFile.flatten.flatten
    val sparkType: DataType = SchemaBridge.toSparkType(field.fieldType)
    val value: Any =
      if (bounds.isEmpty) null
      else {
        val ord = boundOrdering(field.fieldType)
        if (lower) bounds.min(ord) else bounds.max(ord)
      }
    val label = if (lower) s"min(${field.name})" else s"max(${field.name})"
    Some((StructField(label, sparkType, nullable = true), value))
  }

  private def boundOrdering(t: graft.core.IcebergType): Ordering[Any] = t match {
    case IcebergTypes.IntT | IcebergTypes.DateT =>
      Ordering.Int.on[Any](_.asInstanceOf[Int])
    case IcebergTypes.LongT => Ordering.Long.on[Any](_.asInstanceOf[Long])
    case IcebergTypes.FloatT =>
      Ordering.Float.TotalOrdering.on[Any](_.asInstanceOf[Float])
    case IcebergTypes.DoubleT =>
      Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"unexpected bound type $other")
  }
}

/** One-row scan carrying a fully-pushed aggregate result. */
final class SpjAggScan(schema: StructType, row: InternalRow)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SpjAggPartition(schema.length, row match {
      case g: GenericInternalRow => g.values
      case other => (0 until schema.length).map(i =>
        other.get(i, schema(i).dataType)).toArray
    }))
  override def createReaderFactory(): PartitionReaderFactory = SpjAggReaderFactory
}

final case class SpjAggPartition(n: Int, values: Array[Any]) extends InputPartition

object SpjAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SpjAggPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(p.values)
      override def close(): Unit = ()
    }
  }
}
