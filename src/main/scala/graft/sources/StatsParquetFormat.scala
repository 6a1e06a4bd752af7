package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.util.CollectionAccumulator

import graft.core.Geo

/** Per-file stats the parquet footer can't carry, collected INLINE during
  * the write (reference collects these in its own writer,
  * `table/internal/parquet_files.go:733-1150`): NaN counts for float/double
  * columns and planar envelope bounds for geometry columns. Reported
  * through a Spark accumulator keyed by the written part-file name, so the
  * append's stats harvest needs no second read over fresh files.
  */
final case class WriteFileStats(
    fileName: String,
    nanCounts: Map[Int, Long],
    geoBounds: Map[Int, (Double, Double, Double, Double)])

/** A drop-in `ParquetFileFormat` whose writers stream per-row NaN/geo stats
  * into a driver accumulator as they write. Column selections travel via
  * options:
  *   - `graft.stats.job`: accumulator handle (see [[StatsParquetFormat.register]])
  *   - `graft.stats.nan`: `dotted.path:fieldId` pairs, `;`-separated
  *   - `graft.stats.geo`: `name:fieldId` pairs (top-level WKB binary columns)
  *
  * Everything else — encryption options, compression, the actual encoding —
  * is the stock parquet write path.
  */
final class StatsParquetFormat extends ParquetFileFormat {

  override def shortName(): String = "graft-stats-parquet"

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory = {
    val delegate = super.prepareWrite(sparkSession, job, options, dataSchema)
    val acc = StatsParquetFormat.accFor(options("graft.stats.job"))

    def parse(key: String): Seq[(String, Int)] =
      options.getOrElse(key, "").split(';').filter(_.nonEmpty).toSeq.map { kv =>
        val i = kv.lastIndexOf(':')
        (kv.substring(0, i), kv.substring(i + 1).toInt)
      }

    // dotted path -> ordinal chain with per-level struct widths, so writers
    // navigate nested InternalRows without name lookups per row
    def chain(path: String): Option[(Seq[(Int, Int)], Boolean)] = {
      var st: StructType = dataSchema
      val steps = mutable.Buffer.empty[(Int, Int)]
      val parts = path.split('.')
      for ((p, i) <- parts.zipWithIndex) {
        val ord = st.fieldNames.indexOf(p)
        if (ord < 0) return None
        steps += ((ord, st.size))
        if (i < parts.length - 1) st.fields(ord).dataType match {
          case s: StructType => st = s
          case _ => return None
        } else {
          return Some((steps.toSeq, st.fields(ord).dataType == FloatType))
        }
      }
      None
    }

    val nanCols: Seq[(Seq[(Int, Int)], Boolean, Int)] =
      parse("graft.stats.nan").flatMap { case (p, id) => chain(p).map(c => (c._1, c._2, id)) }
    val geoCols: Seq[(Int, Int)] = parse("graft.stats.geo").flatMap { case (p, id) =>
      val ord = dataSchema.fieldNames.indexOf(p)
      if (ord < 0) None else Some((ord, id))
    }

    new OutputWriterFactory {
      def getFileExtension(ctx: TaskAttemptContext): String = delegate.getFileExtension(ctx)

      def newInstance(path: String, schema: StructType,
          ctx: TaskAttemptContext): OutputWriter = {
        val inner = delegate.newInstance(path, schema, ctx)
        new OutputWriter {
          private val nan = Array.fill[Long](nanCols.size)(0L)
          private val env = Array.fill[(Double, Double, Double, Double)](geoCols.size)(null)

          private def leaf(row: InternalRow, steps: Seq[(Int, Int)]): Option[(InternalRow, Int)] = {
            var r = row
            var i = 0
            while (i < steps.length - 1) {
              val (ord, _) = steps(i)
              if (r.isNullAt(ord)) return None
              r = r.getStruct(ord, steps(i + 1)._2)
              i += 1
            }
            Some((r, steps.last._1))
          }

          def write(row: InternalRow): Unit = {
            var i = 0
            while (i < nanCols.size) {
              val (steps, isFloat, _) = nanCols(i)
              leaf(row, steps).foreach { case (r, ord) =>
                if (!r.isNullAt(ord)) {
                  val isNan = if (isFloat) r.getFloat(ord).isNaN else r.getDouble(ord).isNaN
                  if (isNan) nan(i) += 1
                }
              }
              i += 1
            }
            i = 0
            while (i < geoCols.size) {
              val ord = geoCols(i)._1
              if (!row.isNullAt(ord)) Geo.envelope(row.getBinary(ord)).foreach {
                case (x0, y0, x1, y1) =>
                  env(i) = env(i) match {
                    case null => (x0, y0, x1, y1)
                    case (ax0, ay0, ax1, ay1) => (math.min(ax0, x0), math.min(ay0, y0),
                      math.max(ax1, x1), math.max(ay1, y1))
                  }
              }
              i += 1
            }
            inner.write(row)
          }

          def close(): Unit = {
            inner.close()
            val name = path.substring(path.lastIndexOf('/') + 1)
            acc.add(WriteFileStats(name,
              nanCols.zipWithIndex.map { case ((_, _, id), i) => id -> nan(i) }.toMap,
              geoCols.zipWithIndex.collect {
                case ((_, id), i) if env(i) != null => id -> env(i)
              }.toMap))
          }

          def path(): String = inner.path()
        }
      }
    }
  }
}

object StatsParquetFormat {

  private val accs = new ConcurrentHashMap[String, CollectionAccumulator[WriteFileStats]]()

  /** Register an accumulator for one write job; pass the returned id as the
    * `graft.stats.job` option and [[drain]] it after the write completes.
    */
  def register(spark: SparkSession): String = {
    val id = java.util.UUID.randomUUID().toString
    val acc = spark.sparkContext.collectionAccumulator[WriteFileStats](s"graft-write-stats-$id")
    accs.put(id, acc)
    id
  }

  private[sources] def accFor(id: String): CollectionAccumulator[WriteFileStats] =
    Option(accs.get(id)).getOrElse(
      throw new IllegalStateException(s"no stats accumulator registered for job $id"))

  /** Collected stats by part-file name; unregisters the job. Task retries
    * can report a file twice with identical stats — last entry wins.
    */
  def drain(id: String): Map[String, WriteFileStats] = {
    val acc = accFor(id)
    accs.remove(id)
    acc.value.asScala.map(s => s.fileName -> s).toMap
  }
}
