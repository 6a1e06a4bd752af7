package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Bridge into the `private[sql]` parquet WRITE machinery — the mirror of
  * [[ParquetRowReadBridge]]: builds the same serializable OutputWriter
  * factory Spark's own FileFormatWriter ships to executors, so DSv2 data
  * writers (the row-level-operation CoW write path) produce parquet with
  * the stock writer — field-id embedding, TIMESTAMP_MICROS, variant
  * shredding, compression from table options — byte-compatible with the
  * DataFrame write path.
  */
object ParquetRowWriteBridge {

  /** A serializable `path => RowFileWriter` over rows of `schema`. Built
    * once on the driver (captures the prepared hadoop conf); each call —
    * on any executor — opens Spark's parquet OutputWriter at `path`.
    */
  def writerFactory(spark: SparkSession, schema: StructType,
      options: Map[String, String]): String => RowFileWriter = {
    val session = spark.asInstanceOf[classic.SparkSession]
    // the knobs the DataFrame write path sets session-wide
    session.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    session.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val hadoopConf = session.sessionState.newHadoopConfWithOptions(options)
    val job = Job.getInstance(hadoopConf)
    val factory = new ParquetFileFormat().prepareWrite(session, job, options, schema)
    val serConf = new SerializableConfiguration(job.getConfiguration)
    (path: String) => {
      // fresh conf per writer: TaskAttemptContext wraps it mutably and
      // concurrent task writers must not share
      val conf = new Configuration(serConf.value)
      val attemptId = new TaskAttemptID(
        new TaskID(new JobID("graft-write", 0), TaskType.MAP, 0), 0)
      val ctx = new TaskAttemptContextImpl(conf, attemptId)
      new RowFileWriter(factory.newInstance(path, schema, ctx))
    }
  }
}

/** Thin public wrapper so graft code outside the spark namespace can hold
  * the (private[sql]) OutputWriter.
  */
final class RowFileWriter(w: OutputWriter) {
  def write(row: InternalRow): Unit = w.write(row)
  def close(): Unit = w.close()
}
