package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table => V2Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.{Inspect, Table => GraftTable}

/** Metadata tables on the SQL surface — `SELECT * FROM g.<table>.<meta>`
  * for `snapshots, history, manifests, entries, files, partitions, refs`
  * — the Iceberg inspection convention, routed through the catalog's
  * multipart identifier (namespace = the data table, name = the metadata
  * view) onto the [[graft.table.Inspect]] frames.
  *
  * Scale note: every Inspect frame is built from table METADATA (manifest
  * lists and manifests the driver already parses to plan scans) — rows
  * number in the thousands at 100 TB, not the data scale — so serving
  * them as a driver-local scan adds no pass over data. Reference basis:
  * metadata tables in `table/metadata.go` consumers / CLI `describe`
  * paths.
  */
object GraftMetaTables {
  val Names: Set[String] =
    Set("snapshots", "history", "manifests", "entries", "files",
      "partitions", "refs", "delete_files", "all_manifests",
      "all_data_files", "all_delete_files", "all_files", "all_entries",
      "metadata_log_entries")

  /** Lineage-wide frames built by Inspect's DISTRIBUTED manifest walk —
    * served as V1 relations (executor rows flow straight into the query)
    * instead of driver-collected LocalScans, so a long history never
    * materializes on the driver.
    */
  val Distributed: Set[String] =
    Set("all_data_files", "all_delete_files", "all_files", "all_entries")

  def frame(spark: SparkSession, t: GraftTable, meta: String): DataFrame =
    meta match {
      case "snapshots" => Inspect.snapshots(spark, t)
      case "history" => Inspect.history(spark, t)
      case "manifests" => Inspect.manifests(spark, t)
      case "entries" => Inspect.entries(spark, t)
      case "files" => Inspect.files(spark, t)
      case "partitions" => Inspect.partitions(spark, t)
      case "refs" => Inspect.refs(spark, t)
      case "delete_files" => Inspect.deleteFiles(spark, t)
      case "all_manifests" => Inspect.allManifests(spark, t)
      case "all_data_files" => Inspect.allDataFiles(spark, t)
      case "all_delete_files" => Inspect.allDeleteFiles(spark, t)
      case "all_files" => Inspect.allFiles(spark, t)
      case "all_entries" => Inspect.allEntries(spark, t)
      case "metadata_log_entries" => Inspect.metadataLogEntries(spark, t)
    }
}

/** `g.<table>.position_deletes` — the one inspection relation that is
  * DATA-scale, not metadata-scale (every deleted position is a row), so
  * unlike [[GraftMetaTable]] it must never collect to the driver: the
  * scan is a V1 relation executing [[graft.table.SparkRead
  * .readPositionDeletes]] — parquet pos-deletes read distributed, DV
  * bitmaps expanded executor-side via the blob cache, DV-superseded
  * parquet rows excluded. Reference basis: the positional-delete scan
  * mode (`table/arrow_scanner.go:1214-1287`) as a queryable relation.
  */
final class GraftPositionDeletesTable(tableName: String, t: GraftTable)
    extends V2Table with SupportsRead {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  override def name(): String = s"$tableName.position_deletes"
  override lazy val schema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = true),
    StructField("pos", LongType, nullable = true),
    StructField("delete_file_path", StringType, nullable = true)))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new org.apache.spark.sql.connector.read.V1Scan {
          override def readSchema(): StructType = schema
          override def description(): String =
            s"GraftPositionDeletes($tableName)"
          override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan](
              context: org.apache.spark.sql.SQLContext): T = {
            val tbl = t
            val out = schema
            new org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan {
              override def sqlContext: org.apache.spark.sql.SQLContext = context
              override def schema: StructType = out
              override def toString: String = "GraftPositionDeletes"
              override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
                graft.table.SparkRead.readPositionDeletes(
                  context.sparkSession, tbl.newScan).rdd
            }.asInstanceOf[T]
          }
        }
    }
}

final class GraftMetaTable(tableName: String, meta: String, t: GraftTable)
    extends V2Table with SupportsRead {

  override def name(): String = s"$tableName.$meta"
  override lazy val schema: StructType =
    GraftMetaTables.frame(SparkSession.active, t, meta).schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        if (GraftMetaTables.Distributed(meta))
          new org.apache.spark.sql.connector.read.V1Scan {
            override def readSchema(): StructType = GraftMetaTable.this.schema
            override def description(): String = s"GraftMetaTable($tableName.$meta)"
            override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan](
                context: org.apache.spark.sql.SQLContext): T =
              new org.apache.spark.sql.sources.BaseRelation
                  with org.apache.spark.sql.sources.TableScan {
                override def sqlContext: org.apache.spark.sql.SQLContext = context
                override def schema: StructType = GraftMetaTable.this.schema
                override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
                  GraftMetaTables.frame(context.sparkSession, t, meta).rdd
              }.asInstanceOf[T]
          }
        else {
          val df = GraftMetaTables.frame(SparkSession.active, t, meta)
          GraftResultScan(df.schema, df.queryExecution.executedPlan.executeCollect())
        }
    }
}
