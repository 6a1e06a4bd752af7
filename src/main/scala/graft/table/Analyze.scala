package graft.table

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.format._

/** Table statistics operators (reference partition stats + Puffin
  * ndv/theta blobs, `table/` stats wiring; SURVEY §2 row 68): column NDV
  * sketches persisted to a Puffin statistics file registered in table
  * metadata, and a per-partition rollup parquet registered as the
  * partition-statistics file.
  *
  * The NDV sketch is KMV (k-minimum-values over xxhash64): the k smallest
  * distinct hashes are computed fully distributed (global TakeOrdered of a
  * distinct hash column — bounded by k rows on the driver), deterministic,
  * and mergeable. Blob type "graft-kmv-v1"; the classic DataSketches theta
  * estimator (k-1)/fraction(kth) gives the estimate stored in the blob
  * properties under "ndv".
  */
object Analyze {

  val NdvBlobType = "graft-kmv-v1"

  /** KMV estimate from the k smallest distinct 64-bit hashes. */
  def kmvEstimate(smallest: Array[Long], k: Int): Long = {
    if (smallest.length < k) smallest.length.toLong
    else {
      val kth = smallest.last
      // map signed long to [0,1): fraction of hash space covered by k values
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
      if (frac <= 0) smallest.length.toLong
      else math.round((k - 1) / frac)
    }
  }

  /** Compute NDV sketches for `columns`, write one Puffin statistics file,
    * register it in table metadata (replacing any stats for the current
    * snapshot). Returns the updated table.
    */
  def computeNdv(spark: SparkSession, table: Table, columns: Seq[String],
      k: Int = 1024): Table = {
    val meta = table.metadata
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("no snapshot to analyze"))
    val df = SparkRead.read(spark, table.newScan)

    val blobs = columns.map { c =>
      val fieldId = table.schema.findField(c).getOrElse(
        throw new IllegalArgumentException(s"no such column $c")).id
      // distinct-hash TakeOrdered: at most k rows reach the driver
      val smallest = df.select(xxhash64(col(c)).as("h")).where(col(c).isNotNull)
        .distinct().orderBy(col("h")).limit(k)
        .collect().map(_.getLong(0))
      val ndv = kmvEstimate(smallest, k)
      val bb = ByteBuffer.allocate(4 + smallest.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(smallest.length)
      smallest.foreach(bb.putLong)
      (fieldId, bb.array, ndv)
    }

    val path = s"${meta.location}/metadata/stats-${UUID.randomUUID()}.puffin"
    val metas = Puffin.write(path, blobs.map { case (fieldId, bytes, ndv) =>
      (NdvBlobType, bytes, Map("ndv" -> ndv.toString, "field-id" -> fieldId.toString))
    })
    val statsFile = StatisticsFile(snap.snapshotId, path, graft.io.FileIO.size(path),
      blobs.zip(metas).map { case ((fieldId, _, ndv), _) =>
        StatsBlobMetadata(NdvBlobType, snap.snapshotId, snap.sequenceNumber,
          Seq(fieldId), Map("ndv" -> ndv.toString))
      })
    val updated = meta.copy(
      statistics = meta.statistics.filterNot(_.snapshotId == snap.snapshotId) :+ statsFile,
      lastUpdatedMs = System.currentTimeMillis())
    table.catalog.commit(table.name, meta, updated, table.currentVersion)
    table.refresh()
  }

  /** NDV estimates recorded for the current snapshot, per field id. */
  def ndvFor(table: Table): Map[Int, Long] = {
    val snapId = table.metadata.currentSnapshotId
    table.metadata.statistics
      .filter(st => snapId.contains(st.snapshotId))
      .flatMap(_.blobMetadata)
      .filter(_.blobType == NdvBlobType)
      .flatMap(b => b.fields.headOption.zip(b.properties.get("ndv").map(_.toLong)))
      .toMap
  }

  /** Write the spec partition-statistics file for the current snapshot: a
    * parquet of per-partition file/record/size rollups.
    */
  def computePartitionStats(spark: SparkSession, table: Table): Table = {
    val meta = table.metadata
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("no snapshot to analyze"))
    val rollup: DataFrame = Inspect.partitions(spark, table)
    val dir = s"${meta.location}/metadata/partition-stats-${UUID.randomUUID()}"
    rollup.coalesce(1).write.parquet(dir)
    val file = graft.io.FileIO.listFilesRecursive(dir)
      .find(_.path.endsWith(".parquet")).get
    val updated = meta.copy(
      partitionStatistics = meta.partitionStatistics
        .filterNot(_.snapshotId == snap.snapshotId) :+
        PartitionStatisticsFile(snap.snapshotId, file.path, file.size),
      lastUpdatedMs = System.currentTimeMillis())
    table.catalog.commit(table.name, meta, updated, table.currentVersion)
    table.refresh()
  }
}
