package graft.table

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Iceberg-metadata-backed scan relation: builds the parquet DataFrame for a
  * planned file set from manifest data alone (path + file_size_in_bytes),
  * so reading planned files never lists or stats the filesystem.
  * `spark.read.parquet(paths)` builds an InMemoryFileIndex, which runs an
  * O(files) listing pass per scan (distributed — 747 stat tasks and ~1 s on
  * a 750-file rolled table) to recover exactly the sizes the manifests
  * already store. Avoiding that relisting is one of the core scale
  * arguments for manifest-based table formats (guide §6); at 100 TB the
  * listing job is a full object-store LIST per query.
  *
  * The relation is otherwise identical to the stock parquet path: same
  * ParquetFileFormat (vectorized reader, field-id resolution via the
  * schema's metadata, `_metadata` columns, filter pushdown through
  * FileSourceStrategy), same split planning — driven by the manifest's
  * file_size_in_bytes, which the spec requires to be the file's true
  * length (ours are footer-harvested at write).
  */
object MetadataRead {

  private final class ManifestFileIndex(files: Seq[(Path, Long)])
      extends FileIndex {
    private val statuses: Seq[FileStatusWithMetadata] = files.map {
      case (p, size) =>
        // mtime 0: only surfaced via _metadata.file_modification_time,
        // which no graft read path consumes; block size only biases
        // locality hints, meaningless on local/object storage
        FileStatusWithMetadata(
          new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L, p))
    }
    override val rootPaths: Seq[Path] = files.map(_._1)
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, statuses))
    override def inputFiles: Array[String] = files.map(_._1.toString).toArray
    override def refresh(): Unit = ()
    override val sizeInBytes: Long = files.map(_._2).sum
    override def partitionSchema: StructType = new StructType()
  }

  /** Parquet DataFrame over `(path, sizeBytes)` pairs with an explicit read
    * schema — the listing-free replacement for
    * `spark.read.options(opts).schema(s).parquet(paths)`.
    */
  def parquet(spark: SparkSession, files: Seq[(String, Long)],
      schema: StructType, options: Map[String, String] = Map.empty): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val hadoopConf = classic.sessionState.newHadoopConfWithOptions(options)
    // qualify against the path's filesystem (no IO — URI arithmetic), so
    // _metadata.file_path carries the same file:/ form the stock listing
    // path produced and existing normalizations keep matching
    val qualified = files.map { case (p, size) =>
      val path = new Path(p)
      (path.getFileSystem(hadoopConf).makeQualified(path), size)
    }
    val relation = HadoopFsRelation(
      new ManifestFileIndex(qualified),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = options)(classic)
    classic.baseRelationToDataFrame(relation)
  }
}
