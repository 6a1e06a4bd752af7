package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.table.Writer

/** Per-column metrics modes (reference `table/internal/utils.go:365-412`
  * MatchMetricsMode + `arrow_utils.go:1634-1650` resolution): none / counts
  * / truncate(n) / full, table default + per-column override.
  */
class MetricsModeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("metrics modes shape the harvested DataFile stats") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-mm").toString)
    val df = Seq(
      (1L, "alphabetical", "keepme", "secret1"),
      (2L, "zygomorphic", "keepme2", "secret2"))
      .toDF("id", "s_trunc", "s_full", "s_none").coalesce(1)
    val schema = SchemaBridge.fromSpark(df.schema)
    val t1 = Writer.append(spark, cat.createTable("mm", schema,
      PartitionSpec.Unpartitioned,
      properties = Map(
        "write.metadata.metrics.default" -> "truncate(4)",
        "write.metadata.metrics.column.s_full" -> "full",
        "write.metadata.metrics.column.s_none" -> "none",
        "write.metadata.metrics.column.id" -> "counts")), df)
    val f = t1.newScan.planFiles().map(_.file).head
    def id(n: String) = t1.schema.findField(n).get.id

    // default truncate(4): string bounds truncated; lower is a prefix,
    // upper sorts at-or-above the true maximum
    val lo = new String(f.lowerBounds(id("s_trunc")), "UTF-8")
    val hi = new String(f.upperBounds(id("s_trunc")), "UTF-8")
    assert(lo === "alph")
    assert(hi.length === 4 && hi >= "zygo")

    // full: untruncated bounds
    assert(new String(f.lowerBounds(id("s_full")), "UTF-8") === "keepme")
    assert(new String(f.upperBounds(id("s_full")), "UTF-8") === "keepme2")

    // none: no metrics at all for the column
    assert(!f.valueCounts.contains(id("s_none")))
    assert(!f.nullCounts.contains(id("s_none")))
    assert(!f.columnSizes.contains(id("s_none")))
    assert(!f.lowerBounds.contains(id("s_none")))

    // counts: counts but no bounds (numeric truncate would be full anyway)
    assert(f.valueCounts(id("id")) === 2L)
    assert(!f.lowerBounds.contains(id("id")))
  }

  test("write.parquet.* properties reach the parquet writer") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-pq").toString)
    val df = (0 until 5000).map(i => (i.toLong, s"name-$i")).toDF("id", "name").coalesce(1)
    val schema = SchemaBridge.fromSpark(df.schema)
    val t1 = Writer.append(spark, cat.createTable("pq", schema,
      PartitionSpec.Unpartitioned,
      properties = Map(
        "write.parquet.compression-codec" -> "gzip",
        "write.parquet.bloom-filter-enabled.column.id" -> "true")), df)
    val path = t1.newScan.planFiles().map(_.file.path).head
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration()))
    try {
      val chunks = r.getFooter.getBlocks.asScala.head.getColumns.asScala
      val idChunk = chunks.find(_.getPath.toArray.mkString(".") == "id").get
      val nameChunk = chunks.find(_.getPath.toArray.mkString(".") == "name").get
      assert(idChunk.getCodec.name().equalsIgnoreCase("gzip"))
      assert(idChunk.getBloomFilterOffset > 0, "bloom filter missing for id")
      assert(nameChunk.getBloomFilterOffset <= 0, "bloom filter unexpectedly on name")
    } finally r.close()
  }

  test("mode parsing matches the reference surface") {
    import Writer.MetricsMode
    assert(MetricsMode.parse(" Truncate(8) ") === MetricsMode.Trunc(8))
    assert(MetricsMode.parse("NONE") === MetricsMode.NoMetrics)
    assert(MetricsMode.parse("counts") === MetricsMode.Counts)
    assert(MetricsMode.parse("full") === MetricsMode.Full)
    intercept[IllegalArgumentException] { MetricsMode.parse("truncate(0)") }
    intercept[IllegalArgumentException] { MetricsMode.parse("bogus") }
  }
}
