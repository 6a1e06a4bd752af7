package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partitioned write throughput vs partition count — the reference's
  * `table/partitioned_throughput_bench_test.go:488-616` benchmark shape:
  * records/sec through the fanout write path at {1, 4, 16, 64} partitions
  * over the SAME input. The scale claim under measurement is that fanout
  * cost stays bounded as partition count grows (close-on-change keeps ONE
  * open row-group buffer per task; the shuffle clusters rows by partition
  * before any writer opens), so throughput should degrade gently — not
  * 1/partitions.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.tools.WriteCurve`; one JSON
  * line on stdout, human summary on stderr.
  */
object WriteCurve {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.HadoopCatalog
    import graft.core.{SchemaBridge, Transforms}
    import graft.format.PartitionSpec
    import graft.table.Writer

    // replicate to ~100k rows so per-file fixed costs (footers, stats)
    // don't masquerade as fanout cost at 64 output files
    val base0 = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
    val copies = math.max(1, (100000 / math.max(1L, base0.count())).toInt)
    val docs = (0 until copies).map(k =>
      base0.withColumn("doc_id", col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _).repartition(32).persist()
    val rows = docs.count()

    def timeWrite(nParts: Int): Double = {
      val wh = s"/root/repo/target/graft-wh/wcurve_${java.util.UUID.randomUUID().toString.take(8)}"
      val cat = new HadoopCatalog(wh)
      val schema = SchemaBridge.fromSpark(docs.schema)
      val spec =
        if (nParts == 1) PartitionSpec.Unpartitioned
        else PartitionSpec.builder(schema)
          .add("doc_id", Transforms.Bucket(nParts)).build()
      val t0 = cat.createTable("d", schema, spec)
      val start = System.nanoTime()
      Writer.append(spark, t0, docs)
      val sec = (System.nanoTime() - start) / 1e9
      graft.io.FileIO.deleteTree(wh)
      sec
    }

    val depths = Seq(1, 4, 16, 64)
    timeWrite(1) // warm codegen/JIT once
    val points = depths.map { n =>
      val sec = math.min(timeWrite(n), timeWrite(n))
      val rps = rows / sec
      System.err.println(f"[wcurve] partitions=$n%3d $sec%6.2fs ${rps / 1000}%8.1fk rec/s")
      (n, sec, rps)
    }
    docs.unpersist()
    val base = points.head._3
    val json = points.map { case (n, sec, rps) =>
      f""""p$n":{"sec":$sec%.3f,"records_per_sec":$rps%.0f,"vs_p1":${rps / base}%.2f}"""
    }.mkString(
      "{\"metric\":\"write_curve\",\"sf\":\"" + src + "\",\"rows\":" + rows + ",",
      ",", "}")
    println(json)
    spark.stop()
  }
}
