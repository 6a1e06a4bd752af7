package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the v3 lineage read: the synthesis must stay one
  * BROADCAST join inside whole-stage codegen (no shuffle, no UDF), with
  * the explicit-column coalesce as a plain projection.
  */
object ExplainLineage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val cat = new graft.catalog.HadoopCatalog(wh)
    val df = spark.range(100000).toDF("k").withColumn("v", col("k") * 2)
    val schema = graft.core.SchemaBridge.fromSpark(df.schema)
    val t0 = graft.table.Evolve.upgradeFormatVersion(
      cat.createTable("t", schema, graft.format.PartitionSpec.Unpartitioned), 3)
    val t1 = graft.table.Writer.append(spark, t0, df)
    val plan = graft.table.SparkRead.read(spark, t1.newScan.withRowLineage)
    plan.explain("formatted")
    spark.stop()
  }
}
