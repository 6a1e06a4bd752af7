package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.HadoopCatalog
import graft.core.{SchemaBridge, Transforms}
import graft.format.PartitionSpec
import graft.table.Writer

/** Scratch harness for the storage-partitioned-join source (not gate
  * surface): builds two identity-partitioned tables, joins through
  * `graft-iceberg-spj`, prints the executed plan.
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"/root/repo/target/graft-wh/spj_probe_${System.nanoTime()}"
    val cat = new HadoopCatalog(wh)
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val s = spark.read.parquet(s"$sfDir/supplier.parquet")
    val cSchema = SchemaBridge.fromSpark(c.schema)
    val sSchema = SchemaBridge.fromSpark(s.schema)
    Writer.append(spark, cat.createTable("cust",
      cSchema, PartitionSpec.builder(cSchema).add("c_nationkey", Transforms.Identity).build()), c)
    Writer.append(spark, cat.createTable("supp",
      sSchema, PartitionSpec.builder(sSchema).add("s_nationkey", Transforms.Identity).build()), s)

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def rd(name: String) = spark.read.format("graft-iceberg-spj")
      .option("catalog", wh).option("table", name).load()

    val joined = rd("cust").join(rd("supp"),
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("c_nationkey"))
    joined.collect().take(3).foreach(println)
    val plan = joined.queryExecution.executedPlan.toString
    println("=== EXCHANGES: " + "(?i)exchange".r.findAllIn(plan).size)
    println(plan.take(4000))
    spark.stop()
  }
}
