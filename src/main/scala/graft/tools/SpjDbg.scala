package graft.tools
import org.apache.spark.sql.SparkSession
import graft.catalog.HadoopCatalog
import graft.core.{Expr, SchemaBridge, Transforms}
import graft.format.PartitionSpec
import graft.table.Writer
object SpjDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("spjdbg").toString
    val cat = new HadoopCatalog(wh)
    val n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val schema = SchemaBridge.fromSpark(n.schema)
    val t1 = Writer.append(spark, cat.createTable("nat_mor", schema,
      PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()), n)
    val t2 = Writer.deleteWhereMoR(spark, t1, Expr.lt("n_nationkey", 5))
    println("snapshots=" + t2.metadata.snapshots.size)
    println("rows after=" + graft.table.SparkRead.read(spark, t2.newScan).count())
    val tasks = new HadoopCatalog(wh).loadTable("nat_mor").newScan.planFiles()
    tasks.foreach(t => println(s"${t.file.path.split('/').last} pos=${t.posDeletes.size} eq=${t.eqDeletes.size}"))
    spark.stop()
  }
}
