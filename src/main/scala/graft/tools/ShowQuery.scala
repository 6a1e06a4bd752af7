package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch correctness harness: run one gate query and print its rows (run
  * via `sbt "runMain graft.tools.ShowQuery <query> [n]"`). Not gate surface.
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 50
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(n, truncate = false)
    println(s"[showquery] $name rows=${df.count()}")
    spark.stop()
  }
}
