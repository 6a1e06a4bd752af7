package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit harness: print the formatted physical plan of one gate
  * query (run via `sbt "runMain graft.tools.ExplainQuery <query>"`). Not gate
  * surface.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (sys.env.contains("SPARK_GRAFT_EXEC")) {
        // execute, then re-explain: AQE only shows runtime decisions
        // (broadcast conversion, exchange reuse, skew splits) in the FINAL
        // plan — the pre-execution plan can both hide reuse and overstate
        // shuffles
        df.write.format("noop").mode("overwrite").save()
        println(s"----- $name (final adaptive plan) -----")
        df.explain("formatted")
      }
    }
    spark.stop()
  }
}
