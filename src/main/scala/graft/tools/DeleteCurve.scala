package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-latency-vs-equality-delete-backlog curve — the reference's
  * `table/read_perf_deletes_test.go:37-58` benchmark shape, which documents
  * per-delete-file degradation as the motivation for compaction and DVs.
  * Builds a documents-table copy, layers K ∈ {0, 4, 16, 64} uncompacted
  * eq-delete commits (the CDC replication shape), and times a full scan
  * aggregate at each depth through BOTH routes (per-file key sets, and the
  * distributed anti-join forced via `spark.graft.eqDeleteFallbackBytes=1`),
  * then compacts once and re-times — the backlog collapse the i114 gate
  * pins for correctness, here measured for latency.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.tools.DeleteCurve`; prints one
  * JSON line, human summary on stderr.
  */
object DeleteCurve {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.HadoopCatalog
    import graft.core.SchemaBridge
    import graft.format.PartitionSpec
    import graft.table.{SparkRead, Writer}

    val wh = s"/root/repo/target/graft-wh/dcurve_${java.util.UUID.randomUUID().toString.take(8)}"
    val cat = new HadoopCatalog(wh)
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    var t = Writer.append(spark,
      cat.createTable("d", SchemaBridge.fromSpark(docs.schema),
        PartitionSpec.Unpartitioned), docs.repartition(16))

    def timedScan(): Double = {
      val t0 = System.nanoTime()
      SparkRead.read(spark, cat.loadTable("d").newScan)
        .agg(count(lit(1)), sum(col("n_chars")))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def measure(route: String): Double = {
      if (route == "antijoin")
        spark.conf.set("spark.graft.eqDeleteFallbackBytes", "1")
      else spark.conf.unset("spark.graft.eqDeleteFallbackBytes")
      timedScan() // warm
      math.min(timedScan(), timedScan())
    }

    val depths = Seq(0, 4, 16, 64)
    var committed = 0
    val points = depths.map { k =>
      while (committed < k) {
        t = Writer.equalityDelete(spark, t,
          docs.filter(col("doc_id") % 997 === committed % 997)
            .select(col("doc_id")), Seq("doc_id"))
        committed += 1
      }
      val keyset = measure("keyset")
      val anti = measure("antijoin")
      System.err.println(f"[dcurve] k=$k%3d keyset=$keyset%6.2fs antijoin=$anti%6.2fs")
      (k, keyset, anti)
    }
    spark.conf.unset("spark.graft.eqDeleteFallbackBytes")
    val res = graft.table.Maintenance.rewriteDataFiles(spark, t, rewriteAll = true)
    val afterCompact = { timedScan(); math.min(timedScan(), timedScan()) }
    System.err.println(f"[dcurve] after compaction (collected ${res.removedDeleteFiles} delete files): $afterCompact%6.2fs")

    val json = points.map { case (k, ks, aj) =>
      f""""k$k":{"keyset_sec":$ks%.3f,"antijoin_sec":$aj%.3f}"""
    }.mkString(
      "{\"metric\":\"delete_curve\",\"sf\":\"" + src + "\",",
      ",",
      f""","after_compaction_sec":$afterCompact%.3f,"collected_delete_files":${res.removedDeleteFiles}}""")
    println(json)
    spark.stop()
  }
}
