package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan-audit harness for OPERATOR frames whose gates return
  * driver-built result rows (the ANN quality gates collect internal
  * counts, so `ExplainQuery` on them shows only a LocalRelation). Prints
  * the formatted plan of each named similarity operator over the
  * `embeddings` table with the gate parameters. Not gate surface. Run via
  * `sbt "runMain graft.tools.ExplainOps <op> ..."` with ops from:
  * lsh, ivf, pq, ivfpq, brute.
  */
object ExplainOps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.queries.Q.tbl(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    args.foreach { op =>
      println(s"===== op:$op =====")
      val df = op match {
        case "lsh" => graft.llm.Similarity.lshTopK(queries, emb, k = 5, nbits = 4, probes = 5)
        case "ivf" => graft.llm.Similarity.ivfTopK(queries, emb, k = 5, nlist = 8, nprobe = 4)
        case "pq" => graft.llm.Similarity.pqTopK(queries, emb, k = 5, m = 8, ksub = 16, refine = 8)
        case "ivfpq" => graft.llm.Similarity.ivfPqTopK(queries, emb, k = 5,
          nlist = 8, nprobe = 4, m = 8, ksub = 16, refine = 8)
        case "brute" => graft.llm.Similarity.bruteForceTopK(queries, emb, k = 5)
        case other => sys.error(s"unknown op: $other")
      }
      df.explain("formatted")
    }
    spark.stop()
  }
}
