package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Focused large-scale probe (round 17): one bigger fixture (default
  * 100× documents/embeddings off sf0.1) × a handful of map-heavy /
  * headline operators, so the 8-vs-32-core speedup can be measured where
  * the work finally dominates scheduling overhead — the r16 verdict's
  * open question (every sf0.1 gate was overhead-bound; ratios ≤ 1.8 on a
  * core ratio of 4 prove nothing about scale-out either way).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleProbe
  * [factor] [outDir]"`. Prints one line per op (min of 2 reps, after a
  * 1× warm rep) — not gate surface, dev-only.
  */
object ScaleProbe {

  private val Ops = Seq("t25_decontaminate_bloom", "t14_repetition",
    "s13_kmeans_twolevel", "t7_minhash_clusters", "q18_approx_sketch")

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.drop(1).headOption
      .getOrElse(s"/root/repo/target/scaleprobe_$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleCurve.buildFixture(spark, src, out, factor = factor)

    def timed(run: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = graft.SparkEntry.all.filter(q => Ops.contains(q.name)).map { qd =>
      def mk(dir: String): () => DataFrame = qd.stagedFn match {
        case Some(prep) => prep(spark, dir)
        case None       => () => qd.fn(spark, dir)
      }
      timed(mk(src)) // warm codegen at 1x
      val r = mk(out)
      val s = math.min(timed(r), timed(r))
      System.err.println(f"[probe] ${qd.name}%-26s ${factor}x cpus=$cpus sec=$s%7.2f")
      s""""${qd.name}":$s"""
    }
    println(results.mkString(
      s"""{"metric":"scale_probe","factor":$factor,"cpus":$cpus,"ops":{""", ",", "}}"))
    spark.stop()
  }
}
