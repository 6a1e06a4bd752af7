package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve evidence for the 100 TB claims: run the five scale-path
  * operators (t25 bloom decontaminate, t1 exact dedup, t7 minhash
  * clusters, s5 IVF ANN, s14 IVFPQ ANN) at sf0.1 and at a generated 10x
  * documents/embeddings fixture, and report time(10x)/time(1x). A linear
  * operator on local[N] should land well under ~15x (10x data plus
  * super-linear shuffle constants); anything above means a hidden
  * quadratic term that 1000 executors cannot save.
  *
  * The 10x fixture replicates sf0.1 documents/embeddings with per-copy id
  * offsets and small text/vector perturbations, so distributional shape
  * (dup rate, cluster structure) is preserved without creating 10-way
  * exact duplicates; all other tables symlink to sf0.1.
  *
  * Usage: `runMain graft.tools.ScaleCurve [outDir]` (default
  * target/scale10). Prints one JSON line; human summary to stderr.
  */
object ScaleCurve {

  private val Ops = Seq("t1_dedup_exact", "t7_minhash_clusters",
    "t25_decontaminate_bloom", "s5_ann_ivf", "s14_ivfpq_ann")

  def buildFixture(spark: SparkSession, src: String, out: String): Unit = {
    val fs = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(fs.resolve("_SUCCESS_SCALE10"))) return
    java.nio.file.Files.createDirectories(fs)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docs10 = (0 until 10).map { k =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
      if (k == 0) d
      // perturb text so copies are near-dups at realistic rates, not
      // 10-way exact duplicates that would distort dedup group sizes
      else d.withColumn("text", concat(col("text"), lit(s" c$k")))
        .withColumn("n_chars", col("n_chars") + lit(3L))
    }.reduce(_ unionByName _)
    docs10.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val embs10 = (0 until 10).map { k =>
      val e = embs.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
      if (k == 0) e
      else e.withColumn("embedding",
        transform(col("embedding"), x => x + lit(k * 1e-4f)))
    }.reduce(_ unionByName _)
    embs10.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    // remaining tables: symlink to the source fixture
    val srcDir = java.nio.file.Paths.get(src)
    java.nio.file.Files.list(srcDir).forEach { p =>
      val name = p.getFileName.toString
      val target = fs.resolve(name)
      if (!java.nio.file.Files.exists(target))
        java.nio.file.Files.createSymbolicLink(target, p)
    }
    java.nio.file.Files.write(fs.resolve("_SUCCESS_SCALE10"),
      Array.emptyByteArray)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/root/repo/target/scale10")
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
    buildFixture(spark, src, out)

    def timed(run: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val defs = graft.SparkEntry.all.filter(q => Ops.contains(q.name))
    val results = defs.map { qd =>
      def runAt(dir: String): () => DataFrame = qd.stagedFn match {
        case Some(prep) => prep(spark, dir)
        case None       => () => qd.fn(spark, dir)
      }
      // warm codegen/JIT on the small scale, then min of 2 reps per scale
      val r1 = runAt(src)
      timed(r1)
      val t1x = math.min(timed(r1), timed(r1))
      val r10 = runAt(out)
      val t10x = math.min(timed(r10), timed(r10))
      val ratio = t10x / t1x
      System.err.println(f"[scale] ${qd.name}%-24s 1x=$t1x%6.2fs 10x=$t10x%6.2fs ratio=$ratio%5.2f")
      (qd.name, t1x, t10x, ratio)
    }
    val json = results.map { case (n, a, b, r) =>
      f""""$n":{"t1x_sec":$a%.3f,"t10x_sec":$b%.3f,"ratio":$r%.2f}"""
    }.mkString("{\"metric\":\"scale_curve\",\"sf1x\":\"" + src + "\",", ",", "}")
    println(json)
    spark.stop()
  }
}
