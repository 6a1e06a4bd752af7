package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf harness for iterating on individual queries (not part of the
  * gate surface; run via `sbt "runMain graft.tools.QuickPerf <query> <n>"`).
  */
object QuickPerf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up
    if (name == "t9stages") { t9stages(spark, sfDir); spark.stop(); return }
    if (name == "s6stages") { s6stages(spark, sfDir); spark.stop(); return }
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[quickperf] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** Stage-level timing of the s6 kNN-agreement gate (exact vs IVF leg). */
  private def s6stages(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s6stages] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.queries.Q.tbl(spark, sfDir, "embeddings")
    time("emb count")(emb.count())
    val exactTop = time("exact topk build+run") {
      val t = graft.llm.Similarity.bruteForceTopK(emb, emb, k = 6).persist()
      t.count(); t
    }
    time("exact agreement agg")(
      graft.llm.Similarity.knnLabelAgreement(exactTop, emb).collect())
    exactTop.unpersist()
    val ivfTop = time("ivf topk build+run") {
      val t = graft.llm.Similarity.ivfTopK(emb, emb, k = 6, nlist = 8, nprobe = 4).persist()
      t.count(); t
    }
    time("ivf agreement agg")(
      graft.llm.Similarity.knnLabelAgreement(ivfTop, emb).collect())
    ivfTop.unpersist()
    ()
  }

  /** Stage-level timing of the t9 near-dup pipeline. */
  private def t9stages(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t9stages] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val u = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val sigUdf = udf((t: String) =>
      if (t == null) Array.empty[Long] else graft.llm.Dedup.minHashSignature(t, 5, 64))
    val withSig = u.select(col("doc_id").as("id"), sigUdf(col("text")).as("sig")).persist()
    time("signatures (10k docs)")(withSig.count())
    val bandUdf = udf((sig: Seq[Long]) =>
      sig.grouped(4).zipWithIndex.map { case (band, bi) =>
        val bb = java.nio.ByteBuffer.allocate(band.length * 8)
        band.foreach(bb.putLong)
        (bi.toLong << 32) | (graft.core.Murmur3.hash(bb.array, 7).toLong & 0xffffffffL)
      }.toArray)
    val buckets = withSig.select(col("id"), explode(bandUdf(col("sig"))).as("bucket"))
    time("explode buckets")(buckets.count())
    val pairs = buckets.as("a").join(buckets.as("b"), col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    time("uncapped self-join + distinct")(pairs.count())
    val full = time("full t9 (build)")(
      graft.llm.Dedup.nearDupPairsMinHash(u, "doc_id", "text", threshold = 0.8))
    time("full t9 (run)")(full.write.format("noop").mode("overwrite").save())
    withSig.unpersist()
    ()
  }
}
