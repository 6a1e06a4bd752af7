package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.{Dedup, Similarity}

/** Quality gates for the approximate operators: LSH must actually find what
  * brute force finds (recall), and the clustering fixpoint must merge
  * chained near-dup groups a single union pass misses.
  */
class LshQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic synthetic corpus: 40 base docs, each with 2 near variants
  private def corpus = {
    import spark.implicits._
    val words = Seq("spark", "query", "engine", "table", "scan", "filter",
      "join", "shuffle", "column", "vector", "batch", "codegen", "metric",
      "plan", "task", "stage", "node", "rack", "disk", "cache")
    val docs = (0 until 40).flatMap { i =>
      val base = (0 until 30).map(j => words((i * 7 + j * 3) % words.size)).mkString(" ")
      Seq(
        (i * 10L, base),
        (i * 10L + 1, base + " extra"),
        (i * 10L + 2, base.replaceFirst(words(i % words.size), "changed")))
    }
    docs.toDF("doc_id", "text")
  }

  test("minhash LSH pair recall >= 0.9 vs brute-force at jaccard >= 0.7") {
    import spark.implicits._
    val df = corpus.cache()
    val rows = df.as[(Long, String)].collect()
    // brute-force ground truth on exact shingle jaccard
    val truth = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      sa = Dedup.shingles(ta, 5); sb = Dedup.shingles(tb, 5)
      inter = sa.intersect(sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.7
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty, "ground truth must be non-trivial")

    val found = Dedup.nearDupPairsMinHash(df, "doc_id", "text",
        threshold = 0.6, exactVerify = true)
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(found).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} true pairs")
  }

  test("lsh ANN recall >= 0.8 of brute-force top-5 neighbors") {
    import spark.implicits._
    // clustered vectors: 8 centers, 12 points each, small jitter
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 96).map { i =>
      val c = i % 8
      val center = Array.tabulate(16)(d => math.sin(c * 16 + d).toFloat * 5f)
      (i.toLong, center.map(v => v + rnd.nextGaussian().toFloat * 0.1f).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, df, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, df, 5, nbits = 6, probes = 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall $recall")
  }

  test("nearDupPairs operators leave no persisted blocks behind") {
    // The pair operators persist their signature frames internally; a persist
    // that survives the call pins blocks in the CacheManager for the session
    // lifetime — exactly what a long-lived 100 TB curation pipeline cannot
    // afford. localCheckpoint blocks are GC-tracked and don't register here.
    spark.catalog.clearCache()
    val df = corpus
    Dedup.nearDupPairsMinHash(df, "doc_id", "text", threshold = 0.6).count()
    Dedup.nearDupPairsSimHash(df, "doc_id", "text").count()
    Dedup.minHashLsh(df, "doc_id", "text").count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator leaked persisted blocks into the session CacheManager")
  }

  test("round-10 persist-using operators leave no persisted blocks behind") {
    import spark.implicits._
    spark.catalog.clearCache()
    val df = corpus
    Dedup.dupSpanCoverage(df, "doc_id", "text", n = 4).count()
    graft.llm.LmScore.bigramDocScore(
      df.withColumn("source", org.apache.spark.sql.functions.lit("s"))).count()
    val r = new java.util.Random(3L)
    val emb = (0L until 30L).map(i =>
      (i, Seq.fill(4)(r.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    graft.llm.Clustering.kMeansTwoLevel(emb, kCoarse = 2, kFine = 2, iters = 1).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator leaked persisted blocks into the session CacheManager")
  }

  test("cluster fixpoint merges chained near-dups one pass misses") {
    import spark.implicits._
    // chain a~b, b~c where a and c share little: long shared core with
    // disjoint halves replaced
    val core = (0 until 60).map(i => s"w$i").mkString(" ")
    val a = core + " " + (0 until 30).map(i => s"alpha$i").mkString(" ")
    val b = core + " " + (0 until 15).map(i => s"alpha$i").mkString(" ") +
      " " + (0 until 15).map(i => s"beta$i").mkString(" ")
    val c = core + " " + (0 until 30).map(i => s"beta$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val clusters = Dedup.minHashLsh(df, "doc_id", "text")
      .select("cluster_id").distinct().count()
    // all three chained docs must converge into one cluster
    assert(clusters === 1L, s"expected 1 cluster, got $clusters")
  }

  test("ngramJaccard: bigram + unigram vectors, short and empty strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("hello", "help"), // unigram: {h,e,l,o} vs {h,e,l,p} = 3/5
      ("abab", "baba"), // bigram: {ab,ba} vs {ba,ab} = 1.0
      ("abc", "xyz"), // disjoint = 0.0
      ("a", "ab"), // shorter than bigram: {} vs {ab} = 0.0
      ("", "")) // both empty = 0.0
      .toDF("a", "b")
    val r = df.select(
      graft.llm.Dedup.ngramJaccard(col("a"), col("b"), 1).as("j1"),
      graft.llm.Dedup.ngramJaccard(col("a"), col("b"), 2).as("j2")).collect()
    assert(r(0).getDouble(0) === 0.6)
    assert(r(1).getDouble(1) === 1.0)
    assert(r(2).getDouble(0) === 0.0 && r(2).getDouble(1) === 0.0)
    assert(r(3).getDouble(1) === 0.0)
    assert(r(4).getDouble(0) === 0.0)
  }

  test("ivfPqTopK: exact duplicates surface at rank 1 with cosine 1.0") {
    import spark.implicits._
    // deterministic vectors; queries are exact copies of corpus vectors, so
    // the re-ranked top-1 must be the twin at cosine 1.0 — residual PQ plus
    // coarse probing must never lose an identical vector (it shares the
    // query's list and its ADC score is the query's own reconstruction)
    val r = new java.util.Random(11L)
    val base = (0L until 60L).map(i => (i, Seq.fill(16)(r.nextGaussian().toFloat)))
    val corpus = base.toDF("vec_id", "embedding")
    val queries = base.take(10).map { case (i, v) => (i + 1000L, v) }
      .toDF("vec_id", "embedding")
    val top = Similarity.ivfPqTopK(queries, corpus, k = 3,
      nlist = 4, nprobe = 2, m = 4, ksub = 8, refine = 4, sampleSize = 60)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(top.size === 10)
    top.foreach { case (qid, (cid, cos)) =>
      assert(cid === qid - 1000L, s"query $qid matched $cid")
      assert(math.abs(cos - 1.0) < 1e-9)
    }
  }

  test("bruteForceTopK rejects an oversized query side (lshTopK is the scale path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val huge = spark.range(graft.llm.Similarity.BruteForceMaxQueries + 1)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(0.0f)).as("embedding"))
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Similarity.bruteForceTopK(huge, corpus, 5)
    }
    assert(e.getMessage.contains("lshTopK"))
  }
}
