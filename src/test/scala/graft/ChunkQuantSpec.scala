package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.{Chunking, Quantize, TextStats}

/** Edge cases for chunking / vocabulary / int8 quantization (the happy path
  * is oracle-gated in t23/t24/s7): exact window boundaries, short documents,
  * rank tie-breaks, saturation and all-zero vectors.
  */
class ChunkQuantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("chunkByTokens emits full-width interior windows and a covering partial tail") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3 -> 1 + ceil(6/3) = 3 chunks:
    // [t1..t4], [t4..t7], [t7..t10]
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "text", window = 4, stride = 3, keep = Seq("doc_id"))
      .orderBy(col("chunk_id")).collect()
    assert(out.map(_.getString(2)).toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(out.map(_.getLong(3)).toSeq === Seq(4L, 4L, 4L))
  }

  test("chunkByTokens: short document yields one chunk equal to the text; exact-stride end has no empty chunk") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),                                   // under window -> itself
      (2L, (1 to 7).map(i => s"w$i").mkString(" ")))   // 7 tok, w4 s3 -> [1..4],[4..7]
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "text", window = 4, stride = 3, keep = Seq("doc_id"))
      .orderBy(col("doc_id"), col("chunk_id")).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq(
      (1L, "a b c"), (2L, "w1 w2 w3 w4"), (2L, "w4 w5 w6 w7")))
  }

  test("topVocab breaks count ties by word asc; oovStats counts misses against it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a b c a z", "s1"),
      (2L, "a b q", "s2")).toDF("doc_id", "text", "source")
    // counts: a=3, b=3, c=1, q=1, z=1 -> top-3 = a, b (tie 3), then c (tie 1, asc)
    val vocab = TextStats.topVocab(docs, "text", n = 3)
    assert(vocab.orderBy(col("rank")).collect().map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    val oov = TextStats.oovStats(docs, vocab, "text", "source")
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(oov === Seq(("s1", 6L, 1L), ("s2", 3L, 1L))) // z and q are OOV
  }

  test("int8Codes saturates only the max element, rounds half away from zero, zero vector maps to zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // ma=1.0 -> 64 (63.5 rounds up), -127, 32 (31.75)
      (2L, Seq(0.0f, 0.0f))          // all-zero: no division by zero
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), Quantize.int8Codes(col("embedding")).as("q"))
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(out.toSeq === Seq((1L, Seq(64, -127, 32)), (2L, Seq(0, 0))))
  }

  test("dequantize reconstructs within half a quantization step") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.9f, -0.3f, 0.07f, 0.44f))).toDF("vec_id", "embedding")
    val rec = df.select(
        col("embedding"),
        Quantize.dequantize(Quantize.int8Codes(col("embedding")),
          Quantize.maxAbs(col("embedding"))).as("r"))
      .collect()(0)
    val orig = rec.getSeq[Float](0)
    val back = rec.getSeq[Double](1)
    val step = 0.9 / 127.0
    orig.zip(back).foreach { case (o, b) =>
      assert(math.abs(o.toDouble - b) <= step / 2 + 1e-12)
    }
  }

  test("dsirSelect ranks target-lookalike documents above dissimilar ones") {
    import spark.implicits._
    import graft.llm.Sampling
    // target (t=true) speaks "alpha beta"; doc 10 resembles it, doc 11
    // speaks the off-distribution "zeta" dialect
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta gamma", true),
      (10L, "alpha beta alpha", false),
      (11L, "zeta zeta zeta eta", false),
      (12L, "gamma alpha", false)
    ).toDF("doc_id", "text", "is_t")
    val sel = Sampling.dsirSelect(docs, col("is_t"), "text", "doc_id",
      vocabSize = 4, k = 5).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // the lookalike outranks the off-distribution doc
    assert(sel(10L) < sel(11L))
    assert(sel(12L) < sel(11L))
    // ranks are 1..k over all docs
    assert(sel.values.toSeq.sorted === (1 to 5))
  }
}
