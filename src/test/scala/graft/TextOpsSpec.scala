package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.TextStats

/** Edge cases for the DataFrame-level text operators (the happy path is
  * oracle-gated in t14/t15): degenerate documents and deterministic
  * tie-breaking.
  */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("classifier scoring: hand-computed sigmoid, empty docs null, hash stays in range") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // dims=2: bucket parity of the rolling hash; weights +1/-1 make the
    // expected logit trivially hand-computable
    val w = Array(1.0, -1.0)
    // "a" -> hash 97 -> bucket 1 (weight -1); "b" -> 98 -> bucket 0 (+1)
    val docs = Seq(
      (1L, "a b b"),   // mean = (-1 + 1 + 1) / 3 = 1/3
      (2L, ""),        // no tokens: null score
      (3L, "a  a")     // double space: empty token filtered, mean = -1
    ).toDF("doc_id", "text")
    val out = graft.llm.ClassifierScore.scoreDocs(docs, w, idCol = "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2.get === math.rint(sig(1.0 / 3) * 1e6) / 1e6)
    assert(out(2L) === ((0L, None)))
    assert(out(3L)._2.get === math.rint(sig(-1.0) * 1e6) / 1e6)
  }

  test("wordBucket folds CODE POINTS: surrogate pairs hash as one value") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // non-BMP tokens: emoji (U+1F600), astral math letter (U+1D518), plus
    // BMP CJK — the bucket must equal the code-point fold an ord()-based
    // engine (the DuckDB oracle) computes, never the half-surrogate fold
    val words = Seq("a😀b", "𝔘nicode", "こん", "plain")
    def expected(w: String): Long = {
      var acc = 0L
      w.codePoints().toArray.foreach(cp => acc = (acc * 31L + cp) % 2147483647L)
      acc % 1024L
    }
    val got = words.toDF("w")
      .select(col("w"), graft.llm.ClassifierScore.wordBucket(col("w"), 1024).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach(w => assert(got(w) === expected(w), s"token $w"))
  }

  test("bigramDocScore matches the hand-computed add-one model; 1-token docs are unscored") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b a b", "s1"),
      (2L, "x", "s1") // no bigrams: absent from output
    ).toDF("doc_id", "text", "source")
    val out = graft.llm.LmScore.bigramDocScore(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(2) === 3L)
    // corpus: bigrams ab,ba,ab; c12(ab)=2, c12(ba)=1; c1(a)=2, c1(b)=1; V=3 (a,b,x)
    val expected = (2.0 * math.log(3.0 / 5.0) + math.log(2.0 / 4.0)) / 3.0
    assert(math.abs(r.getDouble(3) - expected) < 1e-12)
  }

  test("redactPii scrubs emails, SSNs, phones, IPs with typed markers; clean text untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "mail me at jo.ann+x@corp.example.org today"),
      (2L, "ssn is 123-45-6789, host 192.168.0.1"),
      (3L, "call +1 (555) 123-4567 or 555-123-4567 now"),
      (4L, "nothing sensitive here, just v2.0 and 7 items")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextStats.redactPii(col("text")).as("r"))
      .withColumn("n", TextStats.redactionCount(col("r")))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("mail me at <EMAIL> today", 1L)))
    assert(out(2L) === (("ssn is <SSN>, host <IP>", 2L)))
    assert(out(3L) === (("call <PHONE> or <PHONE> now", 2L)))
    assert(out(4L) === (("nothing sensitive here, just v2.0 and 7 items", 0L)))
  }

  test("repetitionSignals handles single-word and fully-repeated docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "only"),                    // one word, zero bigrams
      (2L, "spam spam spam spam"),     // fully repeated
      (3L, "a b c d")                  // no repetition
    ).toDF("doc_id", "text")
    val sig = TextStats.repetitionSignals(df)
      .select("doc_id", "n_words", "n_distinct_words", "top_word_freq",
        "n_bigrams", "n_distinct_bigrams")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(sig(1L).getLong(1) === 1 && sig(1L).getLong(3) === 1)
    assert(sig(1L).getLong(4) === 0) // no bigrams from a single word
    assert(sig(2L).getLong(2) === 1 && sig(2L).getLong(3) === 4) // 1 distinct, top=4
    assert(sig(2L).getLong(5) === 1) // "spam spam" x3 -> 1 distinct bigram
    assert(sig(3L).getLong(1) === sig(3L).getLong(2)) // all distinct
    assert(sig(3L).getLong(4) === 3 && sig(3L).getLong(5) === 3)
  }

  test("topTfIdfTerms breaks tf ties by rarity then term text") {
    import spark.implicits._
    // "rare" and "word" both appear twice in doc 1; "word" is in both docs
    // (df=2) while "rare" is only in doc 1 (df=1) -> rarity wins
    val df = Seq(
      (1L, "rare word rare word filler"),
      (2L, "word other things here")
    ).toDF("doc_id", "text")
    val top = TextStats.topTfIdfTerms(df, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) === "rare")
    // doc 2: all tf=1, all df=1 except "word" (df=2) -> lexicographic
    // smallest among the rarest: "here"
    assert(top(2L) === "here")
  }

  test("packByTokenBudget: bins respect the boundary-crossing rule and shards partition cleanly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).map(i => (i, "s", 10L + i % 7)).toDF("doc_id", "source", "ntok")
    val packed = graft.llm.Packing.packByTokenBudget(
      docs, budget = 100L, tokens = col("ntok"))
      .select("doc_id", "pack_bin", "pack_tokens").collect()
    assert(packed.length === 200) // every doc assigned
    // per-bin fill: >= budget only via the one straddling doc; a bin never
    // exceeds budget + max doc tokens
    val byBin = packed.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byBin.values.forall(_ <= 100L + 16L))
    // every bin except the last is filled past... at least to budget - maxdoc
    val bins = byBin.toSeq.sortBy(_._1)
    assert(bins.dropRight(1).forall(_._2 >= 100L - 16L))
    // sharded: packing stays deterministic and bins never span shards
    val sharded = graft.llm.Packing.packByTokenBudget(
      docs, budget = 100L, tokens = col("ntok"), shards = 4)
      .select("doc_id", "pack_shard", "pack_bin").collect()
    assert(sharded.map(_.getLong(0)).toSet.size === 200)
    val shardsSeen = sharded.map(_.getLong(1)).toSet
    assert(shardsSeen.subsetOf(Set(0L, 1L, 2L, 3L)) && shardsSeen.size > 1)
  }

  test("weightedResample honors whole and fractional rates deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 1000L).map(i => (i, "s")).toDF("doc_id", "source")
    // rate 3.0: exactly 3 copies of everything
    val exact = graft.llm.Sampling.weightedResample(docs, lit(3.0), "doc_id")
    assert(exact.count() === 3000)
    assert(exact.groupBy("doc_id").count().filter(col("count") =!= 3).count() === 0)
    // rate 0.25: a fixed ~quarter survives, exactly once each
    val thin = graft.llm.Sampling.weightedResample(docs, lit(0.25), "doc_id")
    val n = thin.count()
    assert(n > 150 && n < 350, s"expected ~250 rows, got $n")
    // deterministic: same input -> same row set
    val again = graft.llm.Sampling.weightedResample(docs, lit(0.25), "doc_id")
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      thin.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // rate 0: empty, no crash from sequence(1, 0)
    assert(graft.llm.Sampling.weightedResample(docs, lit(0.0), "doc_id").count() === 0)
  }

  test("inverted index: postings capped, tf-desc doc-asc order, df/cf exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a a b"), (2L, "a b b"), (3L, "a"), (4L, "a"), (5L, "a"), (6L, "a"))
      .toDF("doc_id", "text")
    val idx = graft.llm.Retrieval.invertedIndex(docs, cap = 3)
      .collect().map(r => (r.getAs[String]("word"),
        (r.getAs[Long]("df"), r.getAs[Long]("cf"), r.getAs[String]("postings")))).toMap
    // 'a': df=6, cf=7; top-3 = doc 1 (tf 2) then tf-1 ties by doc id asc
    assert(idx("a") === ((6L, 7L, "1,2,3")))
    // 'b': df=2, cf=3; doc 2 (tf 2) before doc 1
    assert(idx("b") === ((2L, 3L, "2,1")))
  }

  test("length trim: single-doc group survives its own degenerate bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "one two three", "a"), (2L, "one", "a"), (3L, "one two", "a"),
      (4L, "solo doc here", "b"))
      .toDF("doc_id", "text", "source")
    val kept = TextStats.lengthTrim(docs, "source", 0.25, 0.75)
    // group b: p25 == p75 == 3 -> its only doc is kept, not trimmed away
    assert(kept.filter(col("source") === "b").count() === 1)
    // group a lengths (1,2,3): p25=1.5, p75=2.5 -> only the 2-token doc
    assert(kept.filter(col("source") === "a").select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
