package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.BpeTrainer

/** Edge semantics for BPE training (happy path is oracle-gated in t42). */
class BpeTrainerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("mergePair: greedy left-to-right, non-overlapping, boundary-exact") {
    assert(BpeTrainer.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(BpeTrainer.mergePair(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(BpeTrainer.mergePair(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    // multi-char symbols merge as whole tokens, never substring-matched
    assert(BpeTrainer.mergePair(Seq("th", "e s"), "e", "s") === Seq("th", "e s"))
    assert(BpeTrainer.mergePair(Seq("w", "e", "</w>"), "e", "</w>") ===
      Seq("w", "e</w>"))
  }

  test("train: deterministic, tie-break lexicographic, stops when exhausted") {
    import spark.implicits._
    val docs = Seq("a b").toDF("text")
    // both words are one char + </w>: counts tie at 1, 'a' wins rank 1,
    // then 'b'; after two merges every word is a single symbol -> stop
    val (merges, words) = BpeTrainer.train(docs, "text", numMerges = 10)
    assert(merges.map(m => (m.rank, m.left, m.right)) ===
      Seq((1, "a", "</w>"), (2, "b", "</w>")))
    val syms = words.select("syms").collect()
      .map(_.getSeq[String](0)).toSet
    assert(syms === Set(Seq("a</w>"), Seq("b</w>")))
    // determinism: a second run learns the identical merges
    val (again, _) = BpeTrainer.train(docs, "text", numMerges = 10)
    assert(again === merges)
  }

  test("train: weighted counts drive the argmax") {
    import spark.implicits._
    val docs = Seq("cc cc cc", "cd").toDF("text")
    // pair (c,c) occurs once per 'cc' token (3) vs (c,</w>) 3, (c,d) 1,
    // (d,</w>) 1: tie between (c,c) and (c,</w>) -> '</w>' < 'c' wins
    val (merges, _) = BpeTrainer.train(docs, "text", numMerges = 1)
    assert(merges.head.left === "c")
    assert(merges.head.right === "</w>")
    assert(merges.head.pairCount === 3L)
  }

  test("encode fast path reproduces full merge-list replay bit-for-bit") {
    // adversarial merge lists: chained merges, merges that never fire,
    // merge results colliding with later pair members, random soup
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    def randWord(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val words = Seq("", "a", "aa", "aaa", "aaaa", "abab", "abcabc",
      "dcba", "aabbaabb") ++ (0 until 400).map(_ => randWord(1 + rnd.nextInt(12)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeTrainer.Merge]
    var rank = 1
    def add(l: String, r: String): Unit = {
      merges += BpeTrainer.Merge(rank, l, r, 0L); rank += 1
    }
    add("a", "a"); add("b", "b"); add("a", "b"); add("aa", "a")
    add("ab", "ab"); add("c", "</w>"); add("b", "c"); add("aa", "bb")
    add("d", "c"); add("dc", "b"); add("dcb", "a"); add("aaa", "b")
    // pad with random merges over the evolving symbol space
    val symPool = scala.collection.mutable.ArrayBuffer(
      "a", "b", "c", "d", "</w>", "aa", "bb", "ab", "bc", "dc")
    (0 until 600).foreach { _ =>
      val l = symPool(rnd.nextInt(symPool.length))
      val r = symPool(rnd.nextInt(symPool.length))
      add(l, r); symPool += (l + r)
    }
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right)).toSeq
    val rankOf = BpeTrainer.ranksByPair(merges.toSeq)
    val pairByRank = merges.map(m => m.rank -> ((m.left, m.right))).toMap
    words.filter(_.nonEmpty).foreach { w =>
      assert(BpeTrainer.segmentWord(w, rankOf, pairByRank) ===
        BpeTrainer.segmentWordReplay(w, ordered),
        s"divergence on word '$w'")
    }
    // the point of the fast path: cost scales with word length, not |merges|
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    val bench = (0 until 2000).map(_ => randWord(8))
    val (_, warm1) = time(bench.foreach(w => BpeTrainer.segmentWord(w, rankOf, pairByRank)))
    val (_, warm2) = time(bench.foreach(w => BpeTrainer.segmentWordReplay(w, ordered)))
    val (_, fastMs) = time(bench.foreach(w => BpeTrainer.segmentWord(w, rankOf, pairByRank)))
    val (_, slowMs) = time(bench.foreach(w => BpeTrainer.segmentWordReplay(w, ordered)))
    info(f"fast $fastMs%.1f ms vs replay $slowMs%.1f ms over 2000 words x ${merges.size} merges (warm $warm1%.1f/$warm2%.1f)")
    assert(fastMs * 2 < slowMs,
      f"fast path ($fastMs%.1f ms) should clearly beat replay ($slowMs%.1f ms) at ${merges.size} merges")
  }

  test("encode accepts 0-indexed merge ranks (external merges.txt convention)") {
    // HuggingFace merges.txt is 0-indexed; a rank-0 first merge must fire
    val merges = Seq(
      BpeTrainer.Merge(0, "a", "b", 0L),
      BpeTrainer.Merge(1, "ab", "c", 0L),
      BpeTrainer.Merge(2, "abc", "</w>", 0L))
    val rankOf = BpeTrainer.ranksByPair(merges)
    val pairByRank = merges.map(m => m.rank -> ((m.left, m.right))).toMap
    val ordered = merges.map(m => (m.left, m.right))
    assert(BpeTrainer.segmentWord("abc", rankOf, pairByRank) === Seq("abc</w>"))
    for (w <- Seq("abc", "ababc", "cab", "abcabc"))
      assert(BpeTrainer.segmentWord(w, rankOf, pairByRank) ===
        BpeTrainer.segmentWordReplay(w, ordered), s"divergence on '$w'")
  }
}
