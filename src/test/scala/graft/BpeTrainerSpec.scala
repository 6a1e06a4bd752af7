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
}
