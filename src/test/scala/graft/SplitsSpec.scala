package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Splits

/** Edge semantics for split hygiene (happy path is oracle-gated in t41). */
class SplitsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hashSplit: deterministic, exhaustive, weights hold in expectation") {
    import spark.implicits._
    val ids = (0L until 20000L).toDF("id")
    val w = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val a = Splits.hashSplit(ids, col("id"), w, seed = 7L)
    val b = Splits.hashSplit(ids, col("id"), w, seed = 7L)
    // same seed -> identical assignment; every row gets exactly one split
    assert(a.except(b).count() === 0L)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L)
    assert(counts.keySet === Set("train", "valid", "test"))
    // LCG over sequential keys: proportions within 2% absolute
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("valid") / 20000.0 - 0.1) < 0.02)
    // a different seed moves rows between splits
    val c = Splits.hashSplit(ids, col("id"), w, seed = 8L)
    assert(a.except(c).count() > 0L)
  }

  test("textKey pins exact duplicates (and only key-equal rows) together") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), // exact twins
      (3L, "totally different words here")).toDF("id", "text")
    val w = Seq("a" -> 0.5, "b" -> 0.5)
    // any seed: twins share the key, hence the split
    (0L until 20L).foreach { seed =>
      val sp = Splits.hashSplit(docs, Splits.textKey(col("text")), w, seed)
        .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(sp(1L) === sp(2L))
    }
  }

  test("exactLeaks and pairLeaks count boundary crossings") {
    import spark.implicits._
    val assigned = Seq(
      (1L, "dup text", "train"), (2L, "dup text", "test"), // leaked family
      (3L, "safe text", "train"), (4L, "safe text", "train"),
      (5L, "solo", "valid")).toDF("doc_id", "text", "split")
    val leaks = Splits.exactLeaks(assigned, "text").collect()
    assert(leaks.head.getLong(0) === 1L)
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val pl = Splits.pairLeaks(pairs, assigned, "doc_id")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pl === Set((1L, 2L), (1L, 5L))) // (3,4) stays inside train
  }
}
