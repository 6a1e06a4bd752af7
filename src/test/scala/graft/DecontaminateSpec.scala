package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Decontaminate

/** The Bloom prefilter must never change the answer — only how much data
  * reaches the confirmation join (the happy path vs DuckDB is gate t25).
  */
class DecontaminateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bloom-prefiltered contamination matches exact overlap, docs under n grams never flag") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"g$i").mkString(" ")
    val bench = Seq((1L, s"intro $shared outro")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, s"prefix $shared suffix words here"),       // contains the shared 8-gram
      (11L, "totally unrelated words that never match anything at all"),
      (12L, "short doc"),                               // < 8 tokens: zero grams
      (13L, (1 to 7).map(i => s"g$i").mkString(" "))    // 7-token prefix, no full gram
    ).toDF("doc_id", "text")
    val hits = Decontaminate.contaminatedIds(corpus, bench, n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(10L))
    // tiny fpp stresses the sketch sizing path; answer unchanged
    val hitsTight = Decontaminate.contaminatedIds(corpus, bench, n = 8, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(hitsTight === Set(10L))
  }
}
