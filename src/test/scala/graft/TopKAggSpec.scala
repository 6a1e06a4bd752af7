package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{TopKFunctions, TopKHeap}

/** Bounded top-k aggregate: heap order, tie-breaks, merge, and equivalence
  * with the window-rank formulation on a shuffled many-partition input.
  */
class TopKAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("heap keeps the k best by (score desc, id asc); ties keep smaller id") {
    val h = new TopKHeap(3)
    Seq((1.0, 10L), (5.0, 20L), (3.0, 30L), (5.0, 15L), (0.5, 40L), (3.0, 5L))
      .foreach { case (s, id) => h.insert(s, id) }
    // top-3: 5.0@15 beats 5.0@20 on id; then 3.0@5
    assert(h.sorted.toSeq === Seq((5.0, 15L), (5.0, 20L), (3.0, 5L)))
  }

  test("serialize/deserialize round-trips through merge") {
    val a = new TopKHeap(2); a.insert(1.0, 1L); a.insert(9.0, 2L)
    val b = new TopKHeap(2); b.insert(5.0, 3L); b.insert(7.0, 4L)
    (0 until b.size).foreach(i => a.insert(b.scores(i), b.ids(i)))
    assert(a.sorted.toSeq === Seq((9.0, 2L), (7.0, 4L)))
  }

  test("aggregate matches window row_number ranking over a partitioned pair set") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 50).flatMap(q => (1 to 200).map(c =>
      (q.toLong, c.toLong, math.rint(rnd.nextDouble() * 100) / 100)))
    val df = spark.createDataset(pairs).toDF("qid", "cid", "cos")
      .repartition(8) // candidates for one qid spread over many partitions
    val viaAgg = df.groupBy(col("qid"))
      .agg(TopKFunctions.topKByScore(col("cos"), col("cid"), 5).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"), col("col.cid"), col("col.cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 250)
  }
}
