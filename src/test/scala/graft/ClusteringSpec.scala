package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Clustering

/** Edge cases for k-means / semantic dedup (the happy path is oracle-gated
  * in s8/s9): separable clusters converge, ties break to the lower cluster
  * index, exact duplicates always collapse to the smallest id.
  */
class ClusteringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("kMeans separates two obvious groups regardless of seed quality") {
    import spark.implicits._
    // ids 0,1 seed the clusters; both seeds sit in group A, but one Lloyd
    // iteration pulls centroid 1 to group B's mass
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.2f, 0.1f)), (2L, Seq(0.1f, 0.05f)),
      (3L, Seq(5.0f, 5.0f)), (4L, Seq(5.2f, 5.1f)), (5L, Seq(5.1f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kMeans(df, k = 2, iters = 2)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(out(0L), out(1L), out(2L)).size === 1)
    assert(Set(out(3L), out(4L), out(5L)).size === 1)
    assert(out(0L) !== out(3L))
  }

  test("kMeans with iters=0 assigns against the raw seeds, ties to lower cluster") {
    import spark.implicits._
    // equidistant point from both seeds -> cluster 0 by tie-break
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kMeans(df, k = 2, iters = 0)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("kMeansTwoLevel separates coarse groups and refines within them") {
    import spark.implicits._
    // two well-separated masses (x=0 vs x=9), each with two internal
    // sub-masses (y=0 vs y=1). Ids are interleaved so smallest-id seeding
    // starts one-per-target at BOTH levels: coarse seeds (ids 0,1) sit in
    // different masses, and each list's two smallest ids sit in different
    // sub-masses. (Lloyd from two seeds inside the same target can
    // legitimately converge to a different local optimum — that would test
    // seeding luck, not the operator.)
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(9.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(9.0f, 1.0f)),
      (4L, Seq(0.1f, 0.0f)), (5L, Seq(9.1f, 0.0f)),
      (6L, Seq(0.1f, 1.0f)), (7L, Seq(9.1f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kMeansTwoLevel(df, kCoarse = 2, kFine = 2, iters = 2)
      .select(col("vec_id"), col("list"), col("fine"), col("cluster")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // coarse level keeps the two masses apart
    assert(Set(out(0L)._1, out(2L)._1, out(4L)._1, out(6L)._1).size === 1)
    assert(Set(out(1L)._1, out(3L)._1, out(5L)._1, out(7L)._1).size === 1)
    assert(out(0L)._1 !== out(1L)._1)
    // fine level splits each mass's two sub-masses (y=0 vs y=1)
    assert(out(0L)._2 === out(4L)._2)
    assert(out(2L)._2 === out(6L)._2)
    assert(out(0L)._2 !== out(2L)._2)
    assert(out(1L)._2 === out(5L)._2)
    assert(out(3L)._2 === out(7L)._2)
    assert(out(1L)._2 !== out(3L)._2)
    // cluster id arithmetic: list * kFine + fine
    out.values.foreach { case (l, f, c) => assert(c === l * 2 + f) }
  }

  test("kMeansTwoLevel is deterministic across independent runs") {
    import spark.implicits._
    val r = new java.util.Random(5L)
    val df = (0L until 40L).map(i =>
      (i, Seq.fill(4)(r.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    def run() = Clustering.kMeansTwoLevel(df, kCoarse = 3, kFine = 3, iters = 2)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run() === run())
  }

  test("semanticDedup keeps the smallest id of an exact-duplicate set and spares distinct vectors") {
    import spark.implicits._
    val v = Seq(1.0f, 0.0f, 0.0f)
    val w = Seq(0.0f, 1.0f, 0.0f)
    val df = Seq((10L, v), (20L, v), (30L, v), (40L, w))
      .toDF("vec_id", "embedding")
    val kept = Clustering.semanticDedup(
        Clustering.kMeans(df, k = 1, iters = 1), tau = 0.9)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L, 40L))
  }
}
