package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for semantic curation (SemDeDup-style): k-means
  * partitions the corpus, then near-duplicate pruning runs only WITHIN each
  * cluster, turning an O(n²) all-pairs problem into k bounded ones.
  *
  * Everything is deterministic and engine-portable by construction:
  *  - init is the k vectors with the smallest ids — no RNG;
  *  - each Lloyd iteration rounds every centroid component to `roundDp`
  *    decimals (half away from zero). Partial-aggregation sum order differs
  *    between engines by ~1 ULP; the rounding absorbs it, so an independent
  *    SQL replica of the same iterations lands on bit-identical centroids
  *    and therefore identical assignments (what the s8/s9 oracles pin).
  *
  * Scale shape: centroids are k×dim driver-side literals broadcast into the
  * plan — assignment is a map-side argmin over k codegen'd
  * [[graft.functions.DotProduct]]s, no shuffle, no explode; the update step
  * is ONE partial-agg shuffle of k groups × dim running means (rows never
  * multiply by dim). The driver holds k×dim doubles per iteration, nothing
  * corpus-sized.
  */
object Clustering {

  private def roundHalfAway(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Map-side nearest-centroid column: argmin_j ||v - c_j||² computed as
    * |v|² - 2·(v·c_j) + |c_j|² (the |v|² term is shared across j and could
    * be dropped for the argmin, but keeping it makes the compared value a
    * true distance for debugging). Ties break toward the lower cluster
    * index via lexicographic struct `least`.
    */
  private def nearest(cents: Array[Array[Double]], vec: Column): Column = {
    import graft.functions.VectorFunctions.dot
    val vn2 = dot(vec, vec)
    val cands = cents.zipWithIndex.map { case (c, j) =>
      val d2 = vn2 - lit(2.0) * dot(vec, typedLit(c.toSeq)) + lit(c.map(x => x * x).sum)
      struct(d2.as("d"), lit(j).as("cl"))
    }
    if (cands.length == 1) lit(0) else least(cands: _*).getField("cl")
  }

  /** Deterministic Lloyd's k-means: `iters` assign+update rounds, then a
    * final assignment under the last centroids. Returns the input columns
    * plus `cluster` (int in [0, k)). Empty clusters keep their previous
    * centroid (cannot happen with smallest-id init unless data is tiny).
    */
  def kMeans(df: DataFrame, k: Int, iters: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", roundDp: Int = 6): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    val dim = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    var cents: Array[Array[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.length == k, s"need at least $k rows to seed $k clusters")
    val meanCols = (0 until dim).map(i =>
      avg(element_at(col("__v"), i + 1)).as(s"m$i"))
    for (_ <- 0 until iters) {
      val assigned = df.select(col(vecCol).as("__v"),
        nearest(cents, col(vecCol)).as("__cl"))
      val next = cents.map(_.clone())
      assigned.groupBy(col("__cl")).agg(meanCols.head, meanCols.tail: _*)
        .collect().foreach { r =>
          next(r.getInt(0)) =
            Array.tabulate(dim)(i => roundHalfAway(r.getDouble(i + 1), roundDp))
        }
      cents = next
    }
    df.withColumn("cluster", nearest(cents, col(vecCol)))
  }

  /** SemDeDup-style within-cluster near-duplicate pruning: drop every vector
    * that has a same-cluster neighbor with cosine > `tau` and a smaller id
    * (the smallest-id representative of each similarity neighborhood always
    * survives — deterministic, order-free).
    *
    * The pair join shuffles ONCE on `cluster`, so candidate pairs are
    * co-located and bounded per cluster; at corpus scale k is chosen ~√n
    * (SemDeDup's own regime) so cluster populations — and the quadratic
    * term — stay capped, exactly why clustering precedes the pair scan.
    */
  def semanticDedup(assigned: DataFrame, tau: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    val a = assigned.select(col("cluster"), col(idCol).as("__i"),
      col(vecCol).as("__vi"), norm(col(vecCol)).as("__ni"))
    val b = assigned.select(col("cluster"), col(idCol).as("__j"),
      col(vecCol).as("__vj"), norm(col(vecCol)).as("__nj"))
    val dropped = a.join(b, "cluster")
      .filter(col("__i") < col("__j") &&
        dot(col("__vi"), col("__vj")) / (col("__ni") * col("__nj")) > tau)
      .select(col("__j").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
  }
}
