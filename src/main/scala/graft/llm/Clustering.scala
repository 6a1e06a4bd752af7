package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  * corpus-sized. This shape is bounded to k ≤ ~1k: the argmin is a
  * k-candidate expression tree and each iteration plants k×dim literals in
  * the plan, both of which degrade past that. For the large-k regime
  * (SemDeDup's k ~ √n) use [[Clustering.kMeansTwoLevel]], which keeps fine
  * centroids in a DataFrame and reaches k = kCoarse·kFine ~ 10⁶ with the
  * same determinism contract.
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
    var cents: Array[Array[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.length == k, s"need at least $k rows to seed $k clusters")
    // dimension read off the collected seeds — a separate head() job per
    // call was pure scheduling overhead
    val dim = cents(0).length
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
    graft.metrics.ScaleTelemetry.putNum("kmeans_iters", iters.toLong)
    graft.metrics.ScaleTelemetry.putNum("kmeans_k", k.toLong)
    df.withColumn("cluster", nearest(cents, col(vecCol)))
  }

  /** Two-level k-means for the large-k regime [[kMeans]] cannot reach: a
    * coarse [[kMeans]] partitions the corpus into `kCoarse` lists (the
    * expression-tree argmin, bounded at kCoarse ≤ ~1k), then `kFine`
    * centroids per list train WITHIN each list — effective k =
    * kCoarse·kFine, up to ~10⁶, without ever building a 10⁶-term argmin
    * expression or collecting k×dim doubles to the driver.
    *
    * The fine level is fully distributed: centroids live in a DataFrame
    * (`__list`, `__fid`, centroid), never as driver literals —
    *  - assignment is MAP-SIDE: the per-list centroids collapse to ONE
    *    array row per list (kCoarse rows total, each kFine×dim), join onto
    *    the corpus on `__list` (AQE broadcasts while the centroid set
    *    fits, and falls back to a shuffle join on the list key beyond
    *    that — the corpus moves at most once, never fanned out kFine-way),
    *    and the argmin runs as one array expression per vector;
    *  - the update step is ONE partial-aggregated exchange of
    *    (list, fid) × dim running means (per-dim avg columns — rows never
    *    multiply by dim, nothing posexplodes).
    * Determinism: smallest-id seeds per list (row_number over id), argmin
    * ties break toward the lower fine index (array_position takes the
    * FIRST index attaining the min), and every centroid component rounds
    * to `roundDp` decimals per iteration so partial-sum order cannot leak
    * into assignments (the [[kMeans]] contract).
    *
    * Returns the input columns plus `list` (coarse), `fine` (within-list)
    * and `cluster` = list·kFine + fine.
    */
  def kMeansTwoLevel(df: DataFrame, kCoarse: Int, kFine: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundDp: Int = 6): DataFrame = {
    require(kCoarse > 0 && kFine > 0 && iters >= 0,
      s"need kCoarse > 0, kFine > 0, iters >= 0; got $kCoarse/$kFine/$iters")
    import graft.functions.VectorFunctions.dot
    val listed = kMeans(df, kCoarse, iters, idCol, vecCol, roundDp)
      .withColumnRenamed("cluster", "__list")
    // fan a narrower-than-the-session input out once before caching: the
    // whole fine level (assign expressions, update partials) inherits this
    // partitioning, and a one-file corpus would otherwise run it on one
    // core. No-op at real corpus widths.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (listed.rdd.getNumPartitions < par) listed.repartition(par) else listed
    // the coarse assignment feeds every fine-level consumer (seeds + one
    // assign per iteration + the final assign) — persist DISK_ONLY so the
    // corpus runs the kCoarse-term argmin expression ONCE instead of
    // 3+iters times (the t15 trade: local-disk blocks, no storage-memory
    // pressure); released before returning. ALL caller columns ride along
    // so the final assignment IS the output — no corpus-scale join back.
    val vecs = spread
      .withColumn("__v", transform(col(vecCol), x => x.cast("double")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // seeds: the kFine smallest-id vectors of each list (deterministic)
    val w = Window.partitionBy(col("__list")).orderBy(col(idCol))
    var cents = vecs
      .withColumn("__fid", row_number().over(w) - 1)
      .filter(col("__fid") < kFine)
      .select(col("__list"), col("__fid"), col("__v").as("__c"))
      .localCheckpoint() // k rows; breaks lineage for the iteration loop
    val dim = cents.head().getSeq[Double](2).length
    // per-list centroid array, fid-ordered (k rows -> kCoarse rows)
    def centArrays(c: DataFrame): DataFrame =
      c.groupBy(col("__list"))
        .agg(transform(array_sort(collect_list(struct(col("__fid"), col("__c")))),
          e => e.getField("__c")).as("__cs"))
    // map-side argmin: d2 per fine centroid in one array expression; the
    // FIRST index attaining the min wins, i.e. ties break to the lower fid
    // (exactly the old min_by(struct(d2, fid)) order)
    def assign(c: DataFrame): DataFrame =
      vecs.join(centArrays(c), Seq("__list"))
        .withColumn("__d2s", transform(col("__cs"), cc =>
          dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), cc)
            + dot(cc, cc)))
        .withColumn("__fid",
          (array_position(col("__d2s"), array_min(col("__d2s"))) - 1).cast("int"))
        .drop("__cs", "__d2s")
    val meanCols = (0 until dim).map(i =>
      avg(element_at(col("__v"), i + 1)).as(s"__m$i"))
    for (_ <- 0 until iters) {
      val upd = assign(cents)
        .groupBy(col("__list"), col("__fid"))
        .agg(meanCols.head, meanCols.tail: _*)
        .select(col("__list"), col("__fid"),
          array((0 until dim).map(i => round(col(s"__m$i"), roundDp)): _*).as("__c"))
      // empty fine clusters keep their previous centroid
      cents = cents.alias("o").join(upd.alias("n"), Seq("__list", "__fid"), "left")
        .select(col("__list"), col("__fid"),
          coalesce(col("n.__c"), col("o.__c")).as("__c"))
        .localCheckpoint()
    }
    val out = assign(cents)
      .withColumnRenamed("__list", "list")
      .withColumnRenamed("__fid", "fine")
      .withColumn("cluster", col("list") * lit(kFine) + col("fine"))
      .drop("__v")
      // eager-materialize + release (the simhash pattern): the coarse
      // assignment cache must not outlive this call. (A lazy return +
      // immediate unpersist was A/B'd in r17: the single downstream action
      // then re-runs the fan-out exchange and the coarse argmin, costing
      // what the checkpoint round-trip saved — 3.12 vs 3.20 s.)
      .localCheckpoint()
    vecs.unpersist()
    out
  }

  /** SemDeDup-style within-cluster near-duplicate pruning: drop every vector
    * that has a same-cluster neighbor with cosine > `tau` and a smaller id
    * (the smallest-id representative of each similarity neighborhood always
    * survives — deterministic, order-free).
    *
    * The pair join shuffles ONCE on `cluster`, so candidate pairs are
    * co-located and bounded per cluster. Cluster granularity caps the
    * quadratic term: SemDeDup's own regime picks k ~ √n, which for a large
    * corpus is beyond [[kMeans]]' expression-tree bound (k ≤ ~1k) — use
    * [[kMeansTwoLevel]] there (effective k = kCoarse·kFine) and feed its
    * `cluster` column straight in; this function only reads `cluster`.
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
