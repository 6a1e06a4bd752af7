package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, both deterministic:
  *  - `bruteForceTopK`: exact cosine top-k. The (small) query set is
  *    broadcast; the corpus is scanned once; per-key top-k is computed with a
  *    two-stage aggregation (partial top-k per partition, then merge), so no
  *    O(|Q|x|C|) row set ever crosses a shuffle boundary un-reduced.
  *  - `lshTopK`: random-hyperplane LSH bucketing (sign bits of seeded
  *    Gaussian projections). Queries only meet corpus vectors in their bucket
  *    (+ optional multi-probe neighbors), the scale path for huge corpora:
  *    shuffle keys are (bucket), cost O(n) rows.
  */
object Similarity {

  /** Cosine similarity between two float/double arrays via the native
    * [[graft.functions.DotProduct]] expression — a codegen'd scalar loop,
    * not interpreted higher-order functions (identical IEEE result:
    * sequential double accumulation). Prefer precomputing each side's norm
    * once when the same vector meets many partners (see bruteForceTopK).
    */
  def cosineCol(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions.{dot, norm}
    dot(a, b) / (norm(a) * norm(b))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Queries-side row cap for the exact path: the broadcast query set must
    * stay driver/executor-memory sized; beyond this, O(|Q|·|C|) is a misuse
    * and [[lshTopK]] is the scale path.
    */
  val BruteForceMaxQueries: Long = 100000L

  /** Fan a SMALL stream side out to the session's parallelism before an
    * O(|Q|·|C|) scoring pass: a corpus that arrives in fewer partitions
    * than cores (one small parquet file is ONE partition) would run the
    * whole pair loop on one core — the broadcast join adds no exchange
    * that AQE could re-split. Conditional, so a corpus already wider than
    * the core count (every real 100 TB input) never pays the extra
    * exchange; the shuffle this adds is by construction of a
    * fewer-partitions-than-cores frame, i.e. small.
    */
  private def fanOutSmall(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (qid, rank, cid, cosine).
    *
    * The documented EXACT path: cost is O(|Q|·|C|) with the query side
    * broadcast. Guarded — a query set larger than
    * [[BruteForceMaxQueries]] is rejected so the all-pairs plan can't be
    * reached by accident; use [[lshTopK]] for large query sets.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nq = queries.limit((BruteForceMaxQueries + 1).toInt).count()
    require(nq <= BruteForceMaxQueries,
      s"bruteForceTopK: query side has > $BruteForceMaxQueries rows; " +
        "this exact path is O(|Q|*|C|) — use lshTopK for large query sets")
    import graft.functions.VectorFunctions.{dot, norm}
    // norms are computed ONCE per row on each side (|Q| + |C| passes), not
    // per pair (|Q|·|C| passes); float arrays feed the dot product directly
    // — no casted copy of every vector
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = fanOutSmall(corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv"))))
    val pairs = c.crossJoin(broadcast(q))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("qid"), col("cid"), col("cos"))
    finishTopK(pairs, k)
  }

  /** Shared top-k finisher over a scored (qid, cid, cos) pair set. With
    * long ids it runs the bounded [[graft.functions.TopKByScore]] aggregate:
    * map-side partial top-k means only k entries per (query, map task)
    * cross the shuffle — for brute-force scoring that turns a |Q|·|C|-row
    * exchange+sort into a |Q|·k·P one. Other id types fall back to the
    * two-stage window rank. Both orders are (cos desc, cid asc), so results
    * are identical and tie-stable.
    */
  private def finishTopK(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val ranked = pairs.schema("cid").dataType match {
      case LongType =>
        pairs.groupBy(col("qid"))
          .agg(graft.functions.TopKFunctions.topKByScore(col("cos"), col("cid"), k).as("top"))
          .select(col("qid"), posexplode(col("top")))
          .select(col("qid"), col("col.cid").as("cid"), col("col.cos").as("cos"),
            (col("pos") + 1).cast("int").as("rank"))
      case _ =>
        topKPerKey(pairs, "qid", col("cos").desc, col("cid").asc, k)
    }
    ranked.withColumn("cosine", round(col("cos"), 6)).drop("cos")
  }

  /** Two-stage distributed top-k: partial top-k inside each input partition
    * (window keyed by (key, partition id) — no shuffle moves the full pair
    * set), then a final top-k over <= k rows per (key, partition). Ties
    * broken by `tie` for determinism.
    */
  def topKPerKey(df: DataFrame, key: String, ord: Column, tie: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fin = Window.partitionBy(col(key)).orderBy(ord, tie)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__prn", row_number().over(
        Window.partitionBy(col(key), col("__pid")).orderBy(ord, tie)))
      .filter(col("__prn") <= k)
      .drop("__pid", "__prn")
      .withColumn("rank", row_number().over(fin))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `nbits` x `dim`, seeded. */
  def hyperplanes(dim: Int, nbits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def signBucket(vec: Seq[Double], planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var i = 0
    while (i < planes.length) {
      var dot = 0.0
      val p = planes(i)
      var j = 0
      while (j < p.length && j < vec.length) { dot += p(j) * vec(j); j += 1 }
      if (dot >= 0) bucket |= (1 << i)
      i += 1
    }
    bucket
  }

  /** LSH-bucketed approximate top-k. Multi-probe: each query also probes the
    * `probes` buckets at hamming distance 1 with the weakest hyperplane
    * margins, trading recall for fan-out.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nbits: Int = 8,
              probes: Int = 3, idCol: String = "vec_id",
              vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val qd = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val cd = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    // dim from schema is unknown until runtime; capture planes lazily per-row
    val planesBySeed = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
    def planesFor(dim: Int): Array[Array[Double]] = {
      planesBySeed.computeIfAbsent(dim, d => hyperplanes(d, nbits, seed))
    }
    val bucketU = udf((v: Seq[Double]) => signBucket(v, planesFor(v.length)))
    val probeU = udf((v: Seq[Double]) => {
      val planes = planesFor(v.length)
      val base = signBucket(v, planes)
      val margins = planes.indices.map { i =>
        var dot = 0.0
        var j = 0
        while (j < planes(i).length && j < v.length) { dot += planes(i)(j) * v(j); j += 1 }
        (math.abs(dot), i)
      }.sortBy(_._1).take(probes)
      (base +: margins.map { case (_, i) => base ^ (1 << i) }).distinct.toArray
    })
    // fan the corpus side out BEFORE bucketing + scoring: when AQE
    // broadcasts the query side, the whole pipeline (bucket UDF + join +
    // cosine + the (qid, cid) partial aggregation) inherits the corpus
    // scan's partitioning — one small parquet file = ONE partition = a
    // single-threaded scoring stage (measured: the whole leg serialized on
    // one core). At real corpus widths fanOutSmall is a no-op.
    val cb = fanOutSmall(cd).withColumn("bucket", bucketU(col("cv")))
    val qb = qd.withColumn("bucket", explode(probeU(col("qv"))))
    // no broadcast hint: the query side may be the whole corpus (self near-
    // dup search), so let AQE choose from its runtime size
    val pairs = cb.join(qb, Seq("bucket"))
      .withColumn("cos", cosineCol(col("qv"), col("cv")))
      .select(col("qid"), col("cid"), col("cos"))
      .groupBy("qid", "cid").agg(max("cos").as("cos")) // dedup multi-probe hits
    finishTopK(pairs, k)
  }

  /** Per-label kNN agreement from ANY (qid, cid) top-k frame — leave-one-out
    * majority vote per query, agreement vs the query's own label aggregated
    * per class. Output: (label, n, n_agree).
    *
    * Decoupled from the neighbor search on purpose: feed it
    * [[bruteForceTopK]] for an exact probe on a small labeled set, or
    * [[ivfTopK]]/[[lshTopK]] for the 100 TB path — the aggregation itself is
    * two shuffle joins on (qid)/(cid) plus a <=k-row-per-query vote window,
    * so it scales with whatever produced the top-k frame. Self-matches
    * (qid == cid) are dropped here, so passing top-(k+1) from a self-search
    * yields exactly k voting neighbors. Vote ties break deterministically
    * (highest count, then lowest label).
    */
  def knnLabelAgreement(topK: DataFrame, labels: DataFrame,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lbl = labels.select(col(idCol), col(labelCol))
    val votes = topK.filter(col("qid") =!= col("cid"))
      .join(lbl.withColumnRenamed(idCol, "qid").withColumnRenamed(labelCol, "qlabel"), "qid")
      .join(lbl.withColumnRenamed(idCol, "cid").withColumnRenamed(labelCol, "nlabel"), "cid")
      .groupBy(col("qid"), col("qlabel"), col("nlabel"))
      .agg(count(lit(1)).as("c"))
    val pred = votes
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nlabel").asc)))
      .filter(col("vr") === 1)
    pred.groupBy(col("qlabel").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L)).as("n_agree"))
  }

  // ------------------------------------------------------------------- IVF

  /** Spherical k-means on a driver-side sample: normalize, assign by max
    * dot, mean + renormalize. Deterministic (seeded init over the ordered
    * sample). Returns unit-norm centroids.
    */
  def trainCentroids(sample: Array[Array[Double]], nlist: Int,
      iters: Int = 5, seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty centroid training sample")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val data = sample.map(normalize)
    val rnd = new java.util.Random(seed)
    var centroids = Array.tabulate(math.min(nlist, data.length))(i =>
      data(if (i == 0) 0 else rnd.nextInt(data.length)).clone())
    // allocation-free argmax: the training loop is driver-side
    // samples × nlist × dim × iters — at nlist 32+ the boxed
    // Seq-indexing + tuple-sort path in nearestCentroids costs seconds
    def nearestOne(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        var dot = 0.0; var j = 0
        while (j < c.length) { dot += c(j) * v(j); j += 1 }
        if (dot > bestDot) { bestDot = dot; best = i }
        i += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](data(0).length))
      val counts = new Array[Int](centroids.length)
      data.foreach { v =>
        val c = nearestOne(v, centroids)
        var j = 0
        while (j < v.length) { sums(c)(j) += v(j); j += 1 }
        counts(c) += 1
      }
      centroids = centroids.indices.map { i =>
        if (counts(i) == 0) centroids(i) // empty list keeps its centroid
        else normalize(sums(i))
      }.toArray
    }
    centroids
  }

  /** Indices of the `n` centroids with the largest dot product. */
  def nearestCentroids(v: Seq[Double], centroids: Array[Array[Double]],
      n: Int): Array[Int] = {
    val scored = centroids.indices.map { i =>
      val c = centroids(i)
      var dot = 0.0
      var j = 0
      while (j < c.length && j < v.length) { dot += c(j) * v(j); j += 1 }
      (-dot, i)
    }.sorted
    scored.take(math.min(n, centroids.length)).map(_._2).toArray
  }

  /** IVF (inverted-file) approximate top-k — the centroid-bucketed ANN
    * scale path: coarse centroids train on a bounded deterministic sample
    * (TakeOrdered — never a full sort), every corpus vector joins its
    * nearest centroid's list in one map, queries probe the `nprobe`
    * nearest lists and rescore exactly inside them. Average per-query cost
    * is |corpus| · nprobe / nlist instead of |corpus|.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, sampleSize: Int = 10000, iters: Int = 5,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    val cd = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    val qd = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    // TakeOrderedAndProject: bounded, deterministic, no global sort
    val sample = cd.sort(col("cid")).limit(sampleSize)
      .select(col("cv")).collect().map(_.getSeq[Double](0).toArray)
    val centroids = trainCentroids(sample, nlist, iters, seed)
    val assignU = udf((v: Seq[Double]) => nearestCentroids(v, centroids, 1).head)
    val probeU = udf((v: Seq[Double]) => nearestCentroids(v, centroids, nprobe))
    // fanOutSmall: same single-task-scoring fix as lshTopK — a one-file
    // corpus otherwise runs the assignment UDF and the whole probe scoring
    // on one core once AQE broadcasts the (small) probe side
    val cb = fanOutSmall(cd).withColumn("list", assignU(col("cv")))
    val qb = qd.withColumn("list", explode(probeU(col("qv"))))
    val pairs = cb.join(qb, Seq("list"))
      .withColumn("cos", cosineCol(col("qv"), col("cv")))
      .select(col("qid"), col("cid"), col("cos"))
      .groupBy("qid", "cid").agg(max("cos").as("cos"))
    finishTopK(pairs, k)
  }

  // -------------------------------------------------------------------- PQ

  private def unitNorm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Product-quantization top-k with exact re-rank (the FAISS PQ/ADC shape):
    * per-subspace codebooks train on a bounded deterministic sample, every
    * corpus vector encodes ONCE to `m` centroid indices (bytes on disk —
    * dim·4 / m compression, 32× at dim=64/m=8, which is what lets a 100 TB
    * embedding corpus fit an in-memory serving tier), queries broadcast a
    * flat m·ksub ADC lookup table, and scoring a coded vector is m array
    * lookups + adds instead of dim multiplies. The top `refine·k` ADC
    * candidates per query re-rank by exact cosine, so the output ordering is
    * exact over the candidate set.
    *
    * Corpus rows never shuffle: ADC scores are map-side against the
    * broadcast LUTs and only k·partitions rows per query reach the rank
    * exchange (same partial-top-k path as the exact ranker). Encoding cost
    * (dim·ksub multiplies per row) is the one-time index build. Guarded by
    * [[BruteForceMaxQueries]] on the query side like the exact path; at
    * larger query scale use [[ivfPqTopK]], which drops the same codes into
    * the IVF list layout and replaces the broadcast crossJoin with a join
    * on the list key.
    *
    * Output: (qid, rank, cid, cosine), rank 1..k by exact cosine.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, refine: Int = 4, sampleSize: Int = 10000,
      iters: Int = 10, idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val nq = queries.limit((BruteForceMaxQueries + 1).toInt).count()
    require(nq <= BruteForceMaxQueries,
      s"pqTopK: query side has > $BruteForceMaxQueries rows; " +
        "compose the PQ codes with the IVF list layout for large query sets")
    val cd = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    val qd = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    // bounded, deterministic training sample (TakeOrdered — no global sort)
    val sample = cd.sort(col("cid")).limit(sampleSize)
      .select(col("cv")).collect().map(r => unitNorm(r.getSeq[Double](0).toArray))
    val codebooks = Quantize.trainPqCodebooks(sample, m, ksub, iters, seed)
    val encodeU = udf((v: Seq[Double]) => Quantize.pqEncode(unitNorm(v.toArray), codebooks))
    val lutU = udf((v: Seq[Double]) => Quantize.adcTable(unitNorm(v.toArray), codebooks))
    val adcU = udf((lut: Seq[Double], codes: Seq[Int]) => {
      var s = 0.0; var j = 0
      while (j < codes.length) { s += lut(j * ksub + codes(j)); j += 1 }
      s
    })
    // fan out BEFORE the encode so the (expensive) PQ encoding UDF
    // parallelizes on a narrow corpus scan too — no-op at real widths
    val coded = fanOutSmall(cd)
      .withColumn("codes", encodeU(col("cv"))).select("cid", "codes")
    val qlut = qd.select(col("qid"), lutU(col("qv")).as("lut"))
    val cand = topKPerKey(
      coded.crossJoin(broadcast(qlut))
        .withColumn("adc", adcU(col("lut"), col("codes")))
        .select(col("qid"), col("cid"), col("adc")),
      "qid", col("adc").desc, col("cid").asc, refine * k)
      .select(col("qid"), col("cid"))
    // exact re-rank of the candidate set on the original float vectors
    import graft.functions.VectorFunctions.{dot, norm}
    val cvx = corpus.select(col(idCol).as("cid"), col(vecCol).as("cvx"))
      .withColumn("cn", norm(col("cvx")))
    val qvx = queries.select(col(idCol).as("rqid"), col(vecCol).as("qvx"))
      .withColumn("qn", norm(col("qvx")))
    val rescored = cand.join(cvx, Seq("cid"))
      .join(broadcast(qvx), col("qid") === col("rqid"))
      .withColumn("cos", dot(col("qvx"), col("cvx")) / (col("qn") * col("cn")))
      .select(col("qid"), col("cid"), col("cos"))
    topKPerKey(rescored, "qid", col("cos").desc, col("cid").asc, k)
      .select(col("qid"), col("rank"), col("cid"), col("cos").as("cosine"))
  }

  /** IVF-PQ: the PQ codes dropped into the IVF list layout — the
    * composition [[pqTopK]]'s scaladoc names, and the variant that serves
    * LARGE query sets: corpus vectors are bucketed by nearest coarse
    * centroid and encoded once as m residual-codebook indices (codes are
    * dim·4/m× smaller than the floats — the in-memory serving layout), and
    * queries meet only their `nprobe` probed lists through a JOIN on the
    * list key — no crossJoin, no corpus-side broadcast, and therefore no
    * [[BruteForceMaxQueries]] guard: both sides shuffle on `list`, average
    * per-query ADC work is |corpus|·nprobe/nlist lookup-adds.
    *
    * Encoding is residual (FAISS IVFPQ): each corpus vector stores codes
    * for v̂ − c_list, so the quantizer only has to cover the within-list
    * offset, and dot(q̂, v̂) ≈ dot(q̂, c_list) + ADC(q̂-LUT, codes) — the
    * first term is scalar per (query, list), the second is m lookups. The
    * top `refine·k` ADC candidates per query re-rank by exact cosine on
    * the original floats (bounded: |Q|·refine·k rows through two id
    * joins), so output ordering is exact over the candidate set.
    *
    * Output: (qid, rank, cid, cosine), rank 1..k by exact cosine.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      refine: Int = 4, sampleSize: Int = 10000, iters: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    def sub(a: Array[Double], b: Array[Double]): Array[Double] =
      Array.tabulate(a.length)(i => a(i) - b(i))
    def dotArr(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val cd = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    val qd = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    // bounded, deterministic training sample (TakeOrdered — no global sort)
    val sample = cd.sort(col("cid")).limit(sampleSize)
      .select(col("cv")).collect().map(r => unitNorm(r.getSeq[Double](0).toArray))
    val centroids = trainCentroids(sample, nlist, 5, seed)
    val codebooks = Quantize.trainPqCodebooks(
      sample.map(v => sub(v, centroids(nearestCentroids(v, centroids, 1).head))),
      m, ksub, iters, seed)
    // corpus side: one map — nearest list + residual codes, nothing else
    // ever touches the full-width vector until the re-rank
    val encodeU = udf((v: Seq[Double]) => {
      val u = unitNorm(v.toArray)
      val l = nearestCentroids(u, centroids, 1).head
      (l, Quantize.pqEncode(sub(u, centroids(l)), codebooks))
    })
    // fanOutSmall: parallelize the (expensive) residual encode and the ADC
    // scoring on a narrow corpus scan — no-op at real corpus widths
    val coded = fanOutSmall(cd).withColumn("lc", encodeU(col("cv")))
      .select(col("cid"), col("lc._1").as("list"), col("lc._2").as("codes"))
    // query side: nprobe rows per query, each carrying the scalar
    // query·centroid term and the m·ksub ADC LUT for that query
    val probeU = udf((v: Seq[Double]) => {
      val u = unitNorm(v.toArray)
      nearestCentroids(u, centroids, nprobe).toSeq.map { l =>
        (l, dotArr(u, centroids(l)), Quantize.adcTable(u, codebooks).toSeq)
      }
    })
    val qb = qd.withColumn("p", explode(probeU(col("qv"))))
      .select(col("qid"), col("p._1").as("list"), col("p._2").as("qc"),
        col("p._3").as("lut"))
    val adcU = udf((lut: Seq[Double], codes: Seq[Int]) => {
      var s = 0.0; var j = 0
      while (j < codes.length) { s += lut(j * ksub + codes(j)); j += 1 }
      s
    })
    // each corpus vector lives in exactly one list, so (qid, cid) pairs are
    // unique — no dedup aggregation needed before the partial top-k
    val cand = topKPerKey(
      coded.join(qb, Seq("list"))
        .withColumn("adc", col("qc") + adcU(col("lut"), col("codes")))
        .select(col("qid"), col("cid"), col("adc")),
      "qid", col("adc").desc, col("cid").asc, refine * k)
      .select(col("qid"), col("cid"))
    // exact re-rank on the original floats; plain id joins (AQE broadcasts
    // the k-bounded candidate side when it fits — no unconditional
    // query-side broadcast, unlike the guarded pqTopK)
    import graft.functions.VectorFunctions.{dot, norm}
    val cvx = corpus.select(col(idCol).as("cid"), col(vecCol).as("cvx"))
      .withColumn("cn", norm(col("cvx")))
    val qvx = queries.select(col(idCol).as("rqid"), col(vecCol).as("qvx"))
      .withColumn("qn", norm(col("qvx")))
    val rescored = cand.join(cvx, Seq("cid"))
      .join(qvx, col("qid") === col("rqid"))
      .withColumn("cos", dot(col("qvx"), col("cvx")) / (col("qn") * col("cn")))
      .select(col("qid"), col("cid"), col("cos"))
    topKPerKey(rescored, "qid", col("cos").desc, col("cid").asc, k)
      .select(col("qid"), col("rank"), col("cid"), col("cos").as("cosine"))
  }

  /** Reciprocal-rank fusion of several (qid, cid, rank) top-k frames —
    * the standard score-free ensemble for hybrid retrieval (ANN + ANN, or
    * lexical + dense): fused(q, c) = Σ_r 1/(rrfK + rank_r(q, c)) over the
    * rankers that surfaced the candidate. Rank-based, so rankers with
    * incomparable score scales fuse without calibration.
    *
    * Contributions sum by a ranker-tag-ordered left fold (not a plain
    * `sum`), so the double result is partition-order independent; ties
    * break by cid. Cost: one union + one (qid, cid) aggregation over
    * frames that are already k-bounded per query — nothing corpus-scale.
    *
    * Output: (qid, rank, cid, rrf), rank 1..k by fused score.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val tagged = rankings.map { case (tag, df) =>
      df.select(col("qid"), col("cid"), lit(tag).as("__rk"),
        (lit(1.0) / (col("rank") + lit(rrfK))).as("__s"))
    }
    val fused = tagged.reduce(_ unionByName _)
      .groupBy(col("qid"), col("cid"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__rk"), col("__s")))),
        lit(0.0), (acc, x) => acc + x.getField("__s")).as("rrf"))
    topKPerKey(fused, "qid", col("rrf").desc, col("cid").asc, k)
      .select(col("qid"), col("rank"), col("cid"), col("rrf"))
  }

  /** Matryoshka (MRL-style) two-stage retrieval: score candidates on the
    * FIRST `dims` dimensions of the embedding (matryoshka-trained models
    * front-load information, so a prefix is a usable coarse embedding),
    * keep `k * overfetch` per query, then re-rank those candidates with the
    * exact full-dimension cosine and emit the top k.
    *
    * Stage 1 moves `dims/D` of the vector bytes through the scoring path —
    * at 100 TB that is the difference between shuffling the full corpus'
    * vectors and a prefix slice; stage 2 touches only |Q|·k·overfetch rows,
    * joined back to the corpus by id (AQE broadcasts the candidate side).
    * Recall is governed by `overfetch` exactly like PQ's re-rank
    * ([[pqTopK]]); `candidates` defaults to the exact truncated scorer
    * (guarded by [[BruteForceMaxQueries]]) but accepts any (qid, cid)
    * generator for corpus-scale stage 1 — e.g. [[ivfTopK]] or [[lshTopK]]
    * run over the same prefix slice, which is how the operator composes at
    * 100 TB: the bucketed ANN does the corpus-scale winnowing on `dims/D`
    * of the bytes, and only the k·overfetch survivors per query touch the
    * full-width vectors.
    */
  def matryoshkaTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dims: Int, overfetch: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      candidates: Option[DataFrame] = None): DataFrame = {
    require(dims > 0 && overfetch > 0, "dims and overfetch must be positive")
    def truncated(df: DataFrame) =
      df.select(col(idCol), slice(col(vecCol), 1, dims).as(vecCol))
    val cand = candidates
      .getOrElse(bruteForceTopK(truncated(queries), truncated(corpus),
        k * overfetch, idCol, vecCol))
      .select(col("qid"), col("cid"))
    import graft.functions.VectorFunctions.{dot, norm}
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val rescored = cand.join(c, "cid").join(broadcast(q), "qid")
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("qid"), col("cid"), col("cos"))
    finishTopK(rescored, k)
  }
}
