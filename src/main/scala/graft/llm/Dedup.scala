package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Murmur3

/** Deduplication operators for large-scale corpus curation.
  *
  * Scale notes (the 100 TB contract):
  *  - `exact` is one hash-partitioned shuffle on the key columns — identical
  *    cost shape to a groupBy; AQE handles skewed keys.
  *  - `minHashLsh` never materializes the O(n^2) pair space: docs meet only
  *    inside an LSH band bucket (explode -> shuffle on (band, hash) -> min per
  *    bucket), so cost is O(n * bands) rows shuffled.
  *  - `nearDupPairs*` verify candidates with an exact Jaccard join only on
  *    bucket-collision pairs.
  */
object Dedup {

  /** Keep exactly one row per distinct key tuple — the one with the smallest
    * `tieBreaker` value (deterministic representative selection).
    */
  def exact(df: DataFrame, keys: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tieBreaker).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact n-gram Jaccard similarity between two string columns — distinct
    * character n-grams, |∩| / |∪|. Pure codegen'd array ops (no UDF), so it
    * rescales to rescoring billions of LSH candidate pairs. n=1 matches
    * DuckDB's `jaccard()` exactly (the oracle for t11).
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // one-pass split into a char array — substr(i, n) per index would
    // re-walk the UTF-8 bytes from the start each call (O(len²) per row)
    def grams(c: Column): Column = {
      val chars = split(c, "")
      val g =
        if (n == 1) chars
        else transform(sequence(lit(1), size(chars) - (n - 1)),
          i => concat_ws("", slice(chars, i, lit(n))))
      when(length(c) < n, array().cast("array<string>"))
        .otherwise(array_distinct(g))
    }
    val ga = grams(a)
    val gb = grams(b)
    val uni = size(array_union(ga, gb))
    when(uni === 0, lit(0.0))
      .otherwise(size(array_intersect(ga, gb)).cast("double") / uni.cast("double"))
  }

  // ---------------------------------------------------------------- MinHash

  /** Character shingles of length k over the lowercased, space-normalized text. */
  def shingles(text: String, k: Int): Set[Int] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (t.length < k) Set(Murmur3.hash(t.getBytes("UTF-8"), 0))
    else (0 to t.length - k).iterator
      .map(i => Murmur3.hash(t.substring(i, i + k).getBytes("UTF-8"), 0))
      .toSet
  }

  /** Universal-hash coefficients, deterministic (fixed seed) and cached per
    * numPerm: regenerating them per ROW inside the signature UDF was pure
    * wasted CPU on the hot path.
    */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefficients(numPerm: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numPerm, { n =>
      val rnd = new java.util.Random(42)
      (Array.fill(n)(rnd.nextLong() | 1L), Array.fill(n)(rnd.nextLong()))
    })

  /** Single-pass whitespace collapse + lowercase (the allocation-free
    * equivalent of `toLowerCase.replaceAll("\\s+", " ").trim`).
    */
  private def normalizeWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevSpace = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      } else { sb.append(Character.toLowerCase(c)); prevSpace = false }
      i += 1
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }

  /** murmur3-style finalizer to avalanche the rolling hash. */
  private def fmix(h0: Int): Int = {
    var h = h0
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** numPerm minhash values via universal hashing h_i(x) = a_i*x + b_i over
    * shingle hashes. The shingle hash is a k-char ROLLING polynomial hash
    * (avalanched): O(1) per window slide, zero allocation on the hot path —
    * and no shingle-set dedup, because duplicate shingles cannot change a
    * min. Deterministic (fixed seed).
    */
  def minHashSignature(text: String, k: Int, numPerm: Int): Array[Long] = {
    val (as, bs) = coefficients(numPerm)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val t = normalizeWs(if (text == null) "" else text)

    def update(h: Int): Unit = {
      val x = h.toLong & 0xffffffffL
      var i = 0
      while (i < numPerm) {
        val v = as(i) * x + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }

    if (t.length < k) { update(Murmur3.hash(t.getBytes("UTF-8"), 0)); return sig }
    val B = 31
    var powK = 1 // B^(k-1)
    var j = 0
    while (j < k - 1) { powK *= B; j += 1 }
    var h = 0
    var i = 0
    while (i < k) { h = h * B + t.charAt(i); i += 1 }
    update(fmix(h))
    while (i < t.length) {
      h = (h - t.charAt(i - k) * powK) * B + t.charAt(i)
      update(fmix(h))
      i += 1
    }
    sig
  }

  /** Estimated Jaccard similarity from two minhash signatures. */
  def sigSimilarity(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  /** Band-bucket LSH clustering via min-label propagation to a fixpoint:
    * docs sharing any (band, bandHash) bucket end up in the same cluster,
    * and chained near-dup groups (a~b, b~c, no a-bucket shared with c)
    * converge through iteration — distributed connected components on the
    * doc-bucket bipartite graph, 2 shuffles per round, O(graph diameter)
    * rounds (near-dup chains are shallow in practice).
    *
    * Returns (idCol, cluster_id).
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 5, numPerm: Int = 64, bands: Int = 16,
                 maxIters: Int = 10): DataFrame = {
    require(numPerm % bands == 0)
    val rows = numPerm / bands
    val sigUdf = udf((t: String) =>
      if (t == null) Array.empty[Long] else minHashSignature(t, shingleK, numPerm))
    // NOT fanned out: A/B'd twice (r16, r17 after the cache-race fix) — the
    // wider signature stage wins ~0.4 s but the cached bucket frame inherits
    // the width and every CC round's joins repay it (t37 warm 3.60 -> 3.79)
    val withSig = df.select(col(idCol), sigUdf(col(textCol)).as("__sig"))
    // band hash = murmur over the band's row values
    val bandUdf = udf((sig: Seq[Long]) =>
      if (sig.isEmpty) Array.empty[Long]
      else sig.grouped(rows).zipWithIndex.map { case (band, bi) =>
        val bb = java.nio.ByteBuffer.allocate(band.length * 8)
        band.foreach(bb.putLong)
        (bi.toLong << 32) | (Murmur3.hash(bb.array, 7).toLong & 0xffffffffL)
      }.toArray)
    // signatures are the expensive part — materialize buckets once and reuse
    // across propagation rounds. persist() alone is lazy: the FIRST consumer
    // is a self-join whose two AQE shuffle stages materialize concurrently,
    // racing the cache write and running the signature UDF twice. count()
    // right here forces one materialization (and is the scale-telemetry
    // bucket-row count anyway).
    val buckets = withSig
      .select(col(idCol), explode(bandUdf(col("__sig"))).as("__bucket"))
      .persist()
    // per-round shuffle volume ≈ the bucket rows each propagation joins;
    // recorded with the round trajectory so a super-linear point on the
    // scale curve is attributable to either chain depth (more rounds) or
    // bucket growth (bigger rounds)
    val bucketRows = buckets.count()

    // convergence sum + doc count ride the checkpoint action via observe()
    // (CollectMetrics): zero extra jobs per round where a separate
    // agg-and-first job ran before
    def checkpointWithSum(l: DataFrame): (DataFrame, Long, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val out = l.observe(obs, sum(col("cluster_id")).as("__s"),
        count(lit(1)).as("__n")).localCheckpoint()
      val m = obs.get
      (out, Option(m("__s")).map(_.asInstanceOf[Number].longValue).getOrElse(0L),
        m("__n").asInstanceOf[Number].longValue)
    }

    // localCheckpoint (not persist): truncates the logical plan each round,
    // keeping analyzer/optimizer cost flat — nested join-agg lineage over N
    // rounds otherwise makes planning itself quadratic in N
    var (labels, prevSum, nDocs) = checkpointWithSum(buckets
      .join(buckets.groupBy(col("__bucket")).agg(min(col(idCol)).as("__bmin")), "__bucket")
      .groupBy(col(idCol))
      .agg(min(col("__bmin")).as("cluster_id")))
    // min-propagation labels only ever decrease, so the label sum strictly
    // decreases until the fixpoint — a scalar convergence check, no join
    val roundSums = scala.collection.mutable.ArrayBuffer(prevSum)
    var iter = 1
    var converged = false
    while (!converged && iter < maxIters) {
      val bucketMin = buckets.join(labels, idCol)
        .groupBy(col("__bucket")).agg(min(col("cluster_id")).as("__bmin"))
      val propagated = buckets.join(bucketMin, "__bucket")
        .groupBy(col(idCol))
        .agg(min(col("__bmin")).as("cluster_id"))
      // pointer jump: adopt the representative's own (smaller-or-equal)
      // label, turning linear chain convergence into logarithmic
      val reps = propagated.select(col(idCol).as("cluster_id"),
        col("cluster_id").as("__jump"))
      val (next, s, _) = checkpointWithSum(propagated
        .join(reps, Seq("cluster_id"), "left")
        .select(col(idCol),
          coalesce(col("__jump"), col("cluster_id")).as("cluster_id")))
      converged = s == prevSum
      labels = next
      prevSum = s
      roundSums += s
      iter += 1
    }
    // labels is an EAGER localCheckpoint — buckets (and the signature UDF
    // behind it) are fully consumed, so release the cached blocks now
    buckets.unpersist()
    graft.metrics.ScaleTelemetry.putNum("cc_rounds", iter.toLong)
    graft.metrics.ScaleTelemetry.putNum("cc_docs", nDocs)
    graft.metrics.ScaleTelemetry.putNum("cc_bucket_rows_per_round", bucketRows)
    graft.metrics.ScaleTelemetry.put("cc_label_sums", roundSums.mkString("[", ",", "]"))
    labels
  }

  /** Candidate near-duplicate pairs via LSH banding, scored by the minhash
    * signature estimate (64 equality checks per pair — no text re-shingling).
    * Signatures ride along the band rows into the self-join, so the estimate
    * computes directly on the join output and per-pair dedup folds into the
    * final aggregation — two fewer shuffle joins than scoring after an
    * id-level distinct, at the cost of numPerm longs per band row in the
    * bucket shuffle (0.5 KB/row; cheap next to the text itself). Set
    * `exactVerify` to rescore survivors with exact shingle Jaccard (costs one
    * extra text join). Output: (id_a, id_b, jaccard).
    */
  def nearDupPairsMinHash(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double, shingleK: Int = 5,
                          numPerm: Int = 64, bands: Int = 16,
                          exactVerify: Boolean = false,
                          maxBucketSize: Int = 256): DataFrame = {
    require(numPerm % bands == 0)
    val rows = numPerm / bands
    val sigUdf = udf((t: String) =>
      if (t == null) Array.empty[Long] else minHashSignature(t, shingleK, numPerm))
    // materialized once: the signature UDF is the expensive stage, and the
    // cap pre-count + bucket self-join would otherwise recompute it.
    // (An eager count() to dodge the two-stage cache race — the minHashLsh
    // fix — was A/B'd in r17 and lost here: one pass over this frame is
    // cheap enough that the extra job costs more than the duplicate stage,
    // t9 1.73 -> 1.96 s.)
    val withSig = df.select(col(idCol).as("id"),
      sigUdf(col(textCol)).as("sig")).persist()
    val bandUdf = udf((sig: Seq[Long]) =>
      sig.grouped(rows).zipWithIndex.map { case (band, bi) =>
        val bb = java.nio.ByteBuffer.allocate(band.length * 8)
        band.foreach(bb.putLong)
        (bi.toLong << 32) | (Murmur3.hash(bb.array, 7).toLong & 0xffffffffL)
      }.toArray)
    // Eagerly materialize the capped buckets, then release the signature
    // frame: the returned pair frame is lazy, so a persist left behind here
    // would pin its blocks in the CacheManager for the session's lifetime
    // (a real leak in a long-lived curation pipeline). localCheckpoint blocks
    // are GC-tracked — they're freed once the caller drops the result —
    // and the checkpoint preserves the bucket hash-partitioning, so the
    // self-join below still reuses one exchange for both sides.
    val buckets = capBuckets(
      withSig.select(col("id"), col("sig"), explode(bandUdf(col("sig"))).as("bucket")),
      "bucket", "id", maxBucketSize)
      .localCheckpoint()
    withSig.unpersist()
    val sigEst = udf((x: Seq[Long], y: Seq[Long]) => {
      var same = 0; var i = 0
      while (i < x.length) { if (x(i) == y(i)) same += 1; i += 1 }
      same.toDouble / x.length
    })
    val estimated = buckets.as("a").join(buckets.as("b"), col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("jaccard", sigEst(col("a.sig"), col("b.sig")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(first(col("jaccard")).as("jaccard")) // a pair may collide in several bands
    if (!exactVerify) estimated.withColumn("jaccard", round(col("jaccard"), 6))
    else {
      val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
      val jacc = udf((x: String, y: String) => {
        val sa = shingles(x, shingleK); val sb = shingles(y, shingleK)
        val inter = sa.intersect(sb).size
        val union = sa.size + sb.size - inter
        if (union == 0) 1.0 else inter.toDouble / union
      })
      estimated.drop("jaccard")
        .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
        .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
        .withColumn("jaccard", round(jacc(col("text_a"), col("text_b")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }

  /** Self-join bucket guard: a degenerate bucket (boilerplate text hashing
    * identically for thousands of docs) turns the bucket self-join quadratic.
    * Buckets at or under `maxSize` pass through untouched; oversized ones are
    * thinned by a deterministic hash sample targeting ~maxSize survivors — a
    * true near-dup group that large still pairs through its retained members,
    * and the pair explosion stays ~maxSize² per bucket. Unlike a row_number
    * window (full sort of every bucket just to guard the rare hot ones), this
    * costs one partial-aggregated count plus a join against the tiny set of
    * hot buckets, which AQE broadcasts.
    */
  private def capBuckets(buckets: DataFrame, bucketCol: String, idCol: String,
                         maxSize: Int): DataFrame = {
    val hot = buckets.groupBy(col(bucketCol)).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxSize)
    buckets.join(hot, Seq(bucketCol), "left")
      .filter(col("__bn").isNull ||
        pmod(xxhash64(col(bucketCol), col(idCol)), lit(1000000L)) * col("__bn") <
          lit(maxSize.toLong * 1000000L))
      .drop("__bn")
      // hash-partition the capped output on the bucket key: the downstream
      // self-join then reuses ONE exchange for both sides (the partitioning
      // the old window cap provided implicitly) instead of shuffling twice
      .repartition(col(bucketCol))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens (weighted by term frequency). */
  def simHash64(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val acc = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        val h1 = Murmur3.hash(tok.getBytes("UTF-8"), 0).toLong & 0xffffffffL
        val h2 = Murmur3.hash(tok.getBytes("UTF-8"), 31).toLong & 0xffffffffL
        val h = (h1 << 32) | h2
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** (id, simhash) for every row; near-dups have small hamming distance. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = udf((t: String) => simHash64(t))
    df.select(col(idCol), f(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup candidate pairs: block on 4 x 16-bit sub-bands (any
    * pair within hamming distance <= 3 shares at least one full band), then
    * verify the true distance.
    */
  def nearDupPairsSimHash(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, maxBucketSize: Int = 256): DataFrame = {
    val f = udf((t: String) => simHash64(t))
    val sh = df.select(col(idCol).as("id"), f(col(textCol)).as("sh")).persist()
    val bandU = udf((h: Long) => (0 until 4).map(i =>
      (i.toLong << 16) | ((h >>> (i * 16)) & 0xffffL)).toArray)
    // Same eager-materialize + release pattern as nearDupPairsMinHash: the
    // simhash frame must not stay persisted past this call (session leak).
    val banded = capBuckets(
      sh.select(col("id"), col("sh"), explode(bandU(col("sh"))).as("band")),
      "band", "id", maxBucketSize)
      .localCheckpoint()
    sh.unpersist()
    val a = banded.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    val ham = udf((x: Long, y: Long) => hamming64(x, y))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", ham(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Duplicated-span coverage (exact-substring dedup statistics, the
    * Lee-et-al "Deduplicating Training Data" shape): for every document,
    * how many token positions fall inside at least one word n-gram that
    * occurs `minCount`-or-more times across the whole corpus. The coverage
    * counts drive span-removal / doc-drop policy decisions; emitting counts
    * (not rewritten text) keeps the operator engine-portable and oracle-able.
    *
    * 100 TB shape — the honest exchange inventory, all of them:
    *  1. the gram-frequency count: one corpus-gram-scale shuffle with
    *     map-side partials;
    *  2. the duplicated-gram join-back: re-shuffles the gram stream AND the
    *     duplicated-gram set on `gram` (in natural text the duplicated set
    *     is a large fraction of distinct grams, so AQE will usually NOT
    *     broadcast it — this is a sort-merge join and the second
    *     corpus-scale exchange). The gram stream is persisted DISK_ONLY so
    *     this consumer re-reads local blocks instead of re-exploding the
    *     corpus (the t15/TF-IDF trade: sequential disk, zero storage-memory
    *     pressure);
    *  3. the per-doc `collect_list(start)` aggregation: one shuffle of the
    *     MATCHED (doc, start) pairs — bounded by corpus positions, one
    *     output row per doc.
    * Token positions never explode: coverage is a sorted interval union
    * ([start, start+n) merged in one `aggregate` expression over the
    * per-doc start list), not a position explode + distinct — that removes
    * the n× position-row exchange the round-9 shape paid.
    *
    * Output: (idCol, n_tokens, covered_tokens), one row per input document;
    * covered_tokens = 0 for documents with no duplicated span.
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Int = 2): DataFrame = {
    // fan a narrow input out before the gram explode so the gram stream's
    // map-side partial aggregation parallelizes (no-op at real widths)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val grams = spread.select(col(idCol),
      posexplode(Decontaminate.wordNgrams(col(textCol), n)).as(Seq("start", "gram")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select(col("gram"))
    // sorted interval union per doc: fold [s, s+n) intervals left-to-right,
    // extending or skipping overlaps — covered positions counted without
    // ever materializing them as rows
    val nL = lit(n.toLong)
    val covered = grams.join(dup, Seq("gram"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start").cast("long"))).as("starts"))
      .select(col(idCol),
        aggregate(col("starts"),
          struct(lit(0L).as("cov"), lit(Long.MinValue).as("end")),
          (acc, s) => struct(
            (acc.getField("cov") + when(s >= acc.getField("end"), nL)
              .otherwise(greatest(s + nL - acc.getField("end"), lit(0L)))).as("cov"),
            greatest(s + nL, acc.getField("end")).as("end")),
          acc => acc.getField("cov")).as("covered_tokens"))
    val res = docs
      .select(col(idCol), size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .withColumn("covered_tokens", coalesce(col("covered_tokens"), lit(0L)))
    // eager-materialize + release (the simhash pattern): the gram cache must
    // not outlive this call; localCheckpoint truncates lineage first so the
    // returned frame never re-reads the unpersisted blocks
    val out = res.localCheckpoint()
    grams.unpersist()
    out
  }

  /** Representative selection after clustering: keep exactly one document
    * per cluster — the best-scoring one, ties broken by smallest id, so
    * the surviving corpus is deterministic run-over-run. This is the
    * curation step after [[minHashLsh]] (or SemDeDup): instead of an
    * arbitrary survivor, keep the highest-quality member of each
    * duplicate cluster.
    *
    * Scale shape: `row_number <= 1` compiles to Spark's rank-limit
    * pushdown (Partial WindowGroupLimit → Exchange → Final): each map
    * task forwards only its own best row per cluster, so the exchange
    * carries ≤ |clusters·tasks| rows — the cluster bodies never travel.
    */
  def keepBestPerCluster(clustered: DataFrame, idCol: String,
      clusterCol: String, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col("__score").desc, col(idCol).asc)
    clustered.withColumn("__score", score)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "__score")
  }
}
