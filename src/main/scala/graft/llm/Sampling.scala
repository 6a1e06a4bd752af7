package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation: exactly k
  * documents per stratum (e.g. language × source), chosen by a keyed
  * pseudo-random order any engine can reproduce — an LCG over the id, not a
  * platform hash, so a SQL oracle computes the identical sample.
  */
object Sampling {

  /** Pseudo-random but engine-portable ordering key: one LCG step. Stays
    * within long range for ids up to ~8e9, so the same arithmetic runs
    * overflow-free in ANSI SQL (DuckDB errors on BIGINT overflow rather
    * than wrapping like the JVM).
    */
  def lcg(id: Column): Column = (id * lit(1103515245L) + lit(12345L)) % lit(2147483648L)

  /** Exact k-per-stratum sample.
    *
    * Scale shape: `row_number <= k` compiles to a Partial/Final
    * `WindowGroupLimit` pair (Spark's rank-limit pushdown): every map task
    * keeps only its own k smallest per stratum BEFORE the exchange, so the
    * shuffle carries at most k·tasks·|strata| rows no matter how large the
    * corpus — the 100 TB stratum never travels, let alone sorts, whole.
    * (Verified in the formatted plan: WindowGroupLimit Partial → Exchange →
    * WindowGroupLimit Final; no manual salting needed.)
    */
  def stratifiedTopK(df: DataFrame, strata: Seq[String], idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(lcg(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Temperature-scaled mixture weights — the standard source-balancing
    * step BEFORE [[weightedResample]] (multilingual corpus sampling à la
    * mBERT/XLM-R, GPT-3-style source mixing): given per-group sizes n_g,
    * sampling weight w_g = n_g^T / Σ n_g^T. T = 1 keeps natural
    * proportions; T → 0 flattens toward uniform, up-weighting small
    * sources; the returned `rate` column rescales w_g into per-document
    * replication epochs against a token budget (rate_g = w_g · budget /
    * n_g), ready to feed `weightedResample`.
    *
    * Scale shape: one partial-agg shuffle of |groups| rows, then driver
    * arithmetic over the group table (|groups| is mixture-spec sized —
    * tens, not corpus-sized) folded back as one broadcastable frame.
    * Doubles round to 6 dp so libm pow ULP differences cannot leak into
    * the mixture spec.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, sizeExpr: Column,
      temperature: Double, budget: Long): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val sizes = df.groupBy(col(groupCol)).agg(sum(sizeExpr).as("n_tokens"))
    val powed = sizes.withColumn("__p", pow(col("n_tokens").cast("double"), lit(temperature)))
    // Σ n^T over mixture-spec-sized groups: cheap second aggregation; kept
    // in-plan (cross-joined scalar) so the whole thing stays one lazy frame
    val total = powed.agg(sum(col("__p")).as("__tot"))
    powed.crossJoin(total)
      .withColumn("weight", round(col("__p") / col("__tot"), 6))
      .withColumn("rate",
        round(col("__p") / col("__tot") * lit(budget.toDouble) / col("n_tokens"), 6))
      .select(col(groupCol), col("n_tokens"), col("weight"), col("rate"))
  }

  /** Domain-mixture resampling: replicate or thin each document according
    * to a per-row rate (the "epochs" column of a training-mixture spec —
    * e.g. Wikipedia ×2.5, CommonCrawl ×0.5). A rate of 2.5 emits 2 copies
    * of every doc plus a 3rd for a deterministic half of them; 0.5 keeps a
    * deterministic half. The fractional part is decided by the same
    * engine-portable LCG as [[stratifiedTopK]], against 1000 buckets, so
    * rates are honored to 1/1000 and a SQL oracle reproduces the exact
    * row set. Use binary-exact rates (k/1000 with exact double
    * representation) to keep the bucket compare engine-identical.
    *
    * Scale shape: pure map-side — a filter plus a bounded `sequence`
    * explode; no shuffle, no state. `epoch_copy` (1-based) disambiguates
    * replicas downstream.
    */
  def weightedResample(df: DataFrame, rate: Column, idCol: String): DataFrame = {
    val copies = (floor(rate).cast("long") +
      when(pmod(lcg(col(idCol)), lit(1000L)) < ((rate - floor(rate)) * 1000).cast("long"),
        1L).otherwise(0L)).as("n_copies")
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch_copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): pick the k documents
    * whose token distribution most resembles a TARGET slice of the corpus,
    * under bag-of-words unigram models.
    *
    *   log w(doc) = Σ_{token ∈ doc ∩ vocab} log p_target(token) / p_source(token)
    *
    * with add-1 smoothing over a top-`vocabSize` target vocabulary. The
    * paper's Gumbel-noise resampling is replaced by the deterministic
    * top-k by (weight, id) — reproducible across engines (compose with
    * [[weightedResample]] for the stochastic variant). Weights round to 6
    * decimals so partial-aggregation order and `log` ulp differences
    * between engines never flip a rank.
    *
    * Output: (idCol, log_w, rank), rank 1..k.
    *
    * Scale shape: the vocabulary and both count models are tiny
    * (vocabSize rows) and BROADCAST; the corpus explodes to tokens once,
    * joins map-side against the broadcast ratio table, and the only
    * corpus-scale exchange is the per-doc partial-aggregated sum. The
    * final top-k is `orderBy.limit` — TakeOrderedAndProject, a per-task
    * k-heap + driver merge (a global row_number window would instead sort
    * every doc in ONE partition); rank is then a window over k rows only.
    */
  def dsirSelect(docs: DataFrame, isTarget: Column, textCol: String,
      idCol: String, vocabSize: Int, k: Int): DataFrame = {
    val words = docs.select(col(idCol), isTarget.as("__t"),
      explode(split(col(textCol), " ")).as("word"))

    val targetCnt = words.filter(col("__t"))
      .groupBy(col("word")).agg(count(lit(1)).as("ct"))
    val vocab = targetCnt
      .orderBy(col("ct").desc, col("word").asc).limit(vocabSize)
    val totT = words.filter(col("__t")).count()
    val totS = words.count()

    val sourceCnt = words.groupBy(col("word")).agg(count(lit(1)).as("cs"))
    // V rows: log((ct+1)/(totT+V)) - log((cs+1)/(totS+V))
    val ratio = vocab.join(sourceCnt, Seq("word"))
      .select(col("word"),
        (log((col("ct") + 1.0) / lit(totT.toDouble + vocabSize)) -
          log((col("cs") + 1.0) / lit(totS.toDouble + vocabSize))).as("lr"))

    val logw = words.join(broadcast(ratio), Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("lr")).as("__w"))
    val scored = docs.select(col(idCol))
      .join(logw, Seq(idCol), "left")
      .select(col(idCol), round(coalesce(col("__w"), lit(0.0)), 6).as("log_w"))
    scored
      .orderBy(col("log_w").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("log_w").desc, col(idCol).asc)))
  }

  /** Deterministic epoch shuffle: a seeded, reproducible global training
    * order. Every (seed, epoch) pair yields a different permutation, and
    * re-running the job — on any cluster size, any engine — yields the
    * SAME one: the order key is two LCG rounds over (id, seed, epoch)
    * with engine-portable modular arithmetic (every intermediate stays
    * far below 2^63, so ANSI engines that error on BIGINT overflow
    * compute it too — same contract as [[lcg]]). Ties (the modulus is
    * ~10^6) break by id, keeping the order total.
    *
    * Scale shape: one `orderBy` = a range exchange + per-partition sort —
    * Spark's sampled range partitioner keeps output partitions even, so a
    * 100 TB corpus shuffles once into a write-ready training order; no
    * window function, no single-partition funnel. Downstream writers
    * preserve the order per file (files themselves are ordered by their
    * range bounds).
    */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
      epoch: Int): DataFrame = {
    require(seed >= 0 && epoch >= 0, "seed and epoch must be non-negative")
    val m = lit(1000003L) // prime modulus keeps LCG cycles long
    val mixed = (col(idCol) + lit(seed % 1000003L) * lit(31L) +
      lit(epoch.toLong) * lit(7919L)) % m
    val key = (mixed * lit(999983L) + lit(12345L)) % m
    docs.orderBy(key.asc, col(idCol).asc)
  }
}
