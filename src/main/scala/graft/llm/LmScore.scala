package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet/KenLM-style statistical language-model scoring for corpus quality
  * filtering: train an add-one-smoothed bigram model ON the corpus itself
  * and score each document by its mean log P(w_i | w_{i-1}). Documents far
  * below the corpus mean are boilerplate/garbage candidates; far above are
  * degenerate repetition — the classic perplexity-bucket signal, without an
  * external model artifact.
  *
  * Scale shape: bigram extraction is map-side array work (slice + zip +
  * explode); the count model is two shuffled aggregations with map-side
  * partials (bigram and unigram-context tables); scoring joins the bigram
  * stream back to both tables on their natural keys — at corpus scale these
  * are shuffle joins on (w1, w2)/(w1), with AQE free to broadcast when a
  * model table is small. The vocabulary size is the only driver-side value
  * (one long).
  */
object LmScore {

  /** Per-document mean bigram log-probability.
    * Output: `keep` columns + (n_bigrams, avg_lp). Documents with fewer
    * than 2 tokens produce no bigrams and are absent from the result — the
    * model cannot score them.
    */
  def bigramDocScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", keep: Seq[String] = Seq("source")): DataFrame = {
    val toks = split(col(textCol), " ")
    val pairs = arrays_zip(
      slice(toks, lit(1), size(toks) - 1).as("w1"),
      slice(toks, lit(2), size(toks) - 1).as("w2"))
    // The bigram stream feeds THREE consumers (context counts, bigram
    // counts, the scoring join) — without a persist the corpus explodes
    // three times. DISK_ONLY so a 100 TB bigram stream spills instead of
    // evicting executor storage memory (the t15 TF-IDF pattern); released
    // eagerly via the count-materialize + finally-unpersist below.
    // fan a narrow input out so the bigram explode + count partials
    // parallelize (no-op at real corpus widths)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val big = spread
      .select((col(idCol) +: keep.map(col)) :+ explode(pairs).as("bg"): _*)
      .select((col(idCol) +: keep.map(col)) :+
        col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val c12 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    // the unigram-context table is the bigram table summed over w2 —
    // exact integers, derived from the (much smaller) c12 frame instead of
    // a second full pass over the corpus-scale bigram stream
    val c1 = c12.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
    // vocabulary as a broadcast 1-row frame, not a collected literal: the
    // old head() was its own full-corpus action serializing before the
    // scoring job; as a crossJoin input its distinct-count subtree runs
    // INSIDE the one scoring action, overlapping the bigram stages
    // (identical value: exact long, cast to double in the same place)
    val vocabDf = spread.select(explode(toks).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("__vocab"))
    val scored = big.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocabDf))
      .withColumn("lp", log((col("n12") + lit(1.0)) / (col("n1") + col("__vocab"))))
      .groupBy((col(idCol) +: keep.map(col)): _*)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("avg_lp"))
    // Materialize while the cache is live, then release it so the cached
    // bigrams don't outlive this call (session-level storage leak). The
    // localCheckpoint truncates lineage so the returned frame no longer
    // references the unpersisted cache.
    val out = scored.localCheckpoint()
    big.unpersist()
    out
  }

  /** CCNet-style perplexity bucketing: per group (language), split the
    * scored documents into `buckets` equal-frequency tiers by LM score —
    * bucket 1 = head (most fluent), bucket `n` = tail. The CCNet recipe
    * keeps head+middle for pretraining and routes tail to re-filtering.
    * Ordering is by `round(avg_lp, 6)` descending with id tie-break, so
    * the tier assignment is deterministic and engine-portable (raw double
    * ordering would let ULP noise flip boundary documents).
    *
    * Scale shape: one [[bigramDocScore]] pass, then an ntile window — an
    * exchange on the group column plus a per-group sort of (id, score)
    * pairs ONLY (text stays behind). Note the window partitions by
    * language: a dominant language concentrates its (still narrow) rows
    * onto one reducer — at extreme scale swap the exact ntile for
    * per-group percentile thresholds and a broadcast bucket join.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", groupCol: String = "lang",
      buckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramDocScore(docs, idCol, textCol, keep = Seq(groupCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(round(col("avg_lp"), 6).desc, col(idCol).asc)
    scored.withColumn("bucket", ntile(buckets).over(w))
  }
}
