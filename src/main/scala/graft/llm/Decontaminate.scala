package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination at corpus scale: find training documents that
  * share a word n-gram with a benchmark/eval set.
  *
  * The exact formulation (gate t13) broadcast-semi-joins every corpus n-gram
  * against the benchmark gram set — right for benchmark sets that fit a
  * broadcast. This operator is the 100 TB shape: a Bloom sketch of the
  * benchmark grams is broadcast instead (orders of magnitude smaller than
  * the gram strings), the corpus gram stream is prefiltered MAP-SIDE — at a
  * 1% false-positive rate ~99% of clean grams die before any join — and
  * only the survivors meet the true gram set in an exact confirmation
  * semi-join. False positives are eliminated by the confirmation join, so
  * the result is bit-identical to the exact path (the t25 oracle is the
  * same SQL as t13's); the sketch only decides how much data reaches the
  * join, never the answer.
  */
object Decontaminate {

  /** Word n-grams of a single-space-tokenized text column (codegen'd array
    * expressions, no UDF). Documents under n tokens yield an EMPTY array —
    * the `when` guard matters because Spark's `sequence(1, 0)` is the
    * descending [1, 0], not empty, which would emit a bogus partial gram
    * and then crash `slice` on start=0.
    */
  def wordNgrams(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Distinct ids of corpus documents sharing an n-gram with `bench`.
    *
    * The Bloom sketch is Spark's own deterministic
    * `org.apache.spark.util.sketch.BloomFilter` (built by one aggregation
    * over the benchmark side, driver-held, broadcast once). `mightContain`
    * is a scalar UDF because Spark exposes no public might_contain function
    * — it is a hash probe per gram, and it prunes the corpus stream before
    * the exchange, which is the whole point. The confirmation join is
    * broadcast here (benchmark gram sets are eval-suite sized); if it ever
    * had to shuffle, the prefiltered left side is already tiny.
    */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      fpp: Double = 0.01): DataFrame = {
    // benchGrams is computed three times (count, sketch, confirmation join)
    // but it is the BENCHMARK side — eval-suite sized by definition — so
    // recomputation beats holding a cache hostage to the caller's lazy plan
    val benchGrams = bench
      .select(explode(wordNgrams(col(textCol), n)).as("gram")).distinct()
    val bf = benchGrams.stat.bloomFilter("gram",
      math.max(benchGrams.count(), 1L), fpp)
    val bfB = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => bfB.value.mightContain(g))
    // fan a narrow corpus out first: the gram explode + Bloom probe +
    // broadcast semi-join are all map-side, so a one-file corpus would run
    // the whole prefilter on one core (no-op at real corpus widths)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (corpus.rdd.getNumPartitions < par) corpus.repartition(par) else corpus
    spread
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
      .filter(mightContain(col("gram")))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
  }
}
