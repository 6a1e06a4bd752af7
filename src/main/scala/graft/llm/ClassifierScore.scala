package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE over a hashed bag-of-words — the
  * fastText-style quality-filter step every large curation pipeline runs
  * (CCNet's LM filter, DCLM's fastText classifier, FineWeb's edu scorer):
  * score(doc) = sigmoid(mean_w weights[bucket(w)] + bias), where `bucket`
  * is a deterministic hash of the token into the weight table. Training
  * happens offline; what the engine owes the pipeline is cheap, exact,
  * portable inference over 100 TB of text.
  *
  * Scale shape: pure map-side array expressions — the weight vector rides
  * into the plan as one broadcast literal (dims ≤ ~100k doubles; the
  * fastText regime), tokens fold under a single `aggregate`, and no UDF,
  * no explode, no shuffle exists anywhere: classifier scoring runs at scan
  * speed and composes with any downstream filter predicate, which Catalyst
  * can then push against the score column.
  *
  * Determinism: the bucket hash is a polynomial rolling hash over code
  * points reduced mod 2^31-1 at every step, so it is exact int64
  * arithmetic any engine reproduces bit-for-bit (DuckDB replicates it with
  * list_reduce — the t30 oracle); the token fold is left-to-right, and the
  * sigmoid output rounds to 6 dp to absorb libm exp ULP differences.
  */
object ClassifierScore {

  /** Hash bucket of one token: fold (acc·31 + codepoint) mod 2³¹−1 over
    * the CODE POINTS, then mod `dims`. All int64 arithmetic — no engine
    * wraps, no sign surprises (unlike Java's overflowing hashCode).
    *
    * Code-point exactness holds for non-BMP text too: Spark's `split(w,
    * "")` advances by code point (Java regex treats a surrogate pair as
    * one match position, so "😀" stays whole) and `ascii` returns the
    * full code point (128512, not a half surrogate) — the same fold
    * DuckDB's `ord` over `string_split(w, '')` computes. Pinned by the
    * t30 gate's astral-plane document and ClassifierScoreSpec.
    */
  def wordBucket(w: Column, dims: Int): Column =
    aggregate(split(w, ""), lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(2147483647L)
    ) % lit(dims.toLong)

  /** Per-document classifier score.
    * Output: `keep` columns + (n_tokens, score); score = sigmoid(mean
    * token weight + bias) rounded to 6 dp, null for token-less documents
    * (the classifier has no evidence — callers decide the policy).
    */
  def scoreDocs(docs: DataFrame, weights: Array[Double], bias: Double = 0.0,
      idCol: String = "doc_id", textCol: String = "text",
      keep: Seq[String] = Nil): DataFrame = {
    require(weights.nonEmpty, "empty weight table")
    val dims = weights.length
    val wLit = typedLit(weights.toSeq)
    // stage the token array in its own projection: four downstream
    // references (guard, fold, denominator, n_tokens) would otherwise each
    // re-run split+filter per row (CollapseProject keeps expensive
    // multiply-referenced projections staged — the s7 lesson)
    val staged = docs.select((col(idCol) +: keep.map(col)) :+
      filter(split(col(textCol), " "), t => length(t) > 0).as("__toks"): _*)
    val toks = col("__toks")
    val sumW = aggregate(toks, lit(0.0), (acc, w) =>
      acc + element_at(wLit, (wordBucket(w, dims) + 1).cast("int")))
    val n = size(toks).cast("long")
    staged.select((col(idCol) +: keep.map(col)) :+ n.as("n_tokens") :+
      when(n > 0, round(
        lit(1.0) / (lit(1.0) + exp(-(sumW / n.cast("double") + lit(bias)))), 6))
        .as("score"): _*)
  }
}
