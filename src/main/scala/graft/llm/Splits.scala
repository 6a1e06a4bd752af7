package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/valid/test split hygiene for corpus curation.
  *
  * A training split is only as good as its boundary: duplicated (or
  * near-duplicated) documents that land on both sides of a split leak
  * evaluation data into training. The standard mitigation is to key the
  * split on something every duplicate SHARES — a content fingerprint, or
  * the dedup-cluster id — instead of the document id, so a whole
  * duplicate family lands in one split by construction.
  *
  * Everything here is a narrow projection plus one hash — map-side only,
  * no shuffle; at 100 TB the split column costs a scan. The leak audit is
  * one aggregation shuffled on a 32-char md5, never on document bytes.
  *
  * Determinism contract: the bucket arithmetic is exact int64 (mod-prime
  * LCG, same family as Sampling.epochShuffle) and the text fingerprint is
  * the code-point fold pinned by t30 — any engine reproduces both
  * bit-for-bit, which is what makes the assignment auditable outside
  * Spark.
  */
object Splits {

  /** Prime modulus / multiplier shared with the epoch-shuffle LCG. */
  private val M = 1000003L
  private val A = 999983L

  /** Deterministic bucket in [0, M) of an integer key column:
    * affine → QUADRATIC → affine rounds mod the prime. The middle square
    * is load-bearing — a purely affine map sends a sequential-id interval
    * to a stride-(M−A) arithmetic progression (a contiguous band, so an
    * 80/10/10 split of sequential ids would come out wildly wrong); the
    * quadratic round scatters intervals. All intermediates stay < 10¹²,
    * exact int64 in any engine.
    */
  def bucketOf(key: Column, seed: Long): Column = {
    val y1 = pmod(pmod(key, lit(M)) * lit(A) + lit(seed), lit(M))
    val y2 = pmod(y1 * y1 + lit(12345L), lit(M))
    pmod(y2 * lit(A) + lit(seed), lit(M))
  }

  /** Portable content fingerprint: fold (acc·31 + codepoint) mod 2³¹−1
    * over the first `prefixLen` characters (the t30 contract — Spark's
    * `split("")` keeps surrogate pairs whole; DuckDB replicates with
    * `list_reduce`/`ord`). Exact duplicates always share it; the bounded
    * prefix keeps the fold O(1) per row regardless of document length.
    */
  def textKey(text: Column, prefixLen: Int = 64): Column =
    aggregate(split(substring(text, 1, prefixLen), ""), lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(2147483647L))

  /** Add a `split` column assigning each row to a named split with the
    * given weights, keyed on `key` (a numeric column). Key on `doc_id`
    * for a naive split, on [[textKey]] for an exact-dup-safe split, or on
    * a dedup-cluster id (e.g. from `Dedup.minhashClusterAssign`) for a
    * near-dup-safe split — the weights only hold in expectation over the
    * key distribution, exactly like every hash-based splitter.
    */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[(String, Double)],
      seed: Long, splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "split weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(M * c / total).toLong)
    val b = bucketOf(key, seed)
    val first: Column = when(b < lit(cuts.head), lit(weights.head._1))
    val chained = weights.zip(cuts).tail.foldLeft(first) {
      case (acc, ((name, _), cut)) => acc.when(b < lit(cut), lit(name))
    }
    df.withColumn(splitCol, chained.otherwise(lit(weights.last._1)))
  }

  /** Exact-duplicate leakage audit: the number of distinct document texts
    * that appear in MORE than one split. Groups on md5(text) so the
    * shuffle carries 32-char keys, not document bodies; md5 exists with
    * identical output in every engine the oracle runs on.
    */
  def exactLeaks(df: DataFrame, textCol: String,
      splitCol: String = "split", by: Seq[String] = Nil): DataFrame = {
    val dup = df.groupBy((by.map(col) :+ md5(col(textCol)).as("k")): _*)
      .agg(countDistinct(col(splitCol)).as("nsplits"))
      .filter(col("nsplits") > 1)
    if (by.isEmpty) dup.agg(count(lit(1)).as("leaked_texts"))
    else dup.groupBy(by.map(col): _*).agg(count(lit(1)).as("leaked_texts"))
  }

  /** Near-duplicate leakage audit over an explicit pair frame (e.g.
    * `Dedup.nearDupPairsMinHash` output): pairs whose endpoints sit in
    * different splits. One broadcast-or-hash join per side on the id.
    */
  def pairLeaks(pairs: DataFrame, assignments: DataFrame, idCol: String,
      splitCol: String = "split"): DataFrame = {
    val a = assignments.select(col(idCol).as("id_a"), col(splitCol).as("split_a"))
    val b = assignments.select(col(idCol).as("id_b"), col(splitCol).as("split_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .filter(col("split_a") =!= col("split_b"))
  }
}
