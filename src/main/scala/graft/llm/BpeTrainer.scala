package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (the merge-learning loop behind
  * GPT-2/RoBERTa-style vocabularies).
  *
  * Shape, and why it scales: the corpus collapses to a UNIQUE-WORD
  * frequency table in one shuffle (the only corpus-scale exchange —
  * 100 TB of text is still ≤ ~10⁷ distinct words), and every merge
  * iteration after that is vocab-bounded: one partial-aggregated
  * pair-count shuffle over (unique word × word length) rows, one
  * TakeOrdered(1) for the argmax (map-side partial top-1, a single row
  * reaches the driver — the algorithm's inherent sync point), and a
  * map-side symbol rewrite. `localCheckpoint` every few merges cuts the
  * iterative lineage (the s13 two-level-k-means lesson).
  *
  * Determinism contract: the winning pair is max count with (left,
  * right) lexicographic tie-break on binary collation, and the rewrite
  * is greedy left-to-right non-overlapping — both exactly reproducible
  * in any engine (the t42 oracle unrolls the loop in DuckDB with a
  * string-accumulator `list_reduce` fold).
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** End-of-word marker (the classic BPE boundary symbol). */
  val EndOfWord = "</w>"

  /** Corpus → (word, cnt): the single corpus-scale exchange. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right non-overlapping merge of one adjacent pair —
    * the BPE rewrite step. Runs per UNIQUE word (never per token), so a
    * plain function beats building a fold expression here.
    */
  private[graft] def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` merges. Returns the ordered merge list and the
    * final symbolized unique-word frame (word, cnt, syms). Stops early
    * when no adjacent pair remains (fully-merged vocabulary).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 5): (Seq[Merge], DataFrame) = {
    var words = wordCounts(docs, textCol)
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit(EndOfWord))))
      .localCheckpoint()
    val mergeUdf = udf(mergePair _)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = adjacentPairCounts(words)
        .orderBy(desc("pc"), asc("a"), asc("b")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, a, b, pc)
        words = words.withColumn("syms",
          mergeUdf(col("syms"), lit(a), lit(b)))
        if (rank % checkpointEvery == 0) words = words.localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), words)
  }

  /** Occurrence-weighted adjacent-pair counts over the symbolized words
    * (overlapping occurrences count, the BPE convention).
    */
  def adjacentPairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"),
      explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("pc"))

  /** Corpus stats under the learned segmentation: total emitted symbols
    * and distinct symbol vocabulary.
    */
  /** Replay-equivalent fast segmentation of one word: instead of walking
    * the ENTIRE merge list (O(|merges|·len) — ~1000x wasted work per word
    * at a real 32k-merge vocabulary), skip directly to the smallest rank
    * GREATER than the last applied whose pair is present in the current
    * symbols. Equivalence argument: replay evaluates rank q against the
    * state after all applied ranks < q; between the last applied rank and
    * the skip target no pair is present in the (unchanged) state, so
    * replay skips them too — and ranks once passed are never revisited,
    * which is why this is NOT the classic greedy lowest-rank loop (that
    * one would re-apply a low rank whose pair reappears later; replay,
    * and therefore training and the t43 oracle's fold, do not).
    * O(len²) pair lookups per word, len = word length. Measured (the
    * equivalence spec's microbench): 15 ms vs 423 ms replay over 2000
    * 8-char words at 612 merges (~28x) — the gap widens linearly with
    * vocabulary size, ~1500x at a real 32k-merge tokenizer.
    */
  /** Per-pair ranks, SORTED ascending: a pair can legitimately appear more
    * than once in a merge list (its adjacency can re-form after later
    * merges create string-equal symbols), and replay applies each
    * occurrence at its own rank — so the lookup is "smallest rank of this
    * pair strictly greater than the last applied", not a single rank.
    */
  private[graft] def ranksByPair(
      merges: Seq[Merge]): Map[(String, String), Array[Int]] =
    merges.groupBy(m => (m.left, m.right))
      .view.mapValues(_.map(_.rank).sorted.toArray).toMap

  private[graft] def segmentWord(w: String,
      rankOf: collection.Map[(String, String), Array[Int]],
      pairByRank: collection.Map[Int, (String, String)]): Seq[String] = {
    def firstRankAbove(ranks: Array[Int], last: Int): Int = {
      // ranks is tiny (1 except pathological vocabularies): linear scan
      var j = 0
      while (j < ranks.length) {
        if (ranks(j) > last) return ranks(j)
        j += 1
      }
      Int.MaxValue
    }
    var syms: Seq[String] = w.split("").toSeq :+ EndOfWord
    // Int.MinValue, not 0: training emits 1-based ranks, but encode()
    // accepts arbitrary merge lists and external ones (HuggingFace
    // merges.txt) are commonly 0-indexed — a 0-start would silently skip
    // a rank-0 merge and diverge from segmentWordReplay
    var last = Int.MinValue
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        rankOf.get((syms(i), syms(i + 1))).foreach { ranks =>
          val r = firstRankAbove(ranks, last)
          if (r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = pairByRank(best)
        syms = mergePair(syms, a, b)
        last = best
      }
    }
    syms
  }

  /** Reference segmentation: full replay of the merge list in rank order —
    * the semantics [[segmentWord]] must reproduce bit-for-bit (kept for
    * the equivalence spec; the oracle's SQL fold does the same walk).
    */
  private[graft] def segmentWordReplay(w: String,
      ordered: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = w.split("").toSeq :+ EndOfWord
    ordered.foreach { case (a, b) => syms = mergePair(syms, a, b) }
    syms
  }

  /** Apply learned merges to a corpus — the tokenizer's encode path.
    * Map-side only: the merge list rides as a broadcast-sized literal in
    * the UDF closure (a vocabulary is KBs–MBs), each word derives the
    * exact segmentation training produced (see [[segmentWord]] for the
    * replay-equivalent fast path), so encode(train corpus) and the final
    * training state agree token-for-token. At 100 TB this is a scan: no
    * shuffle, no state, and per-word cost scales with word length, not
    * vocabulary size.
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge],
      keep: Seq[String] = Nil): DataFrame = {
    val rankOf = ranksByPair(merges)
    val pairByRank: Map[Int, (String, String)] =
      merges.map(m => m.rank -> ((m.left, m.right))).toMap
    val enc = udf((text: String) =>
      text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
        segmentWord(w, rankOf, pairByRank)
      }.toSeq)
    docs.select(keep.map(col) :+ enc(col(textCol)).as("tokens"): _*)
  }

  def stats(words: DataFrame): DataFrame =
    words.agg(sum(size(col("syms")) * col("cnt")).as("total_symbols"))
      .crossJoin(words.select(explode(col("syms")).as("s"))
        .agg(count_distinct(col("s")).as("vocab_symbols")))
}
