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
  /** Apply learned merges to a corpus — the tokenizer's encode path.
    * Map-side only: the merge list rides as a broadcast-sized literal in
    * the UDF closure (a vocabulary is KBs–MBs), each word re-derives its
    * segmentation by replaying merges in rank order — exactly the
    * segmentation training produced, so encode(train corpus) and the
    * final training state agree token-for-token. At 100 TB this is a
    * scan: no shuffle, no state.
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge],
      keep: Seq[String] = Nil): DataFrame = {
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val enc = udf((text: String) =>
      text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
        var syms: Seq[String] = w.split("").toSeq :+ EndOfWord
        ordered.foreach { case (a, b) => syms = mergePair(syms, a, b) }
        syms
      }.toSeq)
    docs.select(keep.map(col) :+ enc(col(textCol)).as("tokens"): _*)
  }

  def stats(words: DataFrame): DataFrame =
    words.agg(sum(size(col("syms")) * col("cnt")).as("total_symbols"))
      .crossJoin(words.select(explode(col("syms")).as("s"))
        .agg(count_distinct(col("s")).as("vocab_symbols")))
}
