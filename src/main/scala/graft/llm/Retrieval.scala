package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval over a document corpus — the classic lexical ranker
  * a training-data pipeline uses for quality-biased sampling and for the
  * sparse half of hybrid (BM25 + embedding) retrieval. Engine extension: no
  * reference-repo equivalent; semantics follow Robertson & Walker's BM25 as
  * commonly implemented (Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
  * which is always positive).
  *
  * 100 TB shape: the query set is broadcast (it is human-authored, not
  * corpus-scale); the corpus-side cost is one token explode feeding a
  * (doc, word) count with map-side partials, document length derived from
  * those counts (no second pass over tokens), and df computed only for the
  * query vocabulary. The scored frame carries one row per (query, doc, term
  * hit) — never the full corpus vocabulary — and the final top-k goes
  * through the partition-partial rank path, so only k rows per (query,
  * partition) reach the last exchange.
  */
object Retrieval {

  /** Top-k documents per query by BM25.
    *
    * `queries` is a small (qid, qtext) frame. Default k1/b are 1.25/0.75 —
    * inside the standard tuning range, and exactly representable in binary
    * so every constant folds to the same double in any engine (an oracle
    * written with 1.2 would have to reproduce 1.2's decimal→double rounding
    * in the other engine's literal parser).
    *
    * Per-(query, doc) term contributions are summed by a left fold over the
    * term-sorted list, not a plain `sum`, so the double result is
    * independent of partition order — reruns and other engines land on the
    * identical bits (modulo 1-ulp libm `ln` differences, which perturb each
    * term's contribution monotonically across all docs and so cannot flip a
    * ranking).
    *
    * Output: (qid, rank, doc_id, score), rank 1..k, ties broken by doc_id.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.25, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "qid", qtextCol: String = "qtext"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
    val tf = tok.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // doc length from the tf partials — no second pass over the token stream
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qt = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(split(col(qtextCol), " "))).as("word"))
    // df only for the query vocabulary: the broadcast semi-join prunes the
    // corpus-wide (doc, word) frame before any per-term counting
    val dfr = tf.join(broadcast(qt.select(col("word")).distinct()), Seq("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(qt), Seq("word"))
      .join(broadcast(dfr), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("qid"), col("doc_id"), col("word"), col("contrib"))
    val scored = contrib.groupBy(col("qid"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("word"), col("contrib")))),
        lit(0.0),
        (acc, x) => acc + x.getField("contrib")).as("score"))
    Similarity.topKPerKey(scored, "qid", col("score").desc, col("doc_id").asc, k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** Materialize an inverted index over the corpus: one row per word with
    * document frequency `df`, collection frequency `cf`, and the head of
    * the postings list — the top-`cap` doc ids by (tf desc, doc_id asc),
    * comma-joined.
    *
    * Scale shape: two exchanges, both bounded. The token stream partial-
    * aggregates map-side into (word, doc_id, tf) before the first shuffle;
    * the per-word rollup then uses the k-bounded [[graft.functions.TopKByScore]]
    * heap, so only `cap` postings per (word, map task) cross the second
    * shuffle — a stop-word's billion-document postings list never
    * materializes anywhere. Full (uncapped) postings at 100 TB should stay
    * ROWS (the `tf` frame itself, sorted within word on write), never
    * per-word arrays; the capped head is what serving-time index builds
    * ship.
    */
  def invertedIndex(docs: DataFrame, cap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        graft.functions.TopKFunctions
          .topKByScore(col("tf").cast("double"), col("doc_id"), cap).as("top"))
      .withColumn("postings",
        array_join(transform(col("top"), x => x.getField("cid")), ","))
      .drop("top")
  }

  /** Per-query retrieval quality metrics — recall@k, MRR, nDCG@k — for any
    * ranked (qid, cid, rank) prediction frame against a (qid, cid)
    * relevance set: the evaluation step every retrieval/ANN pipeline runs
    * (and the composition target: feed it [[Similarity.ivfTopK]] output to
    * score an index against an exact ground truth).
    *
    * Scale: predictions are k rows per query and the relevance set is
    * human-or-oracle-sized; the only exchanges are the (qid, cid) hit join
    * and two per-qid partial aggregations — nothing corpus-scale. DCG uses
    * plain conditional sums of ≤k log2 terms; 4dp rounding absorbs libm
    * and sum-order ULPs (the t26 convention).
    *
    * Output: (qid, n_rel, hits, recall_at_k, mrr, ndcg) per query.
    */
  def retrievalMetrics(predictions: DataFrame, relevance: DataFrame,
      k: Int): DataFrame = {
    val rel = relevance.select(col("qid"), col("cid")).distinct()
    val relSizes = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val marked = predictions.filter(col("rank") <= k)
      .join(rel.withColumn("is_rel", lit(1)), Seq("qid", "cid"), "left")
      .withColumn("is_rel", coalesce(col("is_rel"), lit(0)))
    val perq = marked.groupBy(col("qid")).agg(
      sum(col("is_rel")).cast("long").as("hits"),
      sum(when(col("is_rel") === 1, lit(1.0) / log2(col("rank") + 1))
        .otherwise(lit(0.0))).as("dcg"),
      min(when(col("is_rel") === 1, col("rank"))).as("first_rel_rank"))
    relSizes.join(perq, Seq("qid"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      // ideal DCG: the first min(k, n_rel) ranks all relevant — a
      // deterministic in-order fold over a generated sequence
      .withColumn("idcg", aggregate(
        sequence(lit(1), least(lit(k), col("n_rel")).cast("int")),
        lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1)))
      .select(col("qid"), col("n_rel"), col("hits"),
        round(col("hits") / col("n_rel"), 4).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)), 4).as("mrr"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 4).as("ndcg"))
  }
}
