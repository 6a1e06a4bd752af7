package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.{Quantize, Similarity}
import Q._

/** Similarity search over the `embeddings` table (array<float> x 64). The
  * brute-force cosine top-k carries a DuckDB oracle (zip-unnest dot product);
  * cosines are rounded to 6dp on both sides to absorb summation-order ULPs —
  * ranking uses the raw values, whose candidate gaps are orders of magnitude
  * above ULP noise on this data.
  */
object SimilarityQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s2_cosine_topk_oracle", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      Similarity.bruteForceTopK(queries, corpus, k = 5)
        .select(col("qid"), col("rank"), col("cid"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }, Some("""
      WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
           c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10),
           p AS (
             SELECT qid, cid,
                    (SELECT SUM(a * b) FROM (SELECT UNNEST(qv) AS a, UNNEST(cv) AS b) z) /
                    (sqrt((SELECT SUM(a * a) FROM (SELECT UNNEST(qv) AS a) za)) *
                     sqrt((SELECT SUM(b * b) FROM (SELECT UNNEST(cv) AS b) zb))) AS cos
             FROM q, c),
           r AS (SELECT qid, cid, cos,
                        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
                 FROM p)
      SELECT qid, CAST(rank AS INTEGER) AS rank, cid, round(cos, 6) AS cosine
      FROM r WHERE rank <= 5
      ORDER BY qid, rank""")),

    // ANN quality gate: recall@5 vs the exact brute-force top-k, computed
    // in-query and pinned by the oracle. These embeddings are unstructured
    // (near-orthogonal random vectors), so 16 buckets with 6 probed is the
    // honest recall/fan-out point (~0.55 here; pinned at 0.35 with margin);
    // each query must also find itself at rank 1 (it shares its own bucket).
    QueryDef("s3_ann_lsh", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      // Both top-k frames feed two eager counts each; persist so the LSH and
      // brute-force pipelines run once, and release before returning (all
      // actions complete inside this builder).
      val ann = Similarity.lshTopK(queries, emb, k = 5, nbits = 4, probes = 5).persist()
      val exact = Similarity.bruteForceTopK(queries, emb, k = 5).persist()
      val hits = ann.select(col("qid"), col("cid"))
        .intersect(exact.select(col("qid"), col("cid"))).count()
      val total = exact.count()
      val nq = queries.count()
      val selfOk = ann.filter(col("rank") === 1 && col("qid") === col("cid")).count() == nq
      ann.unpersist()
      exact.unpersist()
      import s.implicits._
      Seq((nq, (hits.toDouble / total >= 0.35).toString, selfOk.toString))
        .toDF("n_queries", "recall_ok", "self_ok")
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, 'true' AS recall_ok,
             'true' AS self_ok
      FROM embeddings WHERE vec_id < 20""")),

    // IVF ANN quality gate (the second scale path next to LSH): coarse
    // centroids + nprobe lists; recall@5 vs brute force pinned, and every
    // query finds itself at rank 1 (its own list is always probed first)
    QueryDef("s5_ann_ivf", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val ann = Similarity.ivfTopK(queries, emb, k = 5,
        nlist = 8, nprobe = 4).persist()
      val exact = Similarity.bruteForceTopK(queries, emb, k = 5).persist()
      val hits = ann.select(col("qid"), col("cid"))
        .intersect(exact.select(col("qid"), col("cid"))).count()
      val total = exact.count()
      val nq = queries.count()
      val selfOk = ann.filter(col("rank") === 1 && col("qid") === col("cid")).count() == nq
      ann.unpersist()
      exact.unpersist()
      import s.implicits._
      Seq((nq, (hits.toDouble / total >= 0.3).toString, selfOk.toString))
        .toDF("n_queries", "recall_ok", "self_ok")
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, 'true' AS recall_ok,
             'true' AS self_ok
      FROM embeddings WHERE vec_id < 20""")),

    // embedding-cosine near-dup over a doubled corpus: every duplicated
    // vector's top-1 must be its exact twin at cosine 1.0 — identical vectors
    // share an LSH bucket by construction, so the oracle pins the full rows
    QueryDef("s4_embedding_neardup", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val u = emb.unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      val top = Similarity.lshTopK(
        u.filter(col("vec_id") >= 1000000L), u.filter(col("vec_id") < 1000000L),
        k = 1, nbits = 8, probes = 2)
      top.filter(col("cosine") > 0.999)
        .select(col("qid"), col("cid"), col("cosine"))
        .orderBy(col("qid"))
    }, Some("""
      SELECT vec_id + 1000000 AS qid, vec_id AS cid, 1.0 AS cosine
      FROM embeddings ORDER BY qid""")),

    // kNN label agreement (quality probe for labeled embedding sets):
    // leave-one-out 5-NN majority vote per vector, agreement vs its own
    // label aggregated per class. The self-match always ranks 1 at cosine
    // 1.0, so top-6-then-drop-self is exactly top-5 excluding self; ties in
    // the vote break deterministically (highest count, then lowest label)
    QueryDef("s6_knn_agreement", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      // exact variant: brute-force top-k feeds the shared agreement
      // aggregation; this is the oracle-checked probe (bounded by the
      // brute-force query-side guard — NOT the scale path)
      val exactAgg = Similarity.knnLabelAgreement(
        Similarity.bruteForceTopK(emb, emb, k = 6), emb).persist()
      val rows = exactAgg.orderBy(col("label")).collect()
      val eTot = exactAgg.agg(sum(col("n")), sum(col("n_agree"))).collect()(0)
      exactAgg.unpersist()
      // scale variant: the SAME aggregation over IVF (centroid-bucketed)
      // top-k — no all-pairs anywhere; agreement must land within 0.15 of
      // exact, proving the operator composes with the ANN paths at scale
      val ivfTot = Similarity.knnLabelAgreement(
        Similarity.ivfTopK(emb, emb, k = 6, nlist = 8, nprobe = 4), emb)
        .agg(sum(col("n")), sum(col("n_agree"))).collect()(0)
      val exactRate = eTot.getLong(1).toDouble / eTot.getLong(0)
      val ivfRate = ivfTot.getLong(1).toDouble / ivfTot.getLong(0)
      val ivfOk = (math.abs(ivfRate - exactRate) <= 0.15).toString
      import s.implicits._
      rows.toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), ivfOk))
        .toDF("label", "n", "n_agree", "ivf_ok")
        .orderBy(col("label"))
    }, Some("""
      WITH p AS (
        SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS cid, b.label AS nlabel,
               (SELECT SUM(x * y) FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) z) /
               (sqrt((SELECT SUM(x * x) FROM (SELECT UNNEST(a.embedding) AS x) za)) *
                sqrt((SELECT SUM(y * y) FROM (SELECT UNNEST(b.embedding) AS y) zb))) AS cos
        FROM embeddings a, embeddings b
        WHERE a.vec_id <> b.vec_id),
      r AS (
        SELECT qid, qlabel, cid, nlabel,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
        FROM p),
      votes AS (
        SELECT qid, qlabel, nlabel, COUNT(*) AS c FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
      pred AS (
        SELECT qid, qlabel, nlabel,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, nlabel ASC) AS vr
        FROM votes)
      SELECT qlabel AS label, COUNT(*) AS n,
             CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
             'true' AS ivf_ok
      FROM pred WHERE vr = 1
      GROUP BY qlabel
      ORDER BY label""")),

    // symmetric int8 quantization: both engines compute round(x*127/max|x|)
    // in identical double arithmetic with half-away-from-zero rounding, so
    // the code sums are integer-exact — every element of every vector is
    // pinned, not just aggregates of a float tolerance
    QueryDef("s7_int8_quant", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val q = Quantize.int8Codes(col("embedding"))
      emb.select(col("vec_id"),
          aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(q, lit(0L), (a, x) => a + abs(x)).as("q_abs_sum"),
          size(filter(q, x => abs(x) === 127)).cast("long").as("n_sat"),
          round(Quantize.maxAbs(col("embedding")), 6).as("max_abs"))
        .orderBy(col("vec_id"))
    }, Some("""
      WITH e AS (SELECT vec_id, unnest(embedding) AS x FROM embeddings),
      m AS (SELECT vec_id, MAX(abs(CAST(x AS DOUBLE))) AS ma FROM e GROUP BY vec_id),
      q AS (SELECT e.vec_id, ma,
              CASE WHEN ma = 0 THEN 0
                   ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / ma) AS INTEGER) END AS qi
            FROM e JOIN m USING (vec_id))
      SELECT vec_id, CAST(SUM(qi) AS BIGINT) AS q_sum,
             CAST(SUM(abs(qi)) AS BIGINT) AS q_abs_sum,
             CAST(SUM(CASE WHEN abs(qi) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
             round(MAX(ma), 6) AS max_abs
      FROM q GROUP BY vec_id ORDER BY vec_id"""))
  ).map(_.copy(repeatable = true)) // pure parquet reads: Bench may re-run for steady-state timing
}
