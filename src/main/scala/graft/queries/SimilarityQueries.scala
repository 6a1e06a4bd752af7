package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.{Clustering, Quantize, Similarity}
import Q._

/** Similarity search over the `embeddings` table (array<float> x 64). The
  * brute-force cosine top-k carries a DuckDB oracle (zip-unnest dot product);
  * cosines are rounded to 6dp on both sides to absorb summation-order ULPs —
  * ranking uses the raw values, whose candidate gaps are orders of magnitude
  * above ULP noise on this data.
  */
object SimilarityQueries {

  /** (total, hits) for a recall gate in ONE job: both top-k frames are
    * unique on (qid, cid) by construction, so a left join + two counts
    * equals the old `intersect.count` + `count` pair — without the two
    * distinct aggregations intersect plans, and one action instead of two.
    */
  private def recallStats(exact: org.apache.spark.sql.DataFrame,
      ann: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = exact.select(col("qid"), col("cid"))
      .join(ann.select(col("qid"), col("cid"), lit(1).as("__hit")),
        Seq("qid", "cid"), "left")
      .agg(count(lit(1)), count(col("__hit"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** All three facts of a standard ANN recall gate — (n_queries,
    * recall total, recall hits, self-at-rank-1 matches) — in ONE
    * union-tagged action where three ran (recall head + queries.count +
    * self count). The ann frame is eagerly checkpointed so its pipeline
    * runs once and its two consumers inside the single job can't race a
    * lazy cache; the independent subtrees' stages schedule concurrently.
    */
  private def annGateStats(queries: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame,
      annLazy: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
    val ann = annLazy.localCheckpoint()
    val recall = exact.select(col("qid"), col("cid"))
      .join(ann.select(col("qid"), col("cid"), lit(1).as("__hit")),
        Seq("qid", "cid"), "left")
      .agg(count(lit(1)).as("a"), count(col("__hit")).as("b"))
      .withColumn("__t", lit("r"))
    val self = ann.agg(
      coalesce(sum(when(col("rank") === 1 && col("qid") === col("cid"), 1L)
        .otherwise(0L)), lit(0L)).as("a"), lit(0L).as("b"))
      .withColumn("__t", lit("s"))
    val nq = queries.agg(count(lit(1)).as("a"), lit(0L).as("b"))
      .withColumn("__t", lit("q"))
    val rows = recall.unionByName(self).unionByName(nq).collect()
    def row(t: String) = rows.find(_.getString(2) == t).get
    (row("q").getLong(0), row("r").getLong(0), row("r").getLong(1),
      row("s").getLong(0))
  }

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
                    (SELECT SUM(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT UNNEST(qv) AS a, UNNEST(cv) AS b) z) /
                    (sqrt((SELECT SUM(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT UNNEST(qv) AS a) za)) *
                     sqrt((SELECT SUM(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT UNNEST(cv) AS b) zb))) AS cos
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
      val (nq, total, hits, selfMatches) = annGateStats(queries,
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Similarity.lshTopK(queries, emb, k = 5, nbits = 4, probes = 5))
      val selfOk = selfMatches == nq
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
      val (nq, total, hits, selfMatches) = annGateStats(queries,
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Similarity.ivfTopK(queries, emb, k = 5, nlist = 8, nprobe = 4))
      val selfOk = selfMatches == nq
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
      // brute-force query-side guard — NOT the scale path).
      // scale variant: the SAME aggregation over IVF (centroid-bucketed)
      // top-k — no all-pairs anywhere; agreement must land within 0.15 of
      // exact, proving the operator composes with the ANN paths at scale.
      // nprobe/nlist = 6/32: each query rescans ~19% of the corpus — a
      // real ANN work regime (8/4 would scan HALF the corpus, an ANN in
      // name only).
      // BOTH legs collect in ONE union-tagged action (was two sequential
      // collects): the two independent subtrees' stages schedule
      // concurrently inside the single job, so the exact leg back-fills
      // cores the IVF leg leaves idle (guide §2.6), and one aggregation
      // job runs where two ran. IVF totals fold from its per-label rows —
      // Σ per-label (n, n_agree) is exactly the old direct total.
      val exactAgg = Similarity.knnLabelAgreement(
        Similarity.bruteForceTopK(emb, emb, k = 6), emb)
        .withColumn("__leg", lit("e"))
      val ivfAgg = Similarity.knnLabelAgreement(
        Similarity.ivfTopK(emb, emb, k = 6, nlist = 32, nprobe = 6), emb)
        .withColumn("__leg", lit("i"))
      val allRows = exactAgg.unionByName(ivfAgg).collect()
      val rows = allRows.filter(_.getString(3) == "e").sortBy(_.getInt(0))
      val (eN, eAgree) = rows.foldLeft((0L, 0L)) { case ((a, b), r) =>
        (a + r.getLong(1), b + r.getLong(2)) }
      val (iN, iAgree) = allRows.filter(_.getString(3) == "i")
        .foldLeft((0L, 0L)) { case ((a, b), r) =>
          (a + r.getLong(1), b + r.getLong(2)) }
      val exactRate = eAgree.toDouble / eN
      val ivfRate = iAgree.toDouble / iN
      val ivfOk = (math.abs(ivfRate - exactRate) <= 0.15).toString
      import s.implicits._
      rows.toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), ivfOk))
        .toDF("label", "n", "n_agree", "ivf_ok")
        .orderBy(col("label"))
    }, Some("""
      WITH p AS (
        SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS cid, b.label AS nlabel,
               (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) z) /
               (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM (SELECT UNNEST(a.embedding) AS x) za)) *
                sqrt((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) FROM (SELECT UNNEST(b.embedding) AS y) zb))) AS cos
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
      // stage max-abs, then codes, then the aggregates: each interpreted
      // HOF input is computed once per row (CollapseProject keeps expensive
      // multiply-referenced projections staged, it does not re-inline them)
      emb.select(col("vec_id"), col("embedding"),
          Quantize.maxAbs(col("embedding")).as("__ma"))
        .select(col("vec_id"), col("__ma"),
          Quantize.int8CodesWithMax(col("embedding"), col("__ma")).as("__q"))
        .select(col("vec_id"),
          aggregate(col("__q"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("__q"), lit(0L), (a, x) => a + abs(x)).as("q_abs_sum"),
          size(filter(col("__q"), x => abs(x) === 127)).cast("long").as("n_sat"),
          round(col("__ma"), 6).as("max_abs"))
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
      FROM q GROUP BY vec_id ORDER BY vec_id""")),

    // deterministic Lloyd's k-means (smallest-id init, per-iteration 6dp
    // centroid rounding): DuckDB re-runs the SAME two iterations from the
    // same seeds, and integer id-sums pin every assignment exactly
    QueryDef("s8_kmeans_clusters", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      Clustering.kMeans(emb, k = 4, iters = 2)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("id_sum"))
        .orderBy(col("cluster"))
    }, Some(s"""
      WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve FROM embeddings),
      ${kmeansOracleCtes(4, 2)}
      SELECT cl AS cluster, COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS id_sum
      FROM aF GROUP BY cl ORDER BY cluster""")),

    // SemDeDup over a doubled corpus (500 exact duplicates + natural
    // near-dups above tau=0.35): within-cluster pruning keeps the
    // smallest-id representative of each similarity neighborhood
    QueryDef("s9_semantic_dedup", (s, dir) => {
      val emb = tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val u = emb.unionByName(
        emb.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
      val kept = Clustering.semanticDedup(Clustering.kMeans(u, k = 4, iters = 2), tau = 0.35)
      kept.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("id_sum"))
        .orderBy(col("cluster"))
    }, Some(s"""
      WITH u AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings),
      v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve FROM u),
      ${kmeansOracleCtes(4, 2)},
      drop AS (SELECT DISTINCT y.vec_id AS j
        FROM aF x JOIN aF y ON x.cl = y.cl AND x.vec_id < y.vec_id
        WHERE list_sum(list_transform(generate_series(1, 64), ii -> x.ve[ii] * y.ve[ii])) /
              (sqrt(list_sum(list_transform(x.ve, e -> e * e))) *
               sqrt(list_sum(list_transform(y.ve, e -> e * e)))) > 0.35),
      kept AS (SELECT * FROM aF WHERE vec_id NOT IN (SELECT j FROM drop))
      SELECT cl AS cluster, COUNT(*) AS n_kept, CAST(SUM(vec_id) AS BIGINT) AS id_sum
      FROM kept GROUP BY cl ORDER BY cluster""")),

    // PQ/ADC ANN gate (the memory-compression ANN path next to LSH and
    // IVF): 8 subspaces × 16 centroids = 32× compression at dim 64, ADC
    // candidates exact-re-ranked; recall@5 vs brute force measures 0.79 at
    // sf0.01 / 0.55 at sf0.1, pinned at 0.3 with margin, and every query
    // must surface itself at rank 1 (the self candidate survives refine
    // because its ADC score is its own reconstruction dot — the maximum
    // the table can produce for the query)
    QueryDef("s10_pq_ann", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val (nq, total, hits, selfMatches) = annGateStats(queries,
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Similarity.pqTopK(queries, emb, k = 5, m = 8, ksub = 16, refine = 8))
      val selfOk = selfMatches == nq
      import s.implicits._
      Seq((nq, (hits.toDouble / total >= 0.3).toString, selfOk.toString))
        .toDF("n_queries", "recall_ok", "self_ok")
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, 'true' AS recall_ok,
             'true' AS self_ok
      FROM embeddings WHERE vec_id < 20""")),

    // IVF-PQ (Similarity.ivfPqTopK) — PQ codes in the IVF list layout, the
    // large-query-set serving path (join on list, no crossJoin, no guard):
    // recall@5 vs brute force pinned at 0.3 with margin (measures well
    // above — residual encoding + exact re-rank), and every query must
    // surface itself at rank 1: self shares its own list (probed first)
    // and its ADC score dot(q̂,c)+ADC(q̂,r̂) is the table's best
    // reconstruction of 1.0, so it survives refine into the exact re-rank
    QueryDef("s14_ivfpq_ann", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val (nq, total, hits, selfMatches) = annGateStats(queries,
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Similarity.ivfPqTopK(queries, emb, k = 5,
          nlist = 8, nprobe = 4, m = 8, ksub = 16, refine = 8))
      val selfOk = selfMatches == nq
      import s.implicits._
      Seq((nq, (hits.toDouble / total >= 0.3).toString, selfOk.toString))
        .toDF("n_queries", "recall_ok", "self_ok")
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, 'true' AS recall_ok,
             'true' AS self_ok
      FROM embeddings WHERE vec_id < 20""")),

    // reciprocal-rank fusion of the two bucketed ANN paths (LSH + IVF,
    // k=10 each, fused to top-5): the ensemble's recall@5 vs brute force
    // must match-or-beat the WEAKER member's pin (it unions candidate
    // sets), and every query still ranks itself first — self is rank 1 in
    // both members, giving the maximum possible fused score
    QueryDef("s11_rrf_fusion", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val lsh = Similarity.lshTopK(queries, emb, k = 10, nbits = 4, probes = 5)
      val ivf = Similarity.ivfTopK(queries, emb, k = 10, nlist = 8, nprobe = 4)
      // NOT annGateStats (r17 A/B): the fused frame is heavy enough that
      // eagerly checkpointing it serializes the whole fusion before the
      // exact leg starts — in full-run context s11 regressed 1.24 -> 1.81;
      // the r16 persist shape overlaps them and stays fastest
      val fusedAll = Similarity.rrfFuse(Seq("lsh" -> lsh, "ivf" -> ivf), k = 5).persist()
      val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      val (total, hits) = recallStats(exact, fusedAll)
      val nq = queries.count()
      val selfOk = fusedAll.filter(col("rank") === 1 && col("qid") === col("cid")).count() == nq
      fusedAll.unpersist()
      import s.implicits._
      Seq((nq, (hits.toDouble / total >= 0.3).toString, selfOk.toString))
        .toDF("n_queries", "recall_ok", "self_ok")
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, 'true' AS recall_ok,
             'true' AS self_ok
      FROM embeddings WHERE vec_id < 20""")),

    // matryoshka stage-1: exact cosine top-k over the FIRST 16 of 64 dims —
    // deterministic, so DuckDB (list_slice + list_dot_product) pins it
    // bit-for-bit at 6 dp; this hashed frame is the stage the oracle can
    // reproduce. On top of it the gate runs the FULL truncate→overfetch→
    // full-dim-re-rank pipeline (Similarity.matryoshkaTopK) twice — default
    // brute-force stage 1, and the scale path with stage 1 generated by IVF
    // over the same 16-dim prefix (the `candidates` hook) — and pins each
    // variant's recall@5 vs the exact full-dimension top-k. Prefix cosines
    // on near-orthogonal random vectors are a weak proxy (~0.5 recall
    // here); pinned at 0.3 with margin, like the other ANN gates.
    QueryDef("s12_matryoshka", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      def trunc16(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val queries = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      // NOT the union-tagged single action (r17 A/B): both matryoshka
      // pipelines in one job regressed s12 in full-run context
      // (1.58 -> 1.94) — the two legs contend rather than overlap; the
      // r16 sequential persist shape stays fastest
      val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
        .select(col("qid"), col("cid")).persist()
      def recallOk(df: org.apache.spark.sql.DataFrame, floor: Double): String = {
        val (total, hits) = recallStats(exact, df)
        (hits.toDouble / total >= floor).toString
      }
      val matOk = recallOk(
        Similarity.matryoshkaTopK(queries, corpus, k = 5, dims = 16), 0.3)
      val ivfCand = Similarity.ivfTopK(trunc16(queries), trunc16(corpus),
        k = 20, nlist = 8, nprobe = 4)
      val ivfOk = recallOk(
        Similarity.matryoshkaTopK(queries, corpus, k = 5, dims = 16,
          candidates = Some(ivfCand)), 0.3)
      exact.unpersist()
      Similarity.bruteForceTopK(trunc16(queries), trunc16(corpus), k = 5)
        .select(col("qid"), col("rank"), col("cid"), col("cosine"))
        .withColumn("mat_ok", lit(matOk))
        .withColumn("ivf_ok", lit(ivfOk))
        .orderBy(col("qid"), col("rank"))
    }, Some("""
      WITH q AS (SELECT vec_id AS qid, list_slice(embedding, 1, 16) AS qv
                 FROM embeddings WHERE vec_id < 10),
           c AS (SELECT vec_id AS cid, list_slice(embedding, 1, 16) AS cv
                 FROM embeddings WHERE vec_id >= 10),
           p AS (
             SELECT qid, cid,
                    (SELECT SUM(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT UNNEST(qv) AS a, UNNEST(cv) AS b) z) /
                    (sqrt((SELECT SUM(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT UNNEST(qv) AS a) za)) *
                     sqrt((SELECT SUM(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT UNNEST(cv) AS b) zb))) AS cos
             FROM q, c),
           r AS (SELECT qid, cid, cos,
                        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
                 FROM p)
      SELECT qid, CAST(rank AS INTEGER) AS rank, cid, round(cos, 6) AS cosine,
             'true' AS mat_ok, 'true' AS ivf_ok
      FROM r WHERE rank <= 5
      ORDER BY qid, rank""")),

    // two-level k-means (Clustering.kMeansTwoLevel) at effective k = 256
    // (16 coarse lists × 16 fine centroids) — the large-k regime the
    // expression-tree kMeans is bounded out of. The gate pins: (a) the
    // cluster-id space stays within [kCoarse, kCoarse·kFine]; (b) the
    // coarse/fine/cluster columns obey cluster = list·kFine + fine for
    // every row; (c) clustering beats the one-centroid baseline — mean
    // squared distance to the assigned fine centroid < mean squared
    // distance to the global mean vector. (Bit-for-bit determinism across
    // independent runs is pinned by ClusteringSpec — re-running the whole
    // pipeline in-gate would double the gate's cost for a claim the unit
    // spec already holds.)
    QueryDef("s13_kmeans_twolevel", (s, dir) => {
      import graft.functions.VectorFunctions.dot
      val emb = tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dv = transform(col("embedding"), x => x.cast("double"))
      val run1 = Clustering.kMeansTwoLevel(emb, kCoarse = 16, kFine = 16,
        iters = 2)
      // EVERY gate fact from ONE per-cluster aggregation (was ~6 jobs, two
      // of them corpus×dim posexplode joins): per cluster collect n, the
      // id-consistency violations, Σ|v|² and the per-dim means; then
      // driver-side algebra over the ≤256 rows —
      //   Σ_{v∈c} |v − m_c|² = Σ|v|² − n_c·|m_c|²   (m_c = mean of cluster)
      //   global mean g = Σ n_c·m_c / N, E|v−g|² = Σ|v|²/N − |g|²
      // The compared quantities are the same means-vs-means contrast as the
      // old two-pass formulation (FP summation order differs; the gate
      // output only carries the comparison booleans).
      // dimension read off the data (one limit-1 row, ~tens of ms), not
      // hardcoded: the per-dim mean columns must match the fixture's real
      // width or the variance algebra silently reads wrong positions
      val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
      val meanCols = (0 until dim).map(i =>
        avg(element_at(col("__v"), i + 1)).as(s"__m$i"))
      val perCluster = run1
        .select(col("cluster"), col("list"), col("fine"), dv.as("__v"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("__n"),
          (Seq(
            sum(when(col("cluster") =!= col("list") * lit(16) + col("fine"), 1L)
              .otherwise(0L)).as("__bad"),
            sum(dot(col("__v"), col("__v"))).as("__v2")) ++ meanCols): _*)
        .collect()
      val n = perCluster.map(_.getLong(1)).sum
      val nClusters = perCluster.length.toLong
      val clustersOk = nClusters >= 16 && nClusters <= 256
      val idsOk = perCluster.map(_.getLong(2)).sum == 0L
      val sumV2 = perCluster.map(_.getDouble(3)).sum
      def means(r: org.apache.spark.sql.Row): Array[Double] =
        Array.tabulate(dim)(i => r.getDouble(4 + i))
      val withinAvg = perCluster.map { r =>
        val m = means(r)
        r.getDouble(3) - r.getLong(1) * m.map(x => x * x).sum
      }.sum / n
      val g = (0 until dim).map(i =>
        perCluster.map(r => r.getLong(1) * r.getDouble(4 + i)).sum / n)
      val globalAvg = sumV2 / n - g.map(x => x * x).sum
      import s.implicits._
      Seq((n, clustersOk.toString, idsOk.toString, (withinAvg < globalAvg).toString))
        .toDF("n_vectors", "clusters_ok", "ids_ok", "quality_ok")
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, 'true' AS clusters_ok,
             'true' AS ids_ok, 'true' AS quality_ok
      FROM embeddings""")),

    // Retrieval evaluation: recall@10 / MRR / nDCG@10 per query, exact
    // hash-match. Predictions = exact top-10; relevance = the cosine≥0.3
    // set (self + planted near-dups), taken as rank≤50 ∧ cosine≥0.3 so the
    // oracle can mirror the semantics literally. The metrics operator
    // itself consumes ANY (qid,cid,rank) frame — the ANN paths compose
    // exactly as in s6. DCG/IDCG are ≤10-term log2 sums; 4dp rounding
    // absorbs libm/sum-order ULPs (the t26 convention).
    QueryDef("s15_retrieval_eval", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 15)
      val ranked = Similarity.bruteForceTopK(queries, emb, k = 50).persist()
      val rel = ranked.filter(col("cosine") >= 0.3).select(col("qid"), col("cid"))
      val pred = ranked.filter(col("rank") <= 10)
        .select(col("qid"), col("cid"), col("rank"))
      val out = graft.llm.Retrieval.retrievalMetrics(pred, rel, k = 10)
        .orderBy(col("qid")).localCheckpoint()
      ranked.unpersist()
      out
    }, Some(s"""
      WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 15),
           c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
           p AS (
             SELECT qid, cid,
                    (SELECT SUM(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT UNNEST(qv) AS a, UNNEST(cv) AS b) z) /
                    (sqrt((SELECT SUM(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT UNNEST(qv) AS a) za)) *
                     sqrt((SELECT SUM(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT UNNEST(cv) AS b) zb))) AS cos
             FROM q, c),
           r AS (SELECT qid, cid, round(cos, 6) AS cosine,
                        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
                 FROM p),
           rel AS (SELECT qid, cid FROM r WHERE rank <= 50 AND cosine >= 0.3),
           pred AS (SELECT qid, cid, rank FROM r WHERE rank <= 10),
           m AS (SELECT pr.qid, pr.rank,
                        CASE WHEN rl.cid IS NOT NULL THEN 1 ELSE 0 END AS is_rel
                 FROM pred pr LEFT JOIN rel rl ON pr.qid = rl.qid AND pr.cid = rl.cid),
           pq AS (SELECT qid, CAST(SUM(is_rel) AS BIGINT) AS hits,
                         SUM(CASE WHEN is_rel = 1 THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg,
                         MIN(CASE WHEN is_rel = 1 THEN rank END) AS frank
                  FROM m GROUP BY qid),
           rs AS (SELECT qid, COUNT(*) AS n_rel FROM rel GROUP BY qid),
           ideal AS (SELECT s.m, SUM(1.0 / log2(t.i + 1)) AS idcg
                     FROM generate_series(1, 10) s(m)
                     JOIN generate_series(1, 10) t(i) ON t.i <= s.m
                     GROUP BY s.m)
      SELECT rs.qid, rs.n_rel, COALESCE(pq.hits, 0) AS hits,
             round(CAST(COALESCE(pq.hits, 0) AS DOUBLE) / rs.n_rel, 4) AS recall_at_k,
             round(COALESCE(1.0 / pq.frank, 0), 4) AS mrr,
             round(COALESCE(pq.dcg, 0) / ideal.idcg, 4) AS ndcg
      FROM rs JOIN ideal ON ideal.m = LEAST(10, rs.n_rel)
      LEFT JOIN pq ON pq.qid = rs.qid
      ORDER BY rs.qid"""))
  ).map(_.copy(repeatable = true)) // pure parquet reads: Bench may re-run for steady-state timing

  /** DuckDB replica of [[graft.llm.Clustering.kMeans]] (dim=64, 6dp centroid
    * rounding) as a CTE chain over `v(vec_id, ve)`: c0 = smallest-id seeds,
    * a{t}/c{t} = assign + rounded-mean update per iteration, aF = final
    * assignment. The rounding makes both engines' centroids decimal-equal
    * (±1 ULP of the same decimal), so assignments — integer facts — match
    * exactly even though partial-sum order differs.
    */
  private def kmeansOracleCtes(k: Int, iters: Int): String = {
    def assign(name: String, cents: String): String = s"""$name AS (SELECT vec_id, ve, cl FROM (
        SELECT v2.vec_id, v2.ve, c.cl,
          ROW_NUMBER() OVER (PARTITION BY v2.vec_id ORDER BY
            list_sum(list_transform(generate_series(1, 64), ii -> (v2.ve[ii] - c.ce[ii]) * (v2.ve[ii] - c.ce[ii]))) ASC,
            c.cl ASC) AS rk
        FROM v v2 CROSS JOIN $cents c) rr WHERE rk = 1)"""
    val init = s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, ve AS ce
        FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT $k) init),
      dims AS (SELECT unnest(generate_series(1, 64)) AS i)"""
    val steps = (1 to iters).flatMap { t =>
      Seq(assign(s"a$t", s"c${t - 1}"),
        s"""c$t AS (SELECT cl, list(m ORDER BY i) AS ce FROM (
        SELECT cl, i, round(avg(ve[i]), 6) AS m FROM a$t, dims GROUP BY cl, i) mm GROUP BY cl)""")
    }
    (init +: steps :+ assign("aF", s"c$iters")).mkString(",\n      ")
  }
}
