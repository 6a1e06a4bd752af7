package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.Similarity
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

    QueryDef("s3_ann_lsh", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      Similarity.lshTopK(queries, emb, k = 5, nbits = 8, probes = 3)
        .orderBy(col("qid"), col("rank"))
    }, None),

    QueryDef("s4_embedding_neardup", (s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      // embedding-cosine near-dup: doubled corpus -> exact dups at cos ~ 1
      val u = emb.unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      val top = Similarity.lshTopK(
        u.filter(col("vec_id") >= 1000000L), u.filter(col("vec_id") < 1000000L),
        k = 1, nbits = 8, probes = 2)
      top.filter(col("cosine") > 0.999)
        .select(col("qid"), col("cid"), col("cosine"))
        .orderBy(col("qid"))
    }, None)
  )
}
