package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Chunking, ClassifierScore, Dedup, Multimodal, Packing, Retrieval, TextStats}
import Q._

/** LLM-corpus text operators over the `documents` table. Queries whose
  * semantics are ANSI-expressible carry DuckDB oracles; sketch-based ops
  * (minhash/simhash/fingerprint/langid) are covered by unit tests instead and
  * run as rows-only checks here.
  *
  * Several queries run against a doubled corpus (documents UNION documents
  * with shifted ids) so dedup operators demonstrably remove rows.
  */
object Text {

  private def doubled(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = tbl(s, dir, "documents")
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  val defs: Seq[QueryDef] = Seq(
    // Okapi BM25 top-5 per query (k1=1.25, b=0.75 — dyadic constants, so
    // both engines fold identical doubles). Per-doc term contributions sum
    // by a term-ordered left fold on BOTH sides, pinning the double bits;
    // scores round to 4dp in the output only
    QueryDef("t27_bm25", (s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val queries = Seq(
        (1, "join hash filter"),
        (2, "customer order query"),
        (3, "vector window sort")).toDF("qid", "qtext")
      Retrieval.bm25TopK(docs, queries, k = 5)
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("qid"), col("rank"))
    }, Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
      st AS (SELECT (SELECT COUNT(*) FROM dl) AS n_docs, (SELECT AVG(dl) FROM dl) AS avgdl),
      q(qid, qtext) AS (VALUES (1, 'join hash filter'), (2, 'customer order query'), (3, 'vector window sort')),
      qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS word FROM q),
      dfx AS (SELECT word, COUNT(*) AS df FROM tf WHERE word IN (SELECT word FROM qt) GROUP BY word),
      c AS (SELECT qt.qid, tf.doc_id, qt.word,
              ln(1 + (st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
              tf.tf * 2.25 / (tf.tf + 1.25 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS contrib
            FROM qt JOIN tf USING (word) JOIN dfx USING (word)
                 JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
      sc AS (SELECT qid, doc_id, list_sum(list(contrib ORDER BY word)) AS score
             FROM c GROUP BY qid, doc_id),
      r AS (SELECT qid, doc_id, score,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank
            FROM sc)
      SELECT qid, CAST(rank AS INT) AS rank, doc_id, round(score, 4) AS score
      FROM r WHERE rank <= 5 ORDER BY qid, rank""")),

    // duplicated-span coverage (exact-substring dedup statistics): token
    // positions covered by any 8-gram occurring >= 2 times corpus-wide,
    // aggregated per source — integer-exact on both engines
    QueryDef("t28_dup_spans", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 8, minCount = 2)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("covered_tokens")).as("dup_tokens"),
          sum(when(col("covered_tokens") > 0, 1L).otherwise(0L)).as("docs_with_dup"))
        .orderBy(col("source"))
    }, Some("""
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      g AS (SELECT doc_id, i AS start, array_to_string(toks[i:i+7], ' ') AS gram
            FROM w, UNNEST(generate_series(1, greatest(0, len(toks) - 7))) AS t(i)),
      d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
      cov AS (SELECT DISTINCT doc_id, start + off AS pos
              FROM g JOIN d USING (gram), UNNEST(generate_series(0, 7)) AS o(off)),
      per AS (SELECT doc_id, COUNT(*) AS covered FROM cov GROUP BY doc_id)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
             CAST(SUM(COALESCE(per.covered, 0)) AS BIGINT) AS dup_tokens,
             CAST(SUM(CASE WHEN per.covered IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_dup
      FROM w LEFT JOIN per USING (doc_id)
      GROUP BY source ORDER BY source""")),

    QueryDef("t1_dedup_exact", (s, dir) => {
      val u = doubled(s, dir)
      Dedup.exact(u, Seq("text"), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
        .orderBy(col("source"))
    }, Some("""
      WITH u AS (
        SELECT doc_id, text, source, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, source, n_chars FROM documents),
      keep AS (SELECT MIN(doc_id) AS doc_id FROM u GROUP BY text)
      SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
      FROM u JOIN keep USING (doc_id)
      GROUP BY source
      ORDER BY source""")),

    QueryDef("t2_token_stats", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      // whitespace token count via the length-difference identity, which is
      // exactly expressible in ANSI SQL (single-space-separated corpus)
      val ntok = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1)).cast("long")
      docs.select(col("source"), ntok.as("ntok"), col("n_chars"))
        .groupBy(col("source"))
        .agg(sum(col("ntok")).as("total_tokens"),
          max(col("ntok")).as("max_tokens"),
          (d(sum(col("n_chars"))) / count(lit(1))).as("avg_chars"))
        .orderBy(col("source"))
    }, Some("""
      SELECT source,
             CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens,
             MAX(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)) AS max_tokens,
             CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents
      GROUP BY source
      ORDER BY source""")),

    QueryDef("t3_text_quality", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      // SQL-expressible quality signals: per-lang punctuation density and
      // occurrences of the stopword "the" (length-difference trick on both sides)
      val nThe = ((length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / lit(3)).cast("long")
      val nPeriod = (length(col("text")) - length(regexp_replace(col("text"), "\\.", ""))).cast("long")
      docs.select(col("lang"), nThe.as("n_the"), nPeriod.as("n_period"), col("n_chars"))
        .groupBy(col("lang"))
        .agg(sum(col("n_the")).as("the_total"),
          sum(col("n_period")).as("period_total"),
          (d(sum(col("n_the"))) * 1000.0 / d(sum(col("n_chars")))).as("the_per_kchar"))
        .orderBy(col("lang"))
    }, Some("""
      SELECT lang,
             CAST(SUM((length(text) - length(replace(text, 'the', ''))) // 3) AS BIGINT) AS the_total,
             CAST(SUM(length(text) - length(replace(text, '.', ''))) AS BIGINT) AS period_total,
             CAST(SUM(CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)) AS DOUBLE) * 1000.0
               / CAST(SUM(n_chars) AS DOUBLE) AS the_per_kchar
      FROM documents
      GROUP BY lang
      ORDER BY lang""")),

    // every signal mirrored in DuckDB list/regex SQL; ratios are single IEEE
    // divisions of integer counts, so the float compare is exact
    QueryDef("t4_quality_score", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      // fan out, project, sort LAST: sorting first ran the expensive
      // signal expressions on the post-sort partitions (2 after AQE
      // coalescing — 1.1 s on 2 cores); fanned out they run 32-wide, and
      // the range-sampler's second evaluation of the projection subtree
      // is also 32-wide, which together beats one narrow evaluation
      val spread = graft.llm.Fanout.fanOutSmall(docs)
      spread.select(col("doc_id"),
        TextStats.tokenCountWs(col("text")).as("n_tokens_ws"),
        TextStats.tokenCountBpeIsh(col("text")).as("n_tokens_bpe"),
        TextStats.stopwordRatio(col("text")).as("stopword_ratio"),
        TextStats.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH sig AS (
        SELECT doc_id, text, trim(text) AS tt,
          CASE WHEN length(trim(text)) = 0 THEN 0.0
               ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','it','that','this','for','on','with','as'], t))) AS DOUBLE)
                    / len(string_split_regex(lower(trim(text)), '\s+')) END AS stopword_ratio,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text) END AS punct,
          CASE WHEN length(trim(text)) = 0 THEN 0.0
               ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t))) AS DOUBLE)
                    / len(string_split_regex(trim(text), '\s+')) END AS mwl
        FROM documents)
      SELECT doc_id,
        CASE WHEN length(tt) = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(len(string_split_regex(tt, '\s+')) AS BIGINT) END AS n_tokens_ws,
        CAST(coalesce(list_sum(list_transform(
            regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]'),
            w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_tokens_bpe,
        stopword_ratio,
        round(
          least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.3 +
          (CASE WHEN punct > 0.2 THEN 0.0 ELSE 1.0 - punct * 5.0 * 0.5 END) * 0.2 +
          (CASE WHEN stopword_ratio > 0.6 THEN 0.5 ELSE least(stopword_ratio * 3.0, 1.0) END) * 0.3 +
          (CASE WHEN mwl < 2.0 OR mwl > 12.0 THEN 0.2 ELSE 1.0 END) * 0.2, 6) AS quality
      FROM sig
      ORDER BY doc_id""")),

    // the corpus is ASCII, so detectLanguage reduces to its stopword-voting
    // path — fully replicated in DuckDB list SQL (votes sorted (v, lang),
    // max wins, < 0.02 -> 'und'), giving the UDF a per-row oracle
    QueryDef("t5_langid", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      docs.orderBy(col("doc_id"))
        .select(col("doc_id"), TextStats.langIdUdf(col("text")).as("pred_lang"))
    }, Some("""
      WITH t AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        FROM documents),
      v AS (
        SELECT doc_id, toks,
          list_sort([
            {'v': CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','that','it','was','for','with','are'], t))) AS DOUBLE) / len(toks) END, 'l': 'en'},
            {'v': CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein','eine','zu','den','mit','von'], t))) AS DOUBLE) / len(toks) END, 'l': 'de'},
            {'v': CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(['le','la','les','et','est','un','une','des','du','que','pour','dans'], t))) AS DOUBLE) / len(toks) END, 'l': 'fr'},
            {'v': CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(['el','los','las','y','es','un','una','de','en','por','para','con'], t))) AS DOUBLE) / len(toks) END, 'l': 'es'},
            {'v': CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(['il','lo','gli','e','di','che','un','una','per','sono','con','del'], t))) AS DOUBLE) / len(toks) END, 'l': 'it'},
            {'v': CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(['o','os','as','e','de','que','um','uma','para','com','em','do'], t))) AS DOUBLE) / len(toks) END, 'l': 'pt'}
          ]) AS votes
        FROM t)
      SELECT doc_id,
        CASE WHEN len(toks) = 0 OR votes[-1].v < 0.02 THEN 'und' ELSE votes[-1].l END AS pred_lang
      FROM v
      ORDER BY doc_id""")),

    // polynomial rolling hash mod 2^61-1, replayed in DuckDB via HUGEINT
    // list_reduce over the normalized text's codepoints — exact per-row
    QueryDef("t6_fingerprint", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      docs.orderBy(col("doc_id"))
        .select(col("doc_id"), TextStats.fingerprintUdf(col("text")).as("fingerprint"))
    }, Some("""
      WITH t AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        FROM documents)
      SELECT doc_id,
        CAST(list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
            list_transform(range(1, length(nt) + 1), i -> CAST(unicode(nt[i]) AS HUGEINT))),
          (h, c) -> (h * 1000003 + c) % 2305843009213693951) AS BIGINT) AS fingerprint
      FROM t
      ORDER BY doc_id""")),

    // exact-dup pairs (id, id+1M) must land in the same cluster, and since
    // twins always travel together every cluster has even size — both pinned
    // per-row by the oracle
    QueryDef("t7_minhash_clusters", (s, dir) => {
      val u = doubled(s, dir)
      val cl = Dedup.minHashLsh(u, "doc_id", "text")
      val a = cl.filter(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("cluster_id").as("ca"))
      val b = cl.filter(col("doc_id") >= 1000000L)
        .select((col("doc_id") - 1000000L).as("doc_id"), col("cluster_id").as("cb"))
      val odd = cl.groupBy(col("cluster_id")).agg(count(lit(1)).as("m"))
        .filter(col("m") % 2 =!= 0).count()
      a.join(b, "doc_id")
        .select(col("doc_id"),
          (col("ca") === col("cb")).cast("string").as("twin_same_cluster"),
          lit((odd == 0L).toString).as("even_sizes"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, 'true' AS twin_same_cluster, 'true' AS even_sizes
      FROM documents ORDER BY doc_id""")),

    // identical text must simhash identically (per-row twin check over the
    // doubled corpus); bit-count sanity pinned alongside
    QueryDef("t8_simhash", (s, dir) => {
      val u = doubled(s, dir)
      val sh = Dedup.simHash(u, "doc_id", "text")
      val a = sh.filter(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("simhash").as("ha"))
      val b = sh.filter(col("doc_id") >= 1000000L)
        .select((col("doc_id") - 1000000L).as("doc_id"), col("simhash").as("hb"))
      a.join(b, "doc_id")
        .select(col("doc_id"),
          (col("ha") === col("hb")).cast("string").as("twin_equal"),
          (col("ha") =!= 0L).cast("string").as("nonzero"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, 'true' AS twin_equal, 'true' AS nonzero
      FROM documents ORDER BY doc_id""")),

    // recall gate: every identical-text pair must surface from the banded
    // candidate pipeline with estimated jaccard exactly 1.0
    QueryDef("t9_neardup_pairs", (s, dir) => {
      val u = doubled(s, dir)
      val pairs = Dedup.nearDupPairsMinHash(u, "doc_id", "text", threshold = 0.8)
      val twins = pairs
        .filter(col("id_b") === col("id_a") + 1000000L && col("jaccard") === 1.0)
        .select(col("id_a").as("doc_id"), lit(true).as("f"))
      u.filter(col("doc_id") < 1000000L).select(col("doc_id"))
        .join(twins, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("f"), lit(false)).cast("string").as("twin_pair_found"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, 'true' AS twin_pair_found FROM documents ORDER BY doc_id""")),

    QueryDef("t10_simhash_pairs", (s, dir) => {
      val u = doubled(s, dir)
      val pairs = Dedup.nearDupPairsSimHash(u, "doc_id", "text", maxHamming = 3)
      val twins = pairs
        .filter(col("id_b") === col("id_a") + 1000000L && col("hamming") === 0)
        .select(col("id_a").as("doc_id"), lit(true).as("f"))
      u.filter(col("doc_id") < 1000000L).select(col("doc_id"))
        .join(twins, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("f"), lit(false)).cast("string").as("twin_pair_found"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, 'true' AS twin_pair_found FROM documents ORDER BY doc_id""")),

    // exact n-gram Jaccard scoring (the rescore step behind near-dup
    // verification), pinned value-for-value against DuckDB's jaccard()
    // over a deterministic consecutive-id pair set
    QueryDef("t11_ngram_jaccard", (s, dir) => {
      val d0 = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      // fan the stream side out: the per-pair char-gram set expressions are
      // the cost, and a one-file corpus runs them on one core after the
      // broadcast join (no-op at real corpus widths)
      val par = s.sparkContext.defaultParallelism
      val d = if (d0.rdd.getNumPartitions < par) d0.repartition(par) else d0
      val b = d0.select((col("doc_id") - 1).as("doc_id"), col("text").as("text_b"))
      d.join(b, Seq("doc_id"))
        .select(col("doc_id"),
          round(Dedup.ngramJaccard(col("text"), col("text_b"), 1), 6).as("jac"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT a.doc_id, ROUND(jaccard(a.text, b.text), 6) AS jac
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      ORDER BY a.doc_id""")),

    // stratified sampling (curation staple: "give me exactly k docs per
    // language × source"): deterministic LCG order so the oracle draws the
    // IDENTICAL sample; row_number<=k compiles to Partial/Final
    // WindowGroupLimit so no stratum ever travels whole (see
    // Sampling.stratifiedTopK)
    QueryDef("t12_stratified_sample", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.llm.Sampling.stratifiedTopK(docs, Seq("lang", "source"), "doc_id", k = 5)
        .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("source"), col("doc_id"))
    }, Some("""
      SELECT lang, source, doc_id, n_chars FROM (
        SELECT lang, source, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang, source
                 ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rk
        FROM documents) t
      WHERE rk <= 5
      ORDER BY lang, source, doc_id""")),

    // benchmark decontamination (training-data hygiene: drop corpus docs
    // that share any word 8-gram with an eval/benchmark set): explode
    // benchmark grams (tiny side, broadcast), semi-join the corpus grams
    // against them, report per-source contamination. At 100 TB the corpus
    // side streams through the broadcast semi-join — no shuffle of the
    // exploded grams; in production the gram strings would hash to longs
    // first, which changes bytes moved but not this plan shape
    QueryDef("t13_decontaminate", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      // guarded helper: under-n-token docs yield an empty gram array
      // (sequence(1,0) in Spark is the DESCENDING [1,0], not empty)
      def grams(n: Int) = graft.llm.Decontaminate.wordNgrams(col("text"), n)
      val bench = docs.filter(col("doc_id") < 20)
        .select(explode(grams(8)).as("gram")).distinct()
      val corpus = docs.filter(col("doc_id") >= 20)
      // fan the corpus out before the gram explode + broadcast semi-join —
      // all map-side, so a one-file corpus runs it on one core (no-op at
      // real corpus widths; same fix as Decontaminate.contaminatedIds)
      val par = s.sparkContext.defaultParallelism
      val spread =
        if (corpus.rdd.getNumPartitions < par) corpus.repartition(par) else corpus
      val contaminated = spread
        .select(col("doc_id"), explode(grams(8)).as("gram"))
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct()
      corpus
        .join(contaminated.withColumn("hit", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"))
        .orderBy(col("source"))
    }, Some("""
      WITH w AS (
        SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
      bg AS (
        SELECT DISTINCT array_to_string(words[i:i+7], ' ') AS gram
        FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 7))) AS t(i)
        WHERE doc_id < 20),
      cg AS (
        SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 7))) AS t(i)
        WHERE doc_id >= 20),
      hits AS (
        SELECT DISTINCT doc_id FROM cg WHERE gram IN (SELECT gram FROM bg))
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM hits) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      FROM documents
      WHERE doc_id >= 20
      GROUP BY source
      ORDER BY source""")),

    // Gopher-style repetition filters (duplicate-word/bigram fraction,
    // top-unigram coverage): per-doc signals are pure array expressions;
    // aggregation sums exact integers per source and divides once at the
    // end, so Spark and DuckDB agree bit-for-bit. `n_repetitive` counts
    // docs whose top word covers >10% of the text — the integer-compare
    // form (topFreq*10 > nWords) keeps the threshold exact too.
    QueryDef("t14_repetition", (s, dir) => {
      val sig = TextStats.repetitionSignals(tbl(s, dir, "documents"))
      sig.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (d(sum(col("n_words") - col("n_distinct_words"))) / d(sum(col("n_words"))))
            .as("dup_word_frac"),
          (d(sum(col("top_word_freq"))) / d(sum(col("n_words"))))
            .as("top_word_frac"),
          (d(sum(col("n_bigrams") - col("n_distinct_bigrams"))) / d(sum(col("n_bigrams"))))
            .as("dup_bigram_frac"),
          sum(when(col("top_word_freq") * 10 > col("n_words"), 1L).otherwise(0L))
            .as("n_repetitive"))
        .orderBy(col("source"))
    }, Some("""
      WITH sig AS (
        SELECT source,
          string_split(text, ' ') AS w,
          len(string_split(text, ' ')) AS total,
          len(list_distinct(string_split(text, ' '))) AS dn,
          list_max(list_transform(list_distinct(string_split(text, ' ')),
            x -> len(list_filter(string_split(text, ' '), y -> y = x)))) AS topf
        FROM documents),
      big AS (
        SELECT source, total, dn, topf,
          list_transform(w[1:len(w)-1], (x, i) -> x || ' ' || w[i+1]) AS bg
        FROM sig)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(total - dn) AS DOUBLE) / CAST(SUM(total) AS DOUBLE) AS dup_word_frac,
        CAST(SUM(topf) AS DOUBLE) / CAST(SUM(total) AS DOUBLE) AS top_word_frac,
        CAST(SUM(len(bg) - len(list_distinct(bg))) AS DOUBLE)
          / CAST(SUM(len(bg)) AS DOUBLE) AS dup_bigram_frac,
        CAST(SUM(CASE WHEN topf * 10 > total THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
      FROM big
      GROUP BY source
      ORDER BY source""")),

    // corpus TF-IDF keyword extraction: top term per document ranked by
    // (tf desc, df asc, term asc) — exact integer/string ordering, no
    // floating-point IDF, so the full per-doc result hash-matches DuckDB
    QueryDef("t15_tfidf_terms", (s, dir) => {
      TextStats.topTfIdfTerms(tbl(s, dir, "documents"), k = 1)
        .select(col("doc_id"), col("term"), col("tf"), col("df"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
      dfr AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
      ranked AS (
        SELECT doc_id, word, tf.tf, dfr.df,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY tf.tf DESC, dfr.df ASC, word ASC) AS rn
        FROM tf JOIN dfr USING (word))
      SELECT doc_id, word AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
      FROM ranked WHERE rn = 1
      ORDER BY doc_id""")),

    // token-budget sequence packing (training context-window assembly):
    // boundary-crossing prefix-sum packing into 512-token bins per source;
    // all outputs are exact integers, so the full per-source bin stats
    // hash-match the oracle
    QueryDef("t16_pack_tokens", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val ntok = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1))
      Packing.packByTokenBudget(docs, budget = 512L, tokens = ntok)
        .groupBy(col("source"), col("pack_bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pack_tokens")).as("bin_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("bin_tokens")).as("total_tokens"),
          max(col("bin_tokens")).as("max_bin_tokens"),
          min(col("bin_tokens")).as("min_bin_tokens"))
        .orderBy(col("source"))
    }, Some("""
      WITH d AS (
        SELECT source, doc_id,
          CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ntok
        FROM documents),
      cum AS (
        SELECT source, doc_id, ntok,
          SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d),
      bins AS (
        SELECT source, (cum - ntok) // 512 AS bin,
               COUNT(*) AS n_docs, SUM(ntok) AS bin_tokens
        FROM cum GROUP BY source, bin)
      SELECT source, COUNT(*) AS n_bins,
        CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
        CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens,
        CAST(MIN(bin_tokens) AS BIGINT) AS min_bin_tokens
      FROM bins
      GROUP BY source
      ORDER BY source""")),

    // flagship end-to-end curation pipeline: the library's operators
    // composed the way a training-data job actually runs them —
    // quality filter → exact dedup (doubled corpus) → benchmark
    // decontamination → stratified sample → token-budget packing. Every
    // stage is the same code path as its standalone gate (t1/t12/t13/t16),
    // and the whole composition still hash-matches DuckDB end to end.
    QueryDef("t17_curation_pipeline", (s, dir) => {
      val ntok = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1))
      // 1. quality gate: keep mid-length docs (30..90 whitespace tokens)
      val quality = doubled(s, dir)
        .withColumn("ntok", ntok.cast("long"))
        .filter(col("ntok") >= 30 && col("ntok") <= 90)
      // 2. exact dedup folds the doubled corpus back to originals
      val deduped = Dedup.exact(quality, Seq("text"), "doc_id")
      // 3. decontaminate vs the benchmark slice (doc_id < 20): any doc
      // sharing a word 8-gram is dropped — including the bench docs
      def grams8 = graft.llm.Decontaminate.wordNgrams(col("text"), 8)
      val bench = tbl(s, dir, "documents").filter(col("doc_id") < 20)
        .select(explode(grams8).as("gram")).distinct()
      // contamination is a pure function of a doc's TEXT, so probe the
      // PRE-dedup quality frame: the anti-join below ignores hit ids that
      // dedup dropped (they are absent from `deduped`), so the clean set is
      // identical — and the dedup window subtree is no longer recomputed
      // for this branch. The quality frame is scan-adjacent, so the narrow-
      // input fan-out condition is decidable (and a no-op at real widths).
      val par = s.sparkContext.defaultParallelism
      val qSpread =
        if (quality.rdd.getNumPartitions < par) quality.repartition(par) else quality
      val contaminated = qSpread
        .select(col("doc_id"), explode(grams8).as("gram"))
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct()
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      // 4. deterministic stratified sample: 10 docs per source
      val sampled = graft.llm.Sampling.stratifiedTopK(clean, Seq("source"), "doc_id", k = 10)
      // 5. pack the sample into 256-token training bins
      Packing.packByTokenBudget(sampled, budget = 256L, tokens = col("ntok"))
        .groupBy(col("source"), col("pack_bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pack_tokens")).as("bin_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("bin_tokens")).as("total_tokens"))
        .orderBy(col("source"))
    }, Some("""
      WITH u AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL SELECT doc_id + 1000000, text, source FROM documents),
      q AS (
        SELECT doc_id, text, source,
          CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ntok
        FROM u
        WHERE length(text) - length(replace(text, ' ', '')) + 1 BETWEEN 30 AND 90),
      keep AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
      dd AS (SELECT q.doc_id, q.text, q.source, q.ntok FROM q JOIN keep USING (doc_id)),
      w AS (SELECT doc_id, source, ntok, string_split(text, ' ') AS words FROM dd),
      bw AS (SELECT string_split(text, ' ') AS words FROM documents WHERE doc_id < 20),
      bg AS (SELECT DISTINCT array_to_string(words[i:i+7], ' ') AS gram
             FROM bw, UNNEST(generate_series(1, greatest(0, len(words) - 7))) AS t(i)),
      hits AS (SELECT DISTINCT doc_id
               FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 7))) AS t(i)
               WHERE array_to_string(words[i:i+7], ' ') IN (SELECT gram FROM bg)),
      clean AS (SELECT doc_id, source, ntok FROM w
                WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
      samp AS (
        SELECT source, doc_id, ntok FROM (
          SELECT source, doc_id, ntok,
            row_number() OVER (PARTITION BY source
              ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rk
          FROM clean) t WHERE rk <= 10),
      cum AS (
        SELECT source, doc_id, ntok,
          SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM samp),
      bins AS (
        SELECT source, (cum - ntok) // 256 AS bin,
               COUNT(*) AS n_docs, SUM(ntok) AS bin_tokens
        FROM cum GROUP BY source, bin)
      SELECT source, COUNT(*) AS n_bins, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens
      FROM bins
      GROUP BY source
      ORDER BY source""")),

    // domain-mixture resampling (training mixture weights, e.g. wiki ×2.5,
    // crawl ×0.5): whole copies plus an LCG-decided extra for the
    // fractional part, exploded map-side — no shuffle. Even-numbered
    // sources upsample 2.5×, odd downsample 0.5×; row counts, unique-doc
    // counts and token totals are exact integers for the hash compare
    QueryDef("t18_mixture_resample", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val ntok = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1))
      val rate = when(substring(col("source"), 4, 10).cast("int") % 2 === 0, lit(2.5))
        .otherwise(lit(0.5))
      graft.llm.Sampling.weightedResample(
          docs.withColumn("ntok", ntok.cast("long")), rate, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_unique"),
          sum(col("ntok")).as("total_tokens"))
        .orderBy(col("source"))
    }, Some("""
      WITH rated AS (
        SELECT doc_id, source,
          CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ntok,
          CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 2.5 ELSE 0.5 END AS rate
        FROM documents),
      copied AS (
        SELECT doc_id, source, ntok,
          CAST(floor(rate) AS BIGINT) +
            CASE WHEN ((doc_id * 1103515245 + 12345) % 2147483648) % 1000
                   < CAST((rate - floor(rate)) * 1000 AS BIGINT)
              THEN 1 ELSE 0 END AS n
        FROM rated),
      exploded AS (
        SELECT doc_id, source, ntok, UNNEST(generate_series(1, n)) AS epoch_copy
        FROM copied WHERE n > 0)
      SELECT source, COUNT(*) AS n_rows,
        COUNT(DISTINCT doc_id) AS n_unique,
        CAST(SUM(ntok) AS BIGINT) AS total_tokens
      FROM exploded
      GROUP BY source
      ORDER BY source""")),

    // stateful STREAMING dedup: documents flow through the Iceberg source →
    // streaming dropDuplicates (64-bit content-hash state) → Iceberg sink,
    // in two separate AvailableNow runs sharing one checkpoint. Run 2
    // replays the whole corpus with shifted ids; the state store restored
    // from the checkpoint must drop every row — the sink commits no second
    // snapshot — while the streaming progress proves the rows were actually
    // ingested, not skipped
    QueryDef.staged("t19_stream_dedup", (s, dir) => {
      import graft.catalog.HadoopCatalog
      import graft.core.SchemaBridge
      import graft.format.PartitionSpec
      import graft.table.{SparkRead, Writer}
      val wh = s"/root/repo/target/graft-wh/sdd_${java.util.UUID.randomUUID().toString.take(8)}"
      val cat = new HadoopCatalog(wh)
      val docs = tbl(s, dir, "documents")
      val n = docs.count()
      val schema = SchemaBridge.fromSpark(docs.schema)
      Writer.append(s, cat.createTable("src", schema, PartitionSpec.Unpartitioned), docs)
      cat.createTable("dst", schema, PartitionSpec.Unpartitioned)
      val ckpt = s"$wh/_ckpt"
      def runOnce(): Long = {
        val q = s.readStream.format("graft-iceberg")
          .option("catalog", wh).option("table", "src").load()
          .transform(df => graft.streaming.StreamingDedup.dedupByHash(df, Seq("text")))
          .writeStream.format("graft-iceberg")
          .option("catalog", wh).option("table", "dst")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.map(_.numInputRows).sum
      }
      val in1 = runOnce()
      Writer.append(s, cat.loadTable("src"),
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      val in2 = runOnce()
      val dst = cat.loadTable("dst")
      val stateRestored = in1 == n && in2 == n &&
        dst.metadata.snapshots.size == 1
      // aggregate GLOBALLY, not per source: duplicate texts can span
      // sources (sf0.1 has 8 such pairs), and first-seen-wins dedup makes
      // the per-source attribution partition-order dependent — the total
      // kept count and kept chars are dedup-invariant (equal texts have
      // equal n_chars)
      () => SparkRead.read(s, dst.newScan)
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
        .withColumn("state_restored", lit(stateRestored.toString))
    }, Some("""
      WITH k AS (SELECT text, MIN(n_chars) AS nc FROM documents GROUP BY text)
      SELECT COUNT(*) AS n_kept, CAST(SUM(nc) AS BIGINT) AS chars_kept,
             'true' AS state_restored
      FROM k"""), repeatable = true),

    // streaming tumbling-window aggregation through StreamWindows.tumblingAgg:
    // the events table flows through a file stream in THREE AvailableNow runs
    // sharing one checkpoint — first half by time, second half, then a
    // far-future "__flush" sentinel whose watermark advance closes every real
    // window. One parquet file per run = one data batch per run, so no
    // intra-run late drops are possible. Asserted along the way: run 1 emits
    // only windows behind its watermark (append discipline), run 2 withholds
    // the still-open final window while MERGING run-1 state (the boundary
    // window spans both runs — checkpoint restore proven by the oracle hash),
    // and the flush run closes the tail. Oracle: plain batch hourly agg.
    QueryDef.staged("t20_stream_windows", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = s"/root/repo/target/graft-wh/swin_${java.util.UUID.randomUUID().toString.take(8)}"
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      // ns→µs with integer division (a double roundtrip would lose precision
      // at 1.7e18 ns); DuckDB's TIMESTAMP_NS→TIMESTAMP cast truncates the
      // same way for positive epochs
      val e = tbl(s, dir, "events").select(col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("t"), col("value"))
      val bounds = e.agg(min(unix_micros(col("t"))), max(unix_micros(col("t")))).collect()(0)
      val (minUs, maxUs) = (bounds.getLong(0), bounds.getLong(1))
      val cutTs = timestamp_micros(lit(minUs + (maxUs - minUs) / 2))
      val schema = e.schema
      def runOnce(): Unit = {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1") // one run file = one batch; a batch emits with the watermark its PREDECESSOR batch advanced to
          .parquet(inDir)
          .transform(df => graft.streaming.StreamWindows.tumblingAgg(
            df, "t", "10 minutes", "1 hour", Seq("event_type"))(
            count(lit(1)).as("n"),
            d(sum(dec(coalesce(col("value"), lit(0.0))))).as("sum_value")))
          // NB: do NOT filter the __flush sentinel here — a grouping-column
          // filter gets pushed below the EventTimeWatermark operator, so the
          // sentinel would never advance the watermark; it is dropped at
          // read-back instead
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def outWindows(): Array[(Long, Long)] = // (window_end epoch s, rows)
        try s.read.parquet(outDir)
          .groupBy(col("window_end").cast("timestamp").cast("long").as("we"))
          .agg(count(lit(1)).as("c")).collect().map(r => (r.getLong(0), r.getLong(1)))
        catch { case _: org.apache.spark.sql.AnalysisException => Array.empty }
      e.filter(col("t") < cutTs).coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
      val w1 = outWindows()
      val wm1 = { // watermark after run 1: max first-half event time - 10 min
        val m = e.filter(col("t") < cutTs).agg(max(unix_micros(col("t")))).collect()(0).getLong(0)
        m / 1000000L - 600L
      }
      val r1AppendOk = w1.nonEmpty && w1.forall(_._1 <= wm1)
      e.filter(col("t") >= cutTs).coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
      val w2 = outWindows()
      val wm2 = maxUs / 1000000L - 600L
      // the window containing the max event time always ends after wm2, so
      // append mode must still be withholding it here
      val openWithheld = w2.length > w1.length && w2.forall(_._1 <= wm2)
      // two sentinel FILES (= two batches): the first advances the watermark
      // past every real window end; the second's batch then emits them
      Seq(7200L, 14400L).foreach { off =>
        s.range(1).select(lit("__flush").as("event_type"),
            timestamp_micros(lit(maxUs + off * 1000000L)).as("t"),
            lit(null).cast("double").as("value"))
          .coalesce(1).write.mode("append").parquet(inDir)
      }
      runOnce()
      () => s.read.parquet(outDir)
        .filter(col("event_type") =!= "__flush")
        .select(col("event_type"),
          col("window_start").cast("timestamp").cast("long").as("ws"),
          col("n"), col("sum_value"))
        .withColumn("r1_append_ok", lit(r1AppendOk.toString))
        .withColumn("open_withheld", lit(openWithheld.toString))
        .orderBy(col("event_type"), col("ws"))
    }, Some("""
      WITH e AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS t, value FROM events)
      SELECT event_type,
        CAST(epoch(time_bucket(INTERVAL '1 hour', t)) AS BIGINT) AS ws,
        COUNT(*) AS n,
        CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        'true' AS r1_append_ok, 'true' AS open_withheld
      FROM e
      GROUP BY 1, 2
      ORDER BY event_type, ws"""), repeatable = true),

    // PII redaction over the corpus: the documents text is augmented with
    // deterministically synthesized PII (email, IPv4, SSN, phone derived
    // from doc_id) because the clean corpus has none, then scrubbed by the
    // regexp_replace chain. The oracle re-runs the SAME patterns under
    // DuckDB's RE2 — the patterns are deliberately dialect-portable — and
    // the driver hash-compares every redacted document verbatim.
    QueryDef("t21_pii_redact", (s, dir) => {
      // fan a narrow scan out before the regexp-replace chain — the heavy
      // per-row work sits below the sort exchange and would otherwise run
      // on one core (no-op at real corpus widths)
      val docs0 = tbl(s, dir, "documents")
      val par = s.sparkContext.defaultParallelism
      val docs =
        if (docs0.rdd.getNumPartitions < par) docs0.repartition(par) else docs0
      val aug = docs.select(col("doc_id"), concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10."), (col("doc_id") % 200).cast("string"),
        lit(".0."), (col("doc_id") % 250).cast("string"),
        lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" call +1 (555) 123-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" end")).as("a"))
      aug.select(col("doc_id"), TextStats.redactPii(col("a")).as("redacted"))
        .withColumn("n_pii", TextStats.redactionCount(col("redacted")))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH aug AS (
        SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
          '@mail.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR) ||
          '.0.' || CAST(doc_id % 250 AS VARCHAR) ||
          ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
          ' call +1 (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
          ' end' AS a
        FROM documents),
      red AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(a,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
            '(\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b', '<PHONE>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        FROM aug)
      SELECT doc_id, redacted,
        CAST(len(regexp_extract_all(redacted, '<(EMAIL|SSN|PHONE|IP)>')) AS BIGINT) AS n_pii
      FROM red
      ORDER BY doc_id""")),

    // streaming sessionization with CUSTOM state (flatMapGroupsWithState +
    // event-time timeouts): the t20 harness (file stream, one file per
    // batch, two-run time split + sentinel flush on one checkpoint) driving
    // StreamSessions instead of the built-in window agg. Sessions close
    // exactly once when the watermark passes end+gap — timeouts wake idle
    // keys — and the global session stats must hash-match the batch
    // sessionization oracle in the same ms time domain. Sentinel keys are
    // negative and dropped at read-back.
    QueryDef.staged("t22_stream_sessions", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = s"/root/repo/target/graft-wh/ssess_${java.util.UUID.randomUUID().toString.take(8)}"
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val gapMs = 30L * 60 * 1000
      val e = tbl(s, dir, "events").select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("t"))
      val bounds = e.agg(min(unix_micros(col("t"))), max(unix_micros(col("t")))).collect()(0)
      val (minUs, maxUs) = (bounds.getLong(0), bounds.getLong(1))
      val cutTs = timestamp_micros(lit(minUs + (maxUs - minUs) / 2))
      val schema = e.schema
      def runOnce(): Unit = {
        val q = graft.streaming.StreamSessions.sessionize(
            s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
              .parquet(inDir).withWatermark("t", "10 minutes"),
            "user_id", "t", gapMs)
          .toDF()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      e.filter(col("t") < cutTs).coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
      e.filter(col("t") >= cutTs).coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
      // only sessions older than watermark-gap may be out so far; the tail
      // sessions (touching the final 40 min of data) must still be open
      val openWithheld =
        try s.read.parquet(outDir).agg(max(col("end_ms"))).collect()(0).getLong(0) <
          maxUs / 1000L - gapMs
        catch { case _: Throwable => false }
      Seq(7200L, 14400L).zipWithIndex.foreach { case (off, i) =>
        s.range(1).select(lit(-1L - i).as("user_id"),
            timestamp_micros(lit(maxUs + off * 1000000L)).as("t"))
          .coalesce(1).write.mode("append").parquet(inDir)
      }
      runOnce()
      // sessions are emitted exactly once (late rows can never reach a
      // closed session), so the rows aggregate directly — no defensive
      // re-merge that would mask a double emission
      () => s.read.parquet(outDir)
        .filter(col("key") >= 0)
        .groupBy()
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(expr("(end_ms - start_ms) div 1000")).as("max_dur_s"),
          sum(expr("(end_ms - start_ms) div 1000")).as("total_dur_s"))
        .withColumn("open_withheld", lit(openWithheld.toString))
    }, Some("""
      WITH e AS (
        SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms FROM events),
      lagged AS (
        SELECT user_id, tms,
          CASE WHEN LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) IS NULL
               OR tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) > 1800000
          THEN 1 ELSE 0 END AS new_sess
        FROM e),
      sess AS (
        SELECT user_id, tms,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tms
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM lagged),
      per AS (
        SELECT user_id, sid, COUNT(*) AS n, MIN(tms) AS s, MAX(tms) AS en
        FROM sess GROUP BY user_id, sid)
      SELECT COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
        CAST(MAX((en - s) // 1000) AS BIGINT) AS max_dur_s,
        CAST(SUM((en - s) // 1000) AS BIGINT) AS total_dur_s,
        'true' AS open_withheld
      FROM per"""), repeatable = true),

    // corpus-self-trained bigram LM quality scoring (add-one smoothing):
    // integer bigram counts pin the model exactly; per-doc mean log-probs
    // round to 4dp, far above the ~1e-13 noise from libm ln ULPs and
    // partial-sum order, so both engines land on identical decimals
    QueryDef("t26_bigram_lm", (s, dir) => {
      import graft.llm.LmScore
      val docs = tbl(s, dir, "documents")
      LmScore.bigramDocScore(docs)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("total_bigrams"),
          round(avg(col("avg_lp")), 4).as("mean_lp"),
          round(min(col("avg_lp")), 4).as("min_lp"),
          round(max(col("avg_lp")), 4).as("max_lp"))
        .orderBy(col("source"))
    }, Some("""
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
      big AS (
        SELECT doc_id, source, words[i] AS w1, words[i+1] AS w2
        FROM w, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
      c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
      c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
      vocab AS (SELECT COUNT(DISTINCT words[i]) AS v
        FROM w, UNNEST(generate_series(1, len(words))) AS t(i)),
      scored AS (
        SELECT b.doc_id, b.source,
               ln((c12.n12 + 1.0) / (c1.n1 + vocab.v)) AS lp
        FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab),
      perdoc AS (
        SELECT doc_id, source, COUNT(*) AS nb, AVG(lp) AS avg_lp
        FROM scored GROUP BY doc_id, source)
      SELECT source, COUNT(*) AS n_docs, CAST(SUM(nb) AS BIGINT) AS total_bigrams,
             round(AVG(avg_lp), 4) AS mean_lp,
             round(MIN(avg_lp), 4) AS min_lp, round(MAX(avg_lp), 4) AS max_lp
      FROM perdoc GROUP BY source ORDER BY source""")),

    // Bloom-prefiltered decontamination: same answer as t13 (the oracle IS
    // t13's SQL) through the 100 TB plan — a broadcast Bloom sketch kills
    // ~99% of clean corpus grams map-side before the exact confirmation
    // semi-join, so the exchange carries survivors, not the corpus
    QueryDef("t25_decontaminate_bloom", (s, dir) => {
      import graft.llm.Decontaminate
      val docs = tbl(s, dir, "documents")
      val bench = docs.filter(col("doc_id") < 20)
      val corpus = docs.filter(col("doc_id") >= 20)
      val hits = Decontaminate.contaminatedIds(corpus, bench, n = 8)
      corpus.join(hits.withColumn("hit", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"))
        .orderBy(col("source"))
    }, Some("""
      WITH w AS (
        SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
      bg AS (
        SELECT DISTINCT array_to_string(words[i:i+7], ' ') AS gram
        FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 7))) AS t(i)
        WHERE doc_id < 20),
      cg AS (
        SELECT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 7))) AS t(i)
        WHERE doc_id >= 20),
      hits AS (
        SELECT DISTINCT doc_id FROM cg WHERE gram IN (SELECT gram FROM bg))
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM hits) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      FROM documents
      WHERE doc_id >= 20
      GROUP BY source
      ORDER BY source""")),

    // sliding-window chunking (window 32, stride 24): per-source chunk
    // counts and token/char sums are overlap-sensitive, so the boundary
    // math — including the partial final window — is fully pinned
    QueryDef("t23_chunk_overlap", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      Chunking.chunkByTokens(docs, "text", window = 32, stride = 24, keep = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("chunk_tokens")).as("chunk_tokens"),
          sum(length(col("chunk_text")).cast("long")).as("chunk_chars"))
        .orderBy(col("source"))
    }, Some("""
      WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
      n AS (SELECT source, toks, len(toks) AS nt,
              CASE WHEN len(toks) <= 32 THEN 1
                   ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1 END AS nc
            FROM t),
      x AS (SELECT source, toks, unnest(range(nc)) AS i FROM n),
      c AS (SELECT source, array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk FROM x)
      SELECT source, COUNT(*) AS n_chunks,
             CAST(SUM(len(string_split(chunk, ' '))) AS BIGINT) AS chunk_tokens,
             CAST(SUM(length(chunk)) AS BIGINT) AS chunk_chars
      FROM c GROUP BY source ORDER BY source""")),

    // tokenizer-style vocabulary build (top-10 words by frequency, word-asc
    // tie-break) + per-source out-of-vocabulary rate via broadcast membership
    QueryDef("t24_vocab_oov", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val vocab = TextStats.topVocab(docs, "text", n = 10)
      TextStats.oovStats(docs, vocab, "text", "source")
        .orderBy(col("source"))
    }, Some("""
      WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
      cnt AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
      v AS (SELECT word FROM (
              SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS r FROM cnt)
            WHERE r <= 10)
      SELECT source, COUNT(*) AS total_tokens,
             CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
             round(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS oov_rate
      FROM w LEFT JOIN v ON w.word = v.word
      GROUP BY source ORDER BY source""")),

    QueryDef("mm1_binary_meta", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      FROM documents
      ORDER BY doc_id""")),

    // real binary containers round-tripped through an Iceberg binary column:
    // synthesize GRFT-container payloads, append to an Iceberg table, scan
    // back, parse headers in batched mapPartitions. Every output column is
    // arithmetic in doc_id / text length, so DuckDB checks the full hash.
    QueryDef("mm2_media_features", (s, dir) => {
      import graft.core.SchemaBridge
      import graft.format.PartitionSpec
      import graft.table.{SparkRead, Writer}
      val cat = IcebergQueries.catalogFor(s, dir)
      val name = s"mm_${java.util.UUID.randomUUID().toString.take(8)}"
      val docs = tbl(s, dir, "documents")
      val media = Multimodal.synthesizeMedia(s, docs).toDF()
      val schema = SchemaBridge.fromSpark(media.schema)
      val t1 = Writer.append(s, cat.createTable(name, schema, PartitionSpec.Unpartitioned), media)
      import s.implicits._
      val back = SparkRead.read(s, t1.newScan).as[Multimodal.MediaRecord]
      Multimodal.extractFeatures(back).toDF()
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("duration_ms"))
        .orderBy(col("media_id"))
    }, Some("""
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(21 + octet_length(encode(text)) AS BIGINT) AS byte_len,
             CASE WHEN doc_id % 3 = 1 THEN 0
                  ELSE CAST(64 + (doc_id * 7) % 1024 AS INT) END AS width,
             CASE WHEN doc_id % 3 = 1 THEN 0
                  ELSE CAST(64 + (doc_id * 13) % 1024 AS INT) END AS height,
             CASE WHEN doc_id % 3 = 0 THEN 0
                  ELSE CAST(1000 + (doc_id * 31) % 65536 AS BIGINT) END AS duration_ms
      FROM documents
      ORDER BY media_id""")),

    // resize + frame-sample over the container format: resized dims must fit
    // the bound, and every video yields exactly maxFrames sampled frames
    QueryDef("mm3_resize_frames", (s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val media = Multimodal.synthesizeMedia(s, docs)
      val resized = Multimodal.resize(media, 256, 256)
      // audio headers carry synthetic dims that resize (correctly) ignores —
      // the bound applies to visual kinds only
      val fits = udf((kind: String, p: Array[Byte]) => {
        val (_, w, h, _) = Multimodal.decodeHeader(p)
        kind == "audio" || (w <= 256 && h <= 256)
      })
      val perKind = resized.toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          min(fits(col("kind"), col("payload")).cast("string")).as("within_bounds"))
      val frames = Multimodal.sampleFrames(media, maxFrames = 4).toDF()
        .join(media.toDF().select(col("media_id"), col("kind")), "media_id")
        .groupBy(col("kind")).agg(count(lit(1)).as("n_frames"))
      perKind.join(frames, Seq("kind"), "left")
        .select(col("kind"), col("n"), col("within_bounds"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"))
        .orderBy(col("kind"))
    }, Some("""
      WITH kinds AS (
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               octet_length(encode(text)) AS body_len
        FROM documents)
      SELECT kind, COUNT(*) AS n, 'true' AS within_bounds,
             CAST(CASE WHEN kind = 'video'
                  THEN SUM(LEAST(4, GREATEST(1, body_len))) ELSE 0 END AS BIGINT) AS n_frames
      FROM kinds
      GROUP BY kind
      ORDER BY kind""")),

    // exact interpolated per-group quantiles of document length. Spark's
    // `percentile` and DuckDB's `quantile_cont` share the lower+(hi-lo)*frac
    // interpolation; the chosen fractions are binary-exact so both engines
    // produce bit-identical doubles. Exact percentile sorts each group —
    // fine per-source; the corpus-scale path is approx_percentile (t-digest,
    // mergeable map-side), pinned within tolerance by GroupQuantilesSpec.
    QueryDef("t29_group_quantiles", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      docs.groupBy(col("source"))
        .agg(expr("percentile(n_chars, 0.25)").as("p25"),
          expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.75)").as("p75"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }, Some("""
      SELECT source,
             quantile_cont(n_chars, 0.25) AS p25,
             quantile_cont(n_chars, 0.5) AS p50,
             quantile_cont(n_chars, 0.75) AS p75,
             COUNT(*) AS n_docs
      FROM documents
      GROUP BY source
      ORDER BY source""")),

    // hashed linear classifier inference (ClassifierScore.scoreDocs) — the
    // fastText-style quality-filter scoring step, map-side only. The gate
    // feeds a deterministic pseudo-weight table (integer formula both
    // engines compute exactly: w[b] = (((b+1)·2654435761) mod 1000 − 500)
    // / 1000) so every per-document sigmoid score is pinned at 6 dp by the
    // DuckDB replica of the same rolling-hash bucketing; per-source
    // aggregates keep the gate row count stable while still covering every
    // document's score.
    QueryDef("t30_classifier_score", (s, dir) => {
      import s.implicits._
      // one pinned non-BMP document (emoji + astral math letters + CJK):
      // the rolling hash folds CODE POINTS (verified: Spark's split("")
      // keeps surrogate pairs whole and ascii() yields the code point), and
      // this row makes the gate actually exercise it against DuckDB's
      // ord()-based replica — BMP-only corpora can't catch surrogate drift
      val emojiDoc = Seq((999999999L, "emoji",
        "😀🚀 café こんにちは " +
          "𝔘𝔫𝔦𝔠𝔬𝔡𝔢"))
        .toDF("doc_id", "source", "text")
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .unionByName(emojiDoc)
      val dims = 1024
      val weights = Array.tabulate(dims)(b =>
        ((((b + 1).toLong * 2654435761L) % 1000L) - 500L).toDouble / 1000.0)
      ClassifierScore.scoreDocs(docs, weights, keep = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("score")), 4).as("avg_score"),
          sum(when(col("score") > 0.5, 1L).otherwise(0L)).as("n_high"))
        .orderBy(col("source"))
    }, Some("""
      WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT 999999999, 'emoji',
               '😀🚀 café こんにちは 𝔘𝔫𝔦𝔠𝔬𝔡𝔢'),
      t AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM corpus),
      b AS (
        SELECT doc_id, source,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(w, ''), c -> CAST(ord(c) AS BIGINT))),
                 (a, x) -> (a * 31 + x) % 2147483647) % 1024 AS bkt
        FROM t WHERE length(w) > 0),
      d AS (
        SELECT doc_id, source, COUNT(*) AS n_tokens,
               round(1.0 / (1.0 + exp(-(SUM(
                 ((((bkt + 1) * 2654435761) % 1000) - 500) / 1000.0
               ) / COUNT(*)))), 6) AS score
        FROM b GROUP BY doc_id, source)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             round(AVG(score), 4) AS avg_score,
             CAST(SUM(CASE WHEN score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM d
      GROUP BY source
      ORDER BY source""")),

    // temperature-scaled mixture weights (Sampling.temperatureWeights) —
    // the source-balancing arithmetic that feeds t18's resampler: w_g =
    // n_g^T / Σ n_g^T at T=0.5 (flattens toward uniform, up-weighting
    // small sources), rate_g = w_g·budget/n_g. Integer token counts pin
    // the sizes; 6dp rounding on both engines absorbs libm pow ULPs.
    QueryDef("t31_temperature_mix", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val ntok = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1))
        .cast("long")
      graft.llm.Sampling.temperatureWeights(docs, "source", ntok,
          temperature = 0.5, budget = 10000L)
        .orderBy(col("source"))
    }, Some("""
      WITH sizes AS (
        SELECT source,
               CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      p AS (SELECT source, n_tokens, pow(CAST(n_tokens AS DOUBLE), 0.5) AS pw FROM sizes),
      t AS (SELECT SUM(pw) AS tot FROM p)
      SELECT source, n_tokens, round(pw / tot, 6) AS weight,
             round(pw / tot * 10000 / n_tokens, 6) AS rate
      FROM p, t
      ORDER BY source""")),

    // inverted-index materialization: per word, document frequency,
    // collection frequency, and the postings-list head (top-5 docs by
    // tf desc, doc_id asc — the TopKByScore bounded heap, so only 5
    // postings per (word, map task) cross the rollup shuffle)
    QueryDef("t32_inverted_index", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      Retrieval.invertedIndex(docs, cap = 5)
        .orderBy(col("word"))
    }, Some("""
      WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      tf AS (SELECT word, doc_id, COUNT(*) AS tf FROM w GROUP BY word, doc_id),
      r AS (SELECT word, doc_id, tf,
                   ROW_NUMBER() OVER (PARTITION BY word ORDER BY tf DESC, doc_id ASC) AS rk
            FROM tf)
      SELECT word, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
             string_agg(CASE WHEN rk <= 5 THEN CAST(doc_id AS VARCHAR) END, ','
                        ORDER BY rk) AS postings
      FROM r
      GROUP BY word
      ORDER BY word""")),

    // winsorized length filter: per-source exact p5/p95 token-count
    // bounds, keep docs inside, report the trim per source
    QueryDef("t33_length_trim", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      TextStats.lengthTrim(docs, "source", 0.05, 0.95)
        .groupBy(col("source"), col("p_lo"), col("p_hi"))
        .agg(count(lit(1)).as("kept"), sum(col("ntok")).as("kept_tokens"))
        .orderBy(col("source"))
    }, Some("""
      WITH tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS ntok FROM documents),
      q AS (SELECT source, round(quantile_cont(ntok, 0.05), 6) AS p_lo,
                   round(quantile_cont(ntok, 0.95), 6) AS p_hi
            FROM tok GROUP BY source)
      SELECT t.source, q.p_lo, q.p_hi, COUNT(*) AS kept,
             CAST(SUM(t.ntok) AS BIGINT) AS kept_tokens
      FROM tok t JOIN q ON t.source = q.source
      WHERE t.ntok >= q.p_lo AND t.ntok <= q.p_hi
      GROUP BY t.source, q.p_lo, q.p_hi
      ORDER BY t.source""")),

    // DSIR importance selection: top-40 documents most resembling the
    // English slice under smoothed unigram models over a top-50 target
    // vocabulary — deterministic top-k (the paper's Gumbel resampling
    // composes via weightedResample)
    QueryDef("t34_dsir_select", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.llm.Sampling.dsirSelect(docs, col("lang") === "en", "text", "doc_id",
        vocabSize = 50, k = 40)
        .orderBy(col("rank"))
    }, Some("""
      WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                 FROM documents),
      tcnt AS (SELECT word, COUNT(*) AS ct FROM w WHERE lang = 'en' GROUP BY word),
      v AS (SELECT word, ct FROM (
              SELECT word, ct, ROW_NUMBER() OVER (ORDER BY ct DESC, word ASC) AS r
              FROM tcnt)
            WHERE r <= 50),
      tot AS (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS tt,
                     CAST(COUNT(*) AS DOUBLE) AS ts
              FROM w),
      scnt AS (SELECT word, COUNT(*) AS cs FROM w GROUP BY word),
      ratio AS (SELECT v.word,
                       ln((v.ct + 1.0) / (tot.tt + 50)) -
                       ln((scnt.cs + 1.0) / (tot.ts + 50)) AS lr
                FROM v JOIN scnt ON v.word = scnt.word CROSS JOIN tot),
      logw AS (SELECT w.doc_id, SUM(r.lr) AS lw
               FROM w JOIN ratio r ON w.word = r.word GROUP BY w.doc_id),
      scored AS (SELECT d.doc_id, round(COALESCE(l.lw, 0.0), 6) AS log_w
                 FROM documents d LEFT JOIN logw l ON d.doc_id = l.doc_id)
      SELECT doc_id, log_w,
             CAST(ROW_NUMBER() OVER (ORDER BY log_w DESC, doc_id ASC) AS INT) AS rank
      FROM scored
      ORDER BY log_w DESC, doc_id ASC
      LIMIT 40""")),

    // deterministic epoch shuffle: the first 25 docs of epoch 2's training
    // order under seed 42 — engine-portable LCG key, so DuckDB derives the
    // identical permutation; different epochs permute differently (the
    // same op is what a 100 TB pipeline runs as one range-exchange sort)
    QueryDef("t35_epoch_shuffle", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.llm.Sampling.epochShuffle(docs.select("doc_id", "lang"),
        "doc_id", seed = 42L, epoch = 2)
        .limit(25)
        .withColumn("pos", row_number().over(
          Window.orderBy(
            ((col("doc_id") + lit(42L * 31L) + lit(2L * 7919L)) % 1000003L *
              999983L + 12345L) % 1000003L,
            col("doc_id"))))
    }, Some("""
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (ORDER BY ((doc_id + 42*31 + 2*7919) % 1000003
               * 999983 + 12345) % 1000003, doc_id) AS INT) AS pos
      FROM documents
      ORDER BY pos
      LIMIT 25""")),

    // adjacent-token-pair counting — one BPE merge iteration's statistics:
    // map-side zip_with pair construction (one explode), one pair-count
    // exchange, top-k via per-task heap
    QueryDef("t36_bpe_pairs", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      TextStats.topTokenPairs(docs, "text", 30).orderBy(col("rank"))
    }, Some("""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      idx AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t),
      p AS (SELECT toks[i] || ' ' || toks[i+1] AS pair FROM idx),
      cnt AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair)
      SELECT pair, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS INT) AS rank
      FROM cnt
      ORDER BY n DESC, pair ASC
      LIMIT 30""")),

    // cluster-representative dedup: after LSH clustering, keep exactly the
    // best-scoring member per cluster (ties → min id). Invariant oracle
    // over the doubled corpus: one survivor per cluster, the survivor
    // carries its cluster's max score, and survivor count == cluster count
    QueryDef("t37_cluster_rep", (s, dir) => {
      val u = doubled(s, dir)
      val cl = Dedup.minHashLsh(u, "doc_id", "text")
      val score = (col("doc_id") % 7).cast("double")
      val reps = Dedup.keepBestPerCluster(cl, "doc_id", "cluster_id", score)
      val perCluster = cl
        .select(col("cluster_id"), col("doc_id"), score.as("__s"))
        .groupBy(col("cluster_id"))
        .agg(max(col("__s")).as("best"),
          min(struct(negate(col("__s")), col("doc_id"))).as("tie"))
      // RIGHT join keeps every cluster, and ONE aggregation job answers all
      // four facts (was four separate jobs re-running the window + joins)
      val joined = reps.select(col("cluster_id"), col("doc_id"), score.as("__s"))
        .join(perCluster, Seq("cluster_id"), "right")
      val f = joined.agg(
        countDistinct(col("cluster_id")),
        count(col("__s")),
        sum(when(col("__s") =!= col("best"), 1L).otherwise(0L)),
        sum(when(col("doc_id") =!= col("tie").getField("doc_id"), 1L).otherwise(0L)))
        .head()
      val nClusters = f.getLong(0)
      val nReps = f.getLong(1)
      val allBest = f.getLong(2) == 0L
      val allTie = f.getLong(3) == 0L
      s.createDataFrame(Seq((
        (nReps == nClusters).toString, allBest.toString, allTie.toString)))
        .toDF("one_per_cluster", "max_score_wins", "ties_by_min_id")
    }, Some("""
      SELECT 'true' AS one_per_cluster, 'true' AS max_score_wins,
             'true' AS ties_by_min_id""")),

    // CCNet perplexity tiers: per-language NTILE(3) over the bigram-LM doc
    // scores (head / middle / tail) — the classic keep-head+middle signal
    QueryDef("t38_ppl_buckets", (s, dir) => {
      import graft.llm.LmScore
      val docs = tbl(s, dir, "documents")
      LmScore.perplexityBuckets(docs)
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("avg_lp")), 4).as("mean_lp"))
        .orderBy(col("lang"), col("bucket"))
    }, Some("""
      WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
      big AS (
        SELECT doc_id, lang, words[i] AS w1, words[i+1] AS w2
        FROM w, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
      c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
      c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
      vocab AS (SELECT COUNT(DISTINCT words[i]) AS v
        FROM w, UNNEST(generate_series(1, len(words))) AS t(i)),
      scored AS (
        SELECT b.doc_id, b.lang,
               ln((c12.n12 + 1.0) / (c1.n1 + vocab.v)) AS lp
        FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab),
      perdoc AS (
        SELECT doc_id, lang, AVG(lp) AS avg_lp
        FROM scored GROUP BY doc_id, lang),
      tiered AS (
        SELECT lang, doc_id, avg_lp,
               NTILE(3) OVER (PARTITION BY lang
                 ORDER BY round(avg_lp, 6) DESC, doc_id ASC) AS bucket
        FROM perdoc)
      SELECT lang, CAST(bucket AS INT) AS bucket, COUNT(*) AS n_docs,
             round(AVG(avg_lp), 4) AS mean_lp
      FROM tiered
      GROUP BY lang, bucket
      ORDER BY lang, bucket""")),

    // Cross-source n-gram overlap matrix (data-mixture contamination
    // audit): pairwise distinct-5-gram Jaccard over all source pairs,
    // zero-overlap pairs included (a complete matrix, not just hits). The
    // distinct (source, gram) stream persists DISK_ONLY for its three
    // consumers; the self-join's per-gram cost is sources-sharing-the-gram
    // squared, never corpus-squared; output is sources² rows.
    QueryDef("t39_source_overlap", (s, dir) => {
      graft.llm.CorpusAudit.sourceOverlapMatrix(tbl(s, dir, "documents"), n = 5)
        .orderBy(col("source_a"), col("source_b"))
    }, Some("""
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
      g AS (SELECT DISTINCT source, array_to_string(words[i:i+4], ' ') AS gram
            FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 4))) AS t(i)),
      s AS (SELECT source, COUNT(*) AS n_grams FROM g GROUP BY source),
      i AS (SELECT ga.source AS source_a, gb.source AS source_b, COUNT(*) AS n_common
            FROM g ga JOIN g gb USING (gram) WHERE ga.source < gb.source
            GROUP BY 1, 2)
      SELECT sa.source AS source_a, sb.source AS source_b,
             sa.n_grams AS n_a, sb.n_grams AS n_b,
             COALESCE(i.n_common, 0) AS n_common,
             round(CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / (sa.n_grams + sb.n_grams - COALESCE(i.n_common, 0)), 6) AS jaccard
      FROM s sa JOIN s sb ON sa.source < sb.source
      LEFT JOIN i ON i.source_a = sa.source AND i.source_b = sb.source
      ORDER BY source_a, source_b""")),

    // Per-source boilerplate shortlist (C4-style): top-5 most frequent
    // 3-grams per source with occurrence and document frequency. One
    // corpus-scale exchange (the partial-aggregated (source, gram) count);
    // the top-k finisher is the two-stage partial rank, so only k rows per
    // (source, input partition) reach the final exchange.
    QueryDef("t40_boilerplate", (s, dir) => {
      graft.llm.CorpusAudit.boilerplateGrams(tbl(s, dir, "documents"), n = 3, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("source"), col("rank"))
    }, Some("""
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
      g AS (SELECT source, doc_id, array_to_string(words[i:i+2], ' ') AS gram
            FROM w, UNNEST(generate_series(1, greatest(0, len(words) - 2))) AS t(i)),
      pd AS (SELECT source, doc_id, gram, COUNT(*) AS tf FROM g GROUP BY 1, 2, 3),
      c AS (SELECT source, gram, CAST(SUM(tf) AS BIGINT) AS occurrences,
                   COUNT(*) AS doc_freq
            FROM pd GROUP BY 1, 2),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY occurrences DESC, gram ASC) AS rank FROM c)
      SELECT source, rank, gram, occurrences, doc_freq
      FROM r WHERE rank <= 5
      ORDER BY source, rank""")),

    // Split hygiene (Splits.hashSplit / exactLeaks / pairLeaks): the
    // train/valid/test boundary is where dedup mistakes become eval
    // leakage. Naive id-keyed splitting scatters a duplicate family
    // across splits; keying the SAME hash on a content fingerprint pins
    // every exact duplicate to one split by construction. Corpus =
    // documents + exact twins (id+10⁶): the gate pins both strategies'
    // split sizes and leaked-text counts against DuckDB running the
    // identical mod-prime LCG + code-point fold, and flags assert the
    // twin-pair audit (naive leaks > 0, fingerprint leaks = 0). Split
    // assignment is map-side-only at any scale; the audit shuffles md5
    // keys, never document bodies.
    QueryDef.staged("t41_split_hygiene", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val u = docs.select(col("doc_id"), col("text")).unionByName(
        docs.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      val w = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
      val naive = graft.llm.Splits.hashSplit(u, col("doc_id"), w, seed = 42L)
        .withColumn("strategy", lit("naive"))
      val fp = graft.llm.Splits.hashSplit(
        u, graft.llm.Splits.textKey(col("text")), w, seed = 42L)
        .withColumn("strategy", lit("fingerprint"))
      val twinPairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + lit(1000000L)).as("id_b"))
      val naivePairLeaks = graft.llm.Splits.pairLeaks(twinPairs, naive, "doc_id").count()
      val fpPairLeaks = graft.llm.Splits.pairLeaks(twinPairs, fp, "doc_id").count()
      val flags = Seq(naivePairLeaks > 0, fpPairLeaks == 0L).mkString(",")
      () => {
        val both = naive.unionByName(fp)
        val counts = both.groupBy("strategy", "split")
          .agg(count(lit(1)).as("n_docs"))
        val leaks = graft.llm.Splits.exactLeaks(both, "text", by = Seq("strategy"))
        counts.join(leaks, Seq("strategy"), "left")
          .select(col("strategy"), col("split"), col("n_docs"),
            coalesce(col("leaked_texts"), lit(0L)).as("leaked_texts"),
            lit(flags).as("split_ok"))
          .orderBy(col("strategy"), col("split"))
      }
    }, Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, text FROM documents),
      fp AS (
        SELECT doc_id, text,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substring(text, 1, 64), ''),
                     c -> CAST(ord(c) AS BIGINT))),
                 (a, x) -> (a * 31 + x) % 2147483647) AS fkey
        FROM corpus),
      y1 AS (
        SELECT 'naive' AS strategy, doc_id, text,
               ((doc_id % 1000003) * 999983 + 42) % 1000003 AS y
        FROM corpus
        UNION ALL
        SELECT 'fingerprint', doc_id, text,
               ((fkey % 1000003) * 999983 + 42) % 1000003
        FROM fp),
      assigned AS (
        SELECT strategy, doc_id, text,
               (((y * y + 12345) % 1000003) * 999983 + 42) % 1000003 AS b
        FROM y1),
      sp AS (
        SELECT strategy, doc_id, text,
               CASE WHEN b < 800002 THEN 'train'
                    WHEN b < 900002 THEN 'valid'
                    ELSE 'test' END AS split
        FROM assigned),
      counts AS (
        SELECT strategy, split, COUNT(*) AS n_docs
        FROM sp GROUP BY strategy, split),
      lk AS (
        SELECT strategy, COUNT(*) AS leaked_texts FROM (
          SELECT strategy, md5(text) AS k
          FROM sp GROUP BY strategy, md5(text)
          HAVING COUNT(DISTINCT split) > 1)
        GROUP BY strategy)
      SELECT c.strategy, c.split, c.n_docs,
             COALESCE(l.leaked_texts, 0) AS leaked_texts,
             'true,true' AS split_ok
      FROM counts c LEFT JOIN lk l ON c.strategy = l.strategy
      ORDER BY c.strategy, c.split""")),

    // Distributed BPE training (BpeTrainer.train): the merge-learning
    // loop behind GPT-2-style vocabularies, run as one corpus→word-count
    // shuffle then vocab-bounded iterations (pair partial-agg +
    // TakeOrdered(1) argmax — one row per merge reaches the driver).
    // First three learned merges pinned rank-for-rank against DuckDB
    // unrolling the identical greedy left-to-right rewrite as a
    // string-accumulator list_reduce fold, plus the corpus token count
    // and symbol vocabulary under the learned segmentation
    QueryDef.staged("t42_bpe_train", (s, dir) => {
      val (merges, words) = graft.llm.BpeTrainer.train(
        tbl(s, dir, "documents"), "text", numMerges = 3)
      val st = graft.llm.BpeTrainer.stats(words)
      import s.implicits._
      val mdf = merges.toDF()
      () => mdf.crossJoin(st)
        .select(col("rank"), col("left").as("left_sym"),
          col("right").as("right_sym"), col("pairCount").as("pair_count"),
          col("total_symbols"), col("vocab_symbols"))
        .orderBy(col("rank"))
    }, Some("""
      WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
      wc AS (SELECT word, COUNT(*) AS cnt FROM w WHERE length(word)>0 GROUP BY word),
      s0 AS (SELECT word, cnt, list_append(string_split(word,''), '</w>') AS syms FROM wc),
      p1 AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS pc
             FROM s0, unnest(generate_series(1, len(syms)-1)) t(i) GROUP BY 1,2),
      m1 AS (SELECT 1 AS rank, a, b, pc FROM p1 ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
      s1 AS (SELECT word, cnt, string_split(
               CASE WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1)
                    WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
                    ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END, ' ') AS syms
             FROM (SELECT word, cnt,
               list_reduce(list_prepend('|', syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1) || '|' || x
                   WHEN split_part(acc,'|',2)=m1.a AND x=m1.b THEN
                     (CASE WHEN split_part(acc,'|',1)='' THEN '' ELSE split_part(acc,'|',1) || ' ' END) || m1.a || m1.b || '|'
                   ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2) ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
                 END) AS acc
               FROM s0 CROSS JOIN m1)),
      p2 AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS pc
             FROM s1, unnest(generate_series(1, len(syms)-1)) t(i) GROUP BY 1,2),
      m2 AS (SELECT 2 AS rank, a, b, pc FROM p2 ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
      s2 AS (SELECT word, cnt, string_split(
               CASE WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1)
                    WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
                    ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END, ' ') AS syms
             FROM (SELECT word, cnt,
               list_reduce(list_prepend('|', syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1) || '|' || x
                   WHEN split_part(acc,'|',2)=m2.a AND x=m2.b THEN
                     (CASE WHEN split_part(acc,'|',1)='' THEN '' ELSE split_part(acc,'|',1) || ' ' END) || m2.a || m2.b || '|'
                   ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2) ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
                 END) AS acc
               FROM s1 CROSS JOIN m2)),
      p3 AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS pc
             FROM s2, unnest(generate_series(1, len(syms)-1)) t(i) GROUP BY 1,2),
      m3 AS (SELECT 3 AS rank, a, b, pc FROM p3 ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
      s3 AS (SELECT word, cnt, string_split(
               CASE WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1)
                    WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
                    ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END, ' ') AS syms
             FROM (SELECT word, cnt,
               list_reduce(list_prepend('|', syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1) || '|' || x
                   WHEN split_part(acc,'|',2)=m3.a AND x=m3.b THEN
                     (CASE WHEN split_part(acc,'|',1)='' THEN '' ELSE split_part(acc,'|',1) || ' ' END) || m3.a || m3.b || '|'
                   ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2) ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
                 END) AS acc
               FROM s2 CROSS JOIN m3)),
      st AS (SELECT CAST(SUM(len(syms)*cnt) AS BIGINT) AS total_symbols FROM s3),
      vc AS (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_symbols
             FROM (SELECT unnest(syms) AS sym FROM s3)),
      ms AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
      SELECT CAST(rank AS INT) AS rank, a AS left_sym, b AS right_sym,
             CAST(pc AS BIGINT) AS pair_count, total_symbols, vocab_symbols
      FROM ms CROSS JOIN st CROSS JOIN vc
      ORDER BY rank""")),

    // BPE encode (BpeTrainer.encode): apply the learned merges to the
    // corpus — the tokenizer's serving path. Train (t42's loop) then
    // encode; per-source token totals and distinct-token counts pinned
    // against DuckDB replaying the same three merges and joining the
    // unique-word segmentation back onto the corpus. Encode is a pure
    // scan: the merge list is a broadcast-sized closure literal, no
    // shuffle at any corpus size
    QueryDef.staged("t43_bpe_encode", (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val (merges, _) = graft.llm.BpeTrainer.train(docs, "text", numMerges = 3)
      // fan the corpus out before the encode: encode + the symbol explode
      // are map-side, so a one-file corpus would tokenize on one core
      // (no-op at real corpus widths; the shuffle moves raw text, cheaper
      // than the encoded symbol arrays)
      val par = s.sparkContext.defaultParallelism
      val spread =
        if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
      val toks = graft.llm.BpeTrainer.encode(spread, "text", merges,
        keep = Seq("source"))
      () => toks.select(col("source"), explode(col("tokens")).as("sym"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("sym")).as("n_distinct_tokens"))
        .orderBy(col("source"))
    }, Some("""
      WITH w AS (SELECT source, unnest(string_split(text,' ')) AS word FROM documents),
      wc AS (SELECT word, COUNT(*) AS cnt FROM w WHERE length(word)>0 GROUP BY word),
      s0 AS (SELECT word, cnt, list_append(string_split(word,''), '</w>') AS syms FROM wc),
      p1 AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS pc
             FROM s0, unnest(generate_series(1, len(syms)-1)) t(i) GROUP BY 1,2),
      m1 AS (SELECT a, b FROM p1 ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
      s1 AS (SELECT word, cnt, string_split(
               CASE WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1)
                    WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
                    ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END, ' ') AS syms
             FROM (SELECT word, cnt,
               list_reduce(list_prepend('|', syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1) || '|' || x
                   WHEN split_part(acc,'|',2)=m1.a AND x=m1.b THEN
                     (CASE WHEN split_part(acc,'|',1)='' THEN '' ELSE split_part(acc,'|',1) || ' ' END) || m1.a || m1.b || '|'
                   ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2) ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
                 END) AS acc
               FROM s0 CROSS JOIN m1)),
      p2 AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS pc
             FROM s1, unnest(generate_series(1, len(syms)-1)) t(i) GROUP BY 1,2),
      m2 AS (SELECT a, b FROM p2 ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
      s2 AS (SELECT word, cnt, string_split(
               CASE WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1)
                    WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
                    ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END, ' ') AS syms
             FROM (SELECT word, cnt,
               list_reduce(list_prepend('|', syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1) || '|' || x
                   WHEN split_part(acc,'|',2)=m2.a AND x=m2.b THEN
                     (CASE WHEN split_part(acc,'|',1)='' THEN '' ELSE split_part(acc,'|',1) || ' ' END) || m2.a || m2.b || '|'
                   ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2) ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
                 END) AS acc
               FROM s1 CROSS JOIN m2)),
      p3 AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS pc
             FROM s2, unnest(generate_series(1, len(syms)-1)) t(i) GROUP BY 1,2),
      m3 AS (SELECT a, b FROM p3 ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
      s3 AS (SELECT word, cnt, string_split(
               CASE WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1)
                    WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
                    ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END, ' ') AS syms
             FROM (SELECT word, cnt,
               list_reduce(list_prepend('|', syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc,'|',2)='' THEN split_part(acc,'|',1) || '|' || x
                   WHEN split_part(acc,'|',2)=m3.a AND x=m3.b THEN
                     (CASE WHEN split_part(acc,'|',1)='' THEN '' ELSE split_part(acc,'|',1) || ' ' END) || m3.a || m3.b || '|'
                   ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2) ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
                 END) AS acc
               FROM s2 CROSS JOIN m3)),
      tok AS (SELECT cw.source, unnest(s3.syms) AS sym
              FROM (SELECT source, word FROM w WHERE length(word)>0) cw
              JOIN s3 ON cw.word = s3.word)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT sym) AS BIGINT) AS n_distinct_tokens
      FROM tok GROUP BY source ORDER BY source"""))
  ).map(_.copy(repeatable = true)) // pure parquet reads: Bench may re-run for steady-state timing
}
