package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language identification, document fingerprinting.
  *
  * All column-level operators are built from `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd) where expressible; only langid and the rolling
  * fingerprint need scalar UDFs.
  */
object TextStats {

  /** PII redaction patterns, applied in order (email before phone so a
    * user@host never half-matches; SSN before phone so xxx-xx-xxxx is not
    * eaten as a phone). RE2-compatible on purpose — no backreferences or
    * lookaround — so engines with either regex dialect (Java here, RE2 in
    * the DuckDB oracle) replace identically; both use leftmost-first
    * matching, so ties resolve the same way too.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "(\\+?\\d{1,2}[ .-]?)?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** Redact emails, SSNs, phone numbers and IPv4 addresses with typed
    * markers — the standard scrub a training corpus gets before release.
    * A chain of `regexp_replace` calls: pure codegen'd map work, no UDF, no
    * shuffle; at 100 TB this runs at scan speed alongside the other
    * per-document operators.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** Count of typed redaction markers in an already-redacted text. */
  def redactionCount(redacted: Column): Column =
    size(regexp_extract_all(redacted, lit("<(EMAIL|SSN|PHONE|IP)>"), lit(0))).cast("long")

  /** Whitespace token count (codegen'd, no UDF). */
  def tokenCountWs(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** BPE-ish subword token estimate: words + standalone punctuation, counting
    * a long word as ceil(len/4) subword units (rough GPT-style heuristic).
    */
  def tokenCountBpeIsh(c: Column): Column = {
    val words = regexp_extract_all(c, lit("[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0))
    coalesce(
      aggregate(words, lit(0L),
        (acc, w) => acc + ceil(length(w).cast("double") / lit(4.0)).cast("long")),
      lit(0L))
  }

  /** Punctuation character ratio. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(c, lit("[\\p{Punct}]"), lit(0))).cast("double") /
        length(c).cast("double"))

  /** Uppercase ratio over letters. */
  def upperRatio(c: Column): Column = {
    val letters = size(regexp_extract_all(c, lit("[A-Za-z]"), lit(0)))
    when(letters === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(c, lit("[A-Z]"), lit(0))).cast("double") /
        letters.cast("double"))
  }

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "it", "that", "this", "for", "on", "with", "as")

  /** Fraction of whitespace tokens that are (lowercased) English stopwords. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val sw = array(stopwords.map(lit): _*)
    when(length(trim(c)) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  def meanWordLength(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    when(length(trim(c)) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite [0,1] quality score from length / punctuation / stopword /
    * word-shape signals — the usual "is this prose" pre-filter for training
    * corpora. Weights are heuristic; each signal is individually exposed.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(200.0), lit(1.0))
    val punct = punctRatio(c)
    val punctScore = when(punct > 0.2, lit(0.0)).otherwise(lit(1.0) - punct * 5.0 * 0.5)
    val sw = stopwordRatio(c)
    val swScore = when(sw > 0.6, lit(0.5)).otherwise(least(sw * lit(3.0), lit(1.0)))
    val mwl = meanWordLength(c)
    val shapeScore = when(mwl < 2.0 || mwl > 12.0, lit(0.2)).otherwise(lit(1.0))
    round(lenScore * 0.3 + punctScore * 0.2 + swScore * 0.3 + shapeScore * 0.2, 6)
  }

  // ------------------------------------------------------------ language id

  private val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "was", "for", "with", "are"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "mit", "von"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "du", "que", "pour", "dans"),
    "es" -> Set("el", "los", "las", "y", "es", "un", "una", "de", "en", "por", "para", "con"),
    "it" -> Set("il", "lo", "gli", "e", "di", "che", "un", "una", "per", "sono", "con", "del"),
    "pt" -> Set("o", "os", "as", "e", "de", "que", "um", "uma", "para", "com", "em", "do"))

  /** Lightweight language id: CJK/Cyrillic/Greek script detection first, then
    * stopword voting with diacritic tie-breakers for latin-script languages.
    * Returns ISO-639-1 code or "und".
    */
  def detectLanguage(text: String): String = {
    if (text == null || text.trim.isEmpty) return "und"
    val cps = text.codePoints().toArray
    val total = cps.length.max(1)
    def ratio(pred: Int => Boolean) = cps.count(pred).toDouble / total
    if (ratio(cp => (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)) > 0.10) {
      // Han; disambiguate ja via kana
      if (ratio(cp => (cp >= 0x3040 && cp <= 0x30FF)) > 0.05) return "ja" else return "zh"
    }
    if (ratio(cp => cp >= 0x3040 && cp <= 0x30FF) > 0.10) return "ja"
    if (ratio(cp => cp >= 0xAC00 && cp <= 0xD7AF) > 0.10) return "ko"
    if (ratio(cp => cp >= 0x0400 && cp <= 0x04FF) > 0.30) return "ru"
    if (ratio(cp => cp >= 0x0370 && cp <= 0x03FF) > 0.30) return "el"
    if (ratio(cp => cp >= 0x0600 && cp <= 0x06FF) > 0.30) return "ar"
    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val votes = langProfiles.map { case (lang, sw) =>
      lang -> toks.count(sw.contains).toDouble / toks.length
    }
    val diacritics = Map(
      "de" -> "äöüß", "fr" -> "éèêëàâçîïôœù", "es" -> "áéíóúñ¿¡", "pt" -> "ãõáâêçí")
    val boosted = votes.map { case (lang, v) =>
      val d = diacritics.get(lang).map(ds =>
        text.count(ch => ds.indexOf(ch.toInt) >= 0).toDouble / total).getOrElse(0.0)
      lang -> (v + d * 5.0)
    }
    val (best, score) = boosted.maxBy { case (l, v) => (v, l) }
    if (score < 0.02) "und" else best
  }

  def langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => detectLanguage(t))

  // ---------------------------------------------------------- fingerprinting

  /** Polynomial rolling hash over the normalized text (base 1000003 mod
    * 2^61-1) — a stable whole-document fingerprint.
    */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    val M = (1L << 61) - 1
    val B = 1000003L
    var h = 0L
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    var i = 0
    while (i < t.length) {
      // (h*B + c) mod M without overflow: use Math.multiplyHigh-free 128-bit via BigInt-free split
      val hi = Math.multiplyHigh(h, B)
      val lo = h * B
      // fold 128-bit (hi,lo) mod 2^61-1: (lo & M) + (lo>>>61 | hi<<3)
      var folded = (lo & M) + ((lo >>> 61) | (hi << 3))
      if (folded >= M) folded -= M
      h = folded + t.charAt(i).toLong
      if (h >= M) h -= M
      i += 1
    }
    h
  }

  /** Winnowing fingerprint: min k-gram hash per window — a compact sketch for
    * substring-level dup detection. Returns sorted distinct selected hashes.
    */
  def winnow(text: String, k: Int = 8, window: Int = 4): Array[Long] = {
    if (text == null || text.length < k) return Array(fingerprint64(text))
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (t.length < k) return Array(fingerprint64(t))
    val grams = (0 to t.length - k).map(i =>
      graft.core.Murmur3.hash(t.substring(i, i + k).getBytes("UTF-8"), 0).toLong & 0xffffffffL)
    grams.sliding(window).map(_.min).toArray.distinct.sorted
  }

  def fingerprintUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => fingerprint64(t))

  /** Gopher-style word-repetition quality signals (Rae et al. 2021 §A1.1:
    * duplicate-fraction and top-n-gram-coverage filters), computed per
    * document from pure array expressions — no UDF, no shuffle, O(doc)
    * per row (the top-frequency scan is O(distinct·words) on short-doc
    * corpora; both factors are bounded by document length, so the operator
    * is embarrassingly parallel at 100 TB).
    *
    * Adds integer-valued signal columns so downstream aggregation can stay
    * in exact arithmetic; callers derive fractions at the end:
    *   - `n_words`, `n_distinct_words`: duplicate-word fraction
    *   - `top_word_freq`: top-unigram coverage
    *   - `n_bigrams`, `n_distinct_bigrams`: duplicate-bigram fraction
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val total = size(words)
    // most-frequent-word count: sort (native), then one linear pass that
    // tracks the longest equal-run with a struct accumulator. O(n log n)
    // per doc — the transform/filter formulation is O(distinct·n), which
    // is quadratic on long documents and would not survive 10k-word docs
    val sorted = array_sort(words)
    val topFreq = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(w === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    // word bigrams: pair element i of the head slice with word i+1
    // (transform's lambda index is 0-based, element_at is 1-based)
    val bigrams = transform(slice(words, lit(1), total - 1),
      (w, i) => concat_ws(" ", w, element_at(words, i + 2)))
    // the per-row signal expressions (sort + linear scans per doc) are the
    // cost here — fan a narrower-than-the-session input out so they don't
    // run on one core (no-op at real corpus widths)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    spread
      .withColumn("n_words", total.cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(words)).cast("long"))
      .withColumn("top_word_freq", topFreq.cast("long"))
      .withColumn("n_bigrams", size(bigrams).cast("long"))
      .withColumn("n_distinct_bigrams", size(array_distinct(bigrams)).cast("long"))
  }

  /** Corpus TF-IDF keyword extraction: the top-k terms per document, ranked
    * by term frequency with document frequency (rarity) and term text as
    * exact integer/string tie-breaks — no floating-point IDF, so results
    * are deterministic and oracle-comparable.
    *
    * Shape at 100 TB: tokenize+explode is map-side; TF is one shuffle on
    * (doc, word) with partial aggregation. The TF set is persisted
    * DISK_ONLY because both the DF aggregation and the join consume it —
    * without it Spark re-runs the whole tokenize+TF subtree for the DF side
    * (verified: AQE does NOT reuse the exchange here), doubling the corpus
    * scan. DISK_ONLY, not localCheckpoint/MEMORY_AND_DISK: the TF set is
    * corpus-scale, and pinning it in executor storage memory would evict
    * shuffle/execution pages at 100 TB — local-disk blocks cost one
    * sequential write+read and zero memory pressure, the same trade
    * shuffle spill files make. DF then reduces the persisted set to the
    * vocabulary (tiny),
    * which AQE broadcasts back onto TF — a window `count over (partition by
    * word)` would avoid the join but piles every occurrence of a stopword
    * into one partition (unbounded skew); the two-level aggregate keeps
    * map-side partials. The final top-k is a per-document window with
    * WindowGroupLimit pushdown, so only k rows per doc survive the sort.
    */
  def topTfIdfTerms(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
    val tf = tok.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("word").asc)
    tf.join(dfreq, "word")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("word").as("term"), col("tf"), col("df"), col("rank"))
  }

  /** Frequency-ranked top-N vocabulary (ties broken by word asc, so the
    * cutoff is deterministic). The corpus-scale cost is the token explode +
    * one word shuffle with map-side partial counts. The global top-N is a
    * `sort.limit(n)` — Spark plans it as TakeOrderedAndProject (a bounded
    * n-row heap per partition, then one n·partitions merge), so the
    * web-scale distinct-word table never collapses into a single-partition
    * window sort; only the n surviving rows see the rank window.
    */
  /** Adjacent-token-pair frequencies — the counting step of one BPE /
    * WordPiece merge iteration (tokenizer training at corpus scale: the
    * arg-max pair is the next merge rule). Pairs are built map-side with
    * pure array expressions — `zip_with(slice(1..n-1), slice(2..n))` —
    * so the text explodes exactly once to (tokens-1) pair rows; the only
    * corpus-scale exchange is the partial-aggregated pair count, and the
    * final top-k is `orderBy.limit` (per-task k-heap + driver merge, no
    * global sort). Iterating merges re-runs this with the learned merges
    * applied upstream.
    */
  def topTokenPairs(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col(textCol), " ")
    val pairs = docs.select(explode(zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))).as("pair"))
    val top = pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc).limit(k)
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("n").desc, col("pair").asc)))
  }

  def topVocab(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc).limit(n)
    cnt.withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("word").asc)))
  }

  /** Per-group out-of-vocabulary token rate against a `topVocab` frame. The
    * vocabulary is broadcast (it is N rows by construction), so the corpus
    * side never shuffles for the membership test — the only exchange is the
    * final per-group aggregation.
    */
  /** Winsorized length filter: per-group exact token-count percentiles
    * [lo, hi], then keep only documents whose length falls inside — the
    * standard outlier-trimming curation step (drop boilerplate stubs and
    * runaway concatenations per source/language).
    *
    * Output: the kept documents plus `ntok`, `p_lo`, `p_hi` columns.
    *
    * Scale shape: token counts are map-side `size(split(...))` — the text
    * itself never shuffles. The percentile aggregation's state is bounded
    * by the number of DISTINCT lengths per group (Spark's exact percentile
    * buffers value→count, not rows), which for token counts is tiny; for
    * an unbounded-domain metric swap in `percentile_approx`. The per-group
    * bounds frame is |groups| rows, broadcast back — the only corpus-scale
    * exchange is none at all: filter + count happen where the data sits.
    */
  def lengthTrim(docs: DataFrame, groupCol: String, lo: Double, hi: Double,
      textCol: String = "text"): DataFrame = {
    val withTok = docs.withColumn("ntok",
      size(split(col(textCol), " ")).cast("long"))
    val bounds = withTok.groupBy(col(groupCol))
      .agg(expr(s"percentile(ntok, array($lo, $hi))").as("p"))
      .select(col(groupCol), round(element_at(col("p"), 1), 6).as("p_lo"),
        round(element_at(col("p"), 2), 6).as("p_hi"))
    withTok.join(broadcast(bounds), Seq(groupCol))
      .filter(col("ntok") >= col("p_lo") && col("ntok") <= col("p_hi"))
  }

  def oovStats(docs: DataFrame, vocab: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    docs.select(col(groupCol), explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(vocab.select(col("word"), lit(1).as("__in_vocab"))),
        Seq("word"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("total_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens").cast("double") / col("total_tokens"), 6))
}
