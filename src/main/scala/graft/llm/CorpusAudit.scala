package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-composition audits for training-data pipelines: cross-source
  * n-gram overlap (is "web_crawl_v2" 30% re-crawled "web_crawl_v1"? does a
  * code source bleed into a prose source?) and per-source boilerplate
  * detection (the most-repeated n-grams — headers, footers, license
  * blurbs — that C4-style pipelines strip before training).
  */
object CorpusAudit {

  /** Pairwise distinct-n-gram Jaccard between sources.
    *
    * ONE corpus-gram-scale exchange: grams aggregate straight to their
    * distinct source SET (`collect_set`, partial-merged map-side and
    * bounded by the source dimension, not the corpus). Per-source sizes
    * and the pairwise intersection counts both derive from that set frame
    * with map-side partials, so their exchanges carry at most
    * |sources|/|sources|² rows per task — the old shape distinct'ed
    * (source, gram) and then SELF-JOINED that stream on gram, i.e. three
    * corpus-gram-scale exchanges. The set frame is persisted DISK_ONLY for
    * its two consumers; pairs with zero overlap are restored from the tiny
    * sizes frame, so the matrix is complete. At 100 TB nothing here
    * collects: the result is a |sources|²-row frame.
    */
  def sourceOverlapMatrix(docs: DataFrame, n: Int,
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    // fan a narrow input out so the gram explode + set partials parallelize
    // (no-op at real corpus widths)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val gs = spread
      .select(col(sourceCol).as("source"),
        explode(Decontaminate.wordNgrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(collect_set(col("source")).as("ss"))
      .persist(StorageLevel.DISK_ONLY)
    val sizes = gs.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    // unordered source pairs from each gram's SORTED set (a < b), counted
    // with map-side partials — per-gram cost is |sources-sharing-gram|²,
    // same as the old self-join, without re-shuffling the gram stream
    val sortedSs = array_sort(col("ss"))
    val pairs = flatten(transform(sortedSs, (a, i) =>
      transform(slice(sortedSs, i + lit(2), size(sortedSs)),
        b => struct(a.as("source_a"), b.as("source_b")))))
    val inter = gs.filter(size(col("ss")) >= 2)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    val a = sizes.select(col("source").as("source_a"), col("n_grams").as("n_a"))
    val b = sizes.select(col("source").as("source_b"), col("n_grams").as("n_b"))
    val res = a.join(b, col("source_a") < col("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("jaccard", round(
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard"))
    // eager-materialize + release: the result is sources²-sized, so the
    // checkpoint is tiny and the gram cache never outlives the call
    val out = res.localCheckpoint()
    gs.unpersist()
    out
  }

  /** Per-source top-k most frequent n-grams with their document frequency —
    * the boilerplate shortlist.
    *
    * One corpus-scale exchange: the (source, gram) count with map-side
    * partials (doc frequency rides the same aggregation via
    * count(distinct-by-doc) folded as a second pass over the SAME grouped
    * stream — computed from per-(source, gram, doc) partials, so the
    * explode happens once). The top-k finisher is the two-stage partial
    * rank ([[Similarity.topKPerKey]]): only k rows per (source, input
    * partition) reach the final exchange, so a billion-gram source never
    * funnels its whole distinct-gram table through one window sort.
    */
  def boilerplateGrams(docs: DataFrame, n: Int, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    // fan a narrow input out so the gram explode + per-doc partials
    // parallelize (no-op at real corpus widths)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val perDoc = spread
      .select(col(sourceCol).as("source"), col(idCol),
        explode(Decontaminate.wordNgrams(col(textCol), n)).as("gram"))
      .groupBy(col("source"), col(idCol), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val counts = perDoc
      .groupBy(col("source"), col("gram"))
      .agg(sum(col("tf")).as("occurrences"), count(lit(1)).as("doc_freq"))
    Similarity.topKPerKey(counts, "source",
        col("occurrences").desc, col("gram").asc, k)
      .select(col("source"), col("rank"), col("gram"),
        col("occurrences"), col("doc_freq"))
  }
}
