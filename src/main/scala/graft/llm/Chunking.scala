package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking for LLM context preparation: split each
  * document into windows of `window` tokens advancing by `stride` tokens
  * (overlap = window - stride) — the standard prep step before embedding or
  * training on documents longer than the model context.
  *
  * Pure map-side array expressions (split / sequence / transform / slice)
  * plus one posexplode — no UDF, no shuffle: at 100 TB this runs at scan
  * speed and parallelizes per input split, with output rows ~(overlap
  * factor)× input rows flowing straight into the next operator.
  */
object Chunking {

  /** Chunk `textCol` (single-space-tokenized) into overlapping token windows.
    *
    * Chunk count is `1 + ceil((ntok - window) / stride)` — documents at or
    * under `window` tokens yield exactly one chunk; otherwise the final
    * window starts at the last stride boundary and may be partial, but every
    * token is covered and interior chunks are always full-width.
    *
    * Output: `keep` columns + (chunk_id, chunk_text, chunk_tokens).
    */
  def chunkByTokens(df: DataFrame, textCol: String, window: Int, stride: Int,
      keep: Seq[String]): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    val nt = size(toks)
    val nc = when(nt <= window, lit(1)).otherwise(
      ceil((nt - lit(window)).cast("double") / lit(stride.toDouble)).cast("int") + lit(1))
    val chunks = transform(sequence(lit(0), nc - 1),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(window))))
    df.select(keep.map(col) :+ posexplode(chunks): _*)
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("chunk_tokens", size(split(col("chunk_text"), " ")).cast("long"))
  }
}
