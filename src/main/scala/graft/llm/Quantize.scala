package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage: scale each
  * vector by `127 / max|x|` and round — the standard compression step before
  * an ANN index ships to serving (4× smaller than float32; dot products stay
  * proportional within a vector pair's scales).
  *
  * Pure map-side array expressions — no UDF, no shuffle: at 100 TB this is
  * scan-speed column work that composes with any of the similarity
  * operators. All arithmetic is in double with half-away-from-zero rounding,
  * so codes are integer-exact and engine-portable (DuckDB reproduces them
  * bit-for-bit, which is what the s7 oracle pins).
  */
object Quantize {

  /** max|x| of the vector in double precision (0.0 for all-zero vectors). */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8 codes as array<int>. Max-abs scaling bounds codes to [-127, 127]
    * by construction, so no clamp branch is needed; all-zero vectors map to
    * all-zero codes instead of dividing by zero.
    *
    * Pass a precomputed `maxAbs` column (projected ONCE in its own select)
    * when the codes feed several downstream expressions: higher-order
    * functions evaluate interpreted, and inlining the max under the lambda
    * makes every element re-scan the vector — O(dim²) per row, ~10× on the
    * s7 gate.
    */
  def int8CodesWithMax(vec: Column, maxAbsVal: Column): Column =
    transform(vec, x =>
      when(maxAbsVal === 0.0, lit(0))
        .otherwise(round(x.cast("double") * lit(127.0) / maxAbsVal).cast("int")))

  /** Convenience single-expression form for one-shot use. */
  def int8Codes(vec: Column): Column = int8CodesWithMax(vec, maxAbs(vec))

  /** Per-element reconstruction `q * max|x| / 127` for quality probes. */
  def dequantize(codes: Column, maxAbsVal: Column): Column =
    transform(codes, q => q.cast("double") * maxAbsVal / lit(127.0))
}
