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

  // -------------------------------------------------------- product quant

  /** Per-subspace L2 k-means codebooks (classic product quantization) on a
    * bounded driver-side sample: the dim-length vector splits into `m`
    * subvectors of dim/m, each subspace trains `ksub` centroids. Seeded
    * init over the ordered sample keeps the codebooks deterministic.
    * Returns m × ksub × (dim/m).
    */
  def trainPqCodebooks(sample: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int = 10, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val rnd = new java.util.Random(seed + j)
      var cents = Array.tabulate(math.min(ksub, sub.length))(i =>
        sub(if (i == 0) 0 else rnd.nextInt(sub.length)).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Int](cents.length)
        sub.foreach { v =>
          val c = nearestCode(v, cents)
          var t = 0
          while (t < dsub) { sums(c)(t) += v(t); t += 1 }
          counts(c) += 1
        }
        cents = cents.indices.map { i =>
          if (counts(i) == 0) cents(i)
          else { val a = sums(i); var t = 0; while (t < dsub) { a(t) /= counts(i); t += 1 }; a }
        }.toArray
      }
      cents
    }
  }

  /** Index of the L2-nearest centroid (ties by lowest index). */
  def nearestCode(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i); var d = 0.0; var t = 0
      while (t < c.length) { val e = v(t) - c(t); d += e * e; t += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** PQ codes for one (unit-normalized) vector: m centroid indices. */
  def pqEncode(v: Array[Double], codebooks: Array[Array[Array[Double]]]): Array[Int] = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    Array.tabulate(m)(j =>
      nearestCode(java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub), codebooks(j)))
  }

  /** Asymmetric-distance (ADC) lookup table for one normalized query:
    * flat m·ksub array of dot(query_sub_j, codebook_j(c)). The approximate
    * cosine of a coded corpus vector is then m lookups + adds.
    */
  def adcTable(q: Array[Double], codebooks: Array[Array[Array[Double]]]): Array[Double] = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val cb = codebooks(j)(c); var d = 0.0; var t = 0
        while (t < dsub) { d += q(j * dsub + t) * cb(t); t += 1 }
        lut(j * ksub + c) = d
        c += 1
      }
      j += 1
    }
    lut
  }
}
