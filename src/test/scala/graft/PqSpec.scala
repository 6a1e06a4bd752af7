package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Quantize

/** Product-quantization primitives: deterministic codebooks, argmin
  * encoding, and an ADC table that reproduces the reconstruction dot
  * product exactly (same double arithmetic either way).
  */
class PqSpec extends AnyFunSuite {

  private def vecs(n: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val r = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(r.nextGaussian()))
  }

  test("trainPqCodebooks is deterministic and shaped m x ksub x dim/m") {
    val sample = vecs(200, 16, 7L)
    val a = Quantize.trainPqCodebooks(sample, m = 4, ksub = 8)
    val b = Quantize.trainPqCodebooks(sample, m = 4, ksub = 8)
    assert(a.length == 4 && a(0).length == 8 && a(0)(0).length == 4)
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.sameElements(v) } })
  }

  test("pqEncode picks the L2-argmin centroid per subspace") {
    val sample = vecs(100, 8, 11L)
    val cbs = Quantize.trainPqCodebooks(sample, m = 2, ksub = 4)
    val v = vecs(1, 8, 13L)(0)
    val codes = Quantize.pqEncode(v, cbs)
    assert(codes.length == 2)
    codes.zipWithIndex.foreach { case (code, j) =>
      val sub = java.util.Arrays.copyOfRange(v, j * 4, (j + 1) * 4)
      def d2(c: Array[Double]) = sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      val best = cbs(j).indices.minBy(i => d2(cbs(j)(i)))
      assert(d2(cbs(j)(code)) == d2(cbs(j)(best)))
    }
  }

  test("adcTable lookup equals dot(query_sub, centroid) for every cell") {
    val sample = vecs(100, 8, 17L)
    val cbs = Quantize.trainPqCodebooks(sample, m = 2, ksub = 4)
    val q = vecs(1, 8, 19L)(0)
    val lut = Quantize.adcTable(q, cbs)
    for (j <- 0 until 2; c <- 0 until 4) {
      var dot = 0.0
      for (t <- 0 until 4) dot += q(j * 4 + t) * cbs(j)(c)(t)
      assert(lut(j * 4 + c) == dot)
    }
  }
}
