package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.datasketches.theta.UpdateSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.table.Analyze

/** NDV blob wire formats: spec theta sketches + legacy KMV dual-read. */
class ThetaNdvSpec extends AnyFunSuite {

  test("spec theta blob: library round trip gives exact small-cardinality NDV") {
    val sk = UpdateSketch.builder().build()
    (1 to 1000).foreach(i => sk.update(i.toLong))
    val bytes = sk.compact().toByteArray
    assert(Analyze.ndvFromBlob(Analyze.NdvBlobType, bytes) === 1000L)
  }

  test("spec theta blob: estimation mode stays within ~5%") {
    val sk = UpdateSketch.builder().setLogNominalEntries(Analyze.DefaultLgK).build()
    (1 to 200000).foreach(i => sk.update(s"key-$i"))
    val est = Analyze.ndvFromBlob(Analyze.NdvBlobType, sk.compact().toByteArray)
    assert(math.abs(est - 200000L).toDouble / 200000 <= 0.05, s"estimate $est")
  }

  test("legacy graft-kmv-v1 blobs remain readable (dual-read)") {
    // unsaturated sketch (n < k): estimate is the exact retained count
    val bb = ByteBuffer.allocate(4 + 3 * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(3)
    Seq(Long.MinValue + 10, Long.MinValue + 20, Long.MinValue + 30).foreach(bb.putLong)
    assert(Analyze.ndvFromBlob(Analyze.LegacyKmvBlobType, bb.array) === 3L)
    intercept[IllegalArgumentException] {
      Analyze.ndvFromBlob("no-such-type", Array[Byte](1, 2, 3))
    }
  }
}
