package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.format.{DeletionVector, PositionBitmap, Puffin}

/** Puffin + deletion-vector codec, validated against our own round-trips AND
  * the canonical Java-produced fixtures shipped in the reference repo
  * (pure-spec artifacts from apache/iceberg test resources).
  */
class PuffinDvSpec extends AnyFunSuite {

  private val refPuffin = "/root/reference/puffin/testdata"
  private val refDv = "/root/reference/table/dv/testdata/deletes"

  test("position bitmap set/contains/cardinality across 32-bit boundaries") {
    val bm = new PositionBitmap
    val positions = Seq(0L, 1L, 100L, (1L << 32) - 1, 1L << 32, (1L << 32) + 5, (5L << 32) + 123)
    positions.foreach(bm.set)
    positions.foreach(p => assert(bm.contains(p), s"missing $p"))
    assert(!bm.contains(2L))
    assert(bm.cardinality === positions.size)
    assert(bm.positionsIterator.toSeq === positions.sorted)
  }

  test("portable serialization round trip") {
    val bm = new PositionBitmap
    (0L until 1000L by 7L).foreach(bm.set)
    bm.set(1L << 33)
    val back = PositionBitmap.deserialize(bm.serialize())
    assert(back.cardinality === bm.cardinality)
    assert(back.positionsIterator.toSeq === bm.positionsIterator.toSeq)
  }

  test("dv envelope round trip (length/magic/crc)") {
    val bm = new PositionBitmap
    Seq(1L, 5L, 1000L, (1L << 32) + 42).foreach(bm.set)
    val blob = DeletionVector.serialize(bm)
    val back = DeletionVector.deserialize(blob, expectedCardinality = 4)
    assert(back.positionsIterator.toSeq === Seq(1L, 5L, 1000L, (1L << 32) + 42))
  }

  test("puffin file round trip with two blobs") {
    val dir = Files.createTempDirectory("puffin").toString
    val path = s"$dir/test.puffin"
    val bm1 = new PositionBitmap; bm1.set(1); bm1.set(9)
    val bm2 = new PositionBitmap; bm2.set(1L << 40)
    val metas = Puffin.write(path, Seq(
      (DeletionVector.BlobType, DeletionVector.serialize(bm1), Map("referenced-data-file" -> "a")),
      (DeletionVector.BlobType, DeletionVector.serialize(bm2), Map("referenced-data-file" -> "b"))))
    val footer = Puffin.readFooter(path)
    assert(footer.size === 2)
    assert(footer.map(_.properties("referenced-data-file")) === Seq("a", "b"))
    val b1 = DeletionVector.deserialize(Puffin.readBlob(path, footer(0)))
    val b2 = DeletionVector.deserialize(Puffin.readBlob(path, footer(1)))
    assert(b1.positionsIterator.toSeq === Seq(1L, 9L))
    assert(b2.positionsIterator.toSeq === Seq(1L << 40))
  }

  test("golden: java-produced DV payload deserializes") {
    val payload = Files.readAllBytes(java.nio.file.Paths.get(
      s"$refPuffin/deletion-vector-v1-payload.bin"))
    val bm = DeletionVector.deserialize(payload)
    assert(bm.cardinality > 0)
  }

  test("golden: single-blob and multi-blob java puffin DV files read") {
    for (f <- Seq("single-blob-dv.puffin", "multi-blob-dv.puffin")) {
      val footer = Puffin.readFooter(s"$refDv/$f")
      assert(footer.nonEmpty, f)
      footer.filter(_.blobType == DeletionVector.BlobType).foreach { meta =>
        val bm = DeletionVector.deserialize(Puffin.readBlob(s"$refDv/$f", meta))
        val expected = meta.properties.get("cardinality").map(_.toLong)
        expected.foreach(c => assert(bm.cardinality === c, s"$f cardinality"))
      }
    }
  }

  test("golden: canonical empty puffin from apache/iceberg-java reads") {
    val footer = Puffin.readFooter(s"$refPuffin/empty-puffin-uncompressed.bin")
    assert(footer.isEmpty)
  }

  test("golden: java 64-bit roaring fixtures deserialize as portable bitmaps") {
    for (f <- Seq("64map32bitvals.bin", "64mapempty.bin", "64maphighvals.bin",
      "64mapspreadvals.bin")) {
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$refDv/$f"))
      val bm = PositionBitmap.deserialize(bytes)
      assert(bm.cardinality >= 0, f)
      // round-trip through our serializer must preserve positions
      val back = PositionBitmap.deserialize(bm.serialize())
      assert(back.positionsIterator.toSeq === bm.positionsIterator.toSeq, f)
    }
  }

  test("dv union (or) merges buckets") {
    val a = new PositionBitmap; a.set(1); a.set(1L << 35)
    val b = new PositionBitmap; b.set(2); b.set(1L << 35)
    a.or(b)
    assert(a.positionsIterator.toSeq === Seq(1L, 2L, 1L << 35))
  }
}
