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
        val bm = Puffin.readDv(s"$refDv/$f", meta)
        val expected = meta.properties.get("cardinality").map(_.toLong)
        expected.foreach(c => assert(bm.cardinality === c, s"$f cardinality"))
      }
    }
  }

  // reference `puffin/dv_header_validation_test.go`: the v3 spec pins a DV
  // blob's snapshot-id and sequence-number to -1; a footer claiming anything
  // else is a non-conformant writer and must be rejected, snapshot-id first
  test("footer DV read rejects snapshot-id / sequence-number != -1") {
    val f = s"$refDv/single-blob-dv.puffin"
    val meta = Puffin.readFooter(f)
      .find(_.blobType == DeletionVector.BlobType).get
    assert(meta.snapshotId === -1L && meta.sequenceNumber === -1L)

    val badSnap = intercept[IllegalArgumentException](
      Puffin.readDv(f, meta.copy(snapshotId = 42L)))
    assert(badSnap.getMessage.contains("snapshot-id"))
    val badSeq = intercept[IllegalArgumentException](
      Puffin.readDv(f, meta.copy(sequenceNumber = 7L)))
    assert(badSeq.getMessage.contains("sequence-number"))
    // both wrong: the snapshot-id check fires first
    val both = intercept[IllegalArgumentException](
      Puffin.readDv(f, meta.copy(snapshotId = 42L, sequenceNumber = 7L)))
    assert(both.getMessage.contains("snapshot-id"))
    // a stats blob through the DV route is a type error
    val notDv = intercept[IllegalArgumentException](
      Puffin.readDv(f, meta.copy(blobType = "apache-datasketches-theta-v1")))
    assert(notDv.getMessage.contains("not a deletion vector"))
  }

  test("golden: canonical empty puffin from apache/iceberg-java reads") {
    val footer = Puffin.readFooter(s"$refPuffin/empty-puffin-uncompressed.bin")
    assert(footer.isEmpty)
  }

  test("golden: java 64-bit roaring fixtures deserialize as portable bitmaps") {
    // expected cardinalities pinned by the reference's own tests
    // (table/dv/roaring_bitmap_test.go:34-75)
    val expected = Seq("64map32bitvals.bin" -> 10L, "64mapempty.bin" -> 0L,
      "64mapspreadvals.bin" -> 100L)
    for ((f, card) <- expected) {
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$refDv/$f"))
      val bm = PositionBitmap.deserialize(bytes)
      assert(bm.cardinality === card, f)
      // round-trip through our serializer must preserve positions
      val back = PositionBitmap.deserialize(bm.serialize())
      assert(back.positionsIterator.toSeq === bm.positionsIterator.toSeq, f)
    }
    val spread = PositionBitmap.deserialize(
      Files.readAllBytes(java.nio.file.Paths.get(s"$refDv/64mapspreadvals.bin")))
    assert(spread.contains((3L << 32) | 7L))
    assert(spread.contains((9L << 32) | 9L))
    assert(!spread.contains(10L << 32))
  }

  test("golden: spec-illegal high-key fixture is rejected (java/go parity)") {
    // 64maphighvals.bin carries a roaring key past the spec's unsigned-key
    // bound; Java rejects ("Invalid unsigned key"), Go fails-closed
    // (table/dv/dv_cross_client_test.go:131-152). We must reject too.
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$refDv/64maphighvals.bin"))
    intercept[Exception](PositionBitmap.deserialize(bytes))
  }

  test("dv union (or) merges buckets") {
    val a = new PositionBitmap; a.set(1); a.set(1L << 35)
    val b = new PositionBitmap; b.set(2); b.set(1L << 35)
    a.or(b)
    assert(a.positionsIterator.toSeq === Seq(1L, 2L, 1L << 35))
  }
}
