package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.roaringbitmap.RoaringBitmap

/** Puffin file format (public spec: iceberg.apache.org/puffin-spec) +
  * deletion-vector-v1 blobs (Iceberg v3). Reference: `puffin/puffin.go`,
  * `table/dv/deletion_vector.go`, `table/dv/roaring_bitmap.go`.
  *
  * Layout: [PFA1] [blob]* [PFA1] [footer json] [size int32 LE] [flags] [PFA1]
  */
object Puffin {

  private val Magic = Array[Byte]('P', 'F', 'A', '1')
  private val mapper = new ObjectMapper()

  final case class BlobMetadata(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  /** A blob to write: spec metadata plus payload. DV blobs require
    * snapshotId/sequenceNumber −1; stats blobs carry the real snapshot and
    * sketched field ids (reference `puffin/puffin.go:54-80`).
    */
  final case class BlobSpec(
      blobType: String,
      payload: Array[Byte],
      properties: Map[String, String] = Map.empty,
      fields: Seq[Int] = Nil,
      snapshotId: Long = -1L,
      sequenceNumber: Long = -1L)

  /** Write a puffin file; returns blob metadata with final offsets. */
  def write(path: String, blobs: Seq[(String, Array[Byte], Map[String, String])],
      fileProperties: Map[String, String] = Map.empty): Seq[BlobMetadata] =
    writeBlobs(path,
      blobs.map { case (t, b, p) => BlobSpec(t, b, p) }, fileProperties)

  def writeBlobs(path: String, blobs: Seq[BlobSpec],
      fileProperties: Map[String, String] = Map.empty): Seq[BlobMetadata] = {
    val out = graft.io.FileIO.create(path)
    try {
      out.write(Magic)
      var offset = 4L
      val metas = blobs.map { b =>
        val m = BlobMetadata(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
          offset, b.payload.length.toLong, b.properties)
        out.write(b.payload)
        offset += b.payload.length
        m
      }
      // footer
      val footerJson = {
        val root = mapper.createObjectNode()
        val arr = root.putArray("blobs")
        metas.foreach { m =>
          val o = arr.addObject()
          o.put("type", m.blobType)
          val fa = o.putArray("fields")
          m.fields.foreach(fa.add)
          o.put("snapshot-id", m.snapshotId)
          o.put("sequence-number", m.sequenceNumber)
          o.put("offset", m.offset)
          o.put("length", m.length)
          if (m.properties.nonEmpty) {
            val p = o.putObject("properties")
            m.properties.foreach { case (k, v) => p.put(k, v) }
          }
        }
        if (fileProperties.nonEmpty) {
          val p = root.putObject("properties")
          fileProperties.foreach { case (k, v) => p.put(k, v) }
        }
        mapper.writeValueAsBytes(root)
      }
      out.write(Magic)
      out.write(footerJson)
      val trailer = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      trailer.putInt(footerJson.length)
      trailer.putInt(0) // flags: uncompressed footer
      trailer.put(Magic)
      out.write(trailer.array)
      metas
    } finally out.close()
  }

  def readFooter(path: String): Seq[BlobMetadata] = {
    val len = graft.io.FileIO.size(path)
    require(len >= 20, s"puffin too short: $len")
    val in = graft.io.FileIO.open(path)
    try {
      def magicAt(pos: Long): Boolean = {
        val b = new Array[Byte](4)
        in.readFully(pos, b)
        java.util.Arrays.equals(b, Magic)
      }
      require(magicAt(0), "puffin: bad header magic")
      require(magicAt(len - 4), "puffin: bad trailing magic")
      val tb = new Array[Byte](8)
      in.readFully(len - 12, tb)
      val bb = ByteBuffer.wrap(tb).order(ByteOrder.LITTLE_ENDIAN)
      val footerSize = bb.getInt
      val flags = bb.getInt
      require((flags & 1) == 0, "puffin: compressed footer unsupported")
      val footerStart = len - 12 - footerSize
      require(magicAt(footerStart - 4), "puffin: bad footer magic")
      val fj = new Array[Byte](footerSize)
      in.readFully(footerStart, fj)
      val root = mapper.readTree(fj)
      root.get("blobs").elements().asScala.map { o =>
        BlobMetadata(
          blobType = o.get("type").asText,
          fields = Option(o.get("fields")).map(_.elements().asScala.map(_.asInt).toSeq).getOrElse(Nil),
          snapshotId = Option(o.get("snapshot-id")).map(_.asLong).getOrElse(-1L),
          sequenceNumber = Option(o.get("sequence-number")).map(_.asLong).getOrElse(-1L),
          offset = o.get("offset").asLong,
          length = o.get("length").asLong,
          properties = Option(o.get("properties")).map(p =>
            p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty))
      }.toSeq
    } finally in.close()
  }

  /** Read a deletion-vector-v1 blob through its FOOTER metadata — the route
    * a foreign engine's Puffin file takes (reference
    * `puffin/puffin_reader.go` ReadDV + `dv_header_validation_test.go`):
    * the v3 spec pins a DV blob's snapshot-id and sequence-number to -1, so
    * any other value means a non-conformant writer — reject rather than
    * guess (snapshot-id checked first, matching the reference's order), and
    * verify the payload cardinality against the footer's property.
    */
  def readDv(path: String, meta: BlobMetadata): PositionBitmap = {
    require(meta.blobType == DeletionVector.BlobType,
      s"not a deletion vector blob: ${meta.blobType}")
    require(meta.snapshotId == -1L,
      s"deletion vector blob must carry snapshot-id -1, got ${meta.snapshotId}")
    require(meta.sequenceNumber == -1L,
      s"deletion vector blob must carry sequence-number -1, got ${meta.sequenceNumber}")
    val card = meta.properties.get("cardinality").flatMap(_.toLongOption).getOrElse(-1L)
    DeletionVector.deserialize(readBlob(path, meta), card)
  }

  def readBlob(path: String, meta: BlobMetadata): Array[Byte] =
    graft.io.FileIO.readRange(path, meta.offset, meta.length.toInt)
}

/** 64-bit position bitmap as a sorted map of 32-bit roaring buckets —
  * the Iceberg "portable" serialization (reference
  * `table/dv/roaring_bitmap.go:44-230`).
  */
final class PositionBitmap extends Serializable {
  private val buckets = new java.util.TreeMap[Integer, RoaringBitmap]()

  def set(pos: Long): Unit = {
    val key = (pos >>> 32).toInt
    var bm = buckets.get(key)
    if (bm == null) { bm = new RoaringBitmap(); buckets.put(key, bm) }
    bm.add(pos.toInt)
  }

  def contains(pos: Long): Boolean = {
    val bm = buckets.get((pos >>> 32).toInt)
    bm != null && bm.contains(pos.toInt)
  }

  def or(other: PositionBitmap): Unit =
    other.buckets.forEach { (k, obm) =>
      val bm = buckets.get(k)
      if (bm == null) buckets.put(k, obm.clone()) else bm.or(obm)
    }

  private[format] def addBucket(key: Int, bm: RoaringBitmap): Unit = {
    val existing = buckets.get(key)
    if (existing == null) buckets.put(key, bm) else existing.or(bm)
    ()
  }

  def cardinality: Long = {
    var c = 0L
    buckets.forEach((_, bm) => c += bm.getLongCardinality)
    c
  }

  def positionsIterator: Iterator[Long] = {
    buckets.entrySet().asScala.iterator.flatMap { e =>
      val hi = e.getKey.toLong << 32
      val it = e.getValue.iterator()
      new Iterator[Long] {
        def hasNext = it.hasNext
        def next() = hi | (it.next().toLong & 0xffffffffL)
      }
    }
  }

  /** portable: count (8B LE) + per bucket ascending: key (4B LE) + roaring. */
  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    // iterator (not the Set wrapper) keeps TreeMap ascending-key order,
    // which the portable format requires
    val nonEmpty = buckets.entrySet().iterator().asScala.filter(_.getValue.getCardinality > 0).toSeq
    val cnt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(nonEmpty.size.toLong)
    bos.write(cnt.array)
    nonEmpty.foreach { e =>
      val kb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(e.getKey)
      bos.write(kb.array)
      val bm = e.getValue
      bm.runOptimize()
      val dos = new DataOutputStream(bos)
      bm.serialize(dos)
      dos.flush()
    }
    bos.toByteArray
  }
}

object PositionBitmap {
  /** Max bucket count accepted on read: fail-closed against absurd counts in
    * malformed input (reference `table/dv/roaring_bitmap.go:38`, derived from
    * the default max blob size / minimum 8-byte per-bucket footprint).
    */
  private val MaxBitmapCount: Long = (8L << 30) / 8

  def deserialize(bytes: Array[Byte]): PositionBitmap = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val count = bb.getLong
    require(count >= 0 && count <= MaxBitmapCount, s"bitmap count $count out of range")
    val out = new PositionBitmap
    var i = 0L
    var lastKey = -1L
    while (i < count) {
      val key = bb.getInt
      // Spec: keys are unsigned, bounded by 2^31-1 (Java int), strictly
      // ascending. Java rejects with "Invalid unsigned key"; Go fails further
      // down the parse (`table/dv/dv_cross_client_test.go:131-152`). We
      // fail-closed explicitly.
      require(key >= 0, s"invalid unsigned key $key")
      require(key.toLong > lastKey, s"keys must be ascending: $key after $lastKey")
      lastKey = key.toLong
      val bm = new RoaringBitmap()
      // RoaringBitmap.deserialize(ByteBuffer) reads the portable format and
      // leaves the buffer position past the bitmap
      val dup = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
      bm.deserialize(dup)
      val consumed = bm.serializedSizeInBytes()
      bb.position(bb.position() + consumed)
      out.addBucket(key, bm)
      i += 1
    }
    require(!bb.hasRemaining, s"trailing data after bitmaps: ${bb.remaining} bytes")
    out
  }
}

/** deletion-vector-v1 blob envelope (reference
  * `table/dv/deletion_vector.go:30-165`):
  * length (4B BE, = magic+bitmap) | magic 0x6439D3D1 (4B LE) | portable
  * bitmap | crc32 (4B BE over magic+bitmap).
  */
object DeletionVector {
  val MagicLE: Int = 0x6439D3D1
  val BlobType = "deletion-vector-v1"

  def serialize(bitmap: PositionBitmap): Array[Byte] = {
    val bm = bitmap.serialize()
    val inner = ByteBuffer.allocate(4 + bm.length).order(ByteOrder.LITTLE_ENDIAN)
    inner.putInt(MagicLE)
    inner.put(bm)
    val innerBytes = inner.array
    val crc = new CRC32()
    crc.update(innerBytes)
    val out = ByteBuffer.allocate(4 + innerBytes.length + 4) // BE by default
    out.putInt(innerBytes.length)
    out.put(innerBytes)
    out.putInt(crc.getValue.toInt)
    out.array
  }

  def deserialize(data: Array[Byte], expectedCardinality: Long = -1L): PositionBitmap = {
    require(data.length >= 12, s"deletion vector too short: ${data.length}")
    val bb = ByteBuffer.wrap(data) // big-endian
    val length = bb.getInt
    require(length == data.length - 8,
      s"deletion vector length mismatch: $length vs ${data.length - 8}")
    val magic = ByteBuffer.wrap(data, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(magic == MagicLE, f"bad deletion vector magic 0x$magic%08x")
    val crc = new CRC32()
    crc.update(data, 4, data.length - 8)
    val expected = ByteBuffer.wrap(data, data.length - 4, 4).getInt
    require(crc.getValue.toInt == expected, "deletion vector CRC mismatch")
    val bm = PositionBitmap.deserialize(
      java.util.Arrays.copyOfRange(data, 8, data.length - 4))
    if (expectedCardinality >= 0)
      require(bm.cardinality == expectedCardinality,
        s"cardinality mismatch: ${bm.cardinality} vs $expectedCardinality")
    bm
  }
}
