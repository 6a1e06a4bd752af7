package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB geometry support for the v3 geo surface (reference
  * `table/internal/geo_codec.go:1-563`): point encode/decode (both byte
  * orders on read, little-endian on write) and bbox intersection — enough
  * for `BBoxIntersects` row filtering over a WKB binary column. Full
  * geometry kinds (linestring/polygon/multi*) decode to their coordinate
  * envelope.
  */
object Geo {

  val PointType = 1
  val LineStringType = 2
  val PolygonType = 3

  /** WKB point, little-endian. */
  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // LE marker
    bb.putInt(PointType)
    bb.putDouble(x)
    bb.putDouble(y)
    bb.array
  }

  /** Envelope (xmin, ymin, xmax, ymax) of a WKB geometry; None on
    * non-geometry bytes (fail-open for filtering: caller decides). Covers
    * the full WKB surface — Point/LineString/Polygon plus Multi* and
    * GeometryCollection (each element a complete WKB geometry with its
    * own byte-order marker), in all of XY/XYZ/XYM/XYZM via EWKB flags or
    * ISO type offsets — verified against parquet-java's footer bounds
    * over the vendored parquet-testing corpus (GeoGoldenSpec).
    */
  def envelope(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    if (wkb == null || wkb.length < 5) return None
    try {
      val bb = ByteBuffer.wrap(wkb)
      envelopeAt(bb, depth = 0)
    } catch { case _: Exception => None }
  }

  /** One WKB geometry starting at the buffer position's byte-order
    * marker; advances the buffer past it (collection elements parse
    * sequentially). Depth-bounded: WKB nests collections at most a few
    * levels; a corrupt length field must not recurse unboundedly.
    */
  private def envelopeAt(bb: ByteBuffer,
      depth: Int): Option[(Double, Double, Double, Double)] = {
    if (depth > 8) return None
    bb.order(if (bb.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = bb.getInt
    // EWKB/ISO flags: the masked-off dimensions still occupy bytes, so
    // they must be consumed — not just ignored — or every later read is
    // misaligned and the envelope is silently garbage
    val hasSrid = (rawType & 0x20000000) != 0
    val flagZ = (rawType & 0x80000000) != 0
    val flagM = (rawType & 0x40000000) != 0
    val base = rawType & 0x0fffffff // strip EWKB flag bits
    val isoBlock = base / 1000 // ISO offsets: 1000 = Z, 2000 = M, 3000 = ZM
    val dims = 2 +
      (if (flagZ || isoBlock == 1 || isoBlock == 3) 1 else 0) +
      (if (flagM || isoBlock == 2 || isoBlock == 3) 1 else 0)
    if (hasSrid) bb.getInt // consume SRID
    base % 1000 match {
      case PointType =>
        val x = bb.getDouble; val y = bb.getDouble
        skipDims(bb, dims - 2)
        // NaN vertices carry no envelope information (reference
        // geo_codec.go update() skips them); a NaN point has no bounds
        if (x.isNaN || y.isNaN) None else Some((x, y, x, y))
      case LineStringType =>
        val n = bb.getInt
        envelopeOfCoords(bb, n, dims)
      case PolygonType =>
        val rings = bb.getInt
        var env: Option[(Double, Double, Double, Double)] = None
        var r = 0
        while (r < rings) {
          val n = bb.getInt
          env = merge(env, envelopeOfCoords(bb, n, dims))
          r += 1
        }
        env
      case t if t >= 4 && t <= 7 => // MultiPoint/-LineString/-Polygon/Collection
        val n = bb.getInt
        var env: Option[(Double, Double, Double, Double)] = None
        var i = 0
        while (i < n) {
          env = merge(env, envelopeAt(bb, depth + 1))
          i += 1
        }
        env
      case _ => None
    }
  }

  private def skipDims(bb: ByteBuffer, n: Int): Unit = {
    var i = 0
    while (i < n) { bb.getDouble; i += 1 }
  }

  private def envelopeOfCoords(bb: ByteBuffer, n: Int,
      dims: Int): Option[(Double, Double, Double, Double)] = {
    if (n <= 0) return None
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = Double.MinValue; var ymax = Double.MinValue
    var i = 0
    var finite = 0
    while (i < n) {
      val x = bb.getDouble; val y = bb.getDouble
      skipDims(bb, dims - 2)
      // skip NaN vertices so one bad coordinate can't poison the file
      // bound (reference geo_codec.go accumulator skips NaN and still
      // emits finite bounds)
      if (!x.isNaN && !y.isNaN) {
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
        finite += 1
      }
      i += 1
    }
    if (finite == 0) None else Some((xmin, ymin, xmax, ymax))
  }

  private def merge(a: Option[(Double, Double, Double, Double)],
      b: Option[(Double, Double, Double, Double)]) = (a, b) match {
    case (Some((ax0, ay0, ax1, ay1)), Some((bx0, by0, bx1, by1))) =>
      Some((math.min(ax0, bx0), math.min(ay0, by0),
        math.max(ax1, bx1), math.max(ay1, by1)))
    case (x, None) => x
    case (None, y) => y
  }

  /** Iceberg geospatial single-value bound: concatenated little-endian
    * float64 coordinates — 16 bytes XY (we never emit Z/M). Reference:
    * `table/internal/geo_codec.go` encodeGeoBound/decodeGeoBound.
    */
  def encodeBound(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(x); bb.putDouble(y)
    bb.array
  }

  /** Decode a bound's planar XY; accepts 16 (XY) / 24 (XYZ) / 32 (XYZM/XYM)
    * byte layouts — x,y are always the first two doubles. None on malformed
    * or NaN bounds (unusable for pruning → caller must not prune).
    */
  def decodeBoundXY(bytes: Array[Byte]): Option[(Double, Double)] = {
    if (bytes == null || !(bytes.length == 16 || bytes.length == 24 || bytes.length == 32))
      return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val x = bb.getDouble; val y = bb.getDouble
    if (x.isNaN || y.isNaN) None else Some((x, y))
  }

  /** Planar bbox intersection over closed intervals (touching counts):
    * inclusive pruning must keep any file that might contain a match.
    */
  def bboxIntersectsXY(aMinX: Double, aMinY: Double, aMaxX: Double, aMaxY: Double,
      bMinX: Double, bMinY: Double, bMaxX: Double, bMaxY: Double): Boolean =
    aMinX <= bMaxX && aMaxX >= bMinX && aMinY <= bMaxY && aMaxY >= bMinY

  /** Does the geometry's envelope intersect the query bbox? */
  def intersects(wkb: Array[Byte], xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): Boolean =
    envelope(wkb).exists { case (gx0, gy0, gx1, gy1) =>
      gx1 >= xmin && gx0 <= xmax && gy1 >= ymin && gy0 <= ymax
    }
}
