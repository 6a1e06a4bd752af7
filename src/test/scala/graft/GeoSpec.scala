package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.format.PartitionSpec
import graft.table.{SparkRead, Writer}

/** WKB codec + BBoxIntersects predicate over an Iceberg binary column. */
class GeoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("wkb point round trip and envelope") {
    val wkb = Geo.encodePoint(12.5, -3.25)
    assert(Geo.envelope(wkb) === Some((12.5, -3.25, 12.5, -3.25)))
    // big-endian point reads too
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte); be.putInt(1); be.putDouble(1.0); be.putDouble(2.0)
    assert(Geo.envelope(be.array) === Some((1.0, 2.0, 1.0, 2.0)))
    assert(Geo.envelope(Array[Byte](9, 9, 9)) === None)
  }

  test("multi-geometries and collections merge element envelopes") {
    import java.nio.{ByteBuffer, ByteOrder}
    def pt(x: Double, y: Double): Array[Byte] = Geo.encodePoint(x, y)
    // MULTIPOINT(1 2, -5 9): type 4, two embedded point geometries
    val mp = ByteBuffer.allocate(9 + 2 * 21).order(ByteOrder.LITTLE_ENDIAN)
    mp.put(1.toByte); mp.putInt(4); mp.putInt(2)
    mp.put(pt(1, 2)); mp.put(pt(-5, 9))
    assert(Geo.envelope(mp.array) === Some((-5.0, 2.0, 1.0, 9.0)))
    // GEOMETRYCOLLECTION(POINT(3 4), MULTIPOINT(10 -1)) — nested collection
    val inner = ByteBuffer.allocate(9 + 21).order(ByteOrder.LITTLE_ENDIAN)
    inner.put(1.toByte); inner.putInt(4); inner.putInt(1); inner.put(pt(10, -1))
    val gc = ByteBuffer.allocate(9 + 21 + inner.capacity).order(ByteOrder.LITTLE_ENDIAN)
    gc.put(1.toByte); gc.putInt(7); gc.putInt(2)
    gc.put(pt(3, 4)); gc.put(inner.array)
    assert(Geo.envelope(gc.array) === Some((3.0, -1.0, 10.0, 4.0)))
    // mixed byte order inside a collection: BE point element
    val bePt = ByteBuffer.allocate(21)
    bePt.put(0.toByte); bePt.putInt(1); bePt.putDouble(100.0); bePt.putDouble(7.0)
    val mixed = ByteBuffer.allocate(9 + 21 + 21).order(ByteOrder.LITTLE_ENDIAN)
    mixed.put(1.toByte); mixed.putInt(7); mixed.putInt(2)
    mixed.put(pt(0, 0)); mixed.put(bePt.array)
    assert(Geo.envelope(mixed.array) === Some((0.0, 0.0, 100.0, 7.0)))
    // empty multi has no envelope
    val empty = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
    empty.put(1.toByte); empty.putInt(6); empty.putInt(0)
    assert(Geo.envelope(empty.array) === None)
  }

  test("ewkb srid and z/m flags consume their bytes") {
    // EWKB point with SRID flag: 0x20000001, srid=4326
    val bb = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(0x20000001); bb.putInt(4326)
    bb.putDouble(7.0); bb.putDouble(8.0)
    assert(Geo.envelope(bb.array) === Some((7.0, 8.0, 7.0, 8.0)))
    // ISO PointZ (type 1001): three doubles, envelope uses x/y only
    val bz = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bz.put(1.toByte); bz.putInt(1001)
    bz.putDouble(1.0); bz.putDouble(2.0); bz.putDouble(99.0)
    assert(Geo.envelope(bz.array) === Some((1.0, 2.0, 1.0, 2.0)))
  }

  test("bbox intersection semantics (touching edges count)") {
    val p = Geo.encodePoint(5.0, 5.0)
    assert(Geo.intersects(p, 0, 0, 5, 5))
    assert(Geo.intersects(p, 5, 5, 10, 10))
    assert(!Geo.intersects(p, 6, 6, 10, 10))
  }

  test("geo bound codec: 16-byte XY round trip, Z/M layouts, NaN rejected") {
    val b = Geo.encodeBound(-12.5, 33.25)
    assert(b.length === 16)
    assert(Geo.decodeBoundXY(b) === Some((-12.5, 33.25)))
    // 24-byte XYZ and 32-byte XYZM: x/y are always the first two doubles
    val xyz = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xyz.putDouble(1.0); xyz.putDouble(2.0); xyz.putDouble(9.0)
    assert(Geo.decodeBoundXY(xyz.array) === Some((1.0, 2.0)))
    assert(Geo.decodeBoundXY(Geo.encodeBound(Double.NaN, 1.0)) === None)
    assert(Geo.decodeBoundXY(Array[Byte](1, 2, 3)) === None)
  }

  test("geometry/geography type JSON wire strings") {
    import IcebergTypes._
    assert(SchemaJson.primitiveFromString("geometry") === GeometryT())
    assert(SchemaJson.primitiveFromString("geometry(EPSG:3857)") === GeometryT("EPSG:3857"))
    assert(SchemaJson.primitiveFromString("geography") === GeographyT())
    assert(SchemaJson.primitiveFromString("geography(EPSG:4326, karney)") ===
      GeographyT("EPSG:4326", "karney"))
    // round trip through typeName
    for (t <- Seq(GeometryT(), GeometryT("EPSG:3857"), GeographyT(),
        GeographyT("EPSG:4326", "karney")))
      assert(SchemaJson.primitiveFromString(t.typeName) === t)
  }

  test("geography algorithm is normalized and validated (types.go:981-1020)") {
    import IcebergTypes._
    // mixed case normalizes to lowercase, equal to the canonical form
    assert(SchemaJson.primitiveFromString("geography(EPSG:4326, Karney)") ===
      GeographyT("EPSG:4326", "karney"))
    // default CRS collapses to the default type
    assert(SchemaJson.primitiveFromString("geometry(OGC:CRS84)") === GeometryT())
    assert(SchemaJson.primitiveFromString("geography(OGC:CRS84, SPHERICAL)") === GeographyT())
    // invalid algorithms are rejected, not silently accepted
    intercept[IllegalArgumentException] {
      SchemaJson.primitiveFromString("geography(EPSG:4326, euclidean)")
    }
  }

  test("NaN vertices are skipped when computing envelopes") {
    // linestring with one NaN vertex: bounds come from the finite ones
    val bb = java.nio.ByteBuffer.allocate(9 + 4 + 3 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(Geo.LineStringType); bb.putInt(3)
    bb.putDouble(1.0); bb.putDouble(2.0)
    bb.putDouble(Double.NaN); bb.putDouble(50.0)
    bb.putDouble(3.0); bb.putDouble(4.0)
    assert(Geo.envelope(bb.array) === Some((1.0, 2.0, 3.0, 4.0)))
    // an all-NaN geometry has no envelope at all
    assert(Geo.envelope(Geo.encodePoint(Double.NaN, Double.NaN)) === None)
  }

  test("geometry envelope bounds reach the manifest and prune files") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-geo2").toString)
    // two spatially disjoint clusters, forced into separate files
    val far = (0 until 50).map(i => (i.toLong, Geo.encodePoint(1000.0 + i, 1000.0)))
      .toDF("id", "geom").repartition(1)
    val near = (50 until 100).map(i => (i.toLong, Geo.encodePoint(i.toDouble, 0.0)))
      .toDF("id", "geom").repartition(1)
    val schema0 = SchemaBridge.fromSpark(far.schema)
    val schema = schema0.copy(fields = schema0.fields.map(f =>
      if (f.name == "geom") f.copy(fieldType = IcebergTypes.GeometryT()) else f))
    val t0 = Writer.append(spark,
      cat.createTable("geo_b", schema, PartitionSpec.Unpartitioned), far)
    val t1 = Writer.append(spark, t0, near)
    // bounds harvested: every data file carries a decodable 16-byte envelope
    val files = t1.newScan.planFiles().map(_.file)
    val geomId = t1.schema.findField("geom").get.id
    assert(files.size >= 2)
    assert(files.forall(f => f.lowerBounds.get(geomId).flatMap(Geo.decodeBoundXY).isDefined))
    // a box over the near cluster prunes the far file(s)
    val (tasks, m) = t1.newScan
      .withFilter(Expr.bboxIntersects("geom", 0, -10, 200, 10)).planFilesWithMetrics()
    assert(m.skippedDataFiles > 0, s"expected file skips, got $m")
    assert(tasks.nonEmpty)
    val ids = SparkRead.read(spark,
        t1.newScan.withFilter(Expr.bboxIntersects("geom", 0, -10, 200, 10)))
      .select("id").as[Long].collect().toSet
    assert(ids === (50L until 100L).toSet)
  }

  test("BBoxIntersects filters an Iceberg table's WKB column") {
    import spark.implicits._
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-geo").toString)
    // 100 points on a 10x10 grid
    val pts = (0 until 100).map(i => (i.toLong, Geo.encodePoint(i % 10, i / 10)))
    val df = pts.toDF("id", "geom")
    val t1 = Writer.append(spark,
      cat.createTable("geo_t", SchemaBridge.fromSpark(df.schema), PartitionSpec.Unpartitioned), df)
    val hits = SparkRead.read(spark,
        t1.newScan.withFilter(Expr.bboxIntersects("geom", 2, 3, 4, 5)))
      .select("id").as[Long].collect().toSet
    val expected = pts.collect {
      case (id, _) if (id % 10) >= 2 && (id % 10) <= 4 && (id / 10) >= 3 && (id / 10) <= 5 => id
    }.toSet
    assert(hits === expected)
    // negation
    val misses = SparkRead.read(spark,
        t1.newScan.withFilter(Expr.not(Expr.bboxIntersects("geom", 2, 3, 4, 5))))
      .count()
    assert(misses === 100 - expected.size)
  }
}
