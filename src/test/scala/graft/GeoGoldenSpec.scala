package graft

import scala.jdk.CollectionConverters._

import org.apache.parquet.schema.LogicalTypeAnnotation
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geo

/** Geospatial golden fixtures (reference `table/testdata/geo/` — vendored
  * from apache/parquet-testing): externally-written parquet files whose
  * BINARY columns carry the GEOMETRY/GEOGRAPHY logical types, every WKB
  * geometry type in every dimension combo (XY/XYZ/XYM/XYZM, 196 rows),
  * CRS spellings (default, srid:, projjson:, inline PROJJSON), and NaN
  * coordinates. Our WKB envelope math must reproduce parquet-java's
  * footer bounding boxes exactly — bounds from an implementation we
  * didn't write, over geometries we didn't encode.
  */
class GeoGoldenSpec extends AnyFunSuite {

  private val dir = "/root/reference/table/testdata/geo"

  private def withReader[A](file: String)(
      f: org.apache.parquet.hadoop.ParquetFileReader => A): A = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/$file"),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try f(r) finally r.close()
  }

  private def geoColumn(file: String): Option[(String, String)] = withReader(file) { r =>
    r.getFooter.getFileMetaData.getSchema.getFields.asScala.collectFirst {
      case fld if fld.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.GeometryLogicalTypeAnnotation] =>
        (fld.getName, Option(fld.getLogicalTypeAnnotation
          .asInstanceOf[LogicalTypeAnnotation.GeometryLogicalTypeAnnotation]
          .getCrs).getOrElse(""))
      case fld if fld.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.GeographyLogicalTypeAnnotation] =>
        (fld.getName, Option(fld.getLogicalTypeAnnotation
          .asInstanceOf[LogicalTypeAnnotation.GeographyLogicalTypeAnnotation]
          .getCrs).getOrElse(""))
    }
  }

  /** The file-level bbox parquet-java computed, merged across row groups. */
  private def footerBbox(file: String): Option[(Double, Double, Double, Double)] =
    withReader(file) { r =>
      r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .flatMap(c => Option(c.getGeospatialStatistics))
        .flatMap(g => Option(g.getBoundingBox))
        .map(b => (b.getXMin, b.getYMin, b.getXMax, b.getYMax))
        .reduceOption((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2),
          math.max(a._3, b._3), math.max(a._4, b._4)))
    }

  private def wkbValues(file: String, column: String): Seq[Array[Byte]] = {
    val reader = org.apache.parquet.hadoop.ParquetReader.builder(
      new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new org.apache.hadoop.fs.Path(s"$dir/$file")).build()
    val out = Seq.newBuilder[Array[Byte]]
    var g = reader.read()
    while (g != null) {
      if (g.getFieldRepetitionCount(column) > 0)
        out += g.getBinary(column, 0).getBytes
      g = reader.read()
    }
    reader.close()
    out.result()
  }

  private def ourBbox(wkbs: Seq[Array[Byte]]): Option[(Double, Double, Double, Double)] =
    wkbs.flatMap(Geo.envelope).reduceOption((a, b) =>
      (math.min(a._1, b._1), math.min(a._2, b._2),
        math.max(a._3, b._3), math.max(a._4, b._4)))

  private val GeometryFixtures = Seq(
    "crs-arbitrary-value.parquet", "crs-default.parquet",
    "crs-projjson.parquet", "crs-srid.parquet",
    "geospatial.parquet", "geospatial-with-nan.parquet")

  test("our WKB envelope math reproduces parquet-java's footer bounds") {
    GeometryFixtures.foreach { f =>
      val (col, _) = geoColumn(f).getOrElse(fail(s"$f: no geo column"))
      val expected = footerBbox(f).getOrElse(fail(s"$f: no footer geo stats"))
      val actual = ourBbox(wkbValues(f, col)).getOrElse(fail(s"$f: no values"))
      def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
      assert(close(actual._1, expected._1) && close(actual._2, expected._2) &&
        close(actual._3, expected._3) && close(actual._4, expected._4),
        s"$f: ours $actual vs parquet-java $expected")
    }
  }

  test("CRS spellings survive the footer round-trip") {
    assert(geoColumn("crs-default.parquet").get._2 === "")
    assert(geoColumn("crs-srid.parquet").get._2 === "srid:5070")
    assert(geoColumn("crs-projjson.parquet").get._2 === "projjson:projjson_epsg_5070")
    assert(geoColumn("crs-arbitrary-value.parquet").get._2.contains("\"ProjectedCRS\""))
    // the geography fixture annotates GEOGRAPHY (default crs + algorithm)
    val geog = geoColumn("crs-geography.parquet").get
    assert(geog._1 === "geography")
  }

  test("every individual geometry decodes to a finite or NaN-skipped envelope") {
    // 196 rows; 164 carry a geometry (the rest are null rows); empty
    // geometries (POINT EMPTY spelled as NaN, empty collections)
    // legitimately have no envelope
    val wkbs = wkbValues("geospatial.parquet", "geometry")
    assert(wkbs.size === 164)
    var decoded = 0
    wkbs.foreach { wkb =>
      Geo.envelope(wkb).foreach { case (x0, y0, x1, y1) =>
        assert(!x0.isNaN && !y0.isNaN && !x1.isNaN && !y1.isNaN)
        assert(x0 <= x1 && y0 <= y1)
        decoded += 1
      }
    }
    // 56 of the goldens are EMPTY geometries (7 kinds x 8 dim/row
    // variants) whose envelope is correctly None; every non-empty one
    // decodes
    assert(decoded === 108, s"$decoded of ${wkbs.size} geometries decoded")
  }
}
