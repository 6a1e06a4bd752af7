package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core.{IcebergTypes, SchemaBridge}
import graft.format.PartitionSpec
import graft.table.{Evolve, SparkRead, Writer}

/** Spec v3 default-value semantics (reference `types.go:903`, SURVEY §1.2
  * default-fill contract): initial-default applies ONLY to files written
  * before the field existed — an explicit null written after the add must
  * read back null, never the default. The fill is per-file (EXISTS_DEFAULT
  * metadata on the read schema), not a frame-level coalesce.
  */
class DefaultValueSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("initial-default fills pre-add files; explicit post-add nulls survive") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-defaults").toString
    val cat = new HadoopCatalog(wh)
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t0 = cat.createTable("t", SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned)
    val t1 = Writer.append(spark, t0, df)
    val t2 = Evolve.addColumn(t1, "c", IcebergTypes.StringT,
      initialDefault = Some("dflt"), writeDefault = Some("wd"))
    // post-add file carrying an EXPLICIT null
    val t3 = Writer.append(spark, t2,
      Seq((3L, "x", null.asInstanceOf[String])).toDF("k", "v", "c"))
    // post-add file omitting the column entirely -> write-default
    Writer.append(spark, t3, Seq((4L, "y")).toDF("k", "v"))
    val rows = SparkRead.read(spark, cat.loadTable("t").newScan)
      .orderBy("k").select("k", "c").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq === Seq(
      1L -> Some("dflt"), // pre-add file: initial-default
      2L -> Some("dflt"),
      3L -> None,         // explicit null is NOT rewritten
      4L -> Some("wd")))  // omitted column: write-default at write time
  }

  test("CREATE TABLE with an inline DEFAULT keeps it in the metadata") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cdefault").toString
    spark.conf.set("spark.sql.catalog.gdv", classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdv.uri", wh)
    spark.sql("CREATE TABLE gdv.t (k BIGINT, tag STRING DEFAULT 'fresh', n INT DEFAULT 7)")
    val f = new HadoopCatalog(wh).loadTable("t").schema
    assert(f.findField("tag").get.writeDefault === Some("fresh"))
    assert(f.findField("n").get.writeDefault === Some(7L))
    // the analyzer fills omitted columns from the recorded default
    spark.sql("INSERT INTO gdv.t (k) VALUES (1)")
    spark.sql("INSERT INTO gdv.t VALUES (2, 'explicit', 9)")
    val rows = spark.sql("SELECT k, tag, n FROM gdv.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq === Seq((1L, "fresh", 7), (2L, "explicit", 9)))
  }

  test("non-literal CREATE-time defaults are rejected, not stored verbatim") {
    import org.apache.spark.sql.types._
    // Spark keeps the original DDL text in CURRENT_DEFAULT; a function call
    // must never be recorded as a literal string default
    val md = new MetadataBuilder()
      .putString("CURRENT_DEFAULT", "current_date()").build()
    val st = StructType(Seq(
      StructField("k", LongType), StructField("d", DateType, metadata = md)))
    val ex = intercept[IllegalArgumentException](SchemaBridge.fromSpark(st))
    assert(ex.getMessage.contains("non-literal"))
    // but a typed DATE literal spelling parses to its payload
    val md2 = new MetadataBuilder()
      .putString("CURRENT_DEFAULT", "DATE '2020-01-01'").build()
    val st2 = StructType(Seq(StructField("d", DateType, metadata = md2)))
    assert(SchemaBridge.fromSpark(st2).findField("d").get.writeDefault ===
      Some("2020-01-01"))
  }
}
