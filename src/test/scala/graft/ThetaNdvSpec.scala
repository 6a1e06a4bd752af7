package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, UpdateSketch}
import org.scalatest.funsuite.AnyFunSuite

import graft.table.Analyze

/** NDV blob wire formats: spec theta sketches + legacy KMV dual-read. */
class ThetaNdvSpec extends AnyFunSuite {

  test("Puffin blob bytes are spec theta-v1: typed wrap + cross-engine union") {
    // the cross-engine mergeability contract (reference table/statistics.go
    // apache-datasketches-theta-v1): another engine must be able to (a)
    // deserialize OUR Puffin blob bytes with stock datasketches and (b)
    // union them with its OWN sketch over overlapping keys without double
    // counting — both properties depend on the wire truly being the
    // library's compact format over the standard hash of the raw values.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-theta").toString
      val cat = new graft.catalog.HadoopCatalog(wh)
      val df = spark.range(10000).toDF("k")
      val t0 = cat.createTable("theta_x",
        graft.core.SchemaBridge.fromSpark(df.schema),
        graft.format.PartitionSpec.Unpartitioned)
      val t1 = graft.table.Writer.append(spark, t0, df)
      val t2 = Analyze.computeNdv(spark, t1, Seq("k"), k = 4096)

      val stats = t2.metadata.statistics.head
      val footer = graft.format.Puffin.readFooter(stats.path)
      val blobMeta = footer.find(_.blobType == Analyze.NdvBlobType).get
      val bytes = graft.format.Puffin.readBlob(stats.path, blobMeta)

      // (a) stock typed deserialization — not our lenient reader
      val ours = CompactSketch.wrap(Memory.wrap(bytes))
      assert(math.abs(ours.getEstimate - 10000.0) / 10000.0 <= 0.05)

      // (b) an independently-built sketch over the SAME keys: the union
      // estimate must stay ~N (same hash space → no double counting)
      val same = UpdateSketch.builder().build()
      (0L until 10000L).foreach(same.update)
      val u1 = SetOperation.builder().buildUnion()
      u1.union(ours); u1.union(same.compact())
      val merged = u1.getResult.getEstimate
      assert(math.abs(merged - 10000.0) / 10000.0 <= 0.05,
        s"union over the same keys must not double count: $merged")

      // and over DISJOINT keys the union estimate must approach 2N
      val other = UpdateSketch.builder().build()
      (10000L until 20000L).foreach(other.update)
      val u2 = SetOperation.builder().buildUnion()
      u2.union(ours); u2.union(other.compact())
      val total = u2.getResult.getEstimate
      assert(math.abs(total - 20000.0) / 20000.0 <= 0.05,
        s"union over disjoint keys must approach 2N: $total")

      // the serialized union result stays readable — the bytes another
      // engine would persist back round-trip through the same typed API
      val rt = CompactSketch.wrap(Memory.wrap(u2.getResult.toByteArray))
      assert(math.abs(rt.getEstimate - total) < 1e-6)
    } finally spark.stop()
  }

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
