package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Murmur3
import graft.table.Locations

class LocationsSpec extends AnyFunSuite {

  private val props0 = Map.empty[String, String]
  private val osProps = Map(Locations.ObjectStoreEnabledKey -> "true")

  test("entropy dirs: 20 murmur bits as 4/4/4/8 binary directories") {
    val d = Locations.entropyDirs("00000-0-file.parquet")
    assert(d.matches("[01]{4}/[01]{4}/[01]{4}/[01]{8}"))
    // deterministic and name-sensitive
    assert(d === Locations.entropyDirs("00000-0-file.parquet"))
    assert(d !== Locations.entropyDirs("00000-1-file.parquet"))
    // exact bit derivation from the pinned murmur3_x86_32
    val h = (Murmur3.hash("00000-0-file.parquet".getBytes("UTF-8"), 0)
      & ((1 << 20) - 1)) | (1 << 20)
    val bits = h.toBinaryString.takeRight(20)
    assert(d === Seq(bits.substring(0, 4), bits.substring(4, 8),
      bits.substring(8, 12), bits.substring(12)).mkString("/"))
  }

  test("data locations: simple, object-storage, partitioned-paths, overrides") {
    val loc = "wh/t1"
    assert(Locations.newDataLocation(loc, props0, "", "f.parquet") ===
      "wh/t1/data/f.parquet")
    assert(Locations.newDataLocation(loc, props0, "a=1/b=2/", "f.parquet") ===
      "wh/t1/data/a=1/b=2/f.parquet")
    val hashed = Locations.entropyDirs("f.parquet")
    assert(Locations.newDataLocation(loc, osProps, "a=1", "f.parquet") ===
      s"wh/t1/data/a=1/$hashed/f.parquet")
    assert(Locations.newDataLocation(loc,
      osProps + (Locations.PartitionedPathsKey -> "false"), "a=1", "f.parquet") ===
      s"wh/t1/data/a=1/$hashed-f.parquet")
    assert(Locations.newDataLocation(loc,
      Map(Locations.DataPathKey -> "s3://bucket/shared/"), "a=1", "f.parquet") ===
      "s3://bucket/shared/a=1/f.parquet")
  }

  test("metadata names round-trip every codec; unknown codec refused") {
    assert(Locations.metadataFileName(7, props0) === "v7.metadata.json")
    assert(Locations.metadataFileName(7,
      Map(Locations.MetadataCompressionKey -> "gzip")) === "v7.gz.metadata.json")
    assert(Locations.metadataFileName(7,
      Map(Locations.MetadataCompressionKey -> "zstd")) === "v7.zstd.metadata.json")
    for (fn <- Seq("v7.metadata.json", "v7.gz.metadata.json", "v7.zstd.metadata.json"))
      assert(Locations.metadataVersionOf(s"wh/t/metadata/$fn") === Some(7))
    assert(Locations.metadataVersionOf("wh/t/metadata/snap-1.avro") === None)
    assert(Locations.metadataVersionOf("v7.gz") === None)
    intercept[IllegalArgumentException] {
      Locations.metadataFileName(1, Map(Locations.MetadataCompressionKey -> "lz4"))
    }
  }

  test("metadata encode/read round-trips gzip and zstd through FileIO") {
    val json = """{"format-version":2,"pad":"""" + ("x" * 4096) + "\"}"
    for (codec <- Seq("none", "gzip", "zstd")) {
      val props = Map(Locations.MetadataCompressionKey -> codec)
      val dir = java.nio.file.Files.createTempDirectory("locspec").toString
      val path = s"$dir/${Locations.metadataFileName(3, props)}"
      val bytes = Locations.encodeMetadata(json, props)
      if (codec != "none") assert(bytes.length < json.length / 4) // actually compressed
      graft.io.FileIO.write(path, bytes)
      assert(Locations.readMetadataJson(path) === json)
    }
  }
}
