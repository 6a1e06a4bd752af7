package graft.table

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.core.Murmur3
import graft.io.FileIO

/** File-location strategy per the Iceberg spec (reference
  * `table/locations.go`): where new data and metadata files land under a
  * table, including the object-storage layout that shards data files
  * across hashed key prefixes.
  *
  * Why this matters at 100 TB: object stores rate-limit per key prefix.
  * A 1000-executor write that funnels every file under one `.../data/`
  * prefix throttles on S3's per-prefix request cap; spreading files over
  * 2^20 murmur-hashed prefixes (`write.object-storage.enabled`) removes
  * the hot prefix entirely. The entropy is split into fixed-width
  * directories (4/4/4/8 bits — reference `locations.go:33-35`) so prefix
  * listings during orphan cleanup stay shallow and parallelizable.
  *
  * Also owns metadata-file naming + compression
  * (`write.metadata.compression-codec` = none|gzip|zstd, reference
  * `locations.go:55-82` and `table.go:1289-1312`): compressed versions are
  * named `v<N>.gz.metadata.json` / `v<N>.zstd.metadata.json` and sniffed
  * by suffix on read, so a catalog pointer is self-describing.
  */
object Locations {

  val DataPathKey = "write.data.path"
  val MetadataPathKey = "write.metadata.path"
  val ObjectStoreEnabledKey = "write.object-storage.enabled"
  val PartitionedPathsKey = "write.object-storage.partitioned-paths"
  val MetadataCompressionKey = "write.metadata.compression-codec"

  // reference locations.go:33-35
  private val HashBits = 20
  private val DirLength = 4
  private val DirDepth = 3

  /** Root for new data files: `write.data.path` or `<location>/data`. */
  def dataPath(location: String, props: Map[String, String]): String =
    props.getOrElse(DataPathKey, s"$location/data").stripSuffix("/")

  /** Root for new metadata files: `write.metadata.path` or
    * `<location>/metadata`.
    */
  def metadataPath(location: String, props: Map[String, String]): String =
    props.getOrElse(MetadataPathKey, s"$location/metadata").stripSuffix("/")

  /** 20 bits of murmur3_x86_32(fileName) as a binary string, split into
    * 3 dirs of 4 chars plus an 8-char leaf (reference
    * `locations.go:126-147`): `0110/1010/0011/11101000`.
    */
  def entropyDirs(fileName: String): String = {
    val top = 1 << HashBits
    val hash = (Murmur3.hash(fileName.getBytes(StandardCharsets.UTF_8), 0)
      & (top - 1)) | top
    val bin = hash.toBinaryString // 21 chars, leading 1 preserves zeros
    val bits = bin.substring(bin.length - HashBits)
    val dirs = (0 until DirDepth * DirLength by DirLength)
      .map(i => bits.substring(i, i + DirLength))
    (dirs :+ bits.substring(DirDepth * DirLength)).mkString("/")
  }

  /** Location for a new data (or delete) file. `partPath` is the
    * hive-style partition path ("a=1/b=2", possibly with a trailing
    * slash) or "" for unpartitioned/global files. Mirrors the reference
    * exactly: the partition path folds into the data root first
    * (`rolling_data_writer.go:299-317` partitionLocProvider), then the
    * object-storage provider prefixes the file name with entropy dirs —
    * joined `hash/file` when `write.object-storage.partitioned-paths`
    * (default true), `hash-file` otherwise (`locations.go:149-160`).
    */
  def newDataLocation(location: String, props: Map[String, String],
      partPath: String, fileName: String): String = {
    val base = dataPath(location, props)
    val part = partPath.stripSuffix("/")
    val root = if (part.isEmpty) base else s"$base/$part"
    if (!props.get(ObjectStoreEnabledKey).exists(_.trim.equalsIgnoreCase("true")))
      s"$root/$fileName"
    else {
      val hashed = entropyDirs(fileName)
      if (props.get(PartitionedPathsKey).forall(_.trim.equalsIgnoreCase("true")))
        s"$root/$hashed/$fileName"
      else s"$root/$hashed-$fileName"
    }
  }

  // ------------------------------------------------------ metadata naming

  /** Codec from table properties; rejects unknown codecs like the
    * reference (`locations.go:66-77`).
    */
  def metadataCodec(props: Map[String, String]): String =
    props.getOrElse(MetadataCompressionKey, "none") match {
      case c @ ("none" | "gzip" | "zstd") => c
      case other => throw new IllegalArgumentException(
        s"unsupported write metadata compression codec: $other")
    }

  /** Versioned metadata file name for the catalog layout:
    * `v<N>.metadata.json`, `v<N>.gz.metadata.json`, or
    * `v<N>.zstd.metadata.json`.
    */
  def metadataFileName(version: Int, props: Map[String, String]): String =
    metadataCodec(props) match {
      case "none" => s"v$version.metadata.json"
      case "gzip" => s"v$version.gz.metadata.json"
      case "zstd" => s"v$version.zstd.metadata.json"
    }

  /** Parse the version out of any codec spelling of a versioned metadata
    * file name (accepts full paths).
    */
  def metadataVersionOf(pathOrName: String): Option[Int] = {
    val fn = pathOrName.substring(pathOrName.lastIndexOf('/') + 1)
    if (!fn.startsWith("v")) None
    // codec spellings first: ".metadata.json" is a suffix of both of them
    else Seq(".gz.metadata.json", ".zstd.metadata.json", ".metadata.json")
      .collectFirst { case s if fn.endsWith(s) =>
        fn.stripPrefix("v").stripSuffix(s)
      }.flatMap(_.toIntOption)
  }

  /** Codec sniffed from a metadata file location (reference
    * `table.go:1289-1297` — both `x.gz.metadata.json` and
    * `metadata.json.gz` spellings).
    */
  def codecOfLocation(path: String): String =
    if (path.endsWith(".gz.metadata.json") || path.endsWith(".metadata.json.gz"))
      "gzip"
    else if (path.endsWith(".zstd.metadata.json") || path.endsWith(".metadata.json.zstd"))
      "zstd"
    else "none"

  /** Serialize metadata JSON with the table's configured codec. */
  def encodeMetadata(json: String, props: Map[String, String]): Array[Byte] = {
    val raw = json.getBytes(StandardCharsets.UTF_8)
    metadataCodec(props) match {
      case "none" => raw
      case "gzip" =>
        val bos = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(raw); gz.close()
        bos.toByteArray
      case "zstd" =>
        val bos = new ByteArrayOutputStream()
        val zs = new com.github.luben.zstd.ZstdOutputStream(bos)
        zs.write(raw); zs.close()
        bos.toByteArray
    }
  }

  /** Read a metadata file as JSON text, decompressing by suffix. */
  def readMetadataJson(path: String): String = {
    val bytes = FileIO.readAllBytes(path)
    codecOfLocation(path) match {
      case "none" => new String(bytes, StandardCharsets.UTF_8)
      case "gzip" =>
        new String(new GZIPInputStream(
          new ByteArrayInputStream(bytes)).readAllBytes(), StandardCharsets.UTF_8)
      case "zstd" =>
        new String(new com.github.luben.zstd.ZstdInputStream(
          new ByteArrayInputStream(bytes)).readAllBytes(), StandardCharsets.UTF_8)
    }
  }
}
