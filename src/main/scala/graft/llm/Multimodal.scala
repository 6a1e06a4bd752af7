package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched inside `mapPartitions` (the Scala analogue of `mapInPandas`:
  * one decoder init per partition, amortized over a batch).
  *
  * Payloads are real binary containers — a 21-byte header (magic, kind tag,
  * width, height, duration) followed by the body — and the decoder REALLY
  * parses them (magic check, little-endian field reads). Only the codec
  * behind the header is synthetic: this container ships no image/audio
  * libraries, so the body is carried opaque instead of pixel-decoded; swap
  * `decodeHeader`'s body handling for a JNI/javacv codec in production.
  */
object Multimodal {

  val Magic: Array[Byte] = Array('G', 'R', 'F', 'T')
  val HeaderLen: Int = 21

  /** An opaque media payload with metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features; width/height/duration come from the parsed header. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      sha256_prefix: String)

  // deterministic synthetic dimensions — kept arithmetic in the id so the
  // DuckDB oracle can recompute them without parsing binary
  def widthOf(id: Long): Int = (64 + (id * 7) % 1024).toInt
  def heightOf(id: Long): Int = (64 + (id * 13) % 1024).toInt
  def durationOf(id: Long): Long = 1000 + (id * 31) % 65536
  def kindOf(id: Long): String = (id % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }
  private def kindTag(kind: String): Byte = kind match {
    case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
  }
  private def kindName(tag: Byte): String = tag match {
    case 1 => "image"; case 2 => "audio"; case 3 => "video"; case _ => "unknown"
  }

  /** Build a container payload: GRFT | kind(1) | width(4 LE) | height(4 LE)
    * | duration_ms(8 LE) | body.
    */
  def encodeContainer(kind: String, width: Int, height: Int, durationMs: Long,
      body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(HeaderLen + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(kindTag(kind)).putInt(width).putInt(height).putLong(durationMs)
    bb.put(body)
    bb.array
  }

  /** Parse the container header — a real binary parse with a magic check,
    * not a hash-derived fake. Returns (kind, width, height, durationMs).
    */
  def decodeHeader(payload: Array[Byte]): (String, Int, Int, Long) = {
    require(payload.length >= HeaderLen, s"payload too short: ${payload.length}")
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      f"bad media magic 0x${magic.map("%02x".format(_)).mkString}%s")
    val kind = kindName(bb.get())
    (kind, bb.getInt, bb.getInt, bb.getLong)
  }

  /** Batched feature extraction over real binary payloads. `batchSize`
    * bounds decoder-call batches the way `mapInPandas` batch size does; one
    * digest instance per partition, reused across batches.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val digest = MessageDigest.getInstance("SHA-256")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          digest.reset()
          val sha = digest.digest(rec.payload).take(8).map("%02x".format(_)).mkString
          val (kind, w, h, dur) = decodeHeader(rec.payload)
          val (ww, hh, dd) = kind match {
            case "image" => (w, h, 0L)
            case "audio" => (0, 0, dur)
            case _ => (w, h, dur)
          }
          MediaFeatures(rec.media_id, kind, rec.payload.length.toLong, ww, hh, dd, sha)
        }
      }
    }
  }

  /** Resize image/video payloads to fit within (maxW, maxH), preserving
    * aspect ratio. Header arithmetic and body handling are real; the pixel
    * resampling itself is the STUB part (no image codec in this container):
    * the body is carried through with a deterministic proportional
    * truncation standing in for re-encoded pixels. Audio passes through.
    */
  def resize(ds: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    // no per-batch state to amortize (unlike extractFeatures' digest), so a
    // plain per-row map is the honest shape
    ds.mapPartitions { it =>
      it.map { rec =>
        val (kind, w, h, dur) = decodeHeader(rec.payload)
        if (kind == "audio" || (w <= maxW && h <= maxH)) rec
        else {
          val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
          val nw = math.max(1, (w * scale).toInt)
          val nh = math.max(1, (h * scale).toInt)
          val body = rec.payload.drop(HeaderLen)
          // STUB resample: proportionally truncated body in place of
          // re-encoded pixels; swap for a real codec in production
          val newBody = body.take(math.max(1, (body.length * scale * scale).toInt))
          rec.copy(payload = encodeContainer(kind, nw, nh, dur, newBody))
        }
      }
    }
  }

  /** Sampled "frame" record from a video payload. */
  case class MediaFrame(media_id: Long, frame_index: Int, offset_ms: Long,
      frame: Array[Byte])

  /** Sample up to `maxFrames` evenly-spaced frames from each video payload.
    * Frame extraction = evenly-spaced body slices (the deterministic stand-in
    * for a real demuxer); offsets derive from the container's duration.
    * Non-video rows produce no frames.
    */
  def sampleFrames(ds: Dataset[MediaRecord], maxFrames: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        val (kind, _, _, dur) = decodeHeader(rec.payload)
        if (kind != "video") Nil
        else {
          val body = rec.payload.drop(HeaderLen)
          val n = math.min(maxFrames, math.max(1, body.length))
          val sliceLen = math.max(1, body.length / n)
          (0 until n).map { i =>
            val off = i * sliceLen
            MediaFrame(rec.media_id, i, dur * i / n,
              body.slice(off, math.min(body.length, off + sliceLen)))
          }
        }
      }
    }
  }

  /** Synthesize a media table from documents: deterministic binary
    * containers whose header fields derive arithmetically from doc_id and
    * whose body is the document's UTF-8 bytes.
    */
  def synthesizeMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val make = udf((id: Long, text: String) => {
      val body = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
      encodeContainer(kindOf(id), widthOf(id), heightOf(id), durationOf(id), body)
    })
    docs.select(
      col("doc_id").as("media_id"),
      udf((id: Long) => kindOf(id)).apply(col("doc_id")).as("kind"),
      make(col("doc_id"), col("text")).as("payload")).as[MediaRecord]
  }
}
