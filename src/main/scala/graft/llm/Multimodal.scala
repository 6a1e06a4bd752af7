package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched inside `mapPartitions` (the Scala analogue of `mapInPandas`:
  * one decoder init per partition, amortized over a batch).
  *
  * The actual media decode is STUBBED (`StubDecoder`) — this container ships
  * no image/audio codecs — but the Spark-side contract (schema, batching,
  * partition-level reuse, deterministic output) is real and tested; swap
  * `StubDecoder` for a JNI/javacv decoder in production.
  */
object Multimodal {

  /** An opaque media payload with metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features; `width`/`height`/`duration_ms` are decoder outputs. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      sha256_prefix: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** STUB decoder: deterministic pseudo-decode derived from payload bytes.
    * Real implementation would dispatch on `kind` to an image/audio codec.
    */
  object StubDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Long) = {
      val h = graft.core.Murmur3.hash(payload, 9)
      kind match {
        case "image" => (64 + (h & 0x3ff), 64 + ((h >>> 10) & 0x3ff), 0L)
        case "audio" => (0, 0, 1000L + (h.toLong & 0xffff))
        case "video" => (320 + (h & 0xff), 240 + ((h >>> 8) & 0xff), 5000L + ((h >>> 16) & 0xffff))
        case _ => (0, 0, 0L)
      }
    }
  }

  /** Batched feature extraction. `batchSize` bounds decoder-call batches the
    * way `mapInPandas` batch size does; one digest/decoder instance per
    * partition, reused across batches.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val digest = MessageDigest.getInstance("SHA-256")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          digest.reset()
          val sha = digest.digest(rec.payload).take(8).map("%02x".format(_)).mkString
          val (w, h, dur) = StubDecoder.decode(rec.kind, rec.payload)
          MediaFeatures(rec.media_id, rec.kind, rec.payload.length, sha, w, h, dur)
        }
      }
    }
  }

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — the test
    * stand-in for real binary columns; kind assigned round-robin.
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRecord]
  }
}
