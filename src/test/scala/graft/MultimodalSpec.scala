package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Multimodal

/** Multimodal container operators: header codec, resize, frame sampling. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("container header round trip + bad magic rejected") {
    val p = Multimodal.encodeContainer("video", 640, 480, 12345L, Array[Byte](1, 2, 3))
    assert(Multimodal.decodeHeader(p) === (("video", 640, 480, 12345L)))
    val bad = p.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodeHeader(bad))
  }

  test("resize caps dimensions preserving aspect ratio; audio passes through") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image",
        Multimodal.encodeContainer("image", 800, 400, 0, Array.fill(800)(7.toByte))),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.encodeContainer("audio", 0, 0, 9000, Array.fill(100)(1.toByte))),
      Multimodal.MediaRecord(3L, "image",
        Multimodal.encodeContainer("image", 100, 50, 0, Array.fill(64)(2.toByte))))
      .toDS()
    val out = Multimodal.resize(media, 200, 200).collect().sortBy(_.media_id)
    val (k1, w1, h1, _) = Multimodal.decodeHeader(out(0).payload)
    assert((k1, w1, h1) === (("image", 200, 100))) // 800x400 scaled by 0.25
    assert(Multimodal.decodeHeader(out(1).payload)._4 === 9000L) // audio untouched
    val (_, w3, h3, _) = Multimodal.decodeHeader(out(2).payload)
    assert((w3, h3) === ((100, 50))) // already fits
  }

  test("frame sampling yields evenly spaced offsets for videos only") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "video",
        Multimodal.encodeContainer("video", 320, 240, 8000, Array.fill(400)(5.toByte))),
      Multimodal.MediaRecord(2L, "image",
        Multimodal.encodeContainer("image", 64, 64, 0, Array.fill(32)(1.toByte))))
      .toDS()
    val frames = Multimodal.sampleFrames(media, maxFrames = 4).collect()
    assert(frames.forall(_.media_id == 1L))
    assert(frames.map(_.frame_index).sorted.toSeq === Seq(0, 1, 2, 3))
    assert(frames.map(_.offset_ms).sorted.toSeq === Seq(0L, 2000L, 4000L, 6000L))
    assert(frames.forall(_.frame.nonEmpty))
  }
}
