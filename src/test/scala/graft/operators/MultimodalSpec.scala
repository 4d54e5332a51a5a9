package graft.operators

import graft.{SparkSpec, TestSpark}
import graft.operators.Multimodal.MediaRow

/** The multimodal plumbing's typed machinery: deterministic stub decode,
  * batched mapPartitions behavior, and frame-sampling chunk edges.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeStub: mean unsigned byte value, channel count by media type") {
    val row = MediaRow(1L, "image", Array[Byte](0, 100, -56), 3) // -56 = 200 unsigned
    val f = Multimodal.decodeStub(row)
    assert(f.channels === 3)
    assert(f.mean_intensity === (0 + 100 + 200) / 3.0)
    assert(Multimodal.decodeStub(row.copy(media_type = "audio")).channels === 1)
    assert(Multimodal.decodeStub(row.copy(payload = Array.empty)).mean_intensity === 0.0)
  }

  test("extractFeatures: one output per input across batch boundaries") {
    import spark.implicits._
    val media = (1L to 200L)
      .map(i => MediaRow(i, if (i % 2 == 0) "image" else "audio", s"payload$i".getBytes, 8))
      .toDS()
    val feats = Multimodal.extractFeatures(media, batchSize = 7).collect()
    assert(feats.length === 200)
    assert(feats.map(_.doc_id).toSet === (1L to 200L).toSet)
  }

  test("sampleFrames: stride keeps every Nth chunk, tail chunk may be short") {
    import spark.implicits._
    val payload = ("a" * 100).getBytes // 100 bytes -> chunks of 32: 32,32,32,4
    val media = Seq(MediaRow(7L, "image", payload, 100)).toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2).length)).sortBy(_._1)
    assert(frames.toSeq === Seq((0, 32), (2, 32))) // frames 0 and 2 kept, 1 and 3 dropped
  }

  test("media table rides payloads as binary with typed metadata") {
    val media = Multimodal.mediaTable(spark, TestSpark.Sf0001)
    val first = media.head()
    assert(first.payload.nonEmpty)
    assert(first.n_bytes === first.payload.length)
    assert(Set("image", "audio").contains(first.media_type))
  }
}
