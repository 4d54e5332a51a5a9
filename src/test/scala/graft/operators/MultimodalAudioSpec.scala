package graft.operators

import graft.SparkSpec
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The REAL audio-codec tier (`javax.sound.sampled`) through the same
  * batched mapPartitions plumbing as the image tier — over real WAV
  * containers generated in-test through the same codec, so the asserted
  * sample rates, frame counts, durations, and RMS levels are PCM facts.
  * A full-scale sine's RMS is 1/√2 in normalized units; silence is 0 —
  * closed forms independent of the encoder.
  */
class MultimodalAudioSpec extends SparkSpec {

  import Multimodal.{AudioFeatures, MediaRow, decodeAudio, extractAs}

  /** Mono 16-bit little-endian PCM WAV of a sine at `hz`, amplitude
    * `amp` (0..1), `seconds` long at `rate` Hz.
    */
  private def sineWav(hz: Double, amp: Double, seconds: Double, rate: Float): Array[Byte] = {
    val n = (seconds * rate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (amp * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, b) => MediaRow(id, "audio", b, b.length) }.toDS()
  }

  test("decodeAudio through the batched mapPartitions path: exact PCM facts") {
    import spark.implicits._
    val full = sineWav(440.0, 1.0, 0.5, 8000f)     // full-scale sine
    val quiet = sineWav(440.0, 0.1, 0.25, 16000f)  // -20 dB sine
    val silent = sineWav(440.0, 0.0, 0.1, 8000f)   // all-zero samples

    val feats: Seq[AudioFeatures] =
      extractAs(media(1L -> full, 2L -> quiet, 3L -> silent),
        batchSize = 2, decodeAudio)
        .collect().toSeq.sortBy(_.doc_id)

    assert(feats.map(_.channels) === Seq(1, 1, 1))
    assert(feats.map(_.sample_rate) === Seq(8000.0, 16000.0, 8000.0))
    assert(feats.map(_.n_frames) === Seq(4000L, 4000L, 800L))
    feats.zip(Seq(0.5, 0.25, 0.1)).foreach { case (f, d) =>
      assert(math.abs(f.duration_s - d) < 1e-9)
    }
    // sine RMS = amp/sqrt(2); integer quantization keeps it within 1e-3
    assert(math.abs(feats(0).rms - 1.0 / math.sqrt(2)) < 1e-3)
    assert(math.abs(feats(1).rms - 0.1 / math.sqrt(2)) < 1e-3)
    assert(feats(2).rms === 0.0)
  }

  test("decodeAudio rejects non-PCM payloads instead of fabricating features") {
    val ex = intercept[Exception] {
      decodeAudio(MediaRow(9L, "audio", Array[Byte](1, 2, 3, 4), 4))
    }
    assert(ex.getMessage != null)
  }

  test("stereo frames: RMS spans both channels, frame count is per-frame") {
    import spark.implicits._
    // stereo: left full-scale constant +32767, right constant 0 →
    // mean square = (1 + 0)/2 → rms = 1/sqrt(2)
    val n = 1000
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      pcm(4 * i) = 0xff.toByte; pcm(4 * i + 1) = 0x7f.toByte // L = 32767
      pcm(4 * i + 2) = 0; pcm(4 * i + 3) = 0                 // R = 0
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val f = extractAs(media(1L -> bos.toByteArray), batchSize = 8, decodeAudio)
      .collect().head
    assert(f.channels === 2)
    assert(f.n_frames === n.toLong)
    assert(math.abs(f.rms - math.sqrt((math.pow(32767.0 / 32768, 2) + 0.0) / 2)) < 1e-6)
  }
}
