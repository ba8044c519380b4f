package graft

import graft.multimodal.AudioOps
import graft.operators.AnnSearch
import java.nio.{ByteBuffer, ByteOrder}

class AudioOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-assembled 16-bit PCM WAV: RIFF + fmt + data (interleaved frames
    * for multi-channel). Built from the public container layout, not via
    * javax.sound — the spec must not share code with the parser under test.
    */
  private def wav16(samples: Array[Double], rate: Int, channels: Int = 1,
                    extraChunk: Boolean = false): Array[Byte] = {
    val dataSize = samples.length * 2
    // odd-sized "LIST" chunk (5 payload bytes + 1 alignment pad): the
    // parser must honour RIFF word alignment to reach the data chunk
    val extraPad = if (extraChunk) 8 + 5 + 1 else 0
    val buf = ByteBuffer.allocate(44 + extraPad + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + extraPad + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(rate); buf.putInt(rate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    if (extraChunk) {
      buf.put("LIST".getBytes("US-ASCII")); buf.putInt(5)
      buf.put(Array.fill[Byte](6)(0)) // 5 payload + 1 pad
    }
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataSize)
    samples.foreach { s =>
      buf.putShort(math.max(-32768, math.min(32767, math.round(s * 32767).toInt)).toShort)
    }
    buf.array()
  }

  private def sine(freq: Double, rate: Int, seconds: Double, amp: Double = 0.8): Array[Double] =
    Array.tabulate((rate * seconds).toInt)(i => amp * math.sin(2 * math.Pi * freq * i / rate))

  test("parseWav: metadata, RMS and zero-cross rate of a pure tone match theory") {
    val clip = AudioOps.parseWav(wav16(sine(440, 8000, 1.0), 8000)).get
    assert(clip.channels == 1 && clip.sampleRate == 8000 && clip.bitsPerSample == 16)
    assert(math.abs(clip.durationSec - 1.0) < 1e-3, clip.durationSec.toString)
    // RMS of an amp-0.8 sine is 0.8/sqrt(2)
    assert(math.abs(AudioOps.rms(clip.samples) - 0.8 / math.sqrt(2)) < 0.01)
    // a 440 Hz tone at 8 kHz crosses zero ~2*440 times per second
    val zcr = AudioOps.zeroCrossRate(clip.samples)
    assert(math.abs(zcr - 2.0 * 440 / 8000) < 0.005, zcr.toString)
  }

  test("parseWav: stereo mixes down, extra chunks are walked, junk is rejected") {
    // stereo where L = -R cancels to silence in the mono mix
    val n = 800
    val inter = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) 0.5 else -0.5)
    val st = AudioOps.parseWav(wav16(inter, 8000, channels = 2)).get
    assert(st.channels == 2 && st.nFrames == n)
    assert(AudioOps.rms(st.samples) < 1e-4, "L = -R must cancel in the mono mix")

    // an odd-sized LIST chunk between fmt and data must not derail parsing
    val padded = AudioOps.parseWav(wav16(sine(100, 8000, 0.1), 8000, extraChunk = true))
    assert(padded.nonEmpty && padded.get.nFrames == 800)

    assert(AudioOps.parseWav("not audio at all".getBytes).isEmpty)
    assert(AudioOps.parseWav(Array.empty[Byte]).isEmpty)
    // RIFF magic but truncated body
    assert(AudioOps.parseWav(wav16(sine(100, 8000, 0.1), 8000).take(50)).isEmpty)
  }

  test("energyEnvelope localizes loudness in time") {
    val loudThenQuiet = sine(200, 8000, 0.5) ++ Array.fill(4000)(0.0)
    val clip = AudioOps.parseWav(wav16(loudThenQuiet, 8000)).get
    val env = AudioOps.energyEnvelope(clip, bands = 32)
    assert(env.length == 32)
    assert(env.take(16).forall(_ > 0.3f), env.take(16).mkString(","))
    assert(env.drop(16).forall(_ < 0.01f), env.drop(16).mkString(","))
  }

  test("describeAudio: distributed decode, corrupt rows survive as ok=false") {
    val rows = Seq(
      (1L, wav16(sine(440, 8000, 0.5), 8000)),
      (2L, wav16(sine(880, 8000, 0.25), 8000)),
      (3L, "garbage".getBytes))
    val out = AudioOps.describeAudio(rows.toDF("id", "content"), "id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(6) && out(2L).getBoolean(6) && !out(3L).getBoolean(6))
    assert(math.abs(out(1L).getDouble(3) - 0.5) < 1e-3) // duration_sec
    assert(out(2L).getInt(2) == 8000)                   // sample_rate
    assert(out(3L).isNullAt(7))                         // no descriptor
    // zcr doubles with frequency
    assert(out(2L).getDouble(5) > 1.5 * out(1L).getDouble(5))
  }

  test("audio rides the image ANN machinery: envelope top-1 finds the matching clip") {
    // three clips with distinct temporal shapes
    val a = sine(300, 8000, 0.25) ++ Array.fill(6000)(0.0)          // early burst
    val b = Array.fill(6000)(0.0) ++ sine(300, 8000, 0.25)          // late burst
    val c = sine(300, 8000, 1.0, amp = 0.4)                         // sustained
    val table = AudioOps.describeAudio(
        Seq((1L, wav16(a, 8000)), (2L, wav16(b, 8000)), (3L, wav16(c, 8000)))
          .toDF("id", "content"), "id", "content")
      .where($"ok").select($"id", $"descriptor")
    // query: the early-burst shape at a different frequency and amplitude
    val q = AudioOps.energyEnvelope(
      AudioOps.parseWav(wav16(sine(500, 8000, 0.22, amp = 0.6) ++ Array.fill(6240)(0.0), 8000)).get)
    val qn = {
      val n = math.sqrt(q.map(x => x.toDouble * x).sum)
      q.map(x => x / n).toIndexedSeq.map(_.toDouble)
    }
    val top = AnnSearch.exactTopKCosine(table, "descriptor", "id", qn, 1)
      .head().getLong(0)
    assert(top == 1L, s"expected the early-burst clip, got $top")
  }
}
