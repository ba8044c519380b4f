package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio as a first-class multimodal column: opaque `binary` payloads →
  * typed metadata + a fixed-dim feature vector, decoded DISTRIBUTED on the
  * executors (same plumbing shape as [[ImageOps.describeImages]]). The
  * decoder is a real, from-scratch WAV/RIFF PCM parser (the container is a
  * public spec: RIFF chunks, `fmt ` + `data`; PCM 8/16/24/32-bit int and
  * 32-bit IEEE float payloads) — no stubs, no external codec. Corrupt or
  * non-WAV members decode to `ok = false` instead of failing the task:
  * broken payloads are the norm in web-scale corpora.
  *
  * The descriptor (per-band RMS energy envelope, [[energyEnvelope]]) has
  * the same contract as the image descriptors — `bytes → float[dim]`,
  * deterministic — so audio rides the SAME ANN/serving machinery
  * (AnnSearch, SearchService) untouched: one engine, any modality.
  */
object AudioOps {

  final case class WavClip(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      /** mono mix, normalized to [-1, 1] */
      samples: Array[Double]) {
    def nFrames: Int = samples.length
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else nFrames.toDouble / sampleRate
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Parse a RIFF/WAVE payload; None when the bytes are not a decodable
    * PCM/float WAV. Chunk-walks the container, so extra chunks (LIST, fact,
    * cue) before or after `data` are fine.
    */
  def parseWav(bytes: Array[Byte]): Option[WavClip] =
    try {
      if (bytes.length < 44) return None
      if (new String(bytes, 0, 4, "US-ASCII") != "RIFF") return None
      if (new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
      var data: Option[(Int, Int)] = None // (offset, size)
      while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val size = le32(bytes, off + 4)
        if (size < 0 || off + 8 + size > bytes.length) return None
        id match {
          case "fmt " if size >= 16 =>
            fmt = Some((le16(bytes, off + 8), le16(bytes, off + 10),
              le32(bytes, off + 12), le16(bytes, off + 22)))
          case "data" => data = Some((off + 8, size))
          case _ => ()
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      for {
        (audioFormat, channels, rate, bits) <- fmt
        (dOff, dSize) <- data
        if channels >= 1 && rate > 0
        if (audioFormat == 1 && Seq(8, 16, 24, 32).contains(bits)) ||
          (audioFormat == 3 && bits == 32)
      } yield {
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val n = dSize / frameBytes
        val mono = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val o = dOff + i * frameBytes + c * bytesPerSample
            acc += (if (audioFormat == 3)
              java.lang.Float.intBitsToFloat(le32(bytes, o)).toDouble
            else bits match {
              case 8  => ((bytes(o) & 0xff) - 128) / 128.0 // 8-bit WAV is unsigned
              case 16 => le16(bytes, o).toShort / 32768.0
              case 24 =>
                val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) << 16)
                v / 8388608.0
              case 32 => le32(bytes, o) / 2147483648.0
            })
            c += 1
          }
          mono(i) = acc / channels
          i += 1
        }
        WavClip(channels, rate, bits, mono)
      }
    } catch { case _: Exception => None }

  /** Root-mean-square level of the mono mix. */
  def rms(samples: Array[Double]): Double =
    if (samples.isEmpty) 0.0
    else math.sqrt(samples.map(x => x * x).sum / samples.length)

  /** Zero-crossing rate: sign changes per sample pair — a classic cheap
    * pitch/noisiness signal (a pure tone at f Hz crosses ≈ 2f/rate).
    */
  def zeroCrossRate(samples: Array[Double]): Double = {
    if (samples.length < 2) return 0.0
    var n = 0
    var i = 1
    while (i < samples.length) {
      if ((samples(i - 1) >= 0) != (samples(i) >= 0)) n += 1
      i += 1
    }
    n.toDouble / (samples.length - 1)
  }

  /** Fixed-dim feature vector: the clip split into `bands` equal windows,
    * one RMS per window — a coarse loudness envelope. Same `float[dim]`
    * contract as the image descriptors, so audio similarity search reuses
    * the exact/IVF/SQ8/PQ machinery unchanged.
    */
  def energyEnvelope(clip: WavClip, bands: Int = 32): Array[Float] = {
    val out = new Array[Float](bands)
    val n = clip.nFrames
    if (n == 0) return out
    var b = 0
    while (b < bands) {
      val from = (b.toLong * n / bands).toInt
      val until = math.max(((b + 1).toLong * n / bands).toInt, from + 1)
      var acc = 0.0
      var i = from
      while (i < math.min(until, n)) { acc += clip.samples(i) * clip.samples(i); i += 1 }
      out(b) = math.sqrt(acc / math.max(math.min(until, n) - from, 1)).toFloat
      b += 1
    }
    out
  }

  /** Distributed decode + featurize: (id, bytes) → typed audio metadata and
    * the envelope descriptor. Mirrors [[ImageOps.describeImages]]: a typed
    * mapPartitions over the binary column, undecodable rows survive as
    * `ok = false` with null descriptor.
    */
  def describeAudio(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      bands: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWav(bytes) match {
          case Some(clip) =>
            (id, clip.channels, clip.sampleRate,
              math.rint(clip.durationSec * 1e6) / 1e6,
              math.rint(rms(clip.samples) * 1e6) / 1e6,
              math.rint(zeroCrossRate(clip.samples) * 1e6) / 1e6,
              true, Option(energyEnvelope(clip, bands)))
          case None =>
            (id, 0, 0, 0.0, 0.0, 0.0, false, Option.empty[Array[Float]])
        }
      })
      .toDF(idCol, "channels", "sample_rate", "duration_sec", "rms",
        "zero_cross_rate", "ok", "descriptor")
  }
}
