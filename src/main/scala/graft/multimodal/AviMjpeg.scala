package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** From-scratch MJPEG-in-AVI container codec — the video sibling of
  * [[AudioOps]]'s WAV/RIFF parser, written against the public RIFF/AVI
  * container layout (the same chunk grammar as WAV: fourcc + LE size +
  * payload, word-aligned). Motion-JPEG needs no inter-frame codec: every
  * `##dc`/`##db` chunk in the `movi` list IS a complete JPEG, which the
  * in-process ImageIO pipeline already decodes — so frame extraction
  * (SURVEY A15) gets a REAL, fully in-JVM path this environment can
  * execute end-to-end, where the ffmpeg shell-out (kept for every other
  * codec) has no binary to run.
  *
  * Parsed surface: `avih`'s dwMicroSecPerFrame for timing, every video
  * data chunk in `movi` (including inside `rec ` groups) in file order.
  * Everything else (indexes, stream headers, odd trailing chunks) is
  * walked and skipped structurally.
  */
object AviMjpeg {

  /** One decoded container: frame timing + the raw JPEG payloads. */
  case class Video(microSecPerFrame: Long, frames: Vector[Array[Byte]]) {
    def timeOf(i: Int): Double = i * microSecPerFrame / 1e6
  }

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** True iff the bytes carry the RIFF/AVI magic. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** Parse an MJPEG AVI; None when the container is not a well-formed AVI
    * or holds no video chunks. Defensive: all sizes are bounds-checked, a
    * truncated file yields however many whole frames precede the cut.
    */
  def parse(bytes: Array[Byte]): Option[Video] = {
    if (!sniff(bytes)) return None
    var usPerFrame = 0L
    val frames = Vector.newBuilder[Array[Byte]]

    // Walk a chunk run in [from, until): fourcc + size(LE) + payload + pad.
    def walk(from: Int, until: Int): Unit = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(bytes, p)
        val size = le32(bytes, p + 4)
        val dataStart = p + 8
        val dataEnd = math.min(dataStart + size, until.toLong).toInt
        if (dataEnd < dataStart) return // corrupt size — stop this run
        if (id == "LIST" && dataEnd - dataStart >= 4) {
          // LIST payload = 4cc type + sub-chunks; recurse into every list
          // (hdrl for avih, movi / rec  for frames — type itself unneeded)
          walk(dataStart + 4, dataEnd)
        } else if (id == "avih" && dataEnd - dataStart >= 4) {
          usPerFrame = le32(bytes, dataStart)
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))) {
          // '##dc' compressed / '##db' uncompressed video data — for MJPEG
          // both carry a complete JPEG; skip empty (dropped-frame) chunks
          if (dataEnd > dataStart)
            frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        }
        val padded = size + (size & 1) // chunks are word-aligned
        p = dataStart + math.min(padded, Int.MaxValue.toLong).toInt
      }
    }

    walk(12, bytes.length)
    val fs = frames.result()
    if (fs.isEmpty) None
    else Some(Video(if (usPerFrame > 0) usPerFrame else 1000000L / 12, fs))
  }

  // ---- writer (specs + interop: an engine-made artifact is a valid AVI
  // any MJPEG-capable player/parser accepts)

  private def bb(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = payload.length & 1
    val out = bb(8 + payload.length + pad)
    out.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  private def list(typ: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ payload)

  /** Minimal standards-shaped MJPEG AVI: RIFF(AVI hdrl(avih, strl(strh,
    * strf)) movi(00dc…)). Width/height describe the first frame; players
    * that trust headers still decode because each JPEG is self-contained.
    */
  def write(frames: Seq[Array[Byte]], fps: Int, width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val usPerFrame = 1000000 / fps
    val avih = bb(56)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0x10) // AVIF_HASINDEX off, flags minimal
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0).array()
    val strh = bb(56)
      .put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps) // scale=1, rate=fps → fps frames/s
      .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort)
      .putShort(width.toShort).putShort(height.toShort).array()
    val strf = bb(40)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .put("MJPG".getBytes("US-ASCII"))
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0).array()
    val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.iterator.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bb(8 + payload.length)
      .put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload).array()
  }
}
