package graft

import graft.multimodal.AviMjpeg
import graft.streaming.{AutoFrameExtractor, AviFrameExtractor}

/** The fully in-JVM A15 path: MJPEG-AVI container codec + frame
  * extraction, end-to-end executable in THIS environment (the ffmpeg
  * shell-out spec has auto-canceled for want of a binary since round 1 —
  * this is the real-decode coverage it could never give).
  */
class AviMjpegSpec extends SparkSpec {

  private def jpeg(shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 24) {
      val g = (shade + x * 4) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  test("write -> parse roundtrip: frame payloads, timing, sniff") {
    val frames = (0 until 6).map(i => jpeg(i * 40))
    val avi = AviMjpeg.write(frames, fps = 6, width = 32, height = 24)
    assert(AviMjpeg.sniff(avi))
    assert(!AviMjpeg.sniff("RIFFxxxxWAVE".getBytes("US-ASCII")))
    assert(!AviMjpeg.sniff(Array[Byte](1, 2, 3)))
    val v = AviMjpeg.parse(avi).get
    assert(v.microSecPerFrame == 166666L)
    assert(v.frames.length == 6)
    assert(v.frames.zip(frames).forall { case (a, b) => a.sameElements(b) },
      "frame payloads must roundtrip byte-identically")
    assert(math.abs(v.timeOf(3) - 0.499998) < 1e-6)
  }

  test("AviFrameExtractor: real decode end-to-end — frames, timestamps, hash codes") {
    val frames = (0 until 6).map(i => jpeg(i * 40))
    val avi = AviMjpeg.write(frames, fps = 6, width = 32, height = 24)
    val out = AviFrameExtractor.extract("tt1", "ep1.avi", avi).toVector
    // 6 fps <= 12 fps target: native frames kept with native timestamps
    assert(out.length == 6)
    assert(out.map(_.time) == (0 until 6).map(i => math.rint(i * 166666L / 1e6 * 1e4) / 1e4))
    assert(out.forall(f => f.hi.nonEmpty && f.ha.split(" ").length == 100),
      "every frame must carry a real descriptor hash (md5 hi + 100 BitSampling codes)")
    // distinct content -> distinct exact-dedup keys
    assert(out.map(_.hi).distinct.length == 6)
    // the router picks the in-JVM path for AVI bytes without ffmpeg
    assert(AutoFrameExtractor.extract("tt1", "ep1.avi", avi).toVector.map(_.hi) ==
      out.map(_.hi))
  }

  test("faster-than-12fps sources resample to the 12 fps grid") {
    val frames = (0 until 48).map(i => jpeg(i * 5))
    val avi = AviMjpeg.write(frames, fps = 24, width = 32, height = 24)
    val out = AviFrameExtractor.extract("tt1", "fast.avi", avi).toVector
    // ~2 s of 24 fps source -> ticks at 1/12 s; every output time on the grid
    assert(out.length > 12 && out.length <= 25, out.length.toString)
    assert(out.map(_.time).zipWithIndex.forall { case (t, k) =>
      math.abs(t - k / 12.0) < 1e-3
    }, out.map(_.time).toString)
  }

  test("truncated container: whole frames before the cut survive, no crash") {
    val frames = (0 until 6).map(i => jpeg(i * 40))
    val avi = AviMjpeg.write(frames, fps = 6, width = 32, height = 24)
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - frames.last.length - 4)
    val v = AviMjpeg.parse(cut)
    assert(v.isDefined && v.get.frames.length >= 4 && v.get.frames.length < 6,
      v.map(_.frames.length).toString)
    assert(AviMjpeg.parse(Array.fill[Byte](64)(0x2a)).isEmpty)
  }

  test("ingest throughput floor: the in-JVM decode+descriptor path is not pathologically slow") {
    // the bench sidecar reports the real 320x180 number (BASELINE.md's
    // >= 12 fps/core target); the spec floor is deliberately generous —
    // this host is a shared VM with steal storms, so the assertion only
    // guards against an order-of-magnitude regression, not the target
    val (frames, wall, cores) = Bench.ingestFps(spark, nVids = 4, nFrames = 24,
      w = 64, h = 48)
    // the 12 fps resample grid may drop the container's final frame
    assert(frames >= 4L * 23, s"expected >=92 frames, got $frames")
    val fpc = frames / math.max(wall, 1e-9) / cores
    assert(fpc >= 1.0, f"ingest fps/core $fpc%.2f below the 1.0 floor (wall $wall%.2f s)")
  }
}
