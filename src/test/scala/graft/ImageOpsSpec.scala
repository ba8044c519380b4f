package graft

import graft.multimodal.ImageOps
import graft.streaming.FfmpegFrameExtractor

/** MPEG-7 Edge Histogram Descriptor golden behavior + the runtime-detected
  * ffmpeg extractor (auto-canceled where the binary is absent).
  */
class ImageOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Render a w×h PNG via a per-pixel gray function. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val g = f(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def bins(d: Array[Float], edge: Int): Float =
    (0 until 16).map(s => d(s * 5 + edge)).sum

  test("edgeHistogram: 80 dims, deterministic, flat image has no edges") {
    val flat = ImageOps.edgeHistogram(png(128, 128)((_, _) => 128))
    assert(flat.length == 80)
    assert(flat.forall(_ == 0f), "flat image must fire no edge bins")
    val a = ImageOps.edgeHistogram(png(128, 128)((x, y) => (x * 7 + y * 3) % 256))
    val b = ImageOps.edgeHistogram(png(128, 128)((x, y) => (x * 7 + y * 3) % 256))
    assert(a.toSeq == b.toSeq)
    assert(ImageOps.edgeHistogram("not an image".getBytes) == null)
  }

  test("edgeHistogram: stripe orientations land in the right MPEG-7 bins") {
    // stripe width 3 so stripe boundaries fall INSIDE 2-px blocks (width-4
    // stripes align with the block grid and no block sees an edge)
    val vert = ImageOps.edgeHistogram(png(128, 128)((x, _) => if ((x / 3) % 2 == 0) 0 else 255))
    val horiz = ImageOps.edgeHistogram(png(128, 128)((_, y) => if ((y / 3) % 2 == 0) 0 else 255))
    assert(bins(vert, 0) > bins(vert, 1), s"vertical: ${bins(vert, 0)} vs ${bins(vert, 1)}")
    assert(bins(horiz, 1) > bins(horiz, 0), s"horizontal: ${bins(horiz, 1)} vs ${bins(horiz, 0)}")
    // a diagonal boundary pattern fires SOME edge bins (2×2 quadrant means
    // classify pixel-scale staircases as mixed diagonal/non-directional)
    val diag = ImageOps.edgeHistogram(png(128, 128)((x, y) => if (((x + y) / 3) % 2 == 0) 0 else 255))
    assert((0 until 5).map(bins(diag, _)).sum > 0f)
  }

  test("edgeHistogram: locality — edges only on the left half stay in left sub-images") {
    val leftStripes = ImageOps.edgeHistogram(png(128, 128)((x, _) =>
      if (x < 64 && (x / 3) % 2 == 0) 0 else 255))
    val leftCols = (0 until 16).filter(_ % 4 < 2)
    val rightCols = (0 until 16).filter(_ % 4 >= 2)
    val leftMass = leftCols.map(s => (0 until 5).map(k => leftStripes(s * 5 + k)).sum).sum
    val rightMass = rightCols.map(s => (0 until 5).map(k => leftStripes(s * 5 + k)).sum).sum
    assert(leftMass > 0f)
    assert(rightMass < leftMass / 4,
      s"right sub-images should be near-empty: left=$leftMass right=$rightMass")
  }

  test("describeImagesEhd: distributed EHD column matches the local function") {
    val p = png(64, 64)((x, _) => if ((x / 4) % 2 == 0) 0 else 255)
    val out = ImageOps.describeImagesEhd(Seq((1L, p)).toDF("id", "content"), "id", "content")
      .collect().head
    assert(out.getBoolean(3))
    assert(out.getSeq[Float](4).toArray.toSeq == ImageOps.edgeHistogram(p).toSeq)
  }

  test("FfmpegFrameExtractor: real ffmpeg frames with pts_time timecodes (A15)") {
    assume(FfmpegFrameExtractor.available, "ffmpeg binary not present — skipping")
    // no fixture mp4 in-repo: synthesize one with ffmpeg itself
    val tmp = java.nio.file.Files.createTempFile("graft-test", ".mp4")
    val gen = new ProcessBuilder("ffmpeg", "-y", "-f", "lavfi", "-i",
      "testsrc=duration=1:size=64x64:rate=12", tmp.toString)
      .redirectErrorStream(true).start()
    gen.getInputStream.readAllBytes()
    assume(gen.waitFor() == 0, "ffmpeg cannot synthesize a test clip")
    val frames = FfmpegFrameExtractor
      .extract("tt1", "clip.mp4", java.nio.file.Files.readAllBytes(tmp)).toVector
    java.nio.file.Files.deleteIfExists(tmp)
    assert(frames.nonEmpty)
    assert(frames.map(_.time) == frames.map(_.time).sorted)
    assert(frames.forall(_.hi.nonEmpty))
    assert(frames.forall(f => f.ha.split(" ").length == 64))
  }
}
