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
    // ha is now BitSampling LSH output: 100 bundle codes, each ≤ 3 hex digits
    assert(frames.forall(f => f.ha.split(" ").length == graft.multimodal.BitSampling.Bundles))
    assert(frames.forall(_.ha.split(" ").forall(c => Integer.parseInt(c, 16) <= 0xfff)))
  }

  test("colorLayout: 12 dims, flat image is DC-only, garbage is null (cl default algo)") {
    val flat = ImageOps.colorLayout(png(64, 64)((_, _) => 128))
    assert(flat.length == 12)
    // flat gray 128: every channel plane is constant 128 → DC = 8·128,
    // scaled /2040; all AC coefficients exactly 0
    val dc = 8 * 128 / 2040.0
    assert(math.abs(flat(0) - dc) < 1e-3, s"Y DC ${flat(0)}")
    assert((1 until 6).forall(i => math.abs(flat(i)) < 1e-4), flat.toSeq.toString)
    assert(math.abs(flat(6) - dc) < 1e-3, s"Cb DC ${flat(6)}")
    assert((7 until 9).forall(i => math.abs(flat(i)) < 1e-4))
    assert(math.abs(flat(9) - dc) < 1e-3, s"Cr DC ${flat(9)}")
    assert((10 until 12).forall(i => math.abs(flat(i)) < 1e-4))
    // deterministic
    val a = ImageOps.colorLayout(png(64, 64)((x, y) => (x * 5 + y * 11) % 256))
    val b = ImageOps.colorLayout(png(64, 64)((x, y) => (x * 5 + y * 11) % 256))
    assert(a.toSeq == b.toSeq)
    assert(ImageOps.colorLayout("not an image".getBytes) == null)
  }

  test("colorLayout: gradients excite the right zigzag AC coefficients") {
    // horizontal luma gradient → first zigzag AC (u=1,v=0) strong, (0,1) zero
    val hGrad = ImageOps.colorLayout(png(64, 64)((x, _) => x * 4))
    assert(math.abs(hGrad(1)) > 0.02, s"AC(1,0)=${hGrad(1)}")
    assert(math.abs(hGrad(2)) < 1e-4, s"AC(0,1)=${hGrad(2)}")
    // vertical gradient → the opposite
    val vGrad = ImageOps.colorLayout(png(64, 64)((_, y) => y * 4))
    assert(math.abs(vGrad(2)) > 0.02, s"AC(0,1)=${vGrad(2)}")
    assert(math.abs(vGrad(1)) < 1e-4, s"AC(1,0)=${vGrad(1)}")
  }

  /** Render a w×h PNG with a per-pixel packed-RGB function. */
  private def pngRgb(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, f(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("scalableColor: 64 dims, mean coefficient, hue locality, garbage null (sc)") {
    val red = ImageOps.scalableColor(pngRgb(64, 64)((_, _) => 0xff0000))
    assert(red.length == 64)
    // Haar mass conservation: coefficient 0 is the 256-bin histogram mean,
    // and a normalized histogram always sums to 1
    assert(math.abs(red(0) - 1f / 256) < 1e-5, s"mean coeff ${red(0)}")
    // deterministic
    val a = ImageOps.scalableColor(pngRgb(64, 64)((x, y) => (x * 31 + y * 67) * 97))
    val b = ImageOps.scalableColor(pngRgb(64, 64)((x, y) => (x * 31 + y * 67) * 97))
    assert(a.toSeq == b.toSeq)
    // hue locality: near-red is closer to red than blue is
    def d2(u: Array[Float], v: Array[Float]) =
      u.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
    val nearRed = ImageOps.scalableColor(pngRgb(64, 64)((_, _) => 0xff1505))
    val blue = ImageOps.scalableColor(pngRgb(64, 64)((_, _) => 0x0000ff))
    assert(d2(red, nearRed) < d2(red, blue),
      s"near-red ${d2(red, nearRed)} vs blue ${d2(red, blue)}")
    assert(ImageOps.scalableColor("not an image".getBytes) == null)
  }

  test("opponentHistogram: 64 dims, unit mass, flat image single bin, hue separation (oh)") {
    val gray = ImageOps.opponentHistogram(png(64, 64)((_, _) => 128))
    assert(gray.length == 64)
    assert(math.abs(gray.sum - 1f) < 1e-5)
    assert(gray.count(_ > 0f) == 1, "flat image must land in exactly one opponent cell")
    val red = ImageOps.opponentHistogram(pngRgb(64, 64)((_, _) => 0xff0000))
    val blue = ImageOps.opponentHistogram(pngRgb(64, 64)((_, _) => 0x0000ff))
    assert(red.indexWhere(_ > 0f) != blue.indexWhere(_ > 0f),
      "red and blue must occupy different opponent cells")
    val a = ImageOps.opponentHistogram(pngRgb(64, 64)((x, y) => (x * 31 + y * 67) * 97))
    val b = ImageOps.opponentHistogram(pngRgb(64, 64)((x, y) => (x * 31 + y * 67) * 97))
    assert(a.toSeq == b.toSeq)
    assert(ImageOps.opponentHistogram("not an image".getBytes) == null)
  }

  test("autoColorCorrelogram: flat image autocorrelates at 1, checkerboard at ~0.5 (ac)") {
    val flat = ImageOps.autoColorCorrelogram(pngRgb(64, 64)((_, _) => 0x808080))
    assert(flat.length == 256)
    // all pixels share one quantized color → same-color probability 1 at
    // every distance for that color, 0 everywhere else
    val c = (0x80 >> 6) * 16 + (0x80 >> 6) * 4 + (0x80 >> 6)
    assert((0 until 4).forall(d => flat(c * 4 + d) == 1f), flat.toSeq.filter(_ > 0).toString)
    assert(flat.sum == 4f)
    // 1-px checkerboard: of the 8 chessboard-distance-1 neighbors, the 4
    // diagonals share the color and the 4 axis neighbors don't → ~0.5
    val check = ImageOps.autoColorCorrelogram(pngRgb(64, 64)((x, y) =>
      if ((x + y) % 2 == 0) 0x000000 else 0xffffff))
    val black = 0; val white = 3 * 16 + 3 * 4 + 3
    assert(math.abs(check(black * 4) - 0.5f) < 0.05, s"black d=1 ${check(black * 4)}")
    assert(math.abs(check(white * 4) - 0.5f) < 0.05, s"white d=1 ${check(white * 4)}")
    assert(ImageOps.autoColorCorrelogram("not an image".getBytes) == null)
  }

  test("phog: 168 dims, flat image zero, stripe orientations hit the right bins (ph)") {
    val flat = ImageOps.phog(png(64, 64)((_, _) => 128))
    assert(flat.length == 8 * (1 + 4 + 16))
    assert(flat.forall(_ == 0f), "flat image has no gradients")
    // vertical stripes → horizontal gradient → orientation 0° → bin 0
    val vert = ImageOps.phog(png(64, 64)((x, _) => if ((x / 3) % 2 == 0) 0 else 255))
    assert(math.abs(vert.sum - 1f) < 1e-4, "PHOG is L1-normalized")
    assert((0 until 8).forall(k => k == 0 || vert(0) >= vert(k)),
      s"level-0 bins ${vert.take(8).toSeq}")
    // horizontal stripes → vertical gradient → orientation 90° → bin 4
    val horiz = ImageOps.phog(png(64, 64)((_, y) => if ((y / 3) % 2 == 0) 0 else 255))
    assert((0 until 8).forall(k => k == 4 || horiz(4) >= horiz(k)),
      s"level-0 bins ${horiz.take(8).toSeq}")
    assert(ImageOps.phog("not an image".getBytes) == null)
  }

  test("fuzzy histograms: unit mass, boundary smoothness, hue separation (fc/fo)") {
    def d2(u: Array[Float], v: Array[Float]) =
      u.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
    for (fn <- Seq(ImageOps.fuzzyColorHistogram _, ImageOps.fuzzyOpponentHistogram _)) {
      val red = fn(pngRgb(64, 64)((_, _) => 0xff0000))
      assert(red.length == 64)
      assert(math.abs(red.sum - 1f) < 1e-4)
      // the point of fuzzy membership: crossing a crisp 4-bin boundary
      // (gray 63 → 65) moves the descriptor a LITTLE, not a bin's worth
      val below = fn(pngRgb(64, 64)((_, _) => 0x3f3f3f))
      val above = fn(pngRgb(64, 64)((_, _) => 0x414141))
      assert(d2(below, above) < 0.01, s"boundary jump ${d2(below, above)}")
      val blue = fn(pngRgb(64, 64)((_, _) => 0x0000ff))
      assert(d2(red, blue) > 0.1, "distinct hues must stay far apart")
      assert(fn("not an image".getBytes) == null)
    }
    // determinism across calls
    val a = ImageOps.fuzzyColorHistogram(pngRgb(32, 32)((x, y) => (x * 131 + y * 17) * 41))
    val b = ImageOps.fuzzyColorHistogram(pngRgb(32, 32)((x, y) => (x * 131 + y * 17) * 41))
    assert(a.toSeq == b.toSeq)
  }

  test("cedd: 144 dims, flat colors land in their nominal fuzzy bins (ce)") {
    // color layout: 0 black, 1 grey, 2 white, 3+3i dark/plain/light per hue
    // i ∈ {red, orange, yellow, green, cyan, blue, magenta}; flat images are
    // texture area 0 (non-edge), whose bins are indices 0..23
    val black = ImageOps.cedd(pngRgb(64, 64)((_, _) => 0x000000))
    assert(black.length == 144)
    assert(black(0) > 0.95f, s"black bin ${black(0)}")
    val white = ImageOps.cedd(pngRgb(64, 64)((_, _) => 0xffffff))
    assert(white(2) > 0.95f, s"white bin ${white(2)}")
    val grey = ImageOps.cedd(pngRgb(64, 64)((_, _) => 0x808080))
    assert(grey(1) > 0.95f, s"grey bin ${grey(1)}")
    val red = ImageOps.cedd(pngRgb(64, 64)((_, _) => 0xff0000))
    assert(red(4) > 0.95f, s"plain-red bin ${red(4)}")
    val blue = ImageOps.cedd(pngRgb(64, 64)((_, _) => 0x0000ff))
    assert(blue(3 + 3 * 5 + 1) > 0.95f, s"plain-blue bin ${blue(3 + 3 * 5 + 1)}")
    // fuzzy hue boundary: a 15° hue sits between its two neighbors, not in one
    val redOrange = ImageOps.cedd(pngRgb(64, 64)((_, _) => 0xff4000)) // h≈15°
    assert(redOrange(4) > 0.2f && redOrange(7) > 0.2f,
      s"15° hue must split red/orange: ${redOrange(4)} / ${redOrange(7)}")
    assert(ImageOps.cedd("not an image".getBytes) == null)
  }

  test("cedd: stripe orientations fire the matching texture areas") {
    def area(d: Array[Float], t: Int) = (0 until 24).map(c => d(t * 24 + c)).sum
    val vert = ImageOps.cedd(pngRgb(128, 128)((x, _) =>
      if ((x / 3) % 2 == 0) 0x000000 else 0xffffff))
    assert(area(vert, 3) > area(vert, 2),
      s"vertical stripes: v=${area(vert, 3)} h=${area(vert, 2)}")
    val horiz = ImageOps.cedd(pngRgb(128, 128)((_, y) =>
      if ((y / 3) % 2 == 0) 0x000000 else 0xffffff))
    assert(area(horiz, 2) > area(horiz, 3),
      s"horizontal stripes: h=${area(horiz, 2)} v=${area(horiz, 3)}")
    // determinism
    val a = ImageOps.cedd(pngRgb(64, 64)((x, y) => (x * 31 + y * 67) * 97))
    val b = ImageOps.cedd(pngRgb(64, 64)((x, y) => (x * 31 + y * 67) * 97))
    assert(a.toSeq == b.toSeq)
  }

  test("fcth: 192 dims, flat image is all-low Haar energy, stripes are not") {
    val flat = ImageOps.fcth(pngRgb(64, 64)((_, _) => 0xff0000))
    assert(flat.length == 192)
    assert(math.abs(flat.sum - 1f) < 1e-3)
    assert((0 until 24).map(flat(_)).sum > 0.95f,
      "flat image must sit in the all-low energy area")
    val vert = ImageOps.fcth(pngRgb(128, 128)((x, _) =>
      if ((x / 3) % 2 == 0) 0x000000 else 0xffffff))
    assert((0 until 24).map(vert(_)).sum < 0.95f,
      "stripe energy must leave the all-low area")
    assert(ImageOps.fcth("not an image".getBytes) == null)
  }

  test("jcd: 168 dims, unit mass, flat green concentrates in joint area 0 (jc)") {
    val flat = ImageOps.jcd(pngRgb(64, 64)((_, _) => 0x00ff00))
    assert(flat.length == 168)
    assert(math.abs(flat.sum - 1f) < 1e-3)
    assert((0 until 24).map(flat(_)).sum > 0.95f,
      "smooth image mass must land in the fused non-edge area")
    // green = hue index 3 → plain bin 3+9+1 = 13 within the area
    assert(flat.indexOf(flat.max) == 13, s"argmax ${flat.indexOf(flat.max)}")
    assert(ImageOps.jcd("not an image".getBytes) == null)
  }

  test("jointHistogram: 576 dims, flat rank 0, checkerboard splits ranks 0/4 (jh)") {
    val flat = ImageOps.jointHistogram(pngRgb(32, 32)((_, _) => 0xff0000))
    assert(flat.length == 576)
    // full red: color bin (255>>6)*16 = 48, every interior pixel rank 0
    assert(flat(48 * 9) > 0.99f, s"flat mass ${flat(48 * 9)}")
    // 1-px checkerboard: black pixels see 4 brighter axis neighbors (rank 4),
    // white pixels see none (rank 0)
    val board = ImageOps.jointHistogram(pngRgb(32, 32)((x, y) =>
      if ((x + y) % 2 == 0) 0x000000 else 0xffffff))
    val blackR4 = board(0 * 9 + 4)
    val whiteR0 = board(63 * 9 + 0)
    assert(math.abs(blackR4 - 0.5f) < 0.05, s"black rank-4 $blackR4")
    assert(math.abs(whiteR0 - 0.5f) < 0.05, s"white rank-0 $whiteR0")
    assert(math.abs(board.sum - 1f) < 1e-3)
    assert(ImageOps.jointHistogram("not an image".getBytes) == null)
  }

  test("descriptor registry: all codes resolve and describeImagesWith matches local fns") {
    assert(ImageOps.descriptors.keySet ==
      Set("in", "eh", "cl", "sc", "oh", "ac", "ph", "fc", "fo", "ce", "jc", "jh"))
    val p = png(64, 64)((x, y) => (x * 3 + y * 7) % 256)
    val out = ImageOps.describeImagesWith(Seq((1L, p)).toDF("id", "content"),
        "id", "content", "cl").collect().head
    assert(out.getBoolean(3))
    assert(out.getSeq[Float](4).toArray.toSeq == ImageOps.colorLayout(p).toSeq)
  }

  test("ad=ACCID contract: explicit documented rejection at ingest and serving (SURVEY §7.4 delta)") {
    // The reference whitelist accepts ad (hasher.js:28-49); this engine
    // does not reimplement it — ACCID is not reproducible from public
    // sources. Without a user-supplied LIRE jar (LireBridge) the exclusion
    // is a CONTRACT: a loud, documented rejection, never a silent fallback
    // to some other descriptor. This test pins the UNCONFIGURED posture,
    // so it clears the bridge config for its duration (the configured
    // posture is LireBridgeSpec's).
    assume(!sys.env.contains("SPARK_GRAFT_LIRE_JAR"),
      "env configures a LIRE jar — unconfigured posture not testable here")
    val prev = sys.props.get("graft.lire.jar")
    sys.props.remove("graft.lire.jar")
    try {
      assert(!ImageOps.descriptors.contains("ad"))
      val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "content")
      val ingest = intercept[IllegalArgumentException] {
        ImageOps.describeImagesWith(df, "id", "content", "ad")
      }
      assert(ingest.getMessage.contains("ad=ACCID"), ingest.getMessage)
      assert(ingest.getMessage.contains("not reproducible"), ingest.getMessage)
      val serve = intercept[IllegalArgumentException] {
        new graft.serving.SearchService(
          Seq((1L, Array(1.0f))).toDF("id", "vec"), "vec", "id", algo = "ad")
      }
      assert(serve.getMessage.contains("ad=ACCID"), serve.getMessage)
      // every OTHER reference whitelist code resolves
      Seq("cl", "eh", "sc", "oh", "ac", "ph", "fc", "fo", "ce", "jc", "jh", "in")
        .foreach(a => ImageOps.requireAlgo(a))
    } finally prev.foreach(v => sys.props("graft.lire.jar") = v)
  }

  test("thumbnails: aspect-preserving downscale to maxDim, pass-through for small, junk survives") {
    val rows = Seq(
      (1L, png(400, 200)((x, _) => (x * 255 / 400) << 16)), // landscape 2:1
      (2L, png(60, 90)((_, y) => (y * 255 / 90) << 8)),     // already within bounds
      (3L, "not an image".getBytes))
      .toDF("id", "content")
    val out = ImageOps.thumbnails(rows, "id", "content", maxDim = 100)
      .collect().map(r => r.getLong(0) -> r).toMap
    // landscape scales to 100x50, aspect kept
    assert(out(1L).getInt(2) == 100 && out(1L).getInt(3) == 50, out(1L).toString)
    // small image passes through at original size
    assert(out(2L).getInt(2) == 60 && out(2L).getInt(3) == 90)
    assert(!out(3L).getBoolean(4) && out(3L).isNullAt(1))
    // the thumbnail bytes are a decodable image of the claimed size
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).getAs[Array[Byte]](1)))
    assert(img.getWidth == 100 && img.getHeight == 50)
    // deterministic: same input, same bytes
    val again = ImageOps.thumbnails(rows, "id", "content", maxDim = 100)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(java.util.Arrays.equals(out(1L).getAs[Array[Byte]](1), again(1L).getAs[Array[Byte]](1)))
  }
}
