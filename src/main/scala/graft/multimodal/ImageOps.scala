package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) operators: images/audio/video ride as opaque
  * `binary` columns with typed metadata beside them — the engine's core
  * schema already pairs `binary`-ish payloads with vector columns
  * (SURVEY §1.1, §2.E "multimodal columns").
  *
  * Decode/feature-extract runs distributed in `mapPartitions`; image decode
  * is REAL (JDK ImageIO — in-JVM, no native deps), replacing the
  * reference's Solr/LIRE hop (A13/A16) with the same shape: bytes → global
  * descriptor vector. Video frame-sampling (A15) stays behind the ffmpeg
  * boundary stubbed in [[graft.streaming.IngestPipeline]].
  */
object ImageOps {

  /** B13 magic-byte type sniff on a real binary column
    * (`searcher.js:151-155` checks the same prefixes).
    */
  def sniffType(bytes: Column): Column = {
    val prefix = upper(hex(substring(bytes, 1, 4)))
    when(prefix.startsWith("89504E47"), "png")
      .when(prefix.startsWith("FFD8FF"), "jpg")
      .when(prefix.startsWith("47494638"), "gif")
      .when(prefix.startsWith("52494646"), "riff")
      .otherwise("unknown")
  }

  case class ImageMeta(width: Int, height: Int, ok: Boolean)

  /** Decode metadata via ImageIO. Returns (0,0,false) for undecodable
    * payloads instead of failing the task — corrupt members are the norm
    * in web-scale corpora.
    */
  def decodeMeta(bytes: Array[Byte]): ImageMeta =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) ImageMeta(0, 0, ok = false)
      else ImageMeta(img.getWidth, img.getHeight, ok = true)
    } catch { case _: Exception => ImageMeta(0, 0, ok = false) }

  /** 64-dim global intensity descriptor: decode → resize 8×8 grayscale →
    * row-major mean intensities in [0,1]. The engine's stand-in for LIRE
    * global features (A16) — same signature (bytes → float[dim]), honestly
    * simpler math. Returns null for undecodable images.
    */
  def intensityDescriptor(bytes: Array[Byte], grid: Int = 8): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val scaled = new BufferedImage(grid, grid, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        g.drawImage(img, 0, 0, grid, grid, null)
        g.dispose()
        val out = new Array[Float](grid * grid)
        var i = 0
        while (i < grid * grid) {
          val rgb = scaled.getRGB(i % grid, i / grid)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          out(i) = lum / 255.0f
          i += 1
        }
        out
      }
    } catch { case _: Exception => null }

  /** MPEG-7 Edge Histogram Descriptor (EHD) — a REAL public-standard global
    * descriptor (ISO/IEC 15938-3; one of the LIRE codes the reference's
    * hasher can emit, `hasher.js:28-49` code "eh"). 80 dims:
    *
    *  - the image is divided into a 4×4 grid of sub-images;
    *  - each sub-image is scanned in "image blocks" (side chosen so the
    *    image yields ~1100 blocks, per the standard's recommendation);
    *  - each block, split into 2×2 quadrant means, is classified by five
    *    edge filters — vertical, horizontal, 45°, 135°, non-directional —
    *    taking the max response when it exceeds the threshold (11);
    *  - bins are per-(sub-image, edge-type) block counts, normalized by the
    *    sub-image's block count.
    *
    * Returns 80 floats in [0,1] (sub-image-major, edge-type-minor), or null
    * for undecodable input. Float bins rather than the standard's 3-bit
    * codes: the engine searches by inner product, and quantization would
    * only discard ranking information.
    */
  def edgeHistogram(bytes: Array[Byte]): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        // gray plane once — getRGB per pixel in the loop is pathological
        val gray = new Array[Int](w * h)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          gray(p) = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
            (v & 0xff) * 114) / 1000
          p += 1
        }
        // block side: even, >= 2, ~1100 blocks over the image (standard rec)
        val side = math.max(2, (math.sqrt(w.toDouble * h / 1100).toInt / 2) * 2)
        val threshold = 11.0 // MPEG-7 T_edge
        val counts = new Array[Float](80)
        val blocks = new Array[Int](16)
        val half = side / 2
        var by = 0
        while (by + side <= h) {
          var bx = 0
          while (bx + side <= w) {
            // 2x2 quadrant means a0 a1 / a2 a3
            var a0, a1, a2, a3 = 0L
            var y = 0
            while (y < half) {
              var x = 0
              val r1 = (by + y) * w
              val r2 = (by + half + y) * w
              while (x < half) {
                a0 += gray(r1 + bx + x); a1 += gray(r1 + bx + half + x)
                a2 += gray(r2 + bx + x); a3 += gray(r2 + bx + half + x)
                x += 1
              }
              y += 1
            }
            val n = (half * half).toDouble
            val (m0, m1, m2, m3) = (a0 / n, a1 / n, a2 / n, a3 / n)
            // the five MPEG-7 edge filters over the quadrant means
            val responses = Array(
              math.abs(m0 + m2 - (m1 + m3)),                  // vertical
              math.abs(m0 + m1 - (m2 + m3)),                  // horizontal
              math.abs(math.sqrt(2.0) * (m0 - m3)),           // diagonal 45
              math.abs(math.sqrt(2.0) * (m1 - m2)),           // diagonal 135
              math.abs(2 * (m0 - m1 - m2 + m3)))              // non-directional
            val cx = bx + side / 2
            val cy = by + side / 2
            val sub = math.min(3, cy * 4 / h) * 4 + math.min(3, cx * 4 / w)
            blocks(sub) += 1
            var best = 0
            var k = 1
            while (k < 5) { if (responses(k) > responses(best)) best = k; k += 1 }
            if (responses(best) > threshold) counts(sub * 5 + best) += 1f
            bx += side
          }
          by += side
        }
        var s = 0
        while (s < 16) {
          if (blocks(s) > 0) {
            var k = 0
            while (k < 5) { counts(s * 5 + k) /= blocks(s); k += 1 }
          }
          s += 1
        }
        counts
      }
    } catch { case _: Exception => null }

  /** MPEG-7 ColorLayout descriptor (CLD) — the reference's DEFAULT algo
    * (`loader.js:20` TRACE_ALGO "cl"; ISO/IEC 15938-3 §6.5). Standard
    * pipeline:
    *
    *  1. partition the image into an 8×8 grid and take each cell's average
    *     color (the "representative color" stage, average being the
    *     standard's recommended selector);
    *  2. convert the 64 representative colors RGB → YCbCr;
    *  3. apply an 8×8 2D DCT to each channel plane;
    *  4. zigzag-scan each plane and keep the first `nY` luma and `nC` of
    *     each chroma coefficient (6/3/3 default — the standard's default
    *     configuration).
    *
    * Divergence from the standard, documented: coefficients stay FLOATS
    * (scaled to roughly [0,1] by the DCT range) instead of the standard's
    * 5/6-bit nonlinear quantization — the engine searches by inner product
    * and quantization would only discard ranking information (same call as
    * [[edgeHistogram]]'s float bins). Returns nY+2·nC floats, or null for
    * undecodable input.
    */
  def colorLayout(bytes: Array[Byte], nY: Int = 6, nC: Int = 3): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        // stage 1: 8×8 representative colors (per-cell RGB means)
        val sumR, sumG, sumB = new Array[Long](64)
        val cnt = new Array[Long](64)
        var p = 0
        while (p < rgb.length) {
          val x = p % w
          val y = p / w
          val cell = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
          val v = rgb(p)
          sumR(cell) += (v >> 16) & 0xff
          sumG(cell) += (v >> 8) & 0xff
          sumB(cell) += v & 0xff
          cnt(cell) += 1
          p += 1
        }
        // stage 2: RGB → YCbCr (BT.601 full-range, the standard's space)
        val yP, cbP, crP = new Array[Double](64)
        var c = 0
        while (c < 64) {
          val n = math.max(1L, cnt(c)).toDouble
          val r = sumR(c) / n; val g = sumG(c) / n; val b = sumB(c) / n
          yP(c) = 0.299 * r + 0.587 * g + 0.114 * b
          cbP(c) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
          crP(c) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
          c += 1
        }
        // stage 3: 8×8 2D DCT-II per channel
        def dct8x8(in: Array[Double]): Array[Double] = {
          val out = new Array[Double](64)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0.0
              var x = 0
              while (x < 8) {
                var y = 0
                while (y < 8) {
                  s += in(y * 8 + x) *
                    math.cos((2 * x + 1) * u * math.Pi / 16) *
                    math.cos((2 * y + 1) * v * math.Pi / 16)
                  y += 1
                }
                x += 1
              }
              val cu = if (u == 0) math.sqrt(0.125) else 0.5
              val cv = if (v == 0) math.sqrt(0.125) else 0.5
              out(v * 8 + u) = cu * cv * s
              v += 1
            }
            u += 1
          }
          out
        }
        // stage 4: the standard 8×8 zigzag scan order (indices v*8+u —
        // horizontal frequency u varies fastest, as in JPEG/MPEG-7)
        val zigzag = Array(
          0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
        val dy = dct8x8(yP); val dcb = dct8x8(cbP); val dcr = dct8x8(crP)
        // DC spans 8×255, AC roughly ±4×255 — scale into ~[0,1] floats
        val out = new Array[Float](nY + 2 * nC)
        var i = 0
        while (i < nY) { out(i) = (dy(zigzag(i)) / 2040.0).toFloat; i += 1 }
        var j = 0
        while (j < nC) { out(nY + j) = (dcb(zigzag(j)) / 2040.0).toFloat; j += 1 }
        j = 0
        while (j < nC) { out(nY + nC + j) = (dcr(zigzag(j)) / 2040.0).toFloat; j += 1 }
        out
      }
    } catch { case _: Exception => null }

  /** MPEG-7 ScalableColor descriptor (SCD, ISO/IEC 15938-3 §6.3; LIRE code
    * "sc"). Standard pipeline:
    *
    *  1. quantize each pixel into the standard's 256-cell HSV space —
    *     16 hue × 4 saturation × 4 value bins;
    *  2. normalized 256-bin histogram;
    *  3. 1D Haar transform across the histogram (8 sum/difference passes),
    *     emitting coefficients coarse-to-fine; keep the first `nCoeff`.
    *
    * Divergences from the standard, documented (same policy as
    * [[colorLayout]]/[[edgeHistogram]]): coefficients stay floats (no 11-bit
    * nonlinear bin quantization, no per-coefficient bit allocation), and the
    * Haar runs plain recursive pairwise sum/diff over the H-major bin order
    * rather than the standard's fixed filter-bank wiring — same basis
    * family, simpler indexing. Mass conservation makes coefficient 0 the
    * histogram mean (1/256) for every decodable image. Returns `nCoeff`
    * floats, or null for undecodable input.
    */
  def scalableColor(bytes: Array[Byte], nCoeff: Int = 64): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val hist = new Array[Double](256)
        val hsb = new Array[Float](3)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          java.awt.Color.RGBtoHSB((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff, hsb)
          val hb = math.min(15, (hsb(0) * 16).toInt)
          val sb = math.min(3, (hsb(1) * 4).toInt)
          val vb = math.min(3, (hsb(2) * 4).toInt)
          hist(hb * 16 + sb * 4 + vb) += 1.0
          p += 1
        }
        var i = 0
        while (i < 256) { hist(i) /= rgb.length; i += 1 }
        // 8 Haar passes: averages migrate to the front, pairwise differences
        // fill the back half of each shrinking window → coefficient layout
        // [mean, d@coarsest, 2×, 4×, …, 128×@finest]
        val tmp = new Array[Double](256)
        var n = 256
        while (n > 1) {
          val half = n / 2
          var k = 0
          while (k < half) {
            tmp(k) = (hist(2 * k) + hist(2 * k + 1)) * 0.5
            tmp(half + k) = (hist(2 * k) - hist(2 * k + 1)) * 0.5
            k += 1
          }
          System.arraycopy(tmp, 0, hist, 0, n)
          n = half
        }
        val out = new Array[Float](nCoeff)
        i = 0
        while (i < nCoeff) { out(i) = hist(i).toFloat; i += 1 }
        out
      }
    } catch { case _: Exception => null }

  /** Opponent-color histogram (LIRE code "oh"; van de Sande et al., TPAMI
    * 2010 opponent space): per pixel
    *
    *   O1 = (R − G)/√2,  O2 = (R + G − 2B)/√6,  O3 = (R + G + B)/√3
    *
    * each quantized to 4 uniform bins over its full range → 64-bin
    * normalized histogram. O3 is intensity, O1/O2 are the chromatic axes
    * (shadow/shading-invariant up to offset). Returns 64 floats summing to
    * 1, or null for undecodable input.
    */
  def opponentHistogram(bytes: Array[Byte]): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val hist = new Array[Double](64)
        val s2 = math.sqrt(2.0); val s6 = math.sqrt(6.0); val s3 = math.sqrt(3.0)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
          val o1 = (r - g) / s2                  // [-255/√2, 255/√2]
          val o2 = (r + g - 2.0 * b) / s6        // [-510/√6, 510/√6]
          val o3 = (r + g + b) / s3              // [0, 765/√3]
          val b1 = math.min(3, ((o1 + 255.0 / s2) / (510.0 / s2 + 1e-9) * 4).toInt)
          val b2 = math.min(3, ((o2 + 510.0 / s6) / (1020.0 / s6 + 1e-9) * 4).toInt)
          val b3 = math.min(3, (o3 / (765.0 / s3 + 1e-9) * 4).toInt)
          hist(b1 * 16 + b2 * 4 + b3) += 1.0
          p += 1
        }
        val out = new Array[Float](64)
        var i = 0
        while (i < 64) { out(i) = (hist(i) / rgb.length).toFloat; i += 1 }
        out
      }
    } catch { case _: Exception => null }

  /** Auto color correlogram (LIRE code "ac"; Huang et al., CVPR'97): with
    * colors quantized to 64 cells (4 per RGB channel), entry (c, d) is the
    * probability that a neighbor at L∞ (chessboard) distance d of a pixel
    * of color c also has color c — texture-aware color statistics that
    * plain histograms miss. Distances {1, 3, 5, 7} (the paper's default
    * set) → 256 floats, color-major. Images are downscaled so the longest
    * side is ≤ `maxSide` first: the correlogram is a neighborhood STATISTIC,
    * stable under scaling, and the scan is O(w·h·|D|·8). Returns null for
    * undecodable input.
    */
  def autoColorCorrelogram(bytes: Array[Byte], maxSide: Int = 128): Array[Float] =
    try {
      val img0 = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img0 == null) null
      else {
        val scale = math.max(1.0, math.max(img0.getWidth, img0.getHeight) / maxSide.toDouble)
        val (w, h) = (math.max(1, (img0.getWidth / scale).toInt),
          math.max(1, (img0.getHeight / scale).toInt))
        val img =
          if (scale == 1.0) img0
          else {
            val s = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = s.createGraphics()
            g.drawImage(img0, 0, 0, w, h, null)
            g.dispose()
            s
          }
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val q = new Array[Int](rgb.length)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          q(p) = (((v >> 16) & 0xff) >> 6) * 16 + (((v >> 8) & 0xff) >> 6) * 4 + ((v & 0xff) >> 6)
          p += 1
        }
        val dists = Array(1, 3, 5, 7)
        // the 8 axis/diagonal neighbors at chessboard distance d — the
        // paper's O(1)-per-distance sampling of the L∞ ring
        val ox = Array(-1, 0, 1, -1, 1, -1, 0, 1)
        val oy = Array(-1, -1, -1, 0, 0, 1, 1, 1)
        val same = Array.ofDim[Long](64, dists.length)
        val total = Array.ofDim[Long](64, dists.length)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val c = q(y * w + x)
            var di = 0
            while (di < dists.length) {
              val d = dists(di)
              var k = 0
              while (k < 8) {
                val nx = x + ox(k) * d
                val ny = y + oy(k) * d
                if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
                  total(c)(di) += 1
                  if (q(ny * w + nx) == c) same(c)(di) += 1
                }
                k += 1
              }
              di += 1
            }
            x += 1
          }
          y += 1
        }
        val out = new Array[Float](64 * dists.length)
        var c = 0
        while (c < 64) {
          var di = 0
          while (di < dists.length) {
            out(c * dists.length + di) =
              if (total(c)(di) == 0) 0f
              else (same(c)(di).toDouble / total(c)(di)).toFloat
            di += 1
          }
          c += 1
        }
        out
      }
    } catch { case _: Exception => null }

  /** PHOG — pyramid histogram of oriented gradients (LIRE code "ph"; Bosch,
    * Zisserman, Munoz, CIVR'07). Sobel gradients on the gray plane,
    * magnitude-weighted votes into `nBins` unsigned orientation bins
    * ([0, 180)), accumulated over a 3-level spatial pyramid — 1×1, 2×2,
    * 4×4 cells → nBins·(1+4+16) dims (168 at the default 8 bins), finest
    * level last, L1-normalized over the whole vector (Bosch §3.2). Returns
    * null for undecodable input.
    */
  def phog(bytes: Array[Byte], nBins: Int = 8): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val gray = new Array[Int](w * h)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          gray(p) = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
            (v & 0xff) * 114) / 1000
          p += 1
        }
        val dims = nBins * (1 + 4 + 16)
        val acc = new Array[Double](dims)
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            def g(xx: Int, yy: Int) = gray(yy * w + xx)
            val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
              (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
            val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
              (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
            val mag = math.sqrt(gx.toDouble * gx + gy.toDouble * gy)
            if (mag > 0) {
              // unsigned orientation in [0, 180)
              val theta = {
                val t = math.toDegrees(math.atan2(gy, gx))
                val u = if (t < 0) t + 180.0 else t
                if (u >= 180.0) u - 180.0 else u
              }
              val bin = math.min(nBins - 1, (theta / 180.0 * nBins).toInt)
              // level 0: whole image; level 1: 2×2; level 2: 4×4
              acc(bin) += mag
              val c1 = math.min(1, y * 2 / h) * 2 + math.min(1, x * 2 / w)
              acc(nBins * (1 + c1) + bin) += mag
              val c2 = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
              acc(nBins * (1 + 4 + c2) + bin) += mag
            }
            x += 1
          }
          y += 1
        }
        var s = 0.0
        var i = 0
        while (i < dims) { s += acc(i); i += 1 }
        val out = new Array[Float](dims)
        if (s > 0) {
          i = 0
          while (i < dims) { out(i) = (acc(i) / s).toFloat; i += 1 }
        }
        out
      }
    } catch { case _: Exception => null }

  /** Shared trilinear fuzzy-histogram accumulator: each pixel's 3-axis value
    * contributes fractional mass to the 8 surrounding bin-center cells
    * (triangular membership per axis, product-combined) — the standard
    * fuzzy-histogram construction that removes hard quantization boundaries.
    * `centers` per axis at (i + 0.5)/n of the axis range. 4³ = 64 bins,
    * normalized to unit mass.
    */
  private def fuzzyHist3(
      pixels: Array[Int], n: Int,
      axes: Int => (Double, Double, Double), // pixel → (a1, a2, a3) in [0,1]
      count: Int): Array[Float] = {
    val hist = new Array[Double](n * n * n)
    def spread(v: Double): (Int, Int, Double) = {
      // position in center-space: centers at (i + 0.5)/n
      val t = v * n - 0.5
      val lo = math.floor(t).toInt
      val frac = t - lo
      (math.max(0, lo), math.min(n - 1, lo + 1), frac)
    }
    var p = 0
    while (p < count) {
      val (a1, a2, a3) = axes(p)
      val (l1, u1, f1) = spread(a1)
      val (l2, u2, f2) = spread(a2)
      val (l3, u3, f3) = spread(a3)
      var k = 0
      while (k < 8) {
        val b1 = if ((k & 4) == 0) l1 else u1
        val b2 = if ((k & 2) == 0) l2 else u2
        val b3 = if ((k & 1) == 0) l3 else u3
        val w = (if ((k & 4) == 0) 1 - f1 else f1) *
          (if ((k & 2) == 0) 1 - f2 else f2) *
          (if ((k & 1) == 0) 1 - f3 else f3)
        hist(b1 * n * n + b2 * n + b3) += w
        k += 1
      }
      p += 1
    }
    val out = new Array[Float](n * n * n)
    var i = 0
    while (i < out.length) { out(i) = (hist(i) / count).toFloat; i += 1 }
    out
  }

  /** Fuzzy color histogram (LIRE code "fc"): 64-bin RGB histogram with
    * triangular fuzzy membership — every pixel splits its mass trilinearly
    * across the 8 neighboring bin centers, so a 1-step color change moves
    * the descriptor continuously instead of jumping quantization cliffs.
    * Returns 64 floats summing to 1, or null for undecodable input.
    */
  def fuzzyColorHistogram(bytes: Array[Byte]): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val rgb = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
        fuzzyHist3(rgb, 4, { p =>
          val v = rgb(p)
          (((v >> 16) & 0xff) / 255.0, ((v >> 8) & 0xff) / 255.0, (v & 0xff) / 255.0)
        }, rgb.length)
      }
    } catch { case _: Exception => null }

  /** Fuzzy opponent histogram (LIRE code "fo"): the same trilinear fuzzy
    * construction over the [[opponentHistogram]] axes (O1/O2/O3 scaled to
    * [0,1]) — chromatic fuzziness in the shadow-invariant space. Returns
    * 64 floats summing to 1, or null for undecodable input.
    */
  def fuzzyOpponentHistogram(bytes: Array[Byte]): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val rgb = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
        fuzzyHist3(rgb, 4, { p =>
          val v = rgb(p)
          val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
          // O axes scaled straight to [0,1] (the √-scalings cancel)
          (((r - g) + 255.0) / 510.0,
            ((r + g - 2.0 * b) + 510.0) / 1020.0,
            (r + g + b) / 765.0)
        }, rgb.length)
      }
    } catch { case _: Exception => null }

  // ---- CEDD / FCTH / JCD (LIRE codes "ce", "jc") --------------------------

  private def rampUp(v: Double, lo: Double, hi: Double): Double =
    if (v <= lo) 0.0 else if (v >= hi) 1.0 else (v - lo) / (hi - lo)
  private def rampDown(v: Double, lo: Double, hi: Double): Double =
    1.0 - rampUp(v, lo, hi)

  /** 24-bin fuzzy color unit shared by CEDD/FCTH/JCD (Chatzichristofis &
    * Boutalis, ICVS'08 §3: a two-stage fuzzy-linking system over HSV).
    * Bin layout: 0 black, 1 grey, 2 white, then per hue i ∈ {red, orange,
    * yellow, green, cyan, blue, magenta}: 3+3i dark-hue, 3+3i+1 hue,
    * 3+3i+2 light-hue. Memberships: triangular hue sets centered on the
    * canonical hue angles with wrap-around, ramp memberships for the
    * black/achromatic/tone splits, product-combined and L1-normalized.
    * Divergence, documented: the paper's exact rule-table breakpoints are
    * not reproduced — the ramp bounds here are chosen so saturated
    * primaries, greys, black and white land in their nominal bins (the
    * spec's analytic goldens); same honest-structure policy as
    * [[colorLayout]]'s float coefficients.
    */
  private def fuzzyColor24(r: Int, g: Int, b: Int): Array[Double] = {
    val out = new Array[Double](24)
    val mx = math.max(r, math.max(g, b)) / 255.0
    val mn = math.min(r, math.min(g, b)) / 255.0
    val v = mx
    val s = if (mx == 0) 0.0 else (mx - mn) / mx
    val h = {
      val d = mx - mn
      val hh =
        if (d == 0) 0.0
        else if (mx == r / 255.0) 60.0 * (((g - b) / 255.0 / d) % 6.0)
        else if (mx == g / 255.0) 60.0 * ((b - r) / 255.0 / d + 2.0)
        else 60.0 * ((r - g) / 255.0 / d + 4.0)
      if (hh < 0) hh + 360.0 else hh
    }
    val black = rampDown(v, 0.12, 0.35)
    val chroma = rampUp(s, 0.08, 0.25)
    val nonBlack = 1.0 - black
    val lightV = rampUp(v, 0.60, 0.85)
    out(0) = black
    out(1) = nonBlack * (1.0 - chroma) * (1.0 - lightV) // grey
    out(2) = nonBlack * (1.0 - chroma) * lightV // white
    // hue triangles: centers at the canonical angles, feet on the neighbors
    val centers = Array(0.0, 30.0, 60.0, 120.0, 180.0, 240.0, 300.0)
    val chrom = nonBlack * chroma
    if (chrom > 0) {
      val dark = rampDown(v, 0.30, 0.60)
      val lightFrac = rampDown(s, 0.35, 0.70) // low saturation → pastel
      val light = (1.0 - dark) * lightFrac
      val plain = (1.0 - dark) * (1.0 - lightFrac)
      var i = 0
      while (i < 7) {
        val c = centers(i)
        val prev = centers((i + 6) % 7)
        val next = centers((i + 1) % 7)
        // circular distance to this center and the span toward each foot
        val d = { val x = math.abs(h - c); math.min(x, 360.0 - x) }
        val spanPrev = { val x = math.abs(c - prev); math.min(x, 360.0 - x) }
        val spanNext = { val x = math.abs(next - c); math.min(x, 360.0 - x) }
        // which side of the center is h on (circularly)?
        val fwd = (h - c + 360.0) % 360.0
        val span = if (fwd <= 180.0) spanNext else spanPrev
        val m = math.max(0.0, 1.0 - d / span)
        if (m > 0) {
          out(3 + 3 * i) += chrom * m * dark
          out(3 + 3 * i + 1) += chrom * m * plain
          out(3 + 3 * i + 2) += chrom * m * light
        }
        i += 1
      }
    }
    val sum = out.sum
    if (sum > 0) { var i = 0; while (i < 24) { out(i) /= sum; i += 1 } }
    out
  }

  /** One shared block scan producing BOTH the CEDD (6×24) and FCTH (8×24)
    * histograms — the two descriptors differ only in the texture unit, so
    * the decode, block partition, quadrant means and fuzzy color unit are
    * computed once.
    *
    * CEDD texture (paper §2, the MPEG-7-style pentagon): the five
    * [[edgeHistogram]] filters over the block's 2×2 quadrant luminance
    * means; max response < 14 → area 0 (non-edge), else every filter whose
    * max-normalized response exceeds its threshold participates
    * (non-directional 0.68, horizontal/vertical/diagonals 0.98 — the
    * filter attaining the max always qualifies at 1.0). Areas: 0 non-edge,
    * 1 non-directional, 2 horizontal, 3 vertical, 4 45°, 5 135°.
    *
    * FCTH texture (Chatzichristofis & Boutalis, WIAMIS'08): one-level Haar
    * over the same quadrant means — HL (vertical detail), LH (horizontal),
    * HH (diagonal) — each coefficient fuzzy-thresholded high/low (ramp on
    * |coef|/255 over [0.02, 0.15]), product-combined into 8 energy areas
    * indexed (hl<<2)|(lh<<1)|hh.
    *
    * Both histograms are texture-major (area*24 + colorBin), L1-normalized.
    */
  private def ceddFcthHistograms(bytes: Array[Byte]): (Array[Float], Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) return (null, null)
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val side = math.max(2, (math.sqrt(w.toDouble * h / 1600).toInt / 2) * 2)
    val half = side / 2
    val cedd = new Array[Double](144)
    val fcth = new Array[Double](192)
    var by = 0
    while (by + side <= h) {
      var bx = 0
      while (bx + side <= w) {
        // quadrant gray means + block RGB mean in one pass
        var a0, a1, a2, a3 = 0L
        var sr, sg, sb = 0L
        var y = 0
        while (y < side) {
          val row = (by + y) * w
          var x = 0
          while (x < side) {
            val v = rgb(row + bx + x)
            val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
            sr += r; sg += g; sb += b
            val gray = (r * 299 + g * 587 + b * 114) / 1000
            val q = (if (y >= half) 2 else 0) + (if (x >= half) 1 else 0)
            q match {
              case 0 => a0 += gray; case 1 => a1 += gray
              case 2 => a2 += gray; case _ => a3 += gray
            }
            x += 1
          }
          y += 1
        }
        val qn = (half * half).toDouble
        val (m0, m1, m2, m3) = (a0 / qn, a1 / qn, a2 / qn, a3 / qn)
        val n = (side * side).toDouble
        val color = fuzzyColor24((sr / n).toInt, (sg / n).toInt, (sb / n).toInt)

        // CEDD texture areas (possibly several) with equal participation
        val resp = Array(
          math.abs(2 * (m0 - m1 - m2 + m3)), // non-directional
          math.abs(m0 + m1 - (m2 + m3)), // horizontal
          math.abs(m0 + m2 - (m1 + m3)), // vertical
          math.abs(math.sqrt(2.0) * (m0 - m3)), // 45°
          math.abs(math.sqrt(2.0) * (m1 - m2))) // 135°
        val mxResp = resp.max
        val areas =
          if (mxResp < 14.0) Array(0)
          else {
            val th = Array(0.68, 0.98, 0.98, 0.98, 0.98)
            val b = Array.newBuilder[Int]
            var k = 0
            while (k < 5) { if (resp(k) / mxResp >= th(k)) b += (k + 1); k += 1 }
            b.result()
          }
        val aw = 1.0 / areas.length
        var ai = 0
        while (ai < areas.length) {
          val base = areas(ai) * 24
          var c = 0
          while (c < 24) { cedd(base + c) += aw * color(c); c += 1 }
          ai += 1
        }

        // FCTH texture: fuzzy high/low per Haar band, 8 product-weighted areas
        val hl = rampUp(math.abs(m0 + m2 - m1 - m3) / 255.0, 0.02, 0.15)
        val lh = rampUp(math.abs(m0 + m1 - m2 - m3) / 255.0, 0.02, 0.15)
        val hh = rampUp(math.abs(m0 - m1 - m2 + m3) / 255.0, 0.02, 0.15)
        var area = 0
        while (area < 8) {
          val wgt = (if ((area & 4) != 0) hl else 1 - hl) *
            (if ((area & 2) != 0) lh else 1 - lh) *
            (if ((area & 1) != 0) hh else 1 - hh)
          if (wgt > 0) {
            val base = area * 24
            var c = 0
            while (c < 24) { fcth(base + c) += wgt * color(c); c += 1 }
          }
          area += 1
        }
        bx += side
      }
      by += side
    }
    def norm(a: Array[Double]): Array[Float] = {
      val s = a.sum
      val out = new Array[Float](a.length)
      if (s > 0) { var i = 0; while (i < a.length) { out(i) = (a(i) / s).toFloat; i += 1 } }
      out
    }
    (norm(cedd), norm(fcth))
  }

  /** CEDD — Color and Edge Directivity Descriptor (LIRE code "ce";
    * Chatzichristofis & Boutalis, ICVS'08). 144 dims = 6 texture areas ×
    * 24 fuzzy colors, texture-major, L1-normalized floats (not the paper's
    * 3-bit quantization — same ranking-information policy as the other
    * descriptors). Null for undecodable input.
    */
  def cedd(bytes: Array[Byte]): Array[Float] =
    try ceddFcthHistograms(bytes)._1 catch { case _: Exception => null }

  /** FCTH — Fuzzy Color and Texture Histogram (Chatzichristofis & Boutalis,
    * WIAMIS'08): 192 dims = 8 Haar-energy texture areas × 24 fuzzy colors.
    * Not a whitelist code itself; public building block for [[jcd]].
    */
  def fcth(bytes: Array[Byte]): Array[Float] =
    try ceddFcthHistograms(bytes)._2 catch { case _: Exception => null }

  /** JCD — Joint Composite Descriptor (LIRE code "jc"; Chatzichristofis,
    * Boutalis & Lux 2009): CEDD and FCTH fused into 7 joint texture areas
    * × 24 colors = 168 dims. Area mapping used here (documented
    * reconstruction of the published fusion — CEDD's directional areas are
    * kept, the two "smooth" areas are averaged, FCTH's multi-band energy
    * areas collapse into one "textured" area):
    * 0 = (CEDD non-edge + FCTH all-low)/2; 1..5 = CEDD non-directional /
    * horizontal / vertical / 45° / 135°; 6 = Σ FCTH areas 1..7.
    * Re-L1-normalized; null for undecodable input.
    */
  def jcd(bytes: Array[Byte]): Array[Float] =
    try {
      val (ce, fc) = ceddFcthHistograms(bytes)
      if (ce == null) null
      else {
        val out = new Array[Float](168)
        var c = 0
        while (c < 24) {
          out(c) = (ce(c) + fc(c)) / 2f
          var t = 1
          while (t < 6) { out(t * 24 + c) = ce(t * 24 + c); t += 1 }
          var f = 1
          while (f < 8) { out(6 * 24 + c) += fc(f * 24 + c); f += 1 }
          c += 1
        }
        val s = out.sum
        if (s > 0) { var i = 0; while (i < 168) { out(i) /= s; i += 1 } }
        out
      }
    } catch { case _: Exception => null }

  /** Joint histogram (LIRE code "jh"; Pass & Zabih, "Comparing images using
    * joint histograms", Multimedia Systems 1999): a joint distribution over
    * per-pixel features instead of color alone. Features here: 64-bin RGB
    * color (2 bits/channel) × 9-level neighborhood rank (count of the 8
    * neighbors strictly brighter in luminance than the pixel — Pass &
    * Zabih's "rank" feature). 576 dims, (color*9 + rank), computed over
    * interior pixels, L1-normalized. Null for undecodable input.
    */
  def jointHistogram(bytes: Array[Byte]): Array[Float] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val gray = new Array[Int](w * h)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          gray(p) = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
            (v & 0xff) * 114) / 1000
          p += 1
        }
        val hist = new Array[Double](576)
        var count = 0L
        if (w >= 3 && h >= 3) {
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val i = y * w + x
              val g0 = gray(i)
              var rank = 0
              var dy = -1
              while (dy <= 1) {
                var dx = -1
                while (dx <= 1) {
                  if ((dx != 0 || dy != 0) && gray(i + dy * w + dx) > g0) rank += 1
                  dx += 1
                }
                dy += 1
              }
              val v = rgb(i)
              val colorBin = (((v >> 16) & 0xff) >> 6) * 16 +
                ((((v >> 8) & 0xff) >> 6) * 4) + ((v & 0xff) >> 6)
              hist(colorBin * 9 + rank) += 1
              count += 1
              x += 1
            }
            y += 1
          }
        } else {
          // degenerate tiny image: rank 0 for every pixel
          var i = 0
          while (i < rgb.length) {
            val v = rgb(i)
            val colorBin = (((v >> 16) & 0xff) >> 6) * 16 +
              ((((v >> 8) & 0xff) >> 6) * 4) + ((v & 0xff) >> 6)
            hist(colorBin * 9) += 1
            count += 1
            i += 1
          }
        }
        val out = new Array[Float](576)
        if (count > 0) {
          var i = 0
          while (i < 576) { out(i) = (hist(i) / count).toFloat; i += 1 }
        }
        out
      }
    } catch { case _: Exception => null }

  /** Descriptor registry, keyed the way the reference keys everything on
    * one `algo` end-to-end (`loader.js:20-21`, `searcher.js:204`): "cl"
    * ColorLayout (the reference default), "eh" EdgeHistogram, "sc"
    * ScalableColor, "oh" OpponentHistogram, "ac" AutoColorCorrelogram,
    * "ph" PHOG, "fc" FuzzyColorHistogram, "fo" FuzzyOpponentHistogram,
    * "ce" CEDD, "jc" JCD, "jh" JointHistogram, "in" the
    * intensity grid. Ingest ([[describeImagesWith]]) and serving
    * ([[graft.serving.SearchService]]) both resolve through this map, so a
    * table ingested under an algo is searched with the same descriptor.
    */
  val descriptors: Map[String, Array[Byte] => Array[Float]] = Map(
    "in" -> (b => intensityDescriptor(b)),
    "eh" -> (b => edgeHistogram(b)),
    "cl" -> (b => colorLayout(b)),
    "sc" -> (b => scalableColor(b)),
    "oh" -> (b => opponentHistogram(b)),
    "ac" -> (b => autoColorCorrelogram(b)),
    "ph" -> (b => phog(b)),
    "fc" -> (b => fuzzyColorHistogram(b)),
    "fo" -> (b => fuzzyOpponentHistogram(b)),
    "ce" -> (b => cedd(b)),
    "jc" -> (b => jcd(b)),
    "jh" -> (b => jointHistogram(b)))

  /** Distributed resize: decode → aspect-preserving downscale to fit
    * within `maxDim` → re-encode PNG. The image analog of the reference's
    * `scale=-2:180` ffmpeg stage (hasher.js:77) as a batch column op —
    * binary in, binary out, so thumbnail generation composes with any
    * downstream decode/describe/store stage. Undecodable rows survive as
    * null bytes with ok=false; images already within bounds pass through
    * re-encoded (deterministic output for a given input).
    */
  def thumbnails(df: DataFrame, idCol: String, bytesCol: String,
                 maxDim: Int = 180): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = try {
          val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val scale = math.min(1.0,
              maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val (w, h) = (math.max((img.getWidth * scale).round.toInt, 1),
              math.max((img.getHeight * scale).round.toInt, 1))
            val dst = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", buf)
            Some((buf.toByteArray, w, h))
          }
        } catch { case _: Exception => None }
        out match {
          case Some((b, w, h)) => (id, Option(b), w, h, true)
          case None            => (id, Option.empty[Array[Byte]], 0, 0, false)
        }
      })
      .toDF(idCol, "thumb", "width", "height", "ok")
  }

  /** Distributed decode + describe over a (id, content) binary DataFrame:
    * the batch-shaped analog of a `mapInPandas` image stage. Output:
    * (id, width, height, ok, descriptor FLOAT[grid²]).
    */
  /** Perceptual difference hash (dHash, 8×8 → 64 bits; Krawetz 2013, the
    * standard public perceptual-dedup fingerprint): downscale to 9×8
    * grayscale with bilinear filtering, emit one bit per horizontally
    * adjacent pixel pair — set iff the left pixel is brighter. Stable
    * under resize / re-encode / small edits, so hamming distance over
    * these 64 bits is an image NEAR-DUP metric that rides the exact same
    * Manku block machinery as text simhash
    * ([[graft.operators.TextDedup.hammingNearPairs]] with bits=64).
    * None for undecodable bytes.
    */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        // Exact AREA-AVERAGE luminance over the 9×8 grid: every source
        // pixel contributes to exactly one cell, so the grid is stable
        // under resize — a 3000px original and its 400px re-upload average
        // the same content. (One-step Graphics2D bilinear samples only a
        // 2×2 neighborhood per target pixel; on large sources it aliases
        // and the gradient bits diverge far past any hamming budget.)
        val w = img.getWidth
        val h = img.getHeight
        val sums = Array.ofDim[Double](8, 9)
        val counts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val cy = math.min(y * 8L / h, 7L).toInt
          var x = 0
          while (x < w) {
            val cx = math.min(x * 9L / w, 8L).toInt
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sums(cy)(cx) += 0.299 * r + 0.587 * gg + 0.114 * b // ITU-R BT.601
            counts(cy)(cx) += 1
            x += 1
          }
          y += 1
        }
        def cell(cy: Int, cx: Int): Double =
          if (counts(cy)(cx) == 0) 0.0 else sums(cy)(cx) / counts(cy)(cx)
        var out = 0L
        var bit = 0
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            if (cell(cy, cx) > cell(cy, cx + 1)) out |= 1L << bit
            bit += 1
            cx += 1
          }
          cy += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** Distributed dHash over a binary column → (id, dhash, ok); corrupt
    * rows survive as ok=false (same contract as [[thumbnails]]).
    */
  def dHashes(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        dHash(bytes) match {
          case Some(h) => (id, h, true)
          case None    => (id, 0L, false)
        }
      })
      .toDF(idCol, "dhash", "ok")
  }

  def describeImages(df: DataFrame, idCol: String, bytesCol: String,
                     grid: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decodeMeta(bytes)
        (id, m.width, m.height, m.ok, Option(intensityDescriptor(bytes, grid)))
      })
      .toDF(idCol, "width", "height", "ok", "descriptor")
  }

  /** [[describeImages]] with the MPEG-7 EHD descriptor (80 dims) instead of
    * the intensity grid.
    */
  def describeImagesEhd(df: DataFrame, idCol: String, bytesCol: String): DataFrame =
    describeImagesWith(df, idCol, bytesCol, "eh")

  /** Contract note (SURVEY §7.4 delta): the reference's whitelist
    * additionally accepts `ad` = ACCID (`hasher.js:28-49`). ACCID's
    * publication is not reproducible from public sources, so this engine
    * does not reimplement it: a from-scratch "ACCID" would silently
    * disagree with every other ACCID index. Two honest postures instead:
    * with a user-supplied LIRE jar configured ([[LireBridge]]), `ad`
    * routes through the user's own jar (bit-identical features by
    * construction); without one, `ad` is EXPLICITLY rejected and the
    * message names both the delta and the bridge route. Pinned by
    * ImageOpsSpec's registry-contract test + LireBridgeSpec.
    */
  def requireAlgo(algo: String): Unit =
    require(descriptors.contains(algo) ||
      (algo == "ad" && LireBridge.configuredJar.isDefined),
      s"unsupported descriptor algo '$algo' (have: ${descriptors.keys.toSeq.sorted.mkString(", ")})" +
        (if (algo == "ad")
           "; the reference accepts ad=ACCID, not reimplemented here — not reproducible " +
             "from public sources (SURVEY §7.4). To run ad, supply a LIRE jar via the " +
             "SPARK_GRAFT_LIRE_JAR env var or the graft.lire.jar system property (LireBridge)"
         else ""))

  /** One `algo` string → one row function, for BOTH ingest and serving:
    * the in-engine [[descriptors]] registry by default; `ad` always goes
    * through the configured LIRE jar ([[LireBridge]] — no in-engine
    * ACCID exists); and any code listed in [[LireBridge.routedAlgos]]
    * (the `graft.lire.route` config) ALSO routes through the jar, so a
    * deployment migrating an existing LIRE-built index serves every code
    * bit-identically to its old features instead of refitting
    * (LireBridgeSpec pins routed-vs-jar parity per code, including the
    * cl case where the jar's dimensionality differs from the engine's).
    * The jar path and route set are resolved HERE, on the driver, so the
    * returned closure captures concrete strings rather than re-reading
    * executor-side config.
    */
  def resolve(algo: String): Array[Byte] => Array[Float] = {
    requireAlgo(algo)
    val viaJar = algo == "ad" || LireBridge.routedAlgos.contains(algo)
    if (!viaJar) descriptors(algo)
    else {
      require(LireBridge.configuredJar.isDefined,
        s"descriptor '$algo' is routed through a LIRE jar " +
          "(graft.lire.route) but no jar is configured — set " +
          "SPARK_GRAFT_LIRE_JAR or the graft.lire.jar system property")
      LireBridge.extractor(LireBridge.configuredJar.get,
        LireBridge.ClassFor(algo))
    }
  }

  /** [[describeImages]] resolved through [[resolve]] —
    * one `algo` string selects the same descriptor at ingest and serving.
    */
  def describeImagesWith(df: DataFrame, idCol: String, bytesCol: String,
                         algo: String): DataFrame = {
    val fn = resolve(algo)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decodeMeta(bytes)
        (id, m.width, m.height, m.ok, Option(fn(bytes)))
      })
      .toDF(idCol, "width", "height", "ok", "descriptor")
  }
}
