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

  /** Distributed decode + describe over a (id, content) binary DataFrame:
    * the batch-shaped analog of a `mapInPandas` image stage. Output:
    * (id, width, height, ok, descriptor FLOAT[grid²]).
    */
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
  def describeImagesEhd(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decodeMeta(bytes)
        (id, m.width, m.height, m.ok, Option(edgeHistogram(bytes)))
      })
      .toDF(idCol, "width", "height", "ok", "descriptor")
  }
}
