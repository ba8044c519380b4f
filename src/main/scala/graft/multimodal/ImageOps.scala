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
}
