package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, FileOutputStream}

import org.apache.commons.compress.compressors.xz.{XZCompressorInputStream, XZCompressorOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compatibility reader for the reference's hash-artifact interchange format
  * (SURVEY A8/A9/B6): LIRE-Solr XML `<add><doc>…` documents, usually
  * xz-compressed (`hasher.js:169`, `loader.js:185`), one `<doc>` per frame
  * with fields `id` (timecode seconds), `${algo}_hi`, `${algo}_ha`.
  *
  * Spark-first shape: a `binaryFile` scan + `mapPartitions` parse — the
  * decompress+parse runs distributed, one task per artifact file; no
  * driver-side I/O. Parsing uses the JDK DOM parser (artifacts are ≤ a few
  * MB — one video's frames).
  */
object HashXmlSource {

  val schema: StructType = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("time", DoubleType, nullable = false),
    StructField("hi", StringType, nullable = true),
    StructField("ha", StringType, nullable = true)))

  /** Read one or many artifacts (glob ok). `algo` selects the `_hi`/`_ha`
    * field names, matching the reference's env-driven schema
    * (`loader.js:20-21`).
    */
  def read(spark: SparkSession, path: String, algo: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val rows = bin.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val p = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        parseArtifact(p, bytes, algo).iterator
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** SINK direction (A8): write engine frames back out as reference-shaped
    * artifacts — `<add>` wrapping one single-line `<doc>` per frame with
    * `id` (timecode seconds) and `${algo}_hi`/`${algo}_ha` fields, docs
    * sorted ascending by timecode, the whole document xz-compressed
    * (`hasher.js:139-176`) — so an engine-produced corpus is ingestible by
    * the reference's loader, and [[read]] ∘ [[write]] is the identity
    * (IngestSpec roundtrip).
    *
    * Distributed shape: one artifact per `src`, assembled task-side from a
    * per-src `sort_array(collect_list(...))` — a single video's frames
    * (the reference's unit of interchange, ≤ a few thousand rows), never
    * a whole-corpus collect. `outDir` would be a shared filesystem on a
    * cluster.
    *
    * Write discipline: EAGER (the artifacts exist when this returns — the
    * distributed write runs once, inside this call, and the returned frame
    * is a local relation a caller can re-scan without re-triggering file
    * I/O), and ATOMIC per artifact (each file is written to a task-unique
    * temp name and renamed into place, so a failed or speculatively
    * retried task can never leave a truncated .xz visible).
    *
    * @return (src, path, frames) — one row per artifact written
    */
  def write(frames: DataFrame, outDir: String, algo: String): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    val written = frames
      .select(col("src"),
        struct(col("time"), col("hi"), col("ha")).as("f"))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("f"))).as("fs"))
      .as[(String, Seq[(Double, String, String)])]
      .map { case (src, fs) =>
        val name = src.replaceAll("[^A-Za-z0-9._-]", "_") + ".xml.xz"
        val path = s"$outDir/$name"
        val sb = new StringBuilder("<add>\n")
        fs.foreach { case (t, hi, ha) =>
          sb.append("<doc>").append(s"""<field name="id">$t</field>""")
          if (hi != null) sb.append(s"""<field name="${algo}_hi">${escXml(hi)}</field>""")
          if (ha != null) sb.append(s"""<field name="${algo}_ha">${escXml(ha)}</field>""")
          sb.append("</doc>\n")
        }
        sb.append("</add>\n")
        val tmp = java.nio.file.Files.createTempFile(
          java.nio.file.Paths.get(outDir), s".$name.", ".tmp")
        try {
          val out = new XZCompressorOutputStream(
            new BufferedOutputStream(new FileOutputStream(tmp.toFile)), 6)
          try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
          try
            java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
            java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        } catch { case e: Throwable =>
          // no orphaned temp on a failed task — the retry gets a clean dir
          java.nio.file.Files.deleteIfExists(tmp)
          throw e
        }
        (src, path, fs.size)
      }
      .collect()
    spark.createDataset(written.toSeq).toDF("src", "path", "frames")
  }

  private def escXml(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Decompress (if .xz) and parse one artifact into frame rows. */
  def parseArtifact(path: String, bytes: Array[Byte], algo: String): Seq[Row] = {
    val in =
      if (path.endsWith(".xz"))
        new XZCompressorInputStream(new BufferedInputStream(new ByteArrayInputStream(bytes)))
      else new ByteArrayInputStream(bytes)
    // Artifacts are untrusted input from a watch directory: refuse DTDs and
    // external entities (XXE / entity-expansion hardening; the reference's
    // xmldoc parser never resolves external entities either).
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder().parse(in)
    val docs = doc.getElementsByTagName("doc")
    (0 until docs.getLength).map { i =>
      val fields = docs.item(i).getChildNodes
      var time: Double = Double.NaN
      var hi: String = null
      var ha: String = null
      (0 until fields.getLength).foreach { j =>
        val n = fields.item(j)
        if (n.getNodeType == org.w3c.dom.Node.ELEMENT_NODE) {
          val name = n.getAttributes.getNamedItem("name")
          if (name != null) name.getNodeValue match {
            // loader.js:188-197: id → float time; algo-prefixed hi/ha
            case "id"                   => time = n.getTextContent.toDouble
            case s if s == s"${algo}_hi" => hi = n.getTextContent
            case s if s == s"${algo}_ha" => ha = n.getTextContent
            case _                      =>
          }
        }
      }
      Row(path, time, hi, ha)
    }
  }
}
