package graft

import java.nio.file.{Files, Paths}

import graft.sources.HashXmlSource
import graft.streaming.{IngestPipeline, StreamingTemporalDedup, TimedRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("HashXmlSource reads xz-compressed LIRE XML artifacts (A8/A9/B6)") {
    val xml =
      """<add>
        |  <doc>
        |    <field name="id">12.3456</field>
        |    <field name="cl_hi">QkFTRTY0RkVBVA==</field>
        |    <field name="cl_ha">3ef d3c 2cc</field>
        |  </doc>
        |  <doc>
        |    <field name="id">12.5000</field>
        |    <field name="cl_hi">QkFTRTY0RkVBVDI=</field>
        |    <field name="cl_ha">1a5 5b 4a6</field>
        |  </doc>
        |</add>""".stripMargin
    val dir = tmpDir("hashxml")
    // plain + xz variants
    Files.write(Paths.get(dir, "a.xml"), xml.getBytes("UTF-8"))
    val xzOut = new java.io.ByteArrayOutputStream()
    val xz = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(xzOut)
    xz.write(xml.getBytes("UTF-8")); xz.close()
    Files.write(Paths.get(dir, "b.xml.xz"), xzOut.toByteArray)

    val out = HashXmlSource.read(spark, dir, "cl")
      .orderBy("src", "time")
      .collect()
    assert(out.length == 4)
    val first = out.head
    assert(first.getDouble(1) == 12.3456)
    assert(first.getString(2) == "QkFTRTY0RkVBVA==")
    assert(first.getString(3) == "3ef d3c 2cc")
    // xz content identical to plain
    val times = out.map(_.getDouble(1)).toSeq
    assert(times == Seq(12.3456, 12.5, 12.3456, 12.5))
  }

  test("IngestPipeline end-to-end: watch dir -> frames table with dedup (§3.1-3.2)") {
    val watch = tmpDir("watch")
    val frames = tmpDir("frames") + "/tbl"
    val ckpt = tmpDir("ckpt")
    // two videos + one non-mp4 that must be filtered (B1)
    Files.createDirectories(Paths.get(watch, "tt0000001"))
    Files.createDirectories(Paths.get(watch, "tt0000002"))
    Files.write(Paths.get(watch, "tt0000001", "ep1.mp4"), Array.fill[Byte](4096)(7))
    Files.write(Paths.get(watch, "tt0000002", "ep2.mp4"), Array.fill[Byte](2048)(9))
    Files.write(Paths.get(watch, "tt0000001", "note.txt"), "not a video".getBytes)

    val q = IngestPipeline.start(spark, watch, frames, ckpt, "cl", availableNow = true)
    q.awaitTermination(120000)

    val t = spark.read.parquet(frames)
    val byFile = t.groupBy($"imdb_id", $"file_name").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(byFile.keySet == Set(("tt0000001", "ep1.mp4"), ("tt0000002", "ep2.mp4")))
    // stub emits 12 fps × (bytes/1024) sec, every 4th frame a dup within 2 s
    // → dedup must have dropped them: 4 sec × 12 = 48 → 36 kept
    assert(byFile(("tt0000001", "ep1.mp4")) == 36L)
    assert(byFile(("tt0000002", "ep2.mp4")) == 18L)
    // schema + invariants: unit-norm vectors, keys built, algo partition col
    val row = t.where($"imdb_id" === "tt0000001").orderBy($"time").head()
    assert(row.schema.fieldNames.toSet ==
      Set("imdb_id", "file_name", "time", "hi", "ha", "duration",
        "primary_key", "hash_id", "algo"))
    val v = row.getSeq[Double](row.fieldIndex("ha"))
    assert(v.length == 100)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    assert(row.getAs[String]("hash_id").startsWith("tt0000001/ep1.mp4/"))
    // partition layout on disk: algo=cl
    assert(Files.exists(Paths.get(frames, "algo=cl")))
  }

  test("streaming loader: xz artifacts -> vectorized deduped frames (§3.2)") {
    val watch = tmpDir("artwatch")
    val frames = tmpDir("artframes") + "/tbl"
    val ckpt = tmpDir("artckpt")
    Files.createDirectories(Paths.get(watch, "tt0000009"))
    // two frames 0.16s apart with IDENTICAL cl_hi → C3 drops the second
    val xml =
      """<add>
        |  <doc><field name="id">12.3400</field><field name="cl_hi">SAMEFEAT</field><field name="cl_ha">3ef d3c 2cc</field></doc>
        |  <doc><field name="id">12.5000</field><field name="cl_hi">SAMEFEAT</field><field name="cl_ha">1a5 5b 4a6</field></doc>
        |  <doc><field name="id">20.0000</field><field name="cl_hi">OTHERFEAT</field><field name="cl_ha">f78 c30 99</field></doc>
        |</add>""".stripMargin
    val xzOut = new java.io.ByteArrayOutputStream()
    val xz = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(xzOut)
    xz.write(xml.getBytes("UTF-8")); xz.close()
    Files.write(Paths.get(watch, "tt0000009", "ep9.mp4.xml.xz"), xzOut.toByteArray)

    val q = IngestPipeline.startFromArtifacts(spark, watch, frames, ckpt, "cl",
      availableNow = true)
    q.awaitTermination(120000)

    val t = spark.read.parquet(frames).orderBy($"time").collect()
    assert(t.length == 2) // 12.50 deduped (same hi within 2 s of kept 12.34)
    val first = t.head
    assert(first.getAs[String]("imdb_id") == "tt0000009")
    assert(first.getAs[String]("file_name") == "ep9.mp4")
    assert(first.getAs[String]("hash_id") == "tt0000009/ep9.mp4/12.34")
    val v = first.getSeq[Double](first.fieldIndex("ha"))
    assert(v.length == 100)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    // 0x3ef=1007, 0xd3c=3388, 0x2cc=716 → check first ratio survives normalize
    assert(math.abs(v(0) / v(2) - 1007.0 / 716.0) < 1e-9)
    assert(t(1).getAs[String]("hi") == "OTHERFEAT")
  }

  test("streaming appends -> compaction: file count collapses, content identical (A8/A10)") {
    import graft.sources.LakeLayout
    val watch = tmpDir("cwatch")
    val frames = tmpDir("cframes") + "/tbl"
    val ckpt = tmpDir("cckpt")
    Files.createDirectories(Paths.get(watch, "tt0000042"))
    // micro-batch 1
    Files.write(Paths.get(watch, "tt0000042", "a.mp4"), Array.fill[Byte](2048)(1))
    IngestPipeline.start(spark, watch, frames, ckpt, "cl", availableNow = true)
      .awaitTermination(120000)
    // micro-batch 2: a new file arrives, same checkpoint → incremental append
    Files.write(Paths.get(watch, "tt0000042", "b.mp4"), Array.fill[Byte](2048)(2))
    IngestPipeline.start(spark, watch, frames, ckpt, "cl", availableNow = true)
      .awaitTermination(120000)

    val before = spark.read.parquet(frames).collect()
      .map(_.toString).sorted.toSeq
    assert(before.nonEmpty)
    val stats = LakeLayout.compactParquet(spark, frames,
      targetFileBytes = 128L << 20, partitionCols = Seq("algo"))
    assert(stats.rows == before.size)
    assert(stats.filesBefore >= 2, s"appends should leave ≥2 files, saw ${stats.filesBefore}")
    assert(stats.filesAfter < stats.filesBefore,
      s"compaction must shrink the file count: ${stats.filesBefore} -> ${stats.filesAfter}")
    // row-identical content and surviving partition layout
    val after = spark.read.parquet(frames).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(Files.exists(Paths.get(frames, "algo=cl")))
  }

  test("StreamingTemporalDedup: kept-set parity with batch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TimedRow]
    val out = StreamingTemporalDedup.dedup(input.toDS(), windowSec = 2.0)
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    val batch1 = Seq(
      TimedRow("v", 0.0, "A", 1), TimedRow("v", 1.5, "A", 2), // dropped
      TimedRow("v", 1.0, "B", 3))
    val batch2 = Seq(
      TimedRow("v", 3.0, "A", 4), // kept: 3.0 - 0.0 >= 2 (kept-set!)
      TimedRow("v", 3.5, "B", 5), TimedRow("v", 4.0, "B", 6)) // 5 kept, 6 dropped
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()

    val got = spark.table("dedup_out").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = StreamingTemporalDedup.batchOracle(spark, batch1 ++ batch2, 2.0)
    assert(got == want)
    assert(got == Seq(1L, 3L, 4L, 5L))
    q.stop()
  }

  test("ImageOps: real ImageIO decode + descriptor on a generated PNG") {
    import graft.multimodal.ImageOps
    // render a 32x16 half-black/half-white PNG
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 16)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val df = Seq((1L, png), (2L, "garbage".getBytes)).toDF("id", "content")
    // sniff on the raw binary column
    val kinds = df.select($"id", ImageOps.sniffType($"content").as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(kinds == Map(1L -> "png", 2L -> "unknown"))

    val desc = ImageOps.describeImages(df, "id", "content")
      .collect().map(r => (r.getLong(0), r)).toMap
    assert(desc(1L).getInt(1) == 32 && desc(1L).getInt(2) == 16 && desc(1L).getBoolean(3))
    assert(!desc(2L).getBoolean(3))
    val d = desc(1L).getSeq[Float](4)
    assert(d.length == 64)
    // left half dark, right half bright
    assert(d(0) < 0.2f && d(7) > 0.8f)
    assert(desc(2L).get(4) == null)
  }

  test("A8/A9 wire-format roundtrip: engine frames -> xz XML artifact -> re-ingest, frame-for-frame") {
    import graft.sources.HashXmlSource
    import org.apache.spark.sql.functions.col
    val outDir = java.nio.file.Files.createTempDirectory("graft-xmlsink").toString
    // two videos' frames, deliberately out of time order (the sink must
    // sort ascending by timecode, hasher.js:156-159), one null-ha frame
    val frames = Seq(
      ("vidA.mp4", 2.5, "0a1b2c", "3 7 12"),
      ("vidA.mp4", 0.5, "ffee00", "1 2 3"),
      ("vidA.mp4", 1.25, "c0ffee", null),
      ("vidB.mp4", 0.75, "abcdef", "9 9 9"))
      .toDF("src", "time", "hi", "ha")
    val written = HashXmlSource.write(frames, outDir, "cl").collect()
    assert(written.length == 2, written.mkString(", "))
    assert(written.forall(_.getString(1).endsWith(".xml.xz")))
    // the artifact body is the reference's wire shape: <add> + one-line docs
    val raw = {
      val in = new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(
        new java.io.FileInputStream(written.find(_.getString(0) == "vidA.mp4").get.getString(1)))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(raw.startsWith("<add>\n<doc>"), raw.take(80))
    assert(raw.contains("""<field name="cl_hi">"""), raw.take(200))
    // ascending timecodes inside the artifact
    val ids = """<field name="id">([^<]+)</field>""".r
      .findAllMatchIn(raw).map(_.group(1).toDouble).toSeq
    assert(ids == ids.sorted && ids == Seq(0.5, 1.25, 2.5), ids.toString)

    // re-ingest through the A9 reader: frame-for-frame identity
    val back = HashXmlSource.read(spark, s"$outDir/*.xml.xz", "cl")
      .select(col("time"), col("hi"), col("ha"))
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getString(2))).toSet
    val orig = frames.select(col("time"), col("hi"), col("ha"))
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getString(2))).toSet
    assert(back == orig, s"roundtrip mismatch: back=$back orig=$orig")
  }
}
