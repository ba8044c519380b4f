package graft

import graft.multimodal.{ImageOps, LireBridge}

/** The ad=ACCID bridge: without a user-supplied LIRE jar the loud
  * documented rejection stands; with one (gated on the reference snapshot's
  * own jar), `ad` routes through the jar and the features are pinned
  * against an independent driver-side replay through a FRESH classloader —
  * the same empirical-parity posture as BitSamplingSpec's reflection fuzz.
  */
class LireBridgeSpec extends SparkSpec {
  import spark.implicits._

  private val LireJar = "/root/reference/jar/lire.jar"

  private def withJar[A](body: => A): A = {
    val prev = sys.props.get("graft.lire.jar")
    sys.props("graft.lire.jar") = LireJar
    try body
    finally prev match {
      case Some(v) => sys.props("graft.lire.jar") = v
      case None    => sys.props.remove("graft.lire.jar")
    }
  }

  /** Render a w×h PNG via a per-pixel RGB function. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, f(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def imgA = png(64, 48)((x, y) => ((x * 4) << 16) | ((y * 5) << 8) | ((x + y) & 0xff))
  private def imgB = png(64, 48)((x, y) => (((x ^ y) * 3 & 0xff) << 16) | 0x4080)

  test("without a configured jar, ad stays a loud rejection naming the bridge route") {
    val prev = sys.props.get("graft.lire.jar")
    sys.props.remove("graft.lire.jar")
    try {
      assume(!sys.env.contains("SPARK_GRAFT_LIRE_JAR"),
        "env configures a jar — unconfigured posture not testable here")
      val e = intercept[IllegalArgumentException] {
        ImageOps.resolve("ad")
      }
      assert(e.getMessage.contains("ad=ACCID"), e.getMessage)
      assert(e.getMessage.contains("SPARK_GRAFT_LIRE_JAR"), e.getMessage)
    } finally prev.foreach(v => sys.props("graft.lire.jar") = v)
  }

  test("a configured but missing jar fails the row function loudly, never nulls the scan") {
    val e = intercept[IllegalArgumentException] {
      LireBridge.extractor("/no/such/lire.jar")(imgA)
    }
    assert(e.getMessage.contains("/no/such/lire.jar"), e.getMessage)
  }

  test("a slim jar that fails to link fails the scan loudly; per-image blow-ups null only their row") {
    // build a descriptor jar at test time whose extract() needs a class
    // the jar does NOT ship — the exact slim-jar misconfiguration that a
    // blanket row-level catch would silently turn into an all-null scan
    val tmp = java.nio.file.Files.createTempDirectory("lirebridge").toFile
    def write(name: String, body: String): java.io.File = {
      val f = new java.io.File(tmp, name)
      java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
      f
    }
    val desc = write("FakeDesc.java",
      """public class FakeDesc {
        |  public void extract(java.awt.image.BufferedImage b) {
        |    if (b.getWidth() > 32) FakeHelper.poke(); // class missing from the jar
        |    throw new RuntimeException("per-image blow-up");
        |  }
        |  public double[] getFeatureVector() { return new double[] {1.0}; }
        |}""".stripMargin)
    val helper = write("FakeHelper.java",
      "public class FakeHelper { static void poke() {} }")
    val jc = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(jc.run(null, null, null, desc.getPath, helper.getPath) == 0, "javac failed")
    val jarF = new java.io.File(tmp, "fake.jar")
    val jos = new java.util.jar.JarOutputStream(new java.io.FileOutputStream(jarF))
    jos.putNextEntry(new java.util.zip.ZipEntry("FakeDesc.class")) // FakeHelper withheld
    jos.write(java.nio.file.Files.readAllBytes(
      new java.io.File(tmp, "FakeDesc.class").toPath))
    jos.closeEntry()
    jos.close()
    val fn = LireBridge.extractor(jarF.getPath, "FakeDesc")
    // small image: extract throws a plain RuntimeException → that row nulls
    assert(fn(png(16, 16)((_, _) => 0)) == null)
    // wide image: NoClassDefFoundError inside extract → loud config failure
    val e = intercept[IllegalStateException] { fn(imgA) }
    assert(e.getMessage.contains("failed to link"), e.getMessage)
  }

  test("ad via the jar: 120-dim features, deterministic, junk rows survive (gated)") {
    assume(new java.io.File(LireJar).isFile, "reference lire.jar not present — skipping")
    withJar {
      val df = Seq((1L, imgA), (2L, imgB), (3L, "not an image".getBytes))
        .toDF("id", "content")
      val run1 = ImageOps.describeImagesWith(df, "id", "content", "ad")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(3), Option(r.getSeq[Float](4)).map(_.toVector))).toMap
      assert(run1(1)._1 && run1(2)._1 && !run1(3)._1)
      assert(run1(3)._2.isEmpty, "junk row must carry a null descriptor")
      assert(run1(1)._2.get.length == 120, s"ACCID dims ${run1(1)._2.get.length}")
      assert(run1(1)._2 != run1(2)._2, "distinct images must not collide")
      val run2 = ImageOps.describeImagesWith(df, "id", "content", "ad")
        .collect().map(r => r.getLong(0) ->
          Option(r.getSeq[Float](4)).map(_.toVector)).toMap
      assert(run1.view.mapValues(_._2).toMap == run2, "non-deterministic bridge")
    }
  }

  test("bridge features match an independent replay through a fresh classloader (gated)") {
    assume(new java.io.File(LireJar).isFile, "reference lire.jar not present — skipping")
    val viaBridge = withJar {
      ImageOps.resolve("ad")(imgA).toVector
    }
    val cl = new java.net.URLClassLoader(
      Array(new java.io.File(LireJar).toURI.toURL), getClass.getClassLoader)
    val cls = Class.forName(LireBridge.AccidClass, true, cl)
    val inst = cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(imgA))
    cls.getMethod("extract", classOf[java.awt.image.BufferedImage]).invoke(inst, img)
    val gold = cls.getMethod("getFeatureVector").invoke(inst)
      .asInstanceOf[Array[Double]].map(_.toFloat).toVector
    assert(viaBridge == gold, "bridge must reproduce the jar's own ACCID bit-for-bit")
  }

  private def withRoute[A](route: String)(body: => A): A = {
    val prev = sys.props.get("graft.lire.route")
    sys.props("graft.lire.route") = route
    try body
    finally prev match {
      case Some(v) => sys.props("graft.lire.route") = v
      case None    => sys.props.remove("graft.lire.route")
    }
  }

  /** Fresh-classloader replay of `fqcn` over `bytes` — the gold the
    * routed bridge must reproduce bit-for-bit (no shared loader state).
    */
  private def jarGold(fqcn: String, bytes: Array[Byte]): Vector[Float] = {
    val cl = new java.net.URLClassLoader(
      Array(new java.io.File(LireJar).toURI.toURL), getClass.getClassLoader)
    val cls = Class.forName(fqcn, true, cl)
    val inst = cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    cls.getMethod("extract", classOf[java.awt.image.BufferedImage]).invoke(inst, img)
    cls.getMethod("getFeatureVector").invoke(inst)
      .asInstanceOf[Array[Double]].map(_.toFloat).toVector
  }

  test("routed descriptors match a fresh-classloader jar replay; cl shows the migration dims gap (gated)") {
    assume(new java.io.File(LireJar).isFile, "reference lire.jar not present — skipping")
    withJar {
      withRoute("cl,ph,jh") {
        // parity matrix: the ROUTED resolve must reproduce the jar's own
        // features exactly, per code, on both fixture images
        Seq("cl", "ph", "jh").foreach { code =>
          val fn = ImageOps.resolve(code)
          Seq(imgA, imgB).foreach { img =>
            val got = Option(fn(img)).map(_.toVector)
            val gold = jarGold(graft.multimodal.LireBridge.ClassFor(code), img)
            assert(got.contains(gold), s"routed '$code' diverged from the jar")
          }
        }
        // the case that makes routing MANDATORY for migration: the jar's
        // ColorLayout emits a different dimensionality than the engine's
        // compact cl — a migrated index cannot be served by the in-engine
        // implementation at all
        val routedCl = ImageOps.resolve("cl")(imgA)
        val engineCl = ImageOps.descriptors("cl")(imgA)
        assert(routedCl.length == 33 && engineCl.length == 12,
          s"expected jar cl=33 dims vs engine cl=12, got ${routedCl.length}/${engineCl.length}")
        // un-routed codes keep the in-engine implementation
        val engineEh = ImageOps.resolve("eh")(imgA)
        assert(engineEh.toVector == ImageOps.descriptors("eh")(imgA).toVector)
      }
    }
  }

  test("route config guards: unknown codes and route-without-jar fail loudly") {
    withRoute("cl,zz") {
      val e = intercept[IllegalArgumentException] {
        graft.multimodal.LireBridge.routedAlgos
      }
      assert(e.getMessage.contains("zz"), e.getMessage)
    }
    val prevJar = sys.props.get("graft.lire.jar")
    sys.props.remove("graft.lire.jar")
    try {
      assume(!sys.env.contains("SPARK_GRAFT_LIRE_JAR"),
        "env configures a jar — unconfigured posture not testable here")
      withRoute("cl") {
        val e = intercept[IllegalArgumentException] { ImageOps.resolve("cl") }
        assert(e.getMessage.contains("no jar is configured"), e.getMessage)
      }
    } finally prevJar.foreach(v => sys.props("graft.lire.jar") = v)
    // "*" routes the whole whitelist
    withRoute("*") {
      assert(graft.multimodal.LireBridge.routedAlgos ==
        graft.multimodal.LireBridge.ClassFor.keySet)
    }
  }

  test("serving end-to-end: ingest under ad, search returns the query image itself (gated)") {
    assume(new java.io.File(LireJar).isFile, "reference lire.jar not present — skipping")
    withJar {
      val imgs = Seq((1L, imgA), (2L, imgB),
        (3L, png(64, 48)((x, y) => ((y * 3) << 16) | ((x * 2) << 8))))
        .toDF("id", "content")
      val vecs = ImageOps.describeImagesWith(imgs, "id", "content", "ad")
        .where("ok").selectExpr("id", "descriptor AS vec")
      val svc = new graft.serving.SearchService(
        vecs, "vec", "id", algo = "ad", metric = "l2", topK = 3)
      val hits = svc.search(imgB).get
      assert(hits.head.getLong(hits.head.fieldIndex("id")) == 2L,
        s"self-match under l2 must rank first: ${hits.map(_.toString)}")
    }
  }
}
