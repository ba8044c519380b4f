package graft

import graft.multimodal.BitSampling
import org.scalatest.funsuite.AnyFunSuite

/** BitSampling LSH (A16 fidelity): fixed-seed determinism, analytic golden
  * vectors, code range, and the LSH locality property the codes exist for.
  */
class BitSamplingSpec extends AnyFunSuite {

  test("analytic golden vectors: all-zeros -> every code 0, all-ones -> every code 0xfff") {
    // quantized all-0 / all-255 descriptors have every sampled bit 0 / 1
    // regardless of which positions the seed sampled — true goldens
    val zeros = BitSampling.hashes(Array.fill(64)(0f))
    assert(zeros.length == BitSampling.Bundles)
    assert(zeros.forall(_ == 0))
    val ones = BitSampling.hashes(Array.fill(64)(1f))
    assert(ones.forall(_ == 0xfff))
    assert(BitSampling.hexCodes(Array.fill(64)(1f)) ==
      Seq.fill(BitSampling.Bundles)("fff").mkString(" "))
  }

  test("fixed seed is deterministic across calls and dims; codes stay in 0..4095") {
    val d64 = Array.tabulate(64)(i => i / 63f)
    assert(BitSampling.hashes(d64).toSeq == BitSampling.hashes(d64).toSeq)
    assert(BitSampling.hexCodes(d64) == BitSampling.hexCodes(d64))
    val d80 = Array.tabulate(80)(i => (i * 37 % 80) / 80f)
    val h80 = BitSampling.hashes(d80)
    assert(h80.length == BitSampling.Bundles)
    assert(h80.forall(c => c >= 0 && c <= 0xfff))
    assert(BitSampling.hexCodes(d80).split(" ").forall(_.length <= 3))
    // a different seed samples different positions → different codes
    assert(BitSampling.hashes(d80, seed = 7L).toSeq != h80.toSeq)
  }

  test("LSH locality: a near descriptor shares far more bundle codes than a far one") {
    val rnd = new java.util.Random(123)
    val base = Array.fill(64)(rnd.nextFloat())
    val near = base.clone()
    near(5) = math.min(1f, near(5) + 0.02f) // tiny perturbation, one dim
    val far = base.map(v => 1f - v)
    val hb = BitSampling.hashes(base)
    val nearShared = hb.zip(BitSampling.hashes(near)).count { case (a, b) => a == b }
    val farShared = hb.zip(BitSampling.hashes(far)).count { case (a, b) => a == b }
    assert(nearShared > BitSampling.Bundles / 2,
      s"near descriptor shares only $nearShared/${BitSampling.Bundles} codes")
    assert(nearShared > 2 * farShared + 2,
      s"near=$nearShared far=$farShared — no locality")
  }

  // --- LIRE seed-file parity (SURVEY §7.4 risk 6) --------------------------
  // The reference snapshot ships LIRE's seed file inside its jar; when the
  // snapshot is present the parity tests load the REAL file (read-only).
  // Goldens below were hand-derived this way: running the jar's own
  // BitSampling.generateHashes on the deterministic vectors and recording
  // the first five codes — so the golden test stands alone even where the
  // snapshot is absent... except it needs the seed FILE itself, which is
  // not vendored (GPL data); both tests therefore gate on the jar path.
  private val LireJar = "/root/reference/jar/lire.jar"
  private val SeedEntry = "net/semanticmetadata/lire/indexers/hashing/LshBitSampling.obj"

  private def loadSeedFile(): Option[BitSampling.LireFunctions] = {
    if (!new java.io.File(LireJar).isFile) None
    else {
      val zf = new java.util.zip.ZipFile(LireJar)
      try Option(zf.getEntry(SeedEntry)).map(e =>
        BitSampling.loadLireFunctions(zf.getInputStream(e)))
      finally zf.close()
    }
  }

  test("LIRE seed file parses to the published 100x12x640 geometry") {
    val fns = loadSeedFile()
    assume(fns.isDefined, "reference lire.jar not present — skipping")
    val f = fns.get
    assert(f.bits == 12 && f.dimensions == 640 && f.numFunctionBundles == 100)
    // first weights of the shipped table, read back exactly (floats widen)
    assert(f.weights(0)(0)(0) == 0.8708978891372681)
    assert(f.weights(0)(0)(1) == 0.9816609025001526)
    assert(f.weights(0)(1)(0) == 0.4617578089237213)
  }

  test("lireHashes reproduces the jar's generateHashes codes (hand-derived goldens)") {
    val fns = loadSeedFile()
    assume(fns.isDefined, "reference lire.jar not present — skipping")
    val f = fns.get
    // golden 1: full-width vector h[i] = sin(i*0.1), first five codes as
    // printed by the jar's BitSampling.generateHashes
    val full = Array.tabulate(640)(i => math.sin(i * 0.1))
    assert(BitSampling.lireHashes(full, f).take(5).toSeq ==
      Seq(2235, 3287, 2642, 1815, 499))
    // golden 2: a SHORT feature (64 dims — LIRE features vary in length;
    // the dot product must run over the feature's length only)
    val short = Array.tabulate(64)(i => math.cos(i * 0.37))
    assert(BitSampling.lireHashes(short, f).take(5).toSeq ==
      Seq(343, 1648, 1731, 2508, 2706))
    // golden 3: the zero vector — every projection is 0 and LIRE's
    // predicate is >= 0, so every bit sets (the jar prints 4095)
    assert(BitSampling.lireHashes(new Array[Double](64), f).forall(_ == 0xfff))
    // guard: longer than the table is a hard error, not silent truncation
    intercept[IllegalArgumentException] {
      BitSampling.lireHashes(new Array[Double](641), f)
    }
  }

  test("lireHashes full parity fuzz against the jar itself (reflection, gated)") {
    assume(new java.io.File(LireJar).isFile, "reference lire.jar not present — skipping")
    val fns = loadSeedFile().get
    val cl = new java.net.URLClassLoader(
      Array(new java.io.File(LireJar).toURI.toURL), getClass.getClassLoader)
    try {
      val cls = cl.loadClass("net.semanticmetadata.lire.indexers.hashing.BitSampling")
      // prime the jar's static table from its own resource
      val zf = new java.util.zip.ZipFile(LireJar)
      try {
        val read = cls.getMethod("readHashFunctions", classOf[java.io.InputStream])
        read.invoke(null, zf.getInputStream(zf.getEntry(SeedEntry)))
      } finally zf.close()
      val gen = cls.getMethod("generateHashes", classOf[Array[Double]])
      val rnd = new java.util.Random(2026)
      (0 until 10).foreach { _ =>
        val len = 1 + rnd.nextInt(640)
        val h = Array.fill(len)(rnd.nextGaussian())
        val want = gen.invoke(null, h).asInstanceOf[Array[Int]]
        assert(BitSampling.lireHashes(h, fns).toSeq == want.toSeq,
          s"divergence on a length-$len vector")
      }
    } finally cl.close()
  }
}
