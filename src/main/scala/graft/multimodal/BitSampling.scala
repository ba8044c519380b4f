package graft.multimodal

import java.util.concurrent.ConcurrentHashMap

/** Bit-sampling LSH over quantized global descriptors — the public,
  * ~50-line algorithm behind the reference's `_ha` hash codes (SURVEY §1.3:
  * 100 hash-function bundles × 12 bits each → ≤3-hex-digit codes, the wire
  * format visible at `loader.js:99-105` and produced by the LIRE Solr
  * indexer the reference shells into, `hasher.js:121`).
  *
  * Classic bit sampling for Hamming space (Indyk–Motwani '98): quantize
  * each descriptor dimension to `QuantBits` bits, view the concatenation as
  * one long bit string, and let every bundle sample `BitsPerBundle` fixed
  * random bit positions. Two descriptors close in Hamming distance agree on
  * most sampled bits, so they collide on some bundle with high probability
  * — the bundle codes are LSH bucket keys, exactly how the reference's
  * search treats them.
  *
  * The sample table is derived from a fixed seed (deterministic across JVMs
  * and executors — a re-ingested corpus hashes identically) and cached per
  * (dim, seed). This implementation follows the published algorithm, not
  * LIRE's source.
  */
object BitSampling {

  val Bundles = 100      // loader.js:99-105: 100 codes per frame
  val BitsPerBundle = 12 // 12 bits → codes in 0..4095 (3 hex digits)
  val QuantBits = 8      // descriptor dims quantized to 8-bit levels
  val DefaultSeed = 42L

  // table(bundle)(j) = sampled global bit position (dim * QuantBits + bit)
  private val tables = new ConcurrentHashMap[(Int, Long), Array[Array[Int]]]()

  private def table(dim: Int, seed: Long): Array[Array[Int]] =
    tables.computeIfAbsent((dim, seed), { case (d, s) =>
      val rnd = new java.util.Random(s)
      Array.fill(Bundles)(Array.fill(BitsPerBundle)(rnd.nextInt(d * QuantBits)))
    })

  /** Descriptor (values in [0,1]) → `Bundles` bundle codes in
    * [0, 2^BitsPerBundle). Deterministic for a given (dim, seed).
    */
  def hashes(desc: Array[Float], seed: Long = DefaultSeed): Array[Int] = {
    val q = new Array[Int](desc.length)
    var i = 0
    while (i < desc.length) {
      q(i) = math.max(0, math.min(255, math.round(desc(i) * 255f)))
      i += 1
    }
    val t = table(desc.length, seed)
    val out = new Array[Int](Bundles)
    var k = 0
    while (k < Bundles) {
      val bits = t(k)
      var code = 0
      var j = 0
      while (j < BitsPerBundle) {
        val p = bits(j)
        code |= ((q(p / QuantBits) >> (p % QuantBits)) & 1) << j
        j += 1
      }
      out(k) = code
      k += 1
    }
    out
  }

  /** The reference's wire format: space-separated lowercase hex codes
    * (≤3 digits each, `loader.js:99-105`).
    */
  def hexCodes(desc: Array[Float], seed: Long = DefaultSeed): String =
    hashes(desc, seed).map(Integer.toHexString).mkString(" ")

  // ---------------------------------------------------------------------
  // LIRE seed-file parity (SURVEY §7.4 risk 6): a corpus hashed by the
  // reference's `lire.jar` (`hasher.js:121` shells into LIRE's indexer,
  // whose hash functions load from the `LshBitSampling.obj` resource) can
  // only be hash-verified cross-system if the engine can consume the SAME
  // published seed-file format and reproduce the SAME codes. Format and
  // semantics were pinned empirically against the jar itself (see
  // BitSamplingSpec): gzip-wrapped Java serialization stream carrying
  // int bits, int dimensions, int numFunctionBundles, then
  // bundles×bits×dimensions float projection weights (widened to double);
  // a code's bit j (LSB-first) is set iff the feature's dot product with
  // weight row (bundle, j) — summed over the FEATURE's length, which may
  // be shorter than `dimensions` — is >= 0. Despite the class name this
  // is random-projection LSH (Charikar STOC'02 hyperplane signs), not
  // positional bit sampling; [[hashes]] above remains the engine-native
  // self-consistent scheme, this entry point exists for migration parity.
  // ---------------------------------------------------------------------

  /** A loaded LIRE hash-function bundle set. */
  final case class LireFunctions(
      bits: Int, dimensions: Int,
      weights: Array[Array[Array[Double]]]) {
    def numFunctionBundles: Int = weights.length
  }

  /** Parse a LIRE `LshBitSampling.obj`-format seed file. The caller owns
    * the stream; the whole table (bundles×bits×dimensions doubles,
    * ~6 MB at LIRE's shipped 100×12×640) is driver-sized and broadcast-
    * friendly, the same shape as an IVF centroid model.
    */
  def loadLireFunctions(in: java.io.InputStream): LireFunctions = {
    val ois = new java.io.ObjectInputStream(
      new java.util.zip.GZIPInputStream(in))
    val bits = ois.readInt()
    val dims = ois.readInt()
    val bundles = ois.readInt()
    require(bits > 0 && bits <= 30,
      s"LIRE seed file: bits $bits outside (0, 30] — not a seed file?")
    require(dims > 0 && dims <= (1 << 20) && bundles > 0 && bundles <= (1 << 16),
      s"LIRE seed file: implausible geometry ($bundles bundles × $bits bits × $dims dims)")
    val w = Array.fill(bundles, bits, dims)(ois.readFloat().toDouble)
    LireFunctions(bits, dims, w)
  }

  /** LIRE-parity codes for a feature histogram under loaded [[LireFunctions]]
    * — bit-for-bit what `BitSampling.generateHashes` in the reference's
    * jar produces for the same inputs (spec-pinned via the jar when
    * present). The histogram may be shorter than the table's dimension
    * (LIRE features vary in length); it must not be longer.
    */
  def lireHashes(histogram: Array[Double], fns: LireFunctions): Array[Int] = {
    require(histogram.length <= fns.dimensions,
      s"histogram length ${histogram.length} exceeds seed-file dimensions ${fns.dimensions}")
    val out = new Array[Int](fns.numFunctionBundles)
    var i = 0
    while (i < out.length) {
      val bundle = fns.weights(i)
      var code = 0
      var j = 0
      while (j < fns.bits) {
        val row = bundle(j)
        var p = 0.0
        var k = 0
        while (k < histogram.length) { p += histogram(k) * row(k); k += 1 }
        if (p >= 0) code |= 1 << j
        j += 1
      }
      out(i) = code
      i += 1
    }
    out
  }
}
