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
}
