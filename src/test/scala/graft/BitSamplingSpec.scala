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
}
