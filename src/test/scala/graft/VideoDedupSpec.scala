package graft

import graft.operators.VideoDedup
import org.apache.spark.sql.functions._

class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private def framesDf(vs: (String, Seq[Long])*) =
    vs.flatMap { case (v, fps) => fps.map(v -> _) }.toDF("video", "fp")

  test("nearPairs: verified frame-set Jaccard matches brute force on planted videos") {
    val a = (1L to 40L)
    val b = (5L to 40L) ++ (101L to 104L) // re-upload with 4 frames changed
    val c = (1L to 30L)                   // trim of a
    val dd = (1000L to 1040L)             // unrelated
    val vids = Seq("a" -> a, "b" -> b, "c" -> c, "d" -> dd)
    val got = VideoDedup.nearPairs(framesDf(vids: _*), "video", "fp", tau = 0.5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val expected = (for {
      i <- vids.indices; j <- (i + 1) until vids.length
      (v1, f1) = vids(i); (v2, f2) = vids(j)
      inter = f1.toSet.intersect(f2.toSet).size.toDouble
      jac = inter / (f1.toSet.size + f2.toSet.size - inter)
      if jac >= 0.5
    } yield (v1, v2) -> math.rint(jac * 1e6) / 1e6).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(expected.nonEmpty && !expected.keySet.exists(p => p._1 == "d" || p._2 == "d"))
  }

  test("canonicalize: re-encoded frames (hamming-perturbed hashes) recover the pair") {
    // v2 is v1 re-encoded: every frame hash differs by 1-2 bits — exact
    // set overlap is ZERO, so raw nearPairs must miss it; canonicalizing
    // fingerprints through hamming-CC first must recover jaccard 1.0.
    val base = (0 until 20).map(i => (0x9E3779B97F4A7C15L * (i + 1)) ^ (1L << 40))
    val enc = base.zipWithIndex.map { case (f, i) =>
      f ^ (1L << (i % 64)) ^ (if (i % 2 == 0) 1L << ((i * 13) % 64) else 0L)
    }
    val other = (0 until 20).map(i => 0x517CC1B727220A95L * (i + 3))
    val frames = framesDf("v1" -> base, "v2" -> enc, "v3" -> other)
    val raw = VideoDedup.nearPairs(frames, "video", "fp", tau = 0.5)
    assert(raw.where($"v1" === "v1" && $"v2" === "v2").isEmpty,
      "raw set overlap must miss the re-encode (hashes are perturbed)")
    val canon = VideoDedup.canonicalize(frames, "video", "fp", maxHamming = 3)
    val got = VideoDedup.nearPairs(canon, "video", "fp", tau = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("v1", "v2", 1.0)), got.mkString(", "))
  }

  test("signatures: deterministic, identical frame sets share every family") {
    val f = framesDf("x" -> (1L to 9L), "y" -> (1L to 9L), "z" -> (50L to 60L))
    val sigs = VideoDedup.signatures(f, "video", "fp", k = 8)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(sigs("x") == sigs("y"), "identical frame sets must share the signature")
    assert(sigs("x") != sigs("z"))
    val again = VideoDedup.signatures(f, "video", "fp", k = 8)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(again == sigs)
  }
}
