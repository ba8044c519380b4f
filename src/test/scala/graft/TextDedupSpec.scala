package graft

import graft.operators.TextDedup
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog", "en"), // near dup
    (4L, "completely different words entirely unrelated text here now", "en"),
    (5L, "the quick brown fox jumps over the lazy dog", "de") // dup, other block
  ).toDF("doc_id", "text", "lang")

  test("jaccardPairs finds exact dup with jaccard 1.0, respects blocking") {
    val pairs = TextDedup.jaccardPairs(docs, "text", "doc_id", "lang", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    // doc 5 is an exact dup of 1 but in another block: must NOT pair
    assert(!pairs.exists(p => p._2 == 5L || p._1 == 5L))
  }

  test("jaccardPairsPrefix returns exactly the inverted-index result") {
    def norm(dfr: org.apache.spark.sql.DataFrame) =
      dfr.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = norm(TextDedup.jaccardPairs(docs, "text", "doc_id", "lang", 0.5))
    val pref = norm(TextDedup.jaccardPairsPrefix(docs, "text", "doc_id", "lang", 0.5))
    assert(base.nonEmpty)
    assert(pref == base)
  }

  test("minhash signatures of identical texts are identical; bands pair them") {
    val sig = TextDedup.minhashSignatures(docs, "text", "doc_id", 8, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val s1 = sig.filter(_._1 == 1L).map(x => (x._2, x._3)).sortBy(_._1).toSeq
    val s2 = sig.filter(_._1 == 2L).map(x => (x._2, x._3)).sortBy(_._1).toSeq
    assert(s1 == s2)
    assert(s1.length == 8)
    val pairs = TextDedup.minhashBandPairs(docs, "text", "doc_id", 8, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated text
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val sh = TextDedup.simhash(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh(1L) == sh(2L))
    val hammingNear = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val hammingFar = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(hammingNear < hammingFar)
  }

  test("simhashNearPairs equals brute-force hamming filter") {
    val fp = TextDedup.simhash(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      (i, si) <- fp.toSeq; (j, sj) <- fp.toSeq if i < j
      h = java.lang.Long.bitCount(si ^ sj) if h <= 3
    } yield (i, j, h)).toSet
    val got = TextDedup.simhashNearPairs(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
    assert(got.contains((1L, 2L, 0))) // identical docs at hamming 0
  }

  test("fingerprintMinK: deterministic, equal for dups, k ascending values") {
    val fp = TextDedup.fingerprintMinK(docs, "text", "doc_id", 3, 4)
      .collect().map(r => (r.getLong(0), (1 to 4).map(r.getLong))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) == fp(1L).sorted)
  }

  test("cosinePairs finds identical vectors at cos 1.0 within block") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), 0),
      (2L, Array(1.0f, 0.0f, 2.0f), 0),
      (3L, Array(-1.0f, 0.5f, -2.0f), 0),
      (4L, Array(1.0f, 0.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val pairs = TextDedup.cosinePairs(vecs, "embedding", "vec_id", "label", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }
}
