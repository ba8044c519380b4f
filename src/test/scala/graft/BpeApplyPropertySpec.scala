package graft

import graft.operators.BpeTrain
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the rank-skip applier's ALGEBRA — pure driver-side
  * (no Spark jobs), explicit-seed scalacheck draws in the
  * FreqItemsPropertySpec style (the scalatest+scalacheck bridge artifact
  * isn't in the offline cache, so the loop is explicit). The pinned
  * property: `applyMergesInOrder` under `mergeRanks` equals the
  * in-list-order exhaustive greedy replay for random words (repeated-
  * letter runs included, from a 3-letter alphabet) and random merge
  * lists whose pairs may reference composite symbols built by earlier
  * merges — and may repeat, exercising the per-pair rank ARRAYS.
  * BpeTrainSpec pins the DataFrame-level contracts; this pins the skip
  * logic's claim that no firable merge is ever jumped over.
  */
class BpeApplyPropertySpec extends AnyFunSuite {

  /** Independent in-order replay: one exhaustive greedy left-to-right
    * pass per merge, in list order.
    */
  private def greedyReplay(s: List[String], p: (String, String)): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == p._1 && s(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toList
  }

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val alpha = Seq("a", "b", "c")

  /** Progressive merge-list generator: each merge draws (l, r) from a
    * symbol pool that sometimes grows by the composite l+r, so later
    * merges can have multi-char members and duplicates occur naturally.
    */
  private def genMerges(n: Int): Gen[List[(String, String)]] = {
    def step(pool: Vector[String], k: Int): Gen[List[(String, String)]] =
      if (k == 0) Gen.const(Nil)
      else for {
        l <- Gen.oneOf(pool)
        r <- Gen.oneOf(pool)
        grow <- Gen.prob(0.5)
        rest <- step(if (grow && (l + r).length <= 6) pool :+ (l + r) else pool,
          k - 1)
      } yield (l, r) :: rest
    step(alpha.toVector, n)
  }

  private val genWord: Gen[String] = for {
    len <- Gen.choose(0, 10)
    cs <- Gen.listOfN(len, Gen.oneOf(alpha))
  } yield cs.mkString

  test("applyMergesInOrder == in-order exhaustive replay on 500 random cases") {
    (0 until 500).foreach { i =>
      val word = sample(genWord, 1000L + i)
      val merges = sample(genMerges(1 + i % 40), 2000L + i).toArray
      val ranks = BpeTrain.mergeRanks(merges)
      val got = BpeTrain.applyMergesInOrder(word, merges, ranks).toList
      // replay seeds from the engine's code-point segmentation contract
      // (Spark split: empty word -> [""], astral chars stay one symbol)
      val want = merges.foldLeft(BpeTrain.codePointSyms(word).toList)(greedyReplay)
      assert(got == want, s"case $i word=$word merges=${merges.toList}")
      assert(got.mkString == word,
        s"case $i: tokens must re-concatenate to the word")
    }
  }

  test("duplicate pairs fire independently at each of their ranks") {
    val merges = Array(("a", "a"), ("b", "c"), ("a", "a"), ("aa", "b"))
    val ranks = BpeTrain.mergeRanks(merges)
    val got = BpeTrain.applyMergesInOrder("aaabca", merges, ranks).toList
    val want = merges.foldLeft("aaabca".split("").toList)(greedyReplay)
    assert(got == want)
  }
}
