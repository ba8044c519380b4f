package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

/** [[FuzzyJoin]] — f1 hash-checks the blocking against DuckDB's brute
  * force; this spec pins brute-force parity on adversarial fixtures
  * (short strings, repeated grams, d=0/2), null handling, and the
  * no-cartesian plan shape.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                    d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    (for ((li, l) <- ls; (ri, r) <- rs; dd = lev(l, r) if dd <= d)
      yield (li, ri, dd)).toSet
  }

  private def engine(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                     d: Int, q: Int = 2): Set[(Long, Long, Int)] =
    FuzzyJoin.byEditDistance(
        ls.toDF("lid", "ls"), rs.toDF("rid", "rs"),
        "lid", "ls", "rid", "rs", maxDist = d, q = q)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet

  test("parity with brute force on a mixed short/long fixture, d = 0, 1, 2") {
    val ls = Seq(1L -> "alpha", 2L -> "beta", 3L -> "ab", 4L -> "x",
      5L -> "gamma", 6L -> "aaaa", 7L -> "abab")
    val rs = Seq(10L -> "alpna", 11L -> "bet", 12L -> "ba", 13L -> "",
      14L -> "gamma", 15L -> "aaab", 16L -> "baba", 17L -> "alphaq")
    for (d <- 0 to 2)
      assert(engine(ls, rs, d) == brute(ls, rs, d), s"divergence at d=$d")
  }

  test("parity on pseudo-random strings over a tiny alphabet (gram collisions)") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until (2 + rnd.nextInt(6))).map(_ => "ab" (rnd.nextInt(2))).mkString
    val ls = (1L to 60L).map(i => i -> word())
    val rs = (100L to 160L).map(i => i -> word())
    for (d <- 0 to 1; q <- Seq(2, 3))
      assert(engine(ls, rs, d, q) == brute(ls, rs, d), s"divergence at d=$d q=$q")
  }

  test("null strings never match; distinct output names enforced") {
    val ls = Seq((1L, "abc"), (2L, null.asInstanceOf[String]))
    val rs = Seq((3L, "abd"), (4L, null.asInstanceOf[String]))
    val got = engine(ls.map { case (a, b) => (a, b) }, rs, 1)
    assert(got == Set((1L, 3L, 1)))
    intercept[IllegalArgumentException] {
      FuzzyJoin.byEditDistance(ls.toDF("id", "s"), rs.toDF("id", "s"),
        "id", "s", "id", "s", 1)
    }
  }

  test("salted path: bit-identical results on a one-gram-shared-by-all corpus") {
    // adversarial skew: every string starts with "zz", so the gram "zz"
    // is shared by the ENTIRE corpus — unsalted, all its join work lands
    // in one task. saltGramDf=10/saltCap=8 forces real salting (121 right
    // rows -> ns = ceil(121/8) = 16 cells for "zz") and must not change a
    // single output row: left
    // rows replicate to every cell, right rows land in exactly one, so
    // the count filter sees the same match counts.
    val rnd = new scala.util.Random(7)
    def word() = "zz" + (0 until (2 + rnd.nextInt(4))).map(_ => "abc"(rnd.nextInt(3))).mkString
    val ls = (1L to 120L).map(i => i -> word())
    val rs = (200L to 320L).map(i => i -> word())
    val want = brute(ls, rs, 1)
    def salted(q: Int) = FuzzyJoin.byEditDistance(
        ls.toDF("lid", "ls"), rs.toDF("rid", "rs"),
        "lid", "ls", "rid", "rs", maxDist = 1, q = q,
        saltGramDf = 10L, saltCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    for (q <- Seq(2, 3)) {
      assert(salted(q) == want, s"salted divergence at q=$q")
      assert(salted(q) == engine(ls, rs, 1, q), s"flag on/off divergence at q=$q")
    }
  }

  test("plan: candidates come from hash joins — no cartesian, no nested loop") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val l = docs.select($"source".as("src"), $"source".as("lstr")).distinct()
    val r = docs.select($"doc_id", concat($"source", lit("q")).as("cand"))
    val p = FuzzyJoin.byEditDistance(l, r, "src", "lstr", "doc_id", "cand", 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay an equi-join:\n${p.take(600)}")
  }
}
