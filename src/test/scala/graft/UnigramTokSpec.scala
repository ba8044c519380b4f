package graft

import graft.operators.{BpeTrain, UnigramTok}

/** [[UnigramTok]] — the t27 gate row hash-checks Viterbi segmentation
  * against the enumeration oracle; this spec pins Viterbi against a
  * driver-side exhaustive enumeration on random piece tables, the
  * greedy-beats-nothing property (the "scan" trap), the UNK/empty/null
  * contracts, per-doc counts, and the guards.
  */
class UnigramTokSpec extends SparkSpec {
  import spark.implicits._

  private val pieces = Seq(
    ("a", -2.0), ("b", -2.1), ("c", -2.2), ("d", -2.3), ("n", -2.4),
    ("s", -2.5), ("sc", -2.9), ("an", -3.0), ("scan", -10.0),
    ("ab", -2.8), ("abc", -2.6))

  private def seg(words: Seq[String], ps: Seq[(String, Double)] = pieces) =
    UnigramTok.segmentWords(words.toDF("word"), ps)
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[String](1)).map(_.toSeq).orNull).toMap

  test("Viterbi optimizes globally: the cheap long piece loses") {
    val got = seg(Seq("scan", "abc", "abcd", "ban"))
    // greedy longest-match would take "scan" (-10); the optimum is
    // sc+an (-5.9) — the property that separates this family
    assert(got("scan") == Seq("sc", "an"))
    assert(got("abc") == Seq("abc"), "-2.6 beats ab+c (-5.0) and a+b+c (-6.3)")
    assert(got("abcd") == Seq("abc", "d"), "-4.9 beats ab+c+d (-7.3)")
    assert(got("ban") == Seq("b", "an"))
  }

  test("uncoverable words fall to <unk> whole; empty and null keep contracts") {
    val got = UnigramTok.segmentWords(
        Seq[Option[String]](Some("axq"), Some(""), None, Some("ab"))
          .toDF("word"), pieces)
      .collect().map(r => Option(r.getString(0)) ->
        Option(r.getSeq[String](1)).map(_.toSeq)).toMap
    assert(got(Some("axq")) == Some(Seq(UnigramTok.Unk)), "no cover for x/q")
    assert(got(Some("")) == Some(Seq.empty))
    assert(got(None).isEmpty)
    assert(got(Some("ab")) == Some(Seq("ab")))
  }

  /** Exhaustive driver-side enumeration: every segmentation's score via
    * the same left-to-right fold; argmax by (score, then the engine's
    * earliest-split preference is irrelevant when probs are tie-free).
    */
  private def brute(word: String,
                    ps: Map[String, Double]): Option[(Seq[String], Double)] = {
    val syms = BpeTrain.codePointSyms(word)
    def go(i: Int): Seq[(List[String], Double)] =
      if (i == syms.length) Seq((Nil, 0.0))
      else (i + 1 to syms.length).flatMap { j =>
        val piece = syms.slice(i, j).mkString
        ps.get(piece).toSeq.flatMap { lp =>
          go(j).map { case (rest, s) => (piece :: rest, lp + s) }
        }
      }
    // rebuild the score LEFT-to-right for bit-parity with the DP
    def lscore(segm: Seq[String]): Double =
      segm.foldLeft(0.0)((acc, p) => acc + ps(p))
    val all = go(0).map { case (segm, _) => (segm, lscore(segm)) }
    if (all.isEmpty) None else Some(all.maxBy(_._2))
  }

  test("random piece tables: Viterbi == exhaustive enumeration (tie-free)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcd"
      // distinct random logps -> ties have measure zero; assert score
      // equality always, sequence equality when the argmax is unique
      val ps = (alphabet.map(_.toString) ++
        Seq.fill(8)(Seq.fill(2 + rnd.nextInt(2))(
          alphabet(rnd.nextInt(4))).mkString))
        .distinct.map(p => p -> (-1.0 - rnd.nextDouble() * 4)).toSeq
      val table = UnigramTok.pieceTable(ps)
      val psMap = ps.toMap
      val words = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(7))(alphabet(rnd.nextInt(4))).mkString)
      words.foreach { w =>
        val got = UnigramTok.segmentSyms(
          BpeTrain.codePointSyms(w), table, UnigramTok.Unk).toSeq
        brute(w, psMap) match {
          case None => assert(got == Seq(UnigramTok.Unk), s"word $w")
          case Some((bestSeq, bestScore)) =>
            val gotScore = got.foldLeft(0.0)((acc, p) => acc + psMap(p))
            assert(gotScore == bestScore,
              s"word $w: viterbi $got ($gotScore) vs brute $bestSeq ($bestScore)")
            assert(got == bestSeq, s"word $w (scores tied? $gotScore)")
        }
      }
    }
  }

  test("tokenCounts: per-doc sums, unk words count one") {
    val docs = Seq((1L, "ab scan xq"), (2L, "abc abc")).toDF("doc_id", "text")
    val got = UnigramTok.tokenCounts(docs, "doc_id", "text", pieces)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ab=1, scan=2 (sc+an), xq=<unk>=1 -> 4; abc=1 twice -> 2
    assert(got == Map(1L -> 4L, 2L -> 2L))
  }

  test("guards: empty table, empty piece, duplicates, NaN refuse") {
    intercept[IllegalArgumentException] { UnigramTok.pieceTable(Seq.empty) }
    intercept[IllegalArgumentException] {
      UnigramTok.pieceTable(Seq(("", -1.0)))
    }
    intercept[IllegalArgumentException] {
      UnigramTok.pieceTable(Seq(("a", -1.0), ("a", -2.0)))
    }
    intercept[IllegalArgumentException] {
      UnigramTok.pieceTable(Seq(("a", Double.NaN)))
    }
  }
}
