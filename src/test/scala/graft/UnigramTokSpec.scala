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

  test("vocabIds: model-order ids + unk one past the end; malformed refuse") {
    val ps = Seq(("a", -2.0), ("ab", -2.5), ("b", -2.1))
    assert(UnigramTok.vocabIds(ps) ==
      Seq(("a", 0L), ("ab", 1L), ("b", 2L), (UnigramTok.Unk, 3L)))
    intercept[IllegalArgumentException] {
      UnigramTok.vocabIds(Seq(("a", -1.0), ("a", -2.0)))
    }
    intercept[IllegalArgumentException] {
      UnigramTok.vocabIds(Seq(("a", -1.0), ("x", -2.0)), unk = "x")
    }
  }

  test("tokenIds: positions order by (word, within-word); unk id total") {
    val docs = Seq((1L, "ab scan xq"), (2L, "abc")).toDF("doc_id", "text")
    val got = UnigramTok.tokenIds(docs, "doc_id", "text", pieces)
      .orderBy($"doc_id", $"pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val idOf = UnigramTok.vocabIds(pieces).toMap
    // ab -> [ab]; scan -> [sc, an]; xq -> [<unk>]; abc -> [abc]
    val want = Seq(
      (1L, 0L, idOf("ab")), (1L, 1L, idOf("sc")), (1L, 2L, idOf("an")),
      (1L, 3L, idOf(UnigramTok.Unk)), (2L, 0L, idOf("abc")))
    assert(got.toSeq == want, s"got ${got.toSeq}")
    intercept[IllegalArgumentException] {
      UnigramTok.tokenIds(docs.withColumnRenamed("doc_id", "token"),
        "token", "text", pieces)
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

  // -----------------------------------------------------------------
  // EM training (the t28/t29 rows)
  // -----------------------------------------------------------------

  /** Independent E-step replica: enumerate every segmentation with a
    * running probability product (the t28 oracle's method), expected
    * count = per-piece summed mass / total mass. Under dyadic probs the
    * arithmetic is exact, so parity with the engine's forward–backward
    * is asserted BIT-EXACTLY.
    */
  private def bruteExpected(word: String, ps: Map[String, Double])
      : Option[Map[String, Double]] = {
    val syms = BpeTrain.codePointSyms(word)
    def go(i: Int): Seq[(List[String], Double)] =
      if (i == syms.length) Seq((Nil, 1.0))
      else (i + 1 to syms.length).flatMap { j =>
        val piece = syms.slice(i, j).mkString
        ps.get(piece).toSeq.flatMap { pr =>
          go(j).map { case (rest, m) => (piece :: rest, pr * m) }
        }
      }
    val segs = go(0)
    if (segs.isEmpty) return None
    val z = segs.map(_._2).sum
    val num = scala.collection.mutable.HashMap.empty[String, Double]
    segs.foreach { case (pcs, m) =>
      pcs.foreach(p => num(p) = num.getOrElse(p, 0.0) + m)
    }
    Some(num.toMap.map { case (p, v) => (p, v / z) })
  }

  private val dyadic: Seq[(String, Double)] = Seq(
    ("a", 1.0 / 16), ("b", 1.0 / 16), ("c", 2.0 / 16), ("n", 1.0 / 16),
    ("s", 2.0 / 16), ("aa", 2.0 / 16), ("ab", 3.0 / 16), ("an", 2.0 / 16),
    ("sc", 2.0 / 16), ("scan", 1.0 / 16), ("abc", 3.0 / 16))

  test("wordExpected == enumeration bit-exactly under dyadic probs") {
    val t = UnigramTok.probTable(dyadic)
    val pm = dyadic.toMap
    Seq("a", "aaa", "abab", "scan", "abcabc", "banana", "ssccaann")
      .foreach { w =>
        val got = UnigramTok
          .wordExpected(BpeTrain.codePointSyms(w), t).map(_.toMap)
        assert(got == bruteExpected(w, pm), s"word $w")
      }
  }

  test("wordExpected: hand-checked multi-occurrence counts on 'aaa'") {
    // segs of aaa under a=1/4, aa=1/4: a|a|a (1/64), a|aa and aa|a
    // (1/16 each); Z = 9/64, e(a) = (3/64+1/16+1/16)/Z = 11/9,
    // e(aa) = (2/16)/Z = 8/9
    val t = UnigramTok.probTable(Seq(("a", 0.25), ("aa", 0.25)))
    val got = UnigramTok
      .wordExpected(BpeTrain.codePointSyms("aaa"), t).get.toMap
    assert(got("a") == 11.0 / 9 && got("aa") == 8.0 / 9, got.toString)
  }

  test("wordExpected contracts: empty word, uncoverable -> None") {
    val t = UnigramTok.probTable(dyadic)
    assert(UnigramTok.wordExpected(BpeTrain.codePointSyms(""), t)
      .get.isEmpty)
    assert(UnigramTok.wordExpected(BpeTrain.codePointSyms("xyz"), t).isEmpty)
  }

  test("wordExpected ~ enumeration under random probs (5 seeds)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcd"
      val ps = (alphabet.map(_.toString) ++
        Seq.fill(8)(Seq.fill(2 + rnd.nextInt(2))(
          alphabet(rnd.nextInt(4))).mkString))
        .distinct.map(p => p -> (0.01 + rnd.nextDouble() * 0.4)).toSeq
      val t = UnigramTok.probTable(ps)
      val pm = ps.toMap
      Seq.fill(20)(Seq.fill(1 + rnd.nextInt(7))(
        alphabet(rnd.nextInt(4))).mkString).foreach { w =>
        val got = UnigramTok
          .wordExpected(BpeTrain.codePointSyms(w), t).get.toMap
        val want = bruteExpected(w, pm).get
        assert(got.keySet == want.keySet, s"word $w")
        got.foreach { case (p, e) =>
          assert(math.abs(e - want(p)) <= 1e-12 * math.max(1.0, e),
            s"word $w piece $p: $e vs ${want(p)}")
        }
      }
    }
  }

  test("expectedCounts: distributed grain matches wordExpected per word") {
    val words = Seq("scan", "abab", "banana", "xyz", "")
    val t = UnigramTok.probTable(dyadic)
    val got = UnigramTok.expectedCounts(words.toDF("word"), dyadic)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (w, rs) =>
        (w, rs.map(r => (r._2, r._3)).toMap)
      }
    words.foreach { w =>
      UnigramTok.wordExpected(BpeTrain.codePointSyms(w), t) match {
        case Some(arr) if arr.nonEmpty => assert(got(w) == arr.toMap, w)
        case _ => assert(!got.contains(w), s"$w should emit nothing")
      }
    }
  }

  /** Full driver-side EM replica using the ENUMERATION E-step — the
    * independent algorithm the distributed fit must agree with (the
    * WordPiece fit-vs-replay discipline). Same seeding, same sorted
    * fold orders, same prune rule; only the per-word E-step method
    * differs (enumeration vs forward–backward).
    */
  private def localFit(words: Seq[(String, Long)], vocabTarget: Int,
      seedMaxLen: Int, emIters: Int, pruneKeep: Double,
      minSeedFreq: Long): Seq[(String, Double)] = {
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
    val singles = scala.collection.mutable.HashSet.empty[String]
    words.foreach { case (w, f) =>
      val syms = BpeTrain.codePointSyms(w)
      for {
        j <- syms.indices
        k <- (j + 1) to math.min(syms.length, j + seedMaxLen)
      } {
        val p = syms.slice(j, k).mkString
        cnt(p) = cnt.getOrElse(p, 0L) + f
        if (k - j == 1) singles += p
      }
    }
    val seed = cnt.toSeq
      .filter { case (p, c) => c >= minSeedFreq || singles(p) }
      .sortBy(_._1)
    val tot0 = seed.foldLeft(0.0) { case (a, (_, c)) => a + c.toDouble }
    var probs = seed.map { case (p, c) => (p, c.toDouble / tot0) }.toArray

    def bruteBest(text: String, lp: Map[String, Double],
                  excl: String): Double = {
      val syms = BpeTrain.codePointSyms(text)
      def go(i: Int): Double =
        if (i == syms.length) 0.0
        else (i + 1 to syms.length).map { j =>
          val piece = syms.slice(i, j).mkString
          if (piece == excl) Double.NegativeInfinity
          else lp.get(piece) match {
            case Some(v) =>
              val r = go(j)
              if (r == Double.NegativeInfinity) r else v + r
            case None => Double.NegativeInfinity
          }
        }.max
      go(0)
    }

    def em(cur: Array[(String, Double)]): Array[(String, Double, Double)] = {
      val pm = cur.toMap
      val perPiece = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(String, Double)]]
      words.foreach { case (w, f) =>
        bruteExpected(w, pm).foreach(_.foreach { case (p, e) =>
          perPiece.getOrElseUpdate(p,
            scala.collection.mutable.ArrayBuffer.empty) += ((w, e * f))
        })
      }
      // the engine's exact-decimal accumulation (order-independent, so the
      // replica needs no word sort — summing in any order is identical);
      // exact-zero masses drop, mirroring the engine's c > 0 filter
      val counts = perPiece.toSeq.map { case (p, wv) =>
        (p, UnigramTok.decimalFoldSum(wv.map(_._2)))
      }.filter(_._2 > 0.0).sortBy(_._1)
      // the engine's required-character floor, replicated
      val tot0 = counts.foldLeft(0.0) { case (a, (_, c)) => a + c }
      val floorC = tot0 * 1e-9
      val present = counts.iterator.map(_._1).toSet
      val all = (counts.map { case (p, c) =>
          (p, if (singles(p) && c < floorC) floorC else c)
        } ++ singles.toSeq.filterNot(present).sorted.map(p => (p, floorC)))
        .sortBy(_._1)
      val tot = all.foldLeft(0.0) { case (a, (_, c)) => a + c }
      all.map { case (p, c) => (p, c / tot, c) }.toArray
    }

    var done = false
    while (!done) {
      var last: Array[(String, Double, Double)] = null
      (1 to emIters).foreach { _ =>
        last = em(probs)
        probs = last.map { case (p, pr, _) => (p, pr) }
      }
      if (probs.length <= vocabTarget) done = true
      else {
        val logp = probs.iterator
          .map { case (p, pr) => (p, math.log(pr)) }.toMap
        val (single, multi) = last.partition { case (p, _, _) => singles(p) }
        val targetMulti = math.max(0, vocabTarget - single.length)
        val keepN = math.min(multi.length,
          math.max(targetMulti, (multi.length * pruneKeep).toInt))
        if (keepN >= multi.length) done = true
        else {
          val kept = multi.map { case (p, pr, c) =>
            val alt = bruteBest(p, logp, p)
            val loss = if (alt == Double.NegativeInfinity)
              Double.PositiveInfinity
            else c * (math.log(pr) - alt)
            (p, pr, loss)
          }.sortBy { case (p, _, loss) => (-loss, p) }.take(keepN)
          val next = (single.map { case (p, pr, _) => (p, pr) } ++
            kept.map { case (p, pr, _) => (p, pr) }).sortBy(_._1)
          val mass = next.foldLeft(0.0) { case (a, (_, pr)) => a + pr }
          probs = next.map { case (p, pr) => (p, pr / mass) }
        }
      }
    }
    probs.sortBy(_._1).map { case (p, pr) => (p, math.log(pr)) }.toSeq
  }

  private val fitCorpus: Seq[(String, Long)] = Seq(
    ("fast", 10L), ("faster", 8L), ("fastest", 6L), ("stream", 5L),
    ("stress", 4L), ("rest", 4L), ("tear", 3L), ("ear", 3L))

  test("fit matches the enumeration-based driver replica") {
    val df = fitCorpus.toDF("word", "freq")
    val got = UnigramTok.fit(df, vocabTarget = 20, seedMaxLen = 4,
      emIters = 2, pruneKeep = 0.5, minSeedFreq = 2L)
    val want = localFit(fitCorpus, 20, 4, 2, 0.5, 2L)
    assert(got.map(_._1) == want.map(_._1),
      s"piece sets differ:\n got=${got.map(_._1)}\nwant=${want.map(_._1)}")
    got.zip(want).foreach { case ((p, lg), (_, lw)) =>
      assert(math.abs(lg - lw) <= 1e-9, s"piece $p: $lg vs $lw")
    }
  }

  test("fit: singles survive, target respected, serving covers corpus") {
    val df = fitCorpus.toDF("word", "freq")
    val trained = UnigramTok.fit(df, vocabTarget = 14, seedMaxLen = 4,
      emIters = 2, minSeedFreq = 2L)
    val pieces = trained.map(_._1).toSet
    val chars = fitCorpus.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing singles: ${chars -- pieces}")
    assert(trained.size <= 14)
    assert(trained.exists(_._1.length > 1), "no multi-symbol piece learned")
    // the trained table must serve every corpus word without <unk>
    val seg = UnigramTok.segmentWords(
        fitCorpus.map(_._1).toDF("word"), trained)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    fitCorpus.foreach { case (w, _) =>
      assert(!seg(w).contains(UnigramTok.Unk), s"$w fell to unk")
      assert(seg(w).mkString == w, s"$w pieces don't reassemble")
    }
  }

  // -----------------------------------------------------------------
  // Sampled segmentation (Kudo §3.5 — the t31 row)
  // -----------------------------------------------------------------

  /** Independent FFBS replica: prefix masses built by ENUMERATION (not
    * the engine's forward recurrence), the same md5 draw and min-j pick
    * rule — the t31 oracle's method in Scala.
    */
  private def bruteSample(word: String, ps: Map[String, Double],
                          seed: String): Option[Seq[String]] = {
    val syms = BpeTrain.codePointSyms(word)
    val n = syms.length
    val maxLen = ps.keys.map(p => p.codePointCount(0, p.length)).max
    // alpha(i) by enumeration: sum over all partial segmentations of
    // syms[0..i)
    def mass(i: Int): Double = {
      def go(k: Int): Seq[Double] =
        if (k == i) Seq(1.0)
        else (k + 1 to math.min(i, k + maxLen)).flatMap { j =>
          ps.get(syms.slice(k, j).mkString).toSeq.flatMap { pr =>
            go(j).map(pr * _)
          }
        }
      go(0).sum
    }
    val a = (0 to n).map(mass)
    if (a(n) == 0.0) return None
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val u = UnigramTok.draw60(s"$seed|$word|$pos").toDouble /
        1152921504606846976.0
      val thr = u * a(pos)
      var cum = 0.0
      var pick = -1
      var j = math.max(0, pos - maxLen)
      while (j < pos && pick < 0) {
        if (a(j) != 0.0) ps.get(syms.slice(j, pos).mkString).foreach { p =>
          cum += a(j) * p
          if (cum > thr) pick = j
        }
        j += 1
      }
      out.prepend(syms.slice(pick, pos).mkString)
      pos = pick
    }
    Some(out.toList)
  }

  test("sampleSyms == enumeration-mass FFBS replica under dyadic probs") {
    val t = UnigramTok.probTable(dyadic)
    val pm = dyadic.toMap
    Seq("a", "aaa", "abab", "scan", "abcabc", "banana", "ssccaann")
      .foreach { w =>
        (1 to 4).foreach { s =>
          val got = UnigramTok.sampleSyms(
            BpeTrain.codePointSyms(w), t, 1.0, s"seed$s", w, UnigramTok.Unk)
          bruteSample(w, pm, s"seed$s") match {
            case Some(want) => assert(got.toSeq == want, s"word $w seed $s")
            case None => assert(got.toSeq == Seq(UnigramTok.Unk), s"word $w")
          }
        }
      }
  }

  test("sampling frequencies approximate the posterior on 'aaa'") {
    // segs of aaa under a=1/4, aa=1/4: posterior 1/9, 4/9, 4/9
    val t = UnigramTok.probTable(Seq(("a", 0.25), ("aa", 0.25)))
    val counts = scala.collection.mutable.HashMap.empty[Seq[String], Int]
    (1 to 900).foreach { s =>
      val seg = UnigramTok.sampleSyms(
        BpeTrain.codePointSyms("aaa"), t, 1.0, s"e$s", "aaa",
        UnigramTok.Unk).toSeq
      counts(seg) = counts.getOrElse(seg, 0) + 1
    }
    val f3 = counts.getOrElse(Seq("a", "a", "a"), 0) / 900.0
    val fLeft = counts.getOrElse(Seq("a", "aa"), 0) / 900.0
    val fRight = counts.getOrElse(Seq("aa", "a"), 0) / 900.0
    assert(math.abs(f3 - 1.0 / 9) < 0.06, s"a|a|a at $f3")
    assert(math.abs(fLeft - 4.0 / 9) < 0.06, s"a|aa at $fLeft")
    assert(math.abs(fRight - 4.0 / 9) < 0.06, s"aa|a at $fRight")
  }

  test("large alpha approaches the Viterbi argmax; contracts hold") {
    // at alpha = 60 the argmax dominates every draw (tie-free table)
    val probs = Seq(("a", 0.0625), ("b", 0.0625), ("c", 0.125),
      ("n", 0.0625), ("s", 0.125), ("sc", 0.125), ("an", 0.125),
      ("scan", 0.001), ("ab", 0.1875), ("abc", 0.1875))
    val logp = probs.map { case (p, pr) => (p, math.log(pr)) }
    val t = UnigramTok.probTable(probs)
    val lt = UnigramTok.pieceTable(logp)
    Seq("scan", "abc", "ban", "abcabc").foreach { w =>
      val vit = UnigramTok.segmentSyms(
        BpeTrain.codePointSyms(w), lt, UnigramTok.Unk).toSeq
      (1 to 3).foreach { s =>
        val got = UnigramTok.sampleSyms(
          BpeTrain.codePointSyms(w), t, 60.0, s"x$s", w, UnigramTok.Unk)
        assert(got.toSeq == vit, s"word $w seed $s: $got vs $vit")
      }
    }
    // determinism + the word-grain contracts on the DataFrame face
    val df = Seq[Option[String]](Some("scan"), Some(""), None, Some("xyz"))
      .toDF("word")
    val got = UnigramTok.sampleSegmentWords(df, dyadic, "s1")
      .collect().map(r => Option(r.getString(0)) ->
        Option(r.getSeq[String](1)).map(_.toSeq)).toMap
    assert(got(Some("xyz")) == Some(Seq(UnigramTok.Unk)))
    assert(got(Some("")) == Some(Seq.empty))
    assert(got(None).isEmpty)
    val again = UnigramTok.sampleSegmentWords(df, dyadic, "s1")
      .collect().map(r => Option(r.getString(0)) ->
        Option(r.getSeq[String](1)).map(_.toSeq)).toMap
    assert(again == got, "same seed must reproduce the same sample")
    intercept[IllegalArgumentException] {
      UnigramTok.sampleSegmentWords(df, dyadic, "s1", alpha = 0.0)
    }
  }

  /** Quantized-EM replica by ENUMERATION — the t29b oracle's method in
    * Scala: per-word expectations via [[bruteExpected]] (never
    * forward–backward), the same grid rounding (string-decimal HALF_UP,
    * [[UnigramTok.quantize]]), exact BigDecimal per-piece sums, one
    * double division per normalize. Bit-equality with the engine's
    * distributed chain is exactly the property that makes the t29b hash
    * row sound: grid values are lossless in any engine, and within-round
    * last-bit noise (enumeration vs forward–backward) is absorbed by the
    * quantization.
    */
  private def localEmChain(words: Seq[(String, Long)],
      seed: Seq[(String, Double)], iters: Int,
      scale: Int,
      margin: (Double, String) => Unit = (_, _) => ())
      : Seq[(String, Double, Double)] = {
    val Zero = java.math.BigDecimal.ZERO
    def dec(v: Double) =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(scale, java.math.RoundingMode.HALF_UP)
    var cur = seed
    var out: Seq[(String, Double, Double)] = null
    (1 to iters).foreach { it =>
      val pm = cur.toMap
      val acc = scala.collection.mutable.HashMap.empty[String, java.math.BigDecimal]
      words.foreach { case (w, f) =>
        bruteExpected(w, pm).foreach(_.foreach { case (p, e) =>
          margin(e * f.toDouble, s"it$it e*f $w/$p")
          val v = UnigramTok.quantize(e * f.toDouble, scale)
          acc(p) = acc.getOrElse(p, Zero).add(dec(v))
        })
      }
      val counts = acc.toSeq.filter(_._2.signum > 0).sortBy(_._1)
      val tot = counts.map(_._2).fold(Zero)(_.add(_)).doubleValue
      counts.foreach { case (p, c) =>
        margin(c.doubleValue / tot, s"it$it M $p") }
      out = counts.map { case (p, c) =>
          (p, UnigramTok.quantize(c.doubleValue / tot, scale), c.doubleValue) }
        .filter { case (_, pr, _) => pr > 0.0 }
      cur = out.map { case (p, pr, _) => (p, pr) }
    }
    out
  }

  /** Driver-side replica of [[UnigramTok.quantizedFit]] using the
    * ENUMERATION E-step — the independent algorithm the distributed t29d
    * trainer must agree with, with a hook reporting every PRE-QUANTIZE
    * value so the margin audit can check grid-boundary distances.
    */
  private def localQuantFit(words: Seq[(String, Long)], vocabTarget: Int,
      emIters: Int, pruneKeep: Double, floorFrac: Double, maxRounds: Int,
      margin: (Double, String) => Unit = (_, _) => ())
      : Seq[(String, Double)] = {
    val Zero = java.math.BigDecimal.ZERO
    def dec(v: Double) =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    def decSum(vs: Iterable[Double]): Double =
      vs.map(dec).fold(Zero)(_.add(_)).doubleValue
    // seed: every substring <= 4 with freq-weighted count >= 2; singles
    // unconditionally kept
    val sc = scala.collection.mutable.Map.empty[String, (Long, Boolean)]
    words.foreach { case (w, f) =>
      if (w != null && w.nonEmpty) {
        val syms = BpeTrain.codePointSyms(w)
        for (j <- syms.indices; k <- (j + 1) to math.min(syms.length, j + 4)) {
          val p = syms.slice(j, k).mkString
          val (c, s) = sc.getOrElse(p, (0L, false))
          sc(p) = (c + f, s || k - j == 1)
        }
      }
    }
    val seed = sc.toArray.collect {
      case (p, (c, s)) if c >= 2L || s => (p, c) }.sortBy(_._1)
    val singles = sc.collect { case (p, (_, true)) => p }.toSet
    val seedTotal = seed.foldLeft(0L) { case (a, (_, c)) => a + c }
    seed.foreach { case (p, c) =>
      margin(c.toDouble / seedTotal.toDouble, s"seed $p") }
    var probs: Array[(String, Double)] = seed
      .map { case (p, c) =>
        (p, UnigramTok.quantize(c.toDouble / seedTotal.toDouble, 6)) }
      .filter(_._2 > 0.0)
    var done = false
    var rounds = 0
    var last: Array[(String, Double, Double)] = null
    while (!done) {
      assert(rounds < maxRounds, s"replica did not converge in $maxRounds")
      (1 to emIters).foreach { _ =>
        val pm = probs.toMap
        val acc = scala.collection.mutable.HashMap.empty[String, java.math.BigDecimal]
        words.foreach { case (w, f) =>
          bruteExpected(w, pm).foreach(_.foreach { case (p, e) =>
            margin(e * f.toDouble, s"r$rounds e*f $w/$p")
            acc(p) = acc.getOrElse(p, Zero)
              .add(dec(UnigramTok.quantize(e * f.toDouble, 6)))
          })
        }
        val counts = acc.toSeq.filter(_._2.signum > 0).sortBy(_._1)
          .map { case (p, c) => (p, c.doubleValue) }
        val tot0 = decSum(counts.map(_._2))
        margin(tot0 * floorFrac, s"r$rounds floor")
        val fl = UnigramTok.quantize(tot0 * floorFrac, 6)
        assert(fl > 0.0, "replica floor rounded to zero")
        val present = counts.iterator.map(_._1).toSet
        val all = (counts.map { case (p, c) =>
            (p, if (singles(p) && c < fl) fl else c)
          } ++ singles.toSeq.filterNot(present).sorted.map(p => (p, fl)))
          .sortBy(_._1)
        val tot = decSum(all.map(_._2))
        all.foreach { case (p, c) => margin(c / tot, s"r$rounds M $p") }
        last = all.map { case (p, c) =>
            (p, UnigramTok.quantize(c / tot, 6), c) }
          .filter { case (_, pr, _) => pr > 0.0 }.toArray
        probs = last.map { case (p, pr, _) => (p, pr) }
      }
      if (probs.length <= vocabTarget) done = true
      else {
        val (next, noop) =
          UnigramTok.pruneKept(last, singles, vocabTarget, pruneKeep)
        if (noop) done = true
        else {
          val mass = decSum(next.map(_._2))
          next.foreach { case (p, pr) =>
            margin(pr / mass, s"r$rounds renorm $p") }
          probs = next.map { case (p, pr) =>
            (p, UnigramTok.quantize(pr / mass, 6)) }
        }
      }
      rounds += 1
    }
    probs.sortBy(_._1).toSeq
  }

  // a dyadic seed that COVERS fitCorpus (letters f,a,s,t,e,r,m) — the
  // quantized chain's contract, like fit's seed singles
  private val fitDyadic: Seq[(String, Double)] =
    "fastermu".map(c => (c.toString, 1.0 / 16)) ++ Seq(
      ("st", 2.0 / 16), ("ea", 2.0 / 16), ("er", 2.0 / 16),
      ("re", 2.0 / 16), ("fast", 3.0 / 16), ("ast", 2.0 / 16))

  test("emIterations == enumeration replica BIT-exactly (fit corpus)") {
    val df = fitCorpus.toDF("word", "freq")
    (1 to 3).foreach { iters =>
      val got = UnigramTok.emIterations(df, fitDyadic, iters)
      val want = localEmChain(fitCorpus, fitDyadic, iters, 6)
        .map { case (p, pr, _) => (p, pr) }
      assert(got == want, s"iters=$iters:\n got=$got\nwant=$want")
    }
  }

  test("emIterations == enumeration replica on the REAL gate corpus (t29b shape)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val wf = BpeTrain.wordFreq(docs, "text")
    val words = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = UnigramTok.emIterations(wf, Queries.FixedUgProbs, iters = 2)
    val want = localEmChain(words, Queries.FixedUgProbs, 2, 6)
      .map { case (p, pr, _) => (p, pr) }
    assert(got == want)
    assert(got.nonEmpty && got.forall { case (_, pr) => pr > 0 && pr < 1 })
    // every output is a 1e-6 grid point — the lossless-cast contract
    got.foreach { case (p, pr) =>
      assert(UnigramTok.quantize(pr, 6) == pr, s"$p off-grid: $pr")
    }
  }

  test("emPruneOnce: fit-consistent keep rule, grid renormalize, guards") {
    val df = fitCorpus.toDF("word", "freq")
    val full = UnigramTok.emIterations(df, fitDyadic, iters = 2)
    // prune to fewer pieces than survive EM: singles stay, mass re-grids
    val pruned = UnigramTok.emPruneOnce(df, fitDyadic, iters = 2,
      vocabTarget = 9, pruneKeep = 0.34)
    assert(pruned.size < full.size, s"no prune: ${full.size} -> ${pruned.size}")
    val singles = fitDyadic.map(_._1).filter(_.length == 1).toSet
    val kept = pruned.map(_._1).toSet
    assert(full.map(_._1).filter(singles).forall(kept),
      "surviving singles must never be pruned")
    pruned.foreach { case (p, pr) =>
      assert(UnigramTok.quantize(pr, 6) == pr, s"$p off-grid: $pr") }
    // generous target -> prune is a no-op on the EM output
    val noop = UnigramTok.emPruneOnce(df, fitDyadic, iters = 2,
      vocabTarget = 1000, pruneKeep = 0.5)
    assert(noop.map(_._1) == full.map(_._1))
    intercept[IllegalArgumentException] {
      UnigramTok.emIterations(df, fitDyadic, iters = 0) }
    intercept[IllegalArgumentException] {
      UnigramTok.emIterations(df, fitDyadic, iters = 1, quantScale = 0) }
    intercept[IllegalArgumentException] {
      UnigramTok.emPruneOnce(df, fitDyadic, 1, vocabTarget = 0) }
  }

  test("t29c keep boundary is robust to libm last-bit noise (gate corpus)") {
    // the prune's kept SET is the only thing `ln` influences (the output
    // probs are grid arithmetic); cross-engine log differences are ~1 ulp,
    // so the gate is sound iff the loss gap AT THE KEEP BOUNDARY dwarfs
    // that noise — pinned here on the exact t29c configuration
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val wf = BpeTrain.wordFreq(docs, "text")
    val last = UnigramTok.emChain(wf, Queries.FixedUgProbs, 2, 6)
    val singles = Queries.FixedUgProbs.map(_._1)
      .filter(p => p.codePointCount(0, p.length) == 1).toSet
    val (single, multi) = last.partition { case (p, _, _) => singles(p) }
    val targetMulti = math.max(0, 30 - single.length)
    val keepN = math.min(multi.length,
      math.max(targetMulti, (multi.length * 0.5).toInt))
    assert(keepN > 0 && keepN < multi.length, "t29c must really prune")
    val logp = last.map { case (p, pr, _) => (p, math.log(pr)) }.toMap
    val maxLen = last.map { case (p, _, _) => p.codePointCount(0, p.length) }.max
    val losses = multi.map { case (p, pr, c) =>
      val alt = UnigramTok.viterbiScore(
        BpeTrain.codePointSyms(p), logp, maxLen, p)
      c * (math.log(pr) - alt)
    }.sorted(Ordering[Double].reverse)
    val gap = losses(keepN - 1) - losses(keepN)
    assert(gap > 1e-6 * math.max(1.0, losses(keepN - 1).abs),
      s"keep-boundary gap $gap too narrow: ${losses(keepN - 1)} vs ${losses(keepN)}")
  }

  test("quantizedFit == enumeration replica on the REAL gate corpus (t29d shape)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val wf = BpeTrain.wordFreq(docs, "text")
    val words = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = UnigramTok.quantizedFit(wf, vocabTarget = 60,
      emIters = 1, pruneKeep = 0.5, maxRounds = 8)
    val want = localQuantFit(words, vocabTarget = 60,
      emIters = 1, pruneKeep = 0.5, floorFrac = 1e-6, maxRounds = 8)
    assert(got == want, {
      val g = got.toMap; val w = want.toMap
      val ks = (g.keySet ++ w.keySet).filter(k => g.get(k) != w.get(k))
      s"diverge at $ks: got=${ks.map(g.get)}, want=${ks.map(w.get)}"
    })
    // the trainer's contract: at/under target, singles alive, grid output
    assert(got.size <= 60 && got.nonEmpty)
    val singles = got.map(_._1).filter(_.length == 1).toSet
    assert(singles.nonEmpty, "coverage singles must survive the full fit")
    got.foreach { case (p, pr) =>
      assert(UnigramTok.quantize(pr, 6) == pr, s"$p off-grid: $pr") }
  }

  test("quantizedFit guards refuse loudly") {
    val df = fitCorpus.toDF("word", "freq")
    intercept[IllegalArgumentException] { UnigramTok.quantizedFit(df, 0) }
    intercept[IllegalArgumentException] {
      UnigramTok.quantizedFit(df, 5, emIters = 0) }
    intercept[IllegalArgumentException] {
      UnigramTok.quantizedFit(df, 5, pruneKeep = 1.0) }
    intercept[IllegalArgumentException] {
      UnigramTok.quantizedFit(df, 5, floorFrac = 0.0) }
    intercept[IllegalArgumentException] {
      UnigramTok.quantizedFit(df, 5, maxRounds = 0) }
    // non-convergence within maxRounds is LOUD, not a silent truncation —
    // a 1-round budget cannot complete the prune loop on this corpus
    val ex = intercept[IllegalArgumentException] {
      UnigramTok.quantizedFit(df, vocabTarget = 2, emIters = 1,
        pruneKeep = 0.9, maxRounds = 1)
    }
    assert(ex.getMessage.contains("maxRounds"), ex.getMessage)
  }

  test("rounding-boundary margins on the gate corpus: t29b/t29c/t29d pre-quantize values sit far from .5 (ADVICE r18)") {
    // Spark's round (BigDecimal-over-Double.toString, HALF_UP) and
    // DuckDB's round (half-away-from-zero on the exact binary value)
    // agree EXCEPT within ~1 ulp of a .5 grid boundary; the engines also
    // differ by last-bit noise (enumeration vs forward-backward) BEFORE
    // rounding. The gates are sound iff every value either engine rounds
    // sits far from the boundary relative to that noise — checked here
    // for every pre-quantize value of the exact gate configurations.
    var checked = 0L
    def gridMargin(v: Double, what: String): Unit = {
      val sc = v * 1e6
      assert(!sc.isNaN && !sc.isInfinite, s"$what: non-finite $v")
      if (what.contains("e*f")) {
        // NOISE-BEARING values (enumeration vs forward-backward compute
        // e differently): the boundary distance must dwarf the last-bit
        // noise — threshold 1000x an ulp of the scaled value
        val d = math.abs((sc - math.floor(sc)) - 0.5)
        assert(d > math.max(1e-9, Math.ulp(sc) * 1e3),
          s"$what: $v sits $d from the .5 boundary (scaled $sc)")
      } else {
        // IDENTICAL-OPERAND values (decimal-sum divisions, the floor
        // product, seed integer ratios): both engines hold the same
        // double, so only CONVENTION agreement matters — Spark's
        // toString-HALF_UP == exact-binary HALF_UP, and the float-scaled
        // value must not land EXACTLY on .5 (the one case a half-away
        // float path could split from exact-binary)
        val spark6 = UnigramTok.quantize(v, 6)
        // DuckDB's DOUBLE round: std::round(v * 10^6) / 10^6 — float
        // multiply, half AWAY from zero (the r18 memory-note convention)
        val duck6 = (if (sc >= 0) math.floor(sc + 0.5)
                     else math.ceil(sc - 0.5)) / 1e6
        assert(spark6 == duck6,
          s"$what: $v rounds differently by convention ($spark6 vs $duck6)")
      }
      checked += 1
    }
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val words = BpeTrain.wordFreq(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // t29b/t29c: two chained rounds under the dyadic fixture seed; the
    // t29c renorm divisions
    val last = localEmChain(words, Queries.FixedUgProbs, 2, 6, gridMargin)
    val singles = Queries.FixedUgProbs.map(_._1)
      .filter(p => p.codePointCount(0, p.length) == 1).toSet
    val (next, noop) = UnigramTok.pruneKept(last.toArray, singles, 30, 0.5)
    assert(!noop, "t29c must really prune")
    val mass = UnigramTok.decimalFoldSum(next.map(_._2), 6)
    next.foreach { case (p, pr) => gridMargin(pr / mass, s"t29c renorm $p") }
    // t29d: the full trainer's margins, exact gate configuration
    localQuantFit(words, vocabTarget = 60, emIters = 1, pruneKeep = 0.5,
      floorFrac = 1e-6, maxRounds = 8, margin = gridMargin)
    info(s"checked $checked pre-quantize values")
    assert(checked > 1000, s"audit too small: $checked")
  }

  test("t29d keep boundary is robust to libm last-bit noise at every pruning round (gate corpus)") {
    // same discipline as the t29c boundary test, but per ROUND of the
    // full trainer: ln enters only the kept-set ordering, so each round's
    // loss gap at its keep boundary must dwarf ~1-ulp libm differences
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val wf = BpeTrain.wordFreq(docs, "text")
    val words = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // replay the trainer, checking the gap whenever a prune fires
    var prunes = 0
    val Zero = java.math.BigDecimal.ZERO
    def dec(v: Double) = new java.math.BigDecimal(
      java.lang.Double.toString(v)).setScale(6, java.math.RoundingMode.HALF_UP)
    val sc = scala.collection.mutable.Map.empty[String, (Long, Boolean)]
    words.foreach { case (w, f) =>
      val syms = BpeTrain.codePointSyms(w)
      for (j <- syms.indices; k <- (j + 1) to math.min(syms.length, j + 4)) {
        val p = syms.slice(j, k).mkString
        val (c, s) = sc.getOrElse(p, (0L, false))
        sc(p) = (c + f, s || k - j == 1)
      }
    }
    val seed = sc.toArray.collect {
      case (p, (c, s)) if c >= 2L || s => (p, c) }.sortBy(_._1)
    val singles = sc.collect { case (p, (_, true)) => p }.toSet
    val seedTotal = seed.map(_._2).sum
    var probs = seed.map { case (p, c) =>
      (p, UnigramTok.quantize(c.toDouble / seedTotal.toDouble, 6)) }
      .filter(_._2 > 0.0)
    var done = false
    var rounds = 0
    while (!done && rounds < 8) {
      val last = UnigramTok.emRoundFloor(
        wf, probs, singles, 1e-6, 6)
      probs = last.map { case (p, pr, _) => (p, pr) }
      if (probs.length <= 60) done = true
      else {
        val (single, multi) = last.partition { case (p, _, _) => singles(p) }
        val keepN = math.min(multi.length,
          math.max(math.max(0, 60 - single.length), (multi.length * 0.5).toInt))
        if (keepN >= multi.length) done = true
        else {
          val logp = last.map { case (p, pr, _) => (p, math.log(pr)) }.toMap
          val maxLen = last.map { case (p, _, _) =>
            p.codePointCount(0, p.length) }.max
          val losses = multi.map { case (p, pr, c) =>
            val alt = UnigramTok.viterbiScore(
              BpeTrain.codePointSyms(p), logp, maxLen, p)
            c * (math.log(pr) - alt)
          }.sorted(Ordering[Double].reverse)
          val gap = losses(keepN - 1) - losses(keepN)
          assert(gap > 1e-6 * math.max(1.0, losses(keepN - 1).abs),
            s"round $rounds keep-boundary gap $gap too narrow")
          prunes += 1
          val (next, _) = UnigramTok.pruneKept(last, singles, 60, 0.5)
          probs = UnigramTok.renormGrid(next, 6)
        }
      }
      rounds += 1
    }
    assert(done, "gate configuration must converge within the unroll")
    assert(prunes >= 2, s"gate configuration must prune repeatedly: $prunes")
  }

  test("sampledTokenIds: the epoch story — seeds resample, a seed reproduces, packs feed") {
    // "aaa" has a FLAT posterior under `dyadic` (a|aa vs aa|a split the
    // mass), so nearby seeds genuinely resample it
    val docs = Seq((1L, "ab scan ab"), (2L, "abc b scan"),
      (3L, "abab aa"), (4L, "aaa aaa"))
      .toDF("doc_id", "text")
    // probs: dyadic table reused; ids are model order over the SAME table
    def epoch(seed: String) = UnigramTok.sampledTokenIds(
        docs, "doc_id", "text", dyadic, seed)
      .orderBy($"doc_id", $"pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val e1 = epoch("epoch1")
    val e1again = epoch("epoch1")
    assert(e1 == e1again, "one seed must be bit-stable")
    // at least one of a few epochs must differ (the corpus has words with
    // multiple segmentations under `dyadic` — e.g. abab, aa)
    assert((2 to 10).exists(k => epoch(s"epoch$k") != e1),
      "different seeds should eventually resample a segmentation")
    // ids stay in-model: every id < |pieces| + 1 (unk one past the end)
    assert(e1.forall(_._3 <= dyadic.size.toLong))
    // each epoch's frame feeds the packer directly (the training loop's
    // per-epoch composition); same seed -> same tensors
    def pack(seed: String) = graft.operators.SequencePack.packTokenIds(
        UnigramTok.sampledTokenIds(docs, "doc_id", "text", dyadic, seed),
        "doc_id", ctxLen = 4)
      .orderBy($"chunk_id").collect().map(_.toSeq).toSeq
    assert(pack("epoch1") == pack("epoch1"), "pack must be seed-stable")
  }

  test("emIters chains: later iterations re-estimate from the previous") {
    // with vocabTarget above the seed size no pruning happens, so any
    // difference between 1 and 3 iterations is pure EM chaining — the
    // self-review r17 regression pin (an earlier form re-ran the E-step
    // on the unchanged table, making emIters a no-op)
    val df = fitCorpus.toDF("word", "freq")
    val one = UnigramTok.fit(df, vocabTarget = 500, emIters = 1,
      minSeedFreq = 2L)
    val three = UnigramTok.fit(df, vocabTarget = 500, emIters = 3,
      minSeedFreq = 2L)
    assert(one.map(_._1) == three.map(_._1), "piece set stable without pruning")
    assert(one != three, "EM iterations must move the estimate")
  }

  test("fit guards: bad params and maxVocab refuse loudly") {
    val df = fitCorpus.toDF("word", "freq")
    intercept[IllegalArgumentException] { UnigramTok.fit(df, 0) }
    intercept[IllegalArgumentException] { UnigramTok.fit(df, 5, emIters = 0) }
    intercept[IllegalArgumentException] {
      UnigramTok.fit(df, 5, pruneKeep = 1.0)
    }
    intercept[IllegalArgumentException] {
      UnigramTok.fit(df, 5, maxVocab = 3L)
    }
  }
}
