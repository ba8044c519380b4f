package graft

import graft.operators.{BpeTrain, RegexPreTok, SpacePreTok}
import org.apache.spark.sql.functions._

/** BPE tokenizer training pinned against an INDEPENDENT driver-side
  * replay of the published algorithm (plain Scala strings and lists, no
  * shared code with the operator): same merges, same segmentations, same
  * tie-breaks — on the real documents table, not a toy.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Greedy left-to-right single-pair merge — the reference semantics. */
  private def greedyMerge(s: List[String], p: (String, String)): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == p._1 && s(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toList
  }

  /** Sennrich et al.'s training loop, replayed on the driver. */
  private def replayFit(words: Map[String, Long], k: Int)
      : (Seq[(String, String)], Map[String, List[String]]) = {
    var segs: Map[String, (List[String], Long)] =
      words.map { case (w, f) => w -> (w.split("").toList, f) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.length < k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((_, (s, f)) <- segs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        segs = segs.map { case (w, (s, f)) => w -> (greedyMerge(s, best), f) }
      }
    }
    (merges.toSeq, segs.map { case (w, (s, _)) => w -> s })
  }

  private def corpusWords: Map[String, Long] =
    BpeTrain.wordFreq(Tables.documents(spark, Sf0001), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("fit: 10 merges on the real table match the independent replay, in order") {
    val words = corpusWords
    val (goldMerges, goldSegs) = replayFit(words, 10)
    val wordsDf = words.toSeq.toDF("word", "freq")
    val got = BpeTrain.fit(wordsDf, 10)
    assert(got == goldMerges, s"merges diverge:\n got $got\nwant $goldMerges")
    // and the engine's segmentation under those merges matches word for word
    val segGot = BpeTrain.segmentWords(wordsDf, got)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(segGot == goldSegs)
  }

  test("greedy fold semantics: repeated-symbol runs merge left-to-right") {
    val words = Seq(("aaaa", 1L), ("aaa", 1L), ("aaaaa", 1L)).toDF("word", "freq")
    val seg = BpeTrain.segmentWords(words, Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(seg("aaaa") == List("aa", "aa"))
    assert(seg("aaa") == List("aa", "a"))
    assert(seg("aaaaa") == List("aa", "aa", "a"))
  }

  test("argmax tie-breaks by (count desc, left, right) — deterministic training") {
    val words = Seq(("cd", 2L), ("ab", 2L)).toDF("word", "freq")
    assert(BpeTrain.fit(words, 1) == Seq(("a", "b")))
  }

  test("fit stops early once every word is fused to one symbol") {
    val words = Seq(("ab", 3L)).toDF("word", "freq")
    assert(BpeTrain.fit(words, 5) == Seq(("a", "b")))
  }

  test("tokenCounts: distinct-word segmentation joined back per doc") {
    val docs = Seq((1L, "ab ab cd"), (2L, "cd"), (3L, "")).toDF("doc_id", "text")
    val got = BpeTrain.tokenCounts(docs, "doc_id", "text", Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ab -> [ab] (1 token) twice, cd -> [c, d] (2): doc1 = 4, doc2 = 2;
    // doc3 has no words and no row — the count table's natural grain
    assert(got == Map(1L -> 4L, 2L -> 2L))
  }

  test("fitLocal == fit merge-for-merge on the real table") {
    val wordsDf = corpusWords.toSeq.toDF("word", "freq")
    assert(BpeTrain.fitLocal(wordsDf, 10) == BpeTrain.fit(wordsDf, 10))
  }

  test("fitLocal at 200 merges matches the independent replay (incremental counts + heap)") {
    // synthetic vocabulary with enough pair structure to sustain 200
    // merges: base-26 ids over a-z, tripled — the bpe_apply shape
    val words = (0 until 400).map { i =>
      val s = java.lang.Long.toString(i.toLong, 26).map { c =>
        if (c <= '9') ('a' + (c - '0')).toChar else ('k' + (c - 'a')).toChar
      }.mkString
      (s * 3, (i % 7 + 1).toLong)
    }
    val (goldMerges, _) = replayFit(words.toMap, 200)
    val got = BpeTrain.fitLocal(words.toDF("word", "freq"), 200)
    assert(got.length == goldMerges.length)
    assert(got == goldMerges,
      got.zip(goldMerges).zipWithIndex.collectFirst {
        case ((g, w), i) if g != w => s"first divergence at merge $i: got $g want $w"
      }.getOrElse(""))
  }

  test("fitLocal matches the replay on randomized run-heavy vocabularies") {
    // two-letter alphabet maximizes repeated-letter runs (aaa, ababab) —
    // the shapes that stress the incremental pair-count multiplicity
    // accounting and the stale-heap bookkeeping
    val rnd = new scala.util.Random(4242)
    (0 until 5).foreach { c =>
      val words = (0 until 60).map { _ =>
        (1 to 1 + rnd.nextInt(8)).map(_ => "ab" (rnd.nextInt(2))).mkString
      }.distinct.map(w => (w, (rnd.nextInt(9) + 1).toLong))
      val (gold, _) = replayFit(words.toMap, 25)
      val got = BpeTrain.fitLocal(words.toDF("word", "freq"), 25)
      assert(got == gold, s"case $c: got $got want $gold")
    }
  }

  test("supplementary chars: fitLocal and scalable apply match the Spark plans exactly") {
    // Spark's split(word, "") segments by CODE POINT (U+10000 stays one
    // symbol); Java's String.split("") segments by UTF-16 code UNIT,
    // leaving lone surrogates that form phantom pairs sorting BELOW
    // U+FFFF — this test originally FAILED on a Java-split fitLocal,
    // which learned (\uD800, \uDC00). codePointSyms exists for this.
    val hi = new String(Character.toChars(0x10000))
    assert((hi + "x").split("").length == 3) // the Java trap, pinned
    assert(BpeTrain.codePointSyms(hi + "x").toSeq == Seq(hi, "x"))
    // U+FFFF vs U+10000 at equal counts: code-point/UTF-8 order (Spark's
    // sort) puts U+FFFF first; UTF-16 compareTo would invert it
    val words = Seq(("￿" + "x", 2L), (hi + "x", 2L)).toDF("word", "freq")
    val gotFit = BpeTrain.fit(words, 1)
    assert(gotFit == Seq(("￿", "x")))
    assert(BpeTrain.fitLocal(words, 1) == gotFit)
    // and the two appliers agree with each other on astral words
    val fold = BpeTrain.segmentWords(words, gotFit)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val fast = BpeTrain.segmentWordsScalable(words, gotFit)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(fold == fast)
    assert(fold("￿x") == List("￿x"))
    assert(fold(hi + "x") == List(hi, "x"))
  }

  test("fitLocal stops early on exhaustion and enforces maxVocab") {
    val words = Seq(("ab", 3L)).toDF("word", "freq")
    assert(BpeTrain.fitLocal(words, 5) == Seq(("a", "b")))
    val e = intercept[IllegalArgumentException] {
      BpeTrain.fitLocal(words, 1, maxVocab = 0L)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("segmentWordsScalable == segmentWords on the real vocabulary (learned merges)") {
    val words = corpusWords
    val wordsDf = words.toSeq.toDF("word", "freq")
    val merges = BpeTrain.fit(wordsDf, 10)
    val fold = BpeTrain.segmentWords(wordsDf, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val fast = BpeTrain.segmentWordsScalable(wordsDf, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(fast == fold)
  }

  test("segmentWordsScalable holds at 1000 merges — far past the fold's tree budget") {
    // deterministic synthetic list over a 4-letter alphabet: mostly
    // non-firing merges (the O(1)-skip path) with firing ones sprinkled
    // in; gold = the spec's own in-order exhaustive driver replay.
    val alpha = Vector("a", "b", "c", "d")
    val syms = scala.collection.mutable.ArrayBuffer[String](alpha: _*)
    val merges = (0 until 1000).map { i =>
      val l = syms((i * 7) % syms.length); val r = syms((i * 13 + 5) % syms.length)
      if (i % 37 == 0 && (l + r).length <= 8) syms += (l + r)
      (l, r)
    }
    val words = Seq("abcd", "aabbccdd", "abab", "dcba", "aaaa", "a",
      "abcdabcdabcd", "bbbb").map((_, 1L))
    val gold = words.map { case (w, _) =>
      w -> merges.foldLeft(w.split("").toList)((s, p) => greedyMerge(s, p))
    }.toMap
    val got = BpeTrain.segmentWordsScalable(words.toDF("word", "freq"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got == gold)
    assert(got.values.exists(_.exists(_.length > 1)), "fixture fired no merges")
  }

  test("tokenCounts above FoldMergeMax routes through the scalable applier, same counts") {
    val docs = Seq((1L, "ab ab cd"), (2L, "cd")).toDF("doc_id", "text")
    // pad a firing merge list past the threshold with never-firing pairs
    val merges = ("a", "b") +: (0 to BpeTrain.FoldMergeMax).map(i => (s"z$i", "q"))
    val got = BpeTrain.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 2L))
  }

  test("segmentWordsScalable: null word yields null tokens, the fold path's behavior") {
    val words = Seq("ab", null: String).toDF("word")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    val fold = norm(BpeTrain.segmentWords(words, Seq(("a", "b"))))
    val fast = norm(BpeTrain.segmentWordsScalable(words, Seq(("a", "b"))))
    assert(fold == Map(Some("ab") -> List("ab"), None -> null))
    assert(fast == fold)
  }

  test("wordFreq drops empty tokens (runs of spaces, trailing space)") {
    val docs = Seq((1L, "a  bb "), (2L, "bb")).toDF("doc_id", "text")
    val got = BpeTrain.wordFreq(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "bb" -> 2L))
  }

  // Punctuation/unicode fixtures the synthetic corpus lacks — the regex
  // discipline's hard cases: leading-space absorption, digit runs,
  // punctuation runs, accents, CJK, emoji (astral), tabs/multi-space
  // (untokenized under the lookahead-free pattern), and an empty string.
  private val preTokFixtures = Seq(
    "Hello, world! It's 2026.",
    "a  b\tc", // double space and tab: separators, never tokens
    "naïve café — über-cool… 3.14",
    "日本語 テスト 123abc",
    "emoji 😀😀 end", "!!!", "", "x",
    "trailing space ", " leading")

  test("RegexPreTok: Spark splitCol == driver splitLocal on punctuation/unicode fixtures") {
    val pre = RegexPreTok(RegexPreTok.Gpt2ish)
    val got = pre.splitCol(col("text"))
    val rows = preTokFixtures.toDF("text").select(col("text"), got.as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    preTokFixtures.foreach { t =>
      assert(rows(t) == pre.splitLocal(t).toList,
        s"engine/driver split divergence on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
    // the discipline's load-bearing shapes, pinned concretely
    assert(rows("Hello, world! It's 2026.") ==
      List("Hello", ",", " world", "!", " It", "'", "s", " 2026", "."))
    // whitespace never forms its own token: the space IMMEDIATELY before
    // a span absorbs into it, any earlier whitespace in the run is skipped
    assert(rows("a  b\tc") == List("a", " b", "c"))
    assert(rows("emoji 😀😀 end") == List("emoji", " 😀😀", " end"))
    assert(rows("") == Nil && rows("!!!") == List("!!!"))
  }

  test("wordFreq under RegexPreTok: leading-space vocabulary, replayed on the driver") {
    val docs = Seq((1L, "the cat the the"), (2L, "the")).toDF("doc_id", "text")
    val pre = RegexPreTok(RegexPreTok.Gpt2ish)
    val got = BpeTrain.wordFreq(docs, "text", pre)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // " the" (mid-text) and "the" (text-initial) are DISTINCT entries —
    // the GPT-2 property space-splitting destroys
    assert(got == Map("the" -> 2L, " cat" -> 1L, " the" -> 2L))
  }

  test("tokenCounts under a BpeModel applies the model's own discipline") {
    val docs = Seq((1L, "the the"), (2L, "cat")).toDF("doc_id", "text")
    // in-order-exhaustive semantics: the space-prefixed chain must run
    // BEFORE (t,h) eats the 'th' inside " the", or " the" stalls at 2
    val merges = Seq((" ", "t"), (" t", "h"), (" th", "e"),
      ("t", "h"), ("th", "e"))
    val space = BpeTrain.tokenCounts(docs, "doc_id", "text",
        BpeTrain.BpeModel(SpacePreTok, merges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val regex = BpeTrain.tokenCounts(docs, "doc_id", "text",
        BpeTrain.BpeModel(RegexPreTok(RegexPreTok.Gpt2ish), merges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // space: ["the","the"] -> [the]+[the] = 2 tokens; regex: ["the"," the"]
    // -> [the] + [ the] = 2 too, via the space-prefixed merge path;
    // "cat" = c,a,t = 3 under both
    assert(space == Map(1L -> 2L, 2L -> 3L))
    assert(regex == Map(1L -> 2L, 2L -> 3L))
    // and the 4-arg merge-list form ≡ the SpacePreTok model form
    val legacy = BpeTrain.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(legacy == space)
  }

  test("ByteToUnicode: bijective single-char table matching the published algorithm") {
    val t = BpeTrain.ByteToUnicode
    assert(t.length == 256 && t.distinct.length == 256, "must be a bijection")
    assert(t.forall(_.length == 1), "every symbol is one BMP char")
    // printable Latin-1 ranges map to themselves
    ((33 to 126) ++ (161 to 172) ++ (174 to 255)).foreach(b =>
      assert(t(b) == b.toChar.toString, s"byte $b must be identity"))
    // the famous marks: space -> Ġ (U+0120), newline -> Ċ (U+010A)
    assert(t(0x20) == "Ġ" && t(0x0a) == "Ċ" && t(0) == "Ā")
  }

  test("byte-level: Spark byteSymsCol == driver byteSymsLocal on unicode fixtures") {
    val words = Seq("the", " the", "é", "naïve", "日本", "😀", "a b", "", "\u0000x")
    val got = words.toDF("word")
      .select(col("word"), BpeTrain.byteSymsCol(col("word")).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach(w => assert(got(w) == BpeTrain.byteSymsLocal(w).toList,
      s"engine/driver byte seg divergence on ${w.map(c => f"\\u${c.toInt}%04x").mkString}"))
    // load-bearing shapes: multi-byte chars split into remapped BYTES
    assert(got(" the") == List("Ġ", "t", "h", "e"))
    assert(got("é") == List("Ã", "©"), "U+00E9 is C3 A9 -> Ã ©")
    assert(got("😀").length == 4, "astral chars are 4 UTF-8 bytes")
    assert(got("") == Nil, "empty word -> empty symbol array (no [\"\"])")
    assert(got("\u0000x") == List("Ā", "x"), "NUL remaps, never drops")
  }

  test("byte-level: fold and scalable appliers agree; merges fire over byte symbols") {
    // (Ġ,t) then (Ġt,h) build the space-absorbed prefix GPT-2 vocabularies
    // actually learn; (Ã,©) fuses a multi-byte char back together
    val merges = Seq(("Ġ", "t"), ("Ġt", "h"), ("Ã", "©"))
    val words = Seq(" the", "the", "é", " té").toDF("word")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val fold = norm(BpeTrain.segmentWords(words, merges, byteLevel = true))
    val fast = norm(BpeTrain.segmentWordsScalable(words, merges, byteLevel = true))
    assert(fold == fast)
    assert(fold(" the") == List("Ġth", "e"))
    assert(fold("the") == List("t", "h", "e"), "no space prefix, no fire")
    assert(fold("é") == List("Ã©"))
    assert(fold(" té") == List("Ġt", "Ã©"))
  }

  test("byte-level: fit == fitLocal on a multi-byte vocabulary") {
    val vocab = Seq((" the", 5L), ("the", 3L), (" éé", 4L), ("éé", 2L))
      .toDF("word", "freq")
    val dist = BpeTrain.fit(vocab, 6, byteLevel = true)
    val local = BpeTrain.fitLocal(vocab, 6, byteLevel = true)
    assert(dist == local && dist.nonEmpty,
      s"byte-level fit/fitLocal diverged: $dist vs $local")
    // the learned symbols are byte-alphabet strings (Ã/© for é's bytes)
    assert(dist.exists { case (l, r) => (l + r).contains("Ã") },
      s"expected a merge over é's bytes in $dist")
  }

  test("vocab: 256 byte ids + 256+rank composites; duplicate composites keep the first id") {
    val m = BpeTrain.BpeModel(SpacePreTok,
      Seq(("a", "bc"), ("t", "h"), ("ab", "c")), byteLevel = true)
    val v = BpeTrain.vocab(m)
    assert(v.take(256).map(_._1) == BpeTrain.ByteToUnicode)
    assert(v.take(256).map(_._2) == (0L until 256L))
    // ("a","bc") and ("ab","c") both compose "abc": rank 0 keeps the id,
    // rank 2's duplicate is skipped — token strings stay unique keys
    assert(v.drop(256) == Seq(("abc", 256L), ("th", 257L)))
    assert(v.map(_._1).distinct.length == v.length)
    // code-point models have no deterministic base alphabet
    val e = intercept[IllegalArgumentException] {
      BpeTrain.vocab(BpeTrain.BpeModel(SpacePreTok, Nil))
    }
    assert(e.getMessage.contains("byte-level"))
  }

  test("tokenIds: per-doc positions across pre-token and token order; join is total") {
    val model = BpeTrain.BpeModel(
      RegexPreTok(RegexPreTok.Gpt2ish), Seq(("t", "h"), ("th", "e")),
      byteLevel = true)
    val docs = Seq((1L, "the thé x"), (2L, "a")).toDF("doc_id", "text")
    val got = BpeTrain.tokenIds(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList.sorted
    val ids = BpeTrain.vocab(model).toMap
    // doc 1: "the" -> [the]; " thé" -> [Ġ, th, Ã, ©]; " x" -> [Ġ, x]
    val want = List(
      (1L, 0L, ids("the")),
      (1L, 1L, ids("Ġ")), (1L, 2L, ids("th")), (1L, 3L, ids("Ã")), (1L, 4L, ids("©")),
      (1L, 5L, ids("Ġ")), (1L, 6L, ids("x")),
      (2L, 0L, ids("a"))).sorted
    assert(got == want, s"got $got")
    // totality on the real table: every token row survives the vocab join
    val real = Tables.documents(spark, Sf0001).where(col("doc_id") < 50)
    val nTokens = BpeTrain.tokenCounts(real, "doc_id", "text", model)
      .agg(sum("bpe_tokens")).head.getLong(0)
    assert(BpeTrain.tokenIds(real, "doc_id", "text", model).count() == nTokens,
      "zero-OOV: the id join must never drop a token")
    // reserved-name guard: an idCol colliding with the plumbing refuses
    val e2 = intercept[IllegalArgumentException] {
      BpeTrain.tokenIds(docs.withColumnRenamed("doc_id", "word"),
        "word", "text", model)
    }
    assert(e2.getMessage.contains("collides"))
  }

  test("detokenize inverts tokenIds exactly on single-spaced unicode text") {
    val model = BpeTrain.BpeModel(
      RegexPreTok(RegexPreTok.Gpt2ish), Seq(("t", "h"), ("th", "e")),
      byteLevel = true)
    // multi-byte, astral and punctuation content — the byte alphabet
    // must invert all of it verbatim
    val docs = Seq(
      (1L, "the thé café 😀!"),
      (2L, "日本語 123 test."),
      (3L, "x")).toDF("doc_id", "text")
    val back = BpeTrain.detokenize(
        BpeTrain.tokenIds(docs, "doc_id", "text", model), "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want, s"round trip diverged: $back")
    // id-col collision refuses
    val ids = BpeTrain.tokenIds(docs, "doc_id", "text", model)
    val e = intercept[IllegalArgumentException] {
      BpeTrain.detokenize(ids.withColumnRenamed("doc_id", "token"), "token", model)
    }
    assert(e.getMessage.contains("collides"))
  }

  test("assertBpeOracleReplayable: gate list passes, left-suffix-of-composite rejects") {
    // the live gate list's shape passes (it is defined THROUGH the guard)
    Queries.assertBpeOracleReplayable(
      Seq(("t", "h"), ("th", "e"), ("g", "g"), ("a", "r")))
    // left == an earlier composite is the legal composite-left case
    Queries.assertBpeOracleReplayable(Seq(("a", "b"), ("ab", "c")))
    // (t,h) then (h,e): engine on "the" keeps [th, e] (no 'h' symbol
    // remains) but the right-boundary-only oracle replace would fuse
    // "th␟e␟" -> "the␟" — exactly the divergence the guard must reject
    val ex = intercept[IllegalArgumentException] {
      Queries.assertBpeOracleReplayable(Seq(("t", "h"), ("h", "e")))
    }
    assert(ex.getMessage.contains("proper suffix"))
  }
}
