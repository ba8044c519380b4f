package graft

import graft.operators.BpeTrain
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

  test("wordFreq drops empty tokens (runs of spaces, trailing space)") {
    val docs = Seq((1L, "a  bb "), (2L, "bb")).toDF("doc_id", "text")
    val got = BpeTrain.wordFreq(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "bb" -> 2L))
  }
}
