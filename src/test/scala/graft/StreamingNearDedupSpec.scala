package graft

import graft.operators.TextDedup
import graft.streaming.{StreamDoc, StreamingNearDedup, TimedDoc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming MinHash-LSH near-dup: signature bit-parity with the batch
  * sketch, pair parity with the batch band-pairs path across micro-batch
  * boundaries, and the bounded-bucket drop contract.
  */
class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val Shingle = 3
  private val Bands = 4

  test("streaming signature is bit-identical to the batch minhashWide sketch") {
    val docs = Tables.documents(spark, Sf0001).limit(40)
      .select("doc_id", "text").as[(Long, String)].collect()
    val wide = TextDedup.minhashWide(
        Tables.documents(spark, Sf0001).limit(40), "text", "doc_id", K, Shingle)
      .collect().map(r => r.getLong(0) -> (1 to K).map(r.getLong(_)).toSeq).toMap
    assert(wide.nonEmpty)
    docs.foreach { case (id, text) =>
      val sig = StreamingNearDedup.signature(text, K, Shingle)
      wide.get(id) match {
        case Some(expected) =>
          assert(sig != null && sig.toSeq == expected, s"doc $id sketch mismatch")
        case None => assert(sig == null, s"doc $id should have no signature")
      }
    }
    // short doc: no full shingle → null, matching the batch drop
    assert(StreamingNearDedup.signature("one two", K, Shingle) == null)
  }

  test("streamed candidate pairs across micro-batches equal the batch band pairs") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, Sf0001).limit(120)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => StreamDoc(id, t) }

    val input = MemoryStream[StreamDoc]
    val q = StreamingNearDedup.candidatePairs(input.toDS(), K, Shingle, Bands)
      .writeStream.format("memory").queryName("snd").outputMode("append").start()
    try {
      val (first, rest) = docs.splitAt(50)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(rest.toIndexedSeq)
      q.processAllAvailable()

      val streamed = spark.table("snd").select("d1", "d2")
        .distinct().as[(Long, Long)].collect().toSet
      val batch = TextDedup.minhashBandPairs(
          Tables.documents(spark, Sf0001).limit(120), "text", "doc_id",
          K, Shingle, Bands)
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size}; " +
          s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally q.stop()
  }

  test("near-identical docs pair with high simEst; cross-batch pairs are found") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[StreamDoc]
    val q = StreamingNearDedup.candidatePairs(input.toDS(), K, Shingle, Bands)
      .writeStream.format("memory").queryName("snd2").outputMode("append").start()
    try {
      input.addData(StreamDoc(1, base), StreamDoc(2, "completely different words entirely unrelated content here for sure"))
      q.processAllAvailable()
      // the duplicate arrives in a LATER micro-batch — must pair against history
      input.addData(StreamDoc(3, base))
      q.processAllAvailable()
      val pairs = spark.table("snd2")
        .select("d1", "d2", "simEst").as[(Long, Long, Double)].collect().toSet
      assert(pairs.exists(p => p._1 == 1 && p._2 == 3 && p._3 == 1.0),
        s"exact dup across batches must pair at simEst 1.0: $pairs")
      assert(!pairs.exists(p => p._1 == 2 || p._2 == 2),
        s"unrelated doc must not pair: $pairs")
    } finally q.stop()
  }

  test("windowed variant: pairs inside the trailing window, never across it") {
    implicit val sqlCtx = spark.sqlContext
    // offset well above epoch: a row at exactly the INITIAL watermark (0)
    // is filtered as late before the state operator ever sees it
    def t(sec: Long) = new java.sql.Timestamp((1000000L + sec) * 1000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[TimedDoc]
    val q = StreamingNearDedup
      .candidatePairsWindowed(input.toDS(), windowSec = 60, K, Shingle, Bands)
      .writeStream.format("memory").queryName("sndw").outputMode("append").start()
    try {
      input.addData(TimedDoc(1, t(0), base))
      q.processAllAvailable()
      // dup 30 s later, NEXT micro-batch: inside the window → pairs
      input.addData(TimedDoc(2, t(30), base))
      q.processAllAvailable()
      // watermark jumps far ahead; bucket state becomes evictable
      input.addData(TimedDoc(3, t(1000),
        "completely different words entirely unrelated content here for sure"))
      q.processAllAvailable()
      // dup again at t=1010: docs 1/2 are > 60 s behind → must NOT pair
      input.addData(TimedDoc(4, t(1010), base))
      q.processAllAvailable()
      val pairs = spark.table("sndw")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)), s"only the in-window dup may pair: $pairs")
    } finally q.stop()
  }

  test("windowed variant, out-of-order arrivals: window is symmetric and members survive for late rows") {
    implicit val sqlCtx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp((1000000L + sec) * 1000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[TimedDoc]
    // watermarkDelay 120 s admits rows up to 2 min late; window is 60 s
    val q = StreamingNearDedup
      .candidatePairsWindowed(input.toDS(), windowSec = 60, K, Shingle, Bands,
        watermarkDelay = "120 seconds")
      .writeStream.format("memory").queryName("sndo").outputMode("append").start()
    try {
      input.addData(TimedDoc(1, t(0), base)); q.processAllAvailable()
      input.addData(TimedDoc(2, t(100), base)); q.processAllAvailable() // 100s after 1: no pair
      // LATE row at t=50: within 60 s of BOTH 1 and 2 — must pair with both
      // (doc 1 must not have been pruned by doc 2's arrival)
      input.addData(TimedDoc(3, t(50), base)); q.processAllAvailable()
      input.addData(TimedDoc(4, t(250), base)); q.processAllAvailable() // >60s from all: none
      // late row at t=240: only doc 4 is within its window
      input.addData(TimedDoc(5, t(240), base)); q.processAllAvailable()
      input.addData(TimedDoc(6, t(330), base)); q.processAllAvailable() // >60s from all: none
      // LATE row at t=260: doc 6 sits 70 s AHEAD — the symmetric window
      // must refuse that pair; docs 4 (10 s) and 5 (20 s) qualify
      input.addData(TimedDoc(7, t(260), base)); q.processAllAvailable()
      val pairs = spark.table("sndo")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L), (2L, 3L), (4L, 5L), (4L, 7L), (5L, 7L)),
        s"symmetric-window pair set mismatch: $pairs")
    } finally q.stop()
  }

  test("bucket cap: arrivals into a full bucket are dropped, not exploded") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val input = MemoryStream[StreamDoc]
    val q = StreamingNearDedup
      .candidatePairs(input.toDS(), K, Shingle, Bands, maxPerBucket = 2)
      .writeStream.format("memory").queryName("snd3").outputMode("append").start()
    try {
      input.addData((1L to 10L).map(i => StreamDoc(i, base)): _*)
      q.processAllAvailable()
      val pairs = spark.table("snd3").select("d1", "d2")
        .distinct().as[(Long, Long)].collect().toSet
      // only the first 2 members per bucket survive → exactly pair (1,2),
      // docs 3..10 dropped by the cap (not O(n²) emission)
      assert(pairs == Set((1L, 2L)), s"capped bucket must stop pairing: $pairs")
    } finally q.stop()
  }
}
