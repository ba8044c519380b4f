package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming EXACT dedup (SURVEY §2.E): `dropDuplicatesWithinWatermark`
  * keys state by the dedup column and evicts it once the event-time
  * watermark passes — the bounded-state streaming analogue of e1's batch
  * hash-groupBy dedup, usable on an unbounded ingest feed.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked streaming dedup emits each key once, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup").outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(min * 60000L)
      input.addData((t(0), "a"), (t(1), "a"), (t(2), "b"))
      q.processAllAvailable()
      // replay of "a" while still inside the watermark window: dropped
      input.addData((t(3), "a"), (t(20), "c"))
      q.processAllAvailable()
      val keys = spark.table("sdedup").collect().map(_.getString(1)).toSeq
      assert(keys.count(_ == "a") == 1)
      assert(keys.count(_ == "b") == 1)
      assert(keys.count(_ == "c") == 1)
    } finally q.stop()
  }

  test("streaming session windows: gap merges within, watermark finalizes sessions") {
    // the streaming shape of w2_session_window: same session_window
    // expression under readStream, sessions emitted once the watermark
    // passes their end
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Timestamp, String)]
    val sessions = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"), col("sw.start").as("session_start"), col("n_events"))
    val q = sessions.writeStream
      .format("memory").queryName("ssw").outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp((1000000L + min * 60L) * 1000L)
      // u1: two events 10 min apart (one session), then one 50 min later
      // (a second session); u2: one event
      input.addData((t(0), "u1"), (t(10), "u1"), (t(60), "u1"), (t(5), "u2"))
      q.processAllAvailable()
      // push the watermark far past every session's end so they finalize
      input.addData((t(500), "u3"))
      q.processAllAvailable()
      val rows = spark.table("ssw")
        .select("user", "n_events").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows("u1") == Seq(1L, 2L),
        s"u1 must close as a 2-event and a 1-event session: $rows")
      assert(rows("u2") == Seq(1L), s"u2 one singleton session: $rows")
    } finally q.stop()
  }
}
