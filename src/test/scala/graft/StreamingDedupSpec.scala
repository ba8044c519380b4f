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
}
