package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import graft.streaming.WindowedAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class StreamEvent(ts: Timestamp, k: String, v: Double)

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("nearestPrior: exact as-of semantics incl. ties, no-match, per-key isolation") {
    val clicks = Seq(
      (1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 150L),
      (4L, "u3", 50L) // u3 has no prior error → null
    ).toDF("event_id", "user_id", "tus")
    val errors = Seq(
      ("u1", 90L, 900L), ("u1", 100L, 901L), // tie at click 1's time → 901 (<=)
      ("u1", 200L, 902L), ("u2", 149L, 903L), ("u3", 60L, 904L)
    ).toDF("user_id", "tus", "err_id")

    val out = AsOfJoin.nearestPrior(clicks, errors, "user_id", "tus", "err_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      1L -> Some(901L), // equal-time error wins (<= semantics)
      2L -> Some(902L),
      3L -> Some(903L),
      4L -> None))     // error at 60 is AFTER click at 50
  }

  test("WindowedAgg: watermark drops late rows beyond the delay") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    val input = MemoryStream[StreamEvent]
    val agg = WindowedAgg.tumbling(input.toDF(), "ts", "k", "v",
      delay = "2 minutes", windowDur = "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData(StreamEvent(t(0, 10), "a", 1.0), StreamEvent(t(0, 40), "a", 2.0))
      q.processAllAvailable()
      // advance event time far past the watermark → 10:00 window finalizes
      input.addData(StreamEvent(t(10), "a", 5.0))
      q.processAllAvailable()
      // LATE row for the already-finalized 10:00 window → must be dropped
      input.addData(StreamEvent(t(0, 50), "a", 100.0))
      q.processAllAvailable()
      input.addData(StreamEvent(t(20), "a", 0.0)) // flush
      q.processAllAvailable()

      val rows = spark.table("win_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3)))
      val w0 = rows.filter(_._1 == t(0))
      assert(w0.length == 1)
      assert(w0.head._2 == 2L && w0.head._3 == 3.0,
        s"late row leaked into finalized window: ${w0.toSeq}")
    } finally q.stop()
  }

  test("WindowedAgg.sliding: each event lands in len/hop windows, watermark finalizes") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    val input = MemoryStream[StreamEvent]
    // 2-minute windows every 1 minute: an event is in exactly 2 windows
    val agg = WindowedAgg.sliding(input.toDF(), "ts", "k", "v",
      delay = "2 minutes", windowDur = "2 minutes", hop = "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_slide_out")
      .outputMode("append").start()
    try {
      input.addData(StreamEvent(t(1, 30), "a", 4.0))
      q.processAllAvailable()
      input.addData(StreamEvent(t(30), "a", 0.0)) // push watermark far past
      q.processAllAvailable()
      val rows = spark.table("win_slide_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3)))
        .filter(_._1.before(t(10)))
      // event at 10:01:30 → windows starting 10:00 and 10:01, each (n=1, sum=4)
      assert(rows.map(_._1).toSet == Set(t(0), t(1)), rows.toSeq.toString)
      assert(rows.forall(r => r._2 == 1L && r._3 == 4.0), rows.toSeq.toString)
    } finally q.stop()
  }
}
