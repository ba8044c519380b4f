package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the streaming semantics the
  * reference lacks entirely (SURVEY §2.D: its WebSocket ack/retry loop has
  * no late-data story). With a watermark, window state is bounded and late
  * rows beyond the delay are dropped deterministically — the property that
  * lets this run forever on an unbounded 100 TB/day stream.
  */
object WindowedAgg {

  /** Per (tumbling window, key) count + sum with bounded state.
    * @param tsCol      event-time TIMESTAMP column
    * @param delay      watermark delay, e.g. "2 minutes"
    * @param windowDur  tumbling width, e.g. "1 minute"
    */
  def tumbling(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      delay: String, windowDur: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"), col("sum_v"))

  /** SLIDING (hopping) variant — w3's batch shape under a stream: each row
    * lands in len/hop overlapping windows; state per (window, key) is
    * still bounded and watermark-finalized exactly like [[tumbling]] (a
    * window closes when the watermark passes its END, hop merely means
    * several windows are open per event).
    */
  def sliding(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      delay: String, windowDur: String, hop: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur, hop), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"), col("sum_v"))
}
