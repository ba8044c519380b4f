package graft.streaming

import graft.operators.TemporalDedup
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A row in a keyed, timestamped stream subject to temporal dedup. */
case class TimedRow(g: String, t: Double, k: String, id: Long)

/** Streaming variant of the C3 kept-set dedup (SURVEY §2.C C3): a
  * `flatMapGroupsWithState` whose state is exactly the reference's ring
  * buffer — the last `lookback` KEPT (time, key) pairs per group
  * (`loader.js:202-212`). State is O(lookback) per group forever: no
  * watermark needed, matching the reference's unbounded-session semantics.
  *
  * Ordering: rows are time-sorted within each micro-batch; cross-batch
  * order is the stream's arrival order, same as the reference's
  * sequential WebSocket consumption.
  */
object StreamingTemporalDedup {

  case class KeptState(entries: List[(Double, String)])

  def dedup(
      ds: Dataset[TimedRow],
      windowSec: Double,
      lookback: Int = 24): Dataset[TimedRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.g)
      .flatMapGroupsWithState[KeptState, TimedRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[TimedRow], state: GroupState[KeptState]) =>
          var kept = state.getOption.map(_.entries).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.t).flatMap { r =>
            val dup = kept.exists { case (pt, pk) =>
              (r.t - pt) < windowSec && pk == r.k
            }
            if (dup) None
            else {
              kept = (kept :+ ((r.t, r.k))).takeRight(lookback)
              Some(r)
            }
          }
          state.update(KeptState(kept))
          out.iterator
      }
  }

  /** Batch reference for parity tests: the exact batch dedup over the same
    * row type.
    */
  def batchOracle(spark: SparkSession, rows: Seq[TimedRow],
                  windowSec: Double, lookback: Int = 24): Seq[Long] = {
    import spark.implicits._
    TemporalDedup
      .dedup(rows.toDF(), Seq("g"), "t", "k", windowSec, lookback)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
  }
}
