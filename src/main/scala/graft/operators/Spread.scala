package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Hash-repartition with an EXPLICIT partition count for compute-amplifying
  * stages (shingle explosion, token explosion, per-group scans).
  *
  * `df.repartition(cols…)` (no count) has shuffle origin REPARTITION_BY_COL,
  * which AQE's CoalesceShufflePartitions may legally coalesce down to ONE
  * partition when the map-side bytes look small — its floor of
  * defaultParallelism applies only to ENSURE_REQUIREMENTS shuffles. For a
  * stage whose work EXPLODES after the shuffle (shingles × hash families),
  * map-side bytes are a terrible cost proxy: observed intermittent 2 s → 98 s
  * collapses of the minhash pipeline to a single task at sf0.1. Pinning the
  * count (REPARTITION_BY_NUM) makes the parallelism deliberate; on a real
  * cluster `spark.sql.shuffle.partitions` is sized to the executor fleet, so
  * this scales with deployment rather than with a misleading byte estimate.
  */
private[graft] object Spread {
  def byCols(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val n = scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    df.repartition(n, cols: _*)
  }
}
