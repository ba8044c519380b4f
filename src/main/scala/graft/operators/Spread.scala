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

  /** [[byCols]] plus an OPTIMIZER BARRIER (lazy localCheckpoint at the
    * exchange output) for the case a plain repartition cannot fix: an
    * expensive row-local PREDICATE over a small-file table. Catalyst
    * pushes deterministic filters back through RepartitionByExpression —
    * inlining them through any defining projection — so the predicate
    * evaluates at the SCAN, and a single-row-group parquet file caps the
    * scan at one task regardless of split tuning (row groups are the
    * split floor). Measured on the e9c gate: a ~0.6 ms/doc bloom-probe
    * filter over one 600 KB file ran 3.0 s on 2 of 32 cores with the
    * repartition silently defeated. The lazy checkpoint materializes the
    * (cheap, pre-filter) rows once at full parallelism and downstream
    * work runs on all `n` partitions. Use ONLY when the barred subtree is
    * small-per-row (ids + text): the checkpoint writes those rows to
    * local store once.
    */
  def barrier(df: DataFrame, cols: Seq[Column]): DataFrame =
    byCols(df, cols).localCheckpoint(eager = false)
}
