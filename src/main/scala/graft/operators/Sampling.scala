package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: every engine (and any
  * other system given the same recipe) selects EXACTLY the same rows, with
  * no RNG state, no seed plumbing, and no reliance on partitioning order —
  * the property `df.sample()` cannot give you across reruns, engines, or
  * cluster layouts.
  *
  * The decision bit for a row is a pure function of its id: the first 8 hex
  * chars of `md5(string(id))` read as a uniform draw in [0, 2³²), kept iff
  * below `rate · 2³²`. md5's hex form is identical in every SQL engine, so
  * the SAME sample is reproducible in DuckDB/Trino/any warehouse — which is
  * what makes the s1 gate row oracle-checkable, and what makes a 100 TB
  * corpus re-sample auditable months later.
  *
  * Scale shape: a scan-local filter — no shuffle, no state; composes with
  * partition pruning and column pruning untouched.
  */
object Sampling {

  /** Hex threshold string for a rate in [0,1): `floor(rate·2³²)` as 8 hex
    * digits; lexicographic compare on fixed-width lowercase hex == numeric
    * compare.
    */
  private def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    f"${math.min((rate * 4294967296.0).round, 0xffffffffL)}%08x"
  }

  /** The uniform draw for a row id: first 8 hex chars of md5(string(id)). */
  def drawHex(id: Column): Column = substring(md5(id.cast("string")), 1, 8)

  /** Keep-predicate for a flat rate. */
  def keep(id: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true) else drawHex(id) < lit(thresholdHex(rate))

  /** Stratified deterministic sample: per-stratum rates (e.g. language or
    * source mixing weights), `defaultRate` for strata not listed. Rows keep
    * their columns; the caller filters nothing else.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (k, r)) => when(col(stratumCol) === k, lit(thresholdHex(r))).otherwise(acc)
    }
    df.where(drawHex(col(idCol)) < thr)
  }
}
