package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (tolerance) range join: all (left, right) pairs with
  * |leftTime − rightTime| ≤ tol, WITHOUT the cartesian/broadcast-nested-loop
  * plan Spark picks for a raw non-equi join.
  *
  * Technique (the standard distributed band join): bucket the time line
  * into width-`tol` cells. A pair within the band can differ by at most one
  * bucket, so the LEFT side probes buckets {b−1, b, b+1} (a 3× explode)
  * while the right keeps its single home bucket — the join becomes an
  * EQUI-join on the bucket id (shuffle-hash/SMJ partitionable at any scale)
  * followed by the exact |Δt| ≤ tol filter. Each qualifying pair is emitted
  * exactly once: the right row has one bucket and the left probes each
  * bucket id once.
  */
object RangeJoin {

  /** @param leftTime / rightTime NON-NEGATIVE long columns (epoch micros);
    *                  names must be distinct across the two inputs
    * @param tol       inclusive band half-width, same unit as the columns
    * @param extraCond additional join predicate (e.g. key equality or an
    *                  anti-reflexivity guard for self-joins)
    */
  def within(
      left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      tol: Long,
      extraCond: Column = lit(true)): DataFrame = {
    require(tol > 0, "tol must be positive")
    // long-division floor is exact for the non-negative epoch times used
    // here (a double division would wobble near bucket edges)
    val l = left
      .withColumn("__probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__b", expr(s"$leftTime div $tol") + col("__probe"))
      .drop("__probe")
    val r = right.withColumn("__b", expr(s"$rightTime div $tol"))
    l.join(r,
        l("__b") === r("__b") &&
          abs(col(leftTime) - col(rightTime)) <= tol &&
          extraCond)
      .drop("__b")
  }
}
