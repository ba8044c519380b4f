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

  /** Point-in-interval join: all (point, interval) pairs with
    * `start ≤ t < end` (half-open, the SQL-standard event-in-validity
    * shape) — the asymmetric sibling of [[within]], again WITHOUT the
    * broadcast-nested-loop plan a raw non-equi join gets.
    *
    * Here the INTERVAL side explodes into every width-`width` bucket it
    * overlaps (⌈len/width⌉ + 1 rows) while the point keeps its single home
    * bucket, so the join is an equi-join on the bucket id + the exact
    * containment filter. Each qualifying pair appears exactly once (the
    * point has one bucket; the interval lists it once). Choose `width`
    * near the typical interval length: the explode factor is
    * len/width + 1, and a mega-interval's cost is linear and observable,
    * never a cross product.
    *
    * @param pointTime  NON-NEGATIVE long column (epoch micros/seconds)
    * @param startCol / endCol same unit; empty intervals (end ≤ start)
    *                  match nothing and are dropped before the explode
    */
  def pointInInterval(
      points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      width: Long,
      extraCond: Column = lit(true)): DataFrame = {
    require(width > 0, "width must be positive")
    val p = points.withColumn("__b", expr(s"$pointTime div $width"))
    // end is EXCLUSIVE: the last bucket that can hold a matching point is
    // (end - 1) div width; sequence() would count backwards on an empty
    // interval, so those are filtered out first
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b",
        explode(sequence(expr(s"$startCol div $width"), expr(s"($endCol - 1) div $width"))))
    p.join(iv,
        p("__b") === iv("__b") &&
          col(pointTime) >= col(startCol) && col(pointTime) < col(endCol) &&
          extraCond)
      .drop("__b")
  }
}
