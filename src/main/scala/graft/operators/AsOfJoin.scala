package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest prior event) join — the canonical time-series operator
  * Spark lacks natively (SURVEY §2.D notes general joins arrive free via
  * Catalyst; as-of needs a shape). The naive formulation is a range join
  * (`l.t >= r.t` theta-join) that degenerates to a per-key cartesian; this
  * implementation is the scale-correct union+window form:
  *
  *   tag left/right → union → one shuffle by key → sort by (t, side) →
  *   last_value(right payload, ignoreNulls) over rows-unbounded-preceding
  *   → keep left rows.
  *
  * Cost: ONE shuffle + external sort, O(1) state per row — survives any
  * key cardinality and any time skew; the right payload travels alongside,
  * never multiplied.
  */
object AsOfJoin {

  /** For every left row, attach `rightValue` from the right row with the
    * largest `rightTime <= leftTime` for the same `keyCol` (strictly
    * nearest-prior-or-equal; ties on time resolve right-before-left).
    *
    * @param left      probe side
    * @param right     reference side (e.g. sensor readings, error events)
    * @param keyCol    equality key present in both
    * @param timeCol   ordering column present in both (same type)
    * @param valueCol  right column to carry (emitted as `asof_<valueCol>`)
    */
  def nearestPrior(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    // The right payload travels as a NON-NULL struct so `last(ignoreNulls)`
    // skips only left rows — a right row whose valueCol is NULL must still
    // win the as-of match (and attach NULL), not fall through to an older
    // event. The struct doubles as a deterministic window tiebreak when
    // multiple right rows share (key, time): the largest (t, v) sorts last.
    val payType = StructType(Seq(
      StructField("t", right.schema(timeCol).dataType),
      StructField("v", right.schema(valueCol).dataType)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__pay", lit(null).cast(payType))
    val r = right.select(
      col(keyCol), col(timeCol),
      lit(0).as("__side"),
      struct(col(timeCol).as("t"), col(valueCol).as("v")).as("__pay"))
    // align columns: left keeps its full row; right rows carry nulls
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("__side") :+ col("__pay")).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) :+ col("__side") :+ col("__pay")).toIndexedSeq: _*)
      .unionByName(rAligned)
    // right (side=0) sorts before left (side=1) at equal time → "<=" semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((leftCols.map(col) :+ col("__asof").getField("v").as(s"asof_$valueCol")).toIndexedSeq: _*)
  }
}
