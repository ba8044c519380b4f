package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a native aggregate — the O(cap)-state
  * scale twin of the exact vocabulary count (t10's `explode → groupBy(token)
  * → count`), following the engine's exact/approx twin pattern (e7
  * countDistinct/HLL, q7 percentile/approx_percentile).
  *
  * Why it matters at 100 TB: the exact form shuffles one (token, count) row
  * per distinct token PER MAP PARTITION — a BPE-scale vocabulary (10^5-10^6
  * types) times tens of thousands of tasks is a multi-billion-row shuffle
  * just to find the top 200. The sketch ships ONE O(cap) summary per
  * partition through the partial-aggregation path and merges associatively,
  * the same state shape a streaming `mapGroupsWithState` vocabulary tracker
  * would hold.
  *
  * Algorithm (Misra & Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): counters for at most `cap` live tokens; when the
  * buffer outgrows its slack the (cap+1)-th largest count is subtracted
  * from every counter and non-positive counters are dropped. Reported
  * counts are LOWER bounds with error at most n/cap (n = stream length),
  * and any token with true frequency > n/cap is guaranteed to survive.
  * Updates batch the cut at 2×cap so the per-row cost stays amortized O(1).
  *
  * EXACT-REGIME contract (what the gate row pins): while the number of
  * distinct tokens never exceeds `cap`, no cut ever fires — counts are
  * exact and merge-order-invariant, so the result is deterministic and
  * hash-comparable against the exact oracle. The gate corpus's 31-token
  * vocabulary is the documented degenerate case; FreqItemsSpec carries the
  * approx regime on a planted Zipf fixture (lower-bound + n/cap error +
  * guaranteed-survivor assertions).
  *
  * `freq_items(token, cap)` → ARRAY<STRUCT<token STRING, n BIGINT>>,
  * ordered (n DESC, token ASC) — explode and `LIMIT k` for top-k.
  */
case class FreqItems(
    left: Expression,  // token (string)
    right: Expression, // cap (foldable int literal)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  private lazy val cap: Int = right.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Subtract the (cap+1)-th largest count from every counter and drop the
    * non-positive ones, leaving at most cap survivors (ties with the
    * threshold die too — their lower bound reaches 0).
    */
  private def cut(buf: mutable.HashMap[String, Long]): Unit = {
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val thresh = counts(counts.length - (cap + 1)) // (cap+1)-th largest
    buf.filterInPlace((_, c) => c > thresh)
    buf.mapValuesInPlace((_, c) => c - thresh)
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val t = left.eval(input)
    if (t != null) {
      val key = t.asInstanceOf[UTF8String].toString
      buf.updateWith(key) { case c => Some(c.getOrElse(0L) + 1L) }
      // batch the O(buf) cut: fires at most once per cap net-new tokens
      if (buf.size > 2 * cap) cut(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.updateWith(k) { case prev => Some(prev.getOrElse(0L) + c) }
    }
    if (buf.size > 2 * cap) cut(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val enc = buf.toArray.map { case (t, c) => (t.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + enc.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(enc.length)
    enc.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("freq_items requires a STRING token column")
    // the cap's TYPE gates before its VALUE is evaluated: a non-integral
    // literal (freq_items(t, 'x')) must be a TypeCheckFailure during
    // analysis, not a ClassCastException from the eval below
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(right.dataType))
      TypeCheckResult.TypeCheckFailure("freq_items requires an integral cap")
    else if (!right.foldable || right.eval() == null)
      TypeCheckResult.TypeCheckFailure("freq_items requires a literal cap >= 1")
    else {
      // range-check through longValue: intValue() on a LongType literal
      // silently wraps (cap 2^32+1 would pass as 1, 2^32 would read 0 and
      // report the misleading ">= 1" failure) — ADVICE r11 #1
      val cap = right.eval().asInstanceOf[Number].longValue()
      if (cap < 1L || cap > Int.MaxValue.toLong)
        TypeCheckResult.TypeCheckFailure(
          s"freq_items cap must be in [1, ${Int.MaxValue}], got $cap")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqItems =
    copy(left = newLeft, right = newRight)
}
