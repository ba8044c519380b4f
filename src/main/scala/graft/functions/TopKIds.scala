package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded-heap top-k aggregate (SURVEY §7.3 / §4: the
  * `TypedImperativeAggregate` alternative to `row_number()` windows for
  * top-k-per-group). State is a k-element heap per group — O(k) memory and
  * no per-group sort, vs the window form's full sort of every group.
  * Partial aggregation applies: each map task ships at most k (score, id)
  * pairs per group through the shuffle.
  *
  * `topk_ids(score, id, k)` → ARRAY<BIGINT> of ids, best-first, ordered by
  * (score DESC, id ASC) — the deterministic tie-break the oracle mirrors.
  */
case class TopKIds(
    first: Expression,  // score (castable to double)
    second: Expression, // id (long)
    third: Expression,  // k (foldable int literal)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with TernaryLike[Expression] {

  private lazy val k: Int = TopKIds.toDouble(third.eval()).toInt

  // Heap dequeues the WORST entry: lower score is "greater"; on ties a
  // larger id is "greater" (worse), matching (score DESC, id ASC) output.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = first.eval(input)
    val i = second.eval(input)
    if (s != null && i != null) {
      val cand = (TopKIds.toDouble(s), TopKIds.toLong(i))
      if (buf.size < k) buf.enqueue(cand)
      else {
        val worst = buf.head
        val better = cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)
        if (better) { buf.dequeue(); buf.enqueue(cand) }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { cand =>
      if (buf.size < k) buf.enqueue(cand)
      else {
        val worst = buf.head
        val better = cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)
        if (better) { buf.dequeue(); buf.enqueue(cand) }
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(best.map(_._2))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.enqueue((bb.getDouble, bb.getLong)))
    q
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!third.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else if (!first.dataType.isInstanceOf[NumericType] || !second.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure("topk_ids requires numeric (score, id)")
    else if (third.eval() == null || k < 1)
      TypeCheckResult.TypeCheckFailure(s"topk_ids requires k >= 1, got ${third.eval()}")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKIds =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKIds {
  // Spark's Decimal implements Ordered but NOT java.lang.Number — a plain
  // Number cast passes analysis then throws at runtime on DECIMAL inputs
  // (e.g. a parquet-decimal o_totalprice).
  private def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number                   => n.doubleValue()
  }
  private def toLong(v: Any): Long = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case n: java.lang.Number                   => n.longValue()
  }
}
