package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector-sum aggregate: `vector_sum(vec)` over
  * ARRAY<FLOAT|DOUBLE> rows → ARRAY<DOUBLE>. The building block for label
  * centroids / class prototypes / embedding drift monitors over a corpus
  * of embeddings (SURVEY §2.E multimodal columns).
  *
  * Why a native `TypedImperativeAggregate` and not `posexplode → groupBy
  * (key, pos) → re-assemble`: the explode form multiplies the shuffle by
  * `dim` (a 100 TB embedding table becomes a 6.4 T-row shuffle at dim=64)
  * and needs a second shuffle to zip the per-position sums back into a
  * vector. Here the state is ONE double[dim] per group, partial
  * aggregation applies (each map task ships dim doubles per group), and
  * the result arrives assembled. Same pattern as [[TopKIds]] (the O(k)
  * top-k-per-group state).
  *
  * Contract: null vectors are skipped (like SQL SUM over nulls); an empty
  * group yields NULL; a dimension mismatch within a group throws — silent
  * truncation would corrupt every centroid downstream.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // empty array = "no input seen yet" (dim unknown until the first vector)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    // a zero-length vector would be indistinguishable from the "no input
    // yet" buffer sentinel, making the mismatch error depend on row order
    // across shuffles — reject it outright instead
    if (n == 0)
      throw new IllegalArgumentException("vector_sum: zero-length vector")
    val target = if (buf.isEmpty) new Array[Double](n) else buf
    if (target.length != n)
      throw new IllegalArgumentException(
        s"vector_sum: dimension mismatch in group (${target.length} vs $n)")
    var i = 0
    while (i < n) {
      target(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    target
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      if (buf.length != other.length)
        throw new IllegalArgumentException(
          s"vector_sum: dimension mismatch across partitions (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_sum requires array<float|double> input, got ${t.simpleString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}
