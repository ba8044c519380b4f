package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd inner product over two ARRAY<FLOAT|DOUBLE> columns —
  * the hot expression of the serving query (searcher.js:99-110 top-k IP).
  *
  * Bit-identical to the composed form
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,x)->acc+x)`: a sequential
  * left-to-right double accumulation. The win is mechanical: no
  * intermediate product array, no higher-order-function lambda dispatch —
  * one fused loop over the two ArrayData buffers inside whole-stage
  * codegen. At 100 TB the scored scan is dot-product-bound, so this is the
  * expression to keep tight.
  *
  * Null elements inside the arrays are not expected (vectors are dense);
  * length mismatch yields SQL NULL rather than an error.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "fast_dot"
  // Length mismatch yields NULL even when both inputs are non-nullable; the
  // default (left.nullable || right.nullable) would let codegen bind isNull
  // to FalseLiteral and the interpreted path return null from a
  // declared-non-nullable expression.
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fast_dot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lf, rf) = (isFloat(left), isFloat(right))
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: two instances of this expression can share one codegen
      // function scope, where a hardcoded `i` is a Janino redefinition error
      // (silent fallback to interpreted eval — the exact cost this native
      // expression exists to avoid)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val lGet = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $lGet * $rGet;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
