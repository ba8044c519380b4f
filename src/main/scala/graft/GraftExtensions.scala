package graft

import graft.functions.{ByteDot, ByteLutSum, DotProduct, FreqItems, L2SqDistance, TopKIds, VectorSum}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension point (registered via `spark.sql.extensions`): exposes
  * the custom Catalyst expressions to SQL and `call_function`. Keeping
  * registration in an extensions class (not session-local hacks) means any
  * session — including the driver's — picks the functions up from config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // wrong-arity calls must fail with a clear analysis-time message, not an
  // IndexOutOfBounds from children(1) inside the builder (ADVICE r10)
  private def arity(name: String, n: Int)(
      b: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    children => {
      if (children.length != n) throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${children.length}")
      b(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fast_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "fast_dot"),
      arity("fast_dot", 2)(children =>
        DotProduct(children.head, children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("fast_l2sq"),
      new ExpressionInfo(classOf[L2SqDistance].getName, "fast_l2sq"),
      arity("fast_l2sq", 2)(children =>
        L2SqDistance(children.head, children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("byte_dot"),
      new ExpressionInfo(classOf[ByteDot].getName, "byte_dot"),
      arity("byte_dot", 2)(children =>
        ByteDot(children.head, children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("byte_lut_sum"),
      new ExpressionInfo(classOf[ByteLutSum].getName, "byte_lut_sum"),
      arity("byte_lut_sum", 2)(children =>
        ByteLutSum(children.head, children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("topk_ids"),
      new ExpressionInfo(classOf[TopKIds].getName, "topk_ids"),
      arity("topk_ids", 3)(children =>
        TopKIds(children.head, children(1), children(2)))))
    ext.injectFunction((
      new FunctionIdentifier("vector_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "vector_sum"),
      arity("vector_sum", 1)(children =>
        VectorSum(children.head))))
    ext.injectFunction((
      new FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FreqItems].getName, "freq_items"),
      arity("freq_items", 2)(children =>
        FreqItems(children.head, children(1)))))
    // Spark's OWN runtime-filter bloom expressions (BloomFilterAggregate /
    // BloomFilterMightContain — codegen'd, spark-sketch-backed), surfaced
    // as SQL functions: the scalable membership primitive behind
    // TextDedup.contaminationBloom. Internal-but-public Catalyst classes;
    // exposing them is registration, not reimplementation.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      arity("bloom_agg", 3)(children =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2)))))
    // Broadcast-shipped bloom probe (graft.functions.BloomBroadcasts): the
    // first argument is a tiny registry-key STRING literal, resolved at
    // analysis time to the broadcast handle — the filter bytes never enter
    // the plan or the task binary (the literal form re-allocates a multi-MB
    // array per task; measured as the e9b G1-storm regression, r18).
    ext.injectFunction((
      new FunctionIdentifier("bloom_probe"),
      new ExpressionInfo(
        classOf[graft.functions.BloomMightContainBc].getName, "bloom_probe"),
      arity("bloom_probe", 2)(children => {
        val key = children.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
              if s != null => s.toString
          case _ => throw new IllegalArgumentException(
            "bloom_probe's first argument must be a non-null registry-key " +
              "string literal from BloomBroadcasts.register")
        }
        graft.functions.BloomMightContainBc(
          graft.functions.BloomBroadcasts.lookup(key), children(1))
      })))
    // Broadcast-shipped nearest-centroid assignment (graft.functions
    // .CentroidBroadcasts): like bloom_probe, the first argument is a
    // registry-key string literal resolved at analysis time — the centroid
    // table never enters the plan as O(nlist·dim) literals (the e9b
    // plan-literal lesson applied to the IVF assignment expression).
    ext.injectFunction((
      new FunctionIdentifier("centroid_argmin"),
      new ExpressionInfo(
        classOf[graft.functions.CentroidArgminBc].getName, "centroid_argmin"),
      arity("centroid_argmin", 2)(children => {
        val key = children.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
              if s != null => s.toString
          case _ => throw new IllegalArgumentException(
            "centroid_argmin's first argument must be a non-null " +
              "registry-key string literal from CentroidBroadcasts.register")
        }
        graft.functions.CentroidArgminBc(
          graft.functions.CentroidBroadcasts.lookup(key), children(1))
      })))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      arity("bloom_might_contain", 2)(children =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1)))))
    // ANN auto-rewrite: ORDER BY fast_dot DESC LIMIT k -> nprobe-pruned scan
    // (no-op unless an IvfRegistry model is registered).
    ext.injectOptimizerRule(_ => graft.plans.IvfTopKRewrite())
  }
}
