package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension point (registered via `spark.sql.extensions`): exposes
  * the custom Catalyst expressions to SQL and `call_function`. Keeping
  * registration in an extensions class (not session-local hacks) means any
  * session — including the driver's — picks the functions up from config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fast_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "fast_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children.head, children(1))))
  }
}
