package graft.plans

import graft.functions.DotProduct
import graft.operators.IvfIndex
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Descending, In, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData

/** Session-wide opt-in registry for the ANN auto-rewrite: when a query
  * author registers the current IVF model, any `ORDER BY fast_dot(v, q)
  * DESC LIMIT k` over a relation carrying a `cluster_id` column is
  * rewritten to scan only the `nprobe` most promising clusters. Explicit
  * registration keeps the approximation opt-in — an unregistered session
  * never changes results.
  */
object IvfRegistry {
  @volatile private var state: Option[(IvfIndex.Model, Int)] = None
  def register(model: IvfIndex.Model, nprobe: Int): Unit = state = Some((model, nprobe))
  def clear(): Unit = state = None
  def current: Option[(IvfIndex.Model, Int)] = state
}

/** The optimizer rule (SURVEY §7.3 "custom Catalyst, perf only"): matches
  *
  *   GlobalLimit k ── LocalLimit k ── Sort[fast_dot(vec, qLit) DESC]
  *     ── Project[.., fast_dot AS score] ── child(with cluster_id)
  *
  * and injects `Filter(cluster_id IN topNprobeClusters(q))` below the
  * Project. The IN-filter lands on the scan as a partition/predicate
  * filter when the table is laid out `partitionBy(cluster_id)`
  * (IvfIndex.write) — the Milvus nprobe semantics (searcher.js:105)
  * expressed as partition pruning.
  */
case class IvfTopKRewrite() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = IvfRegistry.current match {
    case None => plan
    case Some((model, nprobe)) =>
      plan.transformDown {
        case gl @ GlobalLimit(_, ll @ LocalLimit(_, sort: Sort)) if sort.global =>
          rewriteSort(sort, model, nprobe) match {
            case Some(newSort) => gl.copy(child = ll.copy(child = newSort))
            case None          => gl
          }
      }
  }

  private def rewriteSort(sort: Sort, model: IvfIndex.Model, nprobe: Int): Option[Sort] =
    (sort.order, sort.child) match {
      case (Seq(SortOrder(attr: AttributeReference, Descending, _, _), _*),
            p @ Project(projList, child))
          if child.output.exists(_.name == "cluster_id") &&
            !child.isInstanceOf[Filter] =>
        projList.collectFirst {
          case a @ Alias(DotProduct(_, Literal(q: ArrayData, _)), _)
              if a.exprId == attr.exprId =>
            val query = q.toDoubleArray()
            val probed = model.centroids.zipWithIndex
              .map { case (c, i) => (i, c.zip(query).map { case (x, y) => x * y }.sum) }
              .sortBy(-_._2).take(nprobe).map(_._1)
            val cid = child.output.find(_.name == "cluster_id").get
            val filtered = Filter(In(cid, probed.toIndexedSeq.map(Literal(_))), child)
            sort.copy(child = p.copy(child = filtered))
        }
      case _ => None
    }
}
