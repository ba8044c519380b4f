package graft.operators

/** The distance-metric surface of the ANN family (SURVEY §1.3). The
  * reference serves inner product only (`searcher.js:104` MetricType.IP
  * over L2-normalized LIRE vectors, which makes IP ≡ cosine); Milvus — the
  * system the reference delegates to — exposes IP, COSINE and L2, so the
  * engine does too. Every search path (exact scan, IVF prune, SQ8 codes,
  * PQ/ADC, serving, optimizer rewrite) takes a metric and keeps one
  * uniform output contract: a single `score` column, ordered by
  * [[VectorMetric.descending]] with id tiebreak.
  *
  *  - [[VectorMetric.Ip]]:     score = a·b, higher is better.
  *  - [[VectorMetric.Cosine]]: score = a·b/(‖a‖‖b‖), higher is better.
  *  - [[VectorMetric.L2]]:     score = Σ(aᵢ−bᵢ)² — SQUARED distance,
  *    lower is better. No final sqrt: sqrt is monotone so top-k order is
  *    unchanged, and squared distance is what Milvus L2 scores return.
  */
sealed abstract class VectorMetric(val name: String, val descending: Boolean)

object VectorMetric {
  case object Ip extends VectorMetric("ip", true)
  case object Cosine extends VectorMetric("cosine", true)
  case object L2 extends VectorMetric("l2", false)

  val all: Seq[VectorMetric] = Seq(Ip, Cosine, L2)

  def apply(name: String): VectorMetric =
    all.find(_.name == name.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown metric '$name' (have: ${all.map(_.name).mkString(", ")})"))
}
