package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise candidates (minhash bands, jaccard join, cosine pairs)
  * into dedup CLUSTERS with a canonical representative (the minimum id),
  * so a corpus clean keeps exactly one document per component.
  *
  * Algorithm: distributed min-label propagation. Every vertex starts
  * labelled with itself; each round every vertex takes the min label over
  * itself and its neighbours (one equi-join + one min-aggregate, both
  * shuffle-partitioned on the vertex id — no driver-side graph state).
  * Rounds needed = graph diameter; near-dup graphs are unions of
  * near-cliques, so 2–3 rounds converge. For adversarial long-chain graphs
  * the O(log n) large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce") is the drop-in upgrade; propagation is kept
  * here for its simpler plans and the tiny diameters of dedup graphs.
  *
  * Each round ends in `localCheckpoint` — without lineage truncation the
  * iterated plan nests one join deeper per round and analysis cost grows
  * superlinearly.
  */
object ConnectedComponents {

  /** @param vertices one column, every vertex id (pairs alone would drop
    *                 singleton documents from the output)
    * @param pairs    undirected edges as (aCol, bCol) rows
    * @return (id, cluster) — cluster = min vertex id of the component
    */
  def minLabel(
      vertices: DataFrame,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val idName = vertices.columns.head
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col(idName).as("id"), col(idName).as("lbl"))
      .localCheckpoint()
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val next = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lbl"))
        .union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      done = next.as("n")
        .join(labels.as("o"), "id")
        .where(col("n.lbl") < col("o.lbl"))
        .isEmpty
      labels = next
      i += 1
    }
    labels.select(col("id").as(idName), col("lbl").as("cluster"))
  }
}
