package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023) — the PRODUCTION path of the sd1 gate row:
  * semantic near-duplicate removal over an embedding column. K-means
  * coarse clustering ([[IvfIndex.build]], the same index family the ANN
  * serving layer loads) confines the O(n²) cosine stage to cluster blocks;
  * pairs above `tau` connect into duplicate groups (driver-finished CC)
  * and each group keeps its min-id representative.
  *
  * The sd1 gate row runs this exact plan shape with DETERMINISTIC
  * block-sum centroids instead of k-means (a pure function of the row, so
  * the whole row is DuckDB-oracle-checkable); here the centroids are
  * learned, which is what you deploy.
  *
  * 100 TB shape: clustering cost is the k-means fit (a periodic job — pass
  * a cached model's assignments directly if you have them) + one
  * assignment scan; the pairwise stage is Σ cluster² instead of n², the
  * SemDeDup point — nlist tunes that budget; CC state is bounded by the
  * measured-edge driver finish.
  *
  * @return (idCol, cluster_id, rep, kept) — kept = this id is its group's
  *         representative
  */
object SemDedup {

  def apply(
      df: DataFrame, vecCol: String, idCol: String,
      nlist: Int, tau: Double): DataFrame = {
    // clamp like SearchService's load: KMeans k must not exceed the point
    // count, or a tiny collection crashes the fit. limit(nlist).count()
    // IS min(nlist, total) and stops scanning after nlist rows — no
    // full-table count action ahead of every production run
    val k = df.select(col(idCol)).limit(nlist).count().toInt
    fromAssigned(IvfIndex.build(df, vecCol, k)._1, vecCol, idCol, tau)
  }

  /** Same, over rows that already carry a `cluster_id` assignment (reuse a
    * served IVF index's layout instead of fitting k-means again).
    */
  def fromAssigned(
      assigned: DataFrame, vecCol: String, idCol: String,
      tau: Double): DataFrame = {
    val pairs = TextDedup.cosinePairs(assigned, vecCol, idCol, "cluster_id", tau)
    val reps = ConnectedComponents
      .minLabel(assigned.select(col(idCol)), pairs.select(col("v1"), col("v2")), "v1", "v2")
      .select(col(idCol), col("cluster").as("rep"))
    assigned.select(col(idCol), col("cluster_id")).join(reps, idCol)
      .select(col(idCol), col("cluster_id"), col("rep"),
        (col("rep") === col(idCol)).as("kept"))
  }
}
