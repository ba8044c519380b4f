package graft.sources

import org.apache.spark.sql.DataFrame

/** Table-layout helpers for the lake (SURVEY §4 "co-located joins via
  * bucketing"): a table written `bucketBy(n, key)` + `sortBy(key)` is
  * hash-partitioned AT REST, so an equi-join (or aggregation) on the
  * bucket key needs NO shuffle at read time — at 100 TB the difference
  * between a join that moves nothing and one that moves both sides.
  *
  * Used for the engine's own tables: `frames` bucketed by `imdb_id` makes
  * per-video dedup/duration computations shuffle-free; dimension tables
  * bucketed by their keys make fact joins map-side.
  */
object LakeLayout {

  /** Write `df` as a bucketed, sorted managed table (parquet). */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, key: String,
      sortKeys: Seq[String] = Nil): Unit = {
    val sorted = if (sortKeys.isEmpty) Seq(key) else sortKeys
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }
}
