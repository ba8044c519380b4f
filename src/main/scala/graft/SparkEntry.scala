package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's core serving
    * query (searcher.js:63-110) — exact top-15 inner-product search over the
    * embeddings table. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.c8AnnExact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §2.E. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-equivalent SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] = Queries.oracle
}
