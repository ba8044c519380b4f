package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
      sortKeys: Seq[String] = Nil): Unit =
    writeBucketedBy(df, table, buckets, Seq(key),
      if (sortKeys.isEmpty) Seq(key) else sortKeys)

  /** [[writeBucketed]] with a composite bucket key — e.g. the incremental
    * dedup signature lake bucketed by (band, bsig), whose at-rest
    * `HashPartitioning(keys)` satisfies any downstream join/aggregation
    * clustered on a SUPERSET of the keys (Spark's subset-satisfies rule),
    * so lake probes plan zero lake-side exchanges.
    */
  def writeBucketedBy(
      df: DataFrame, table: String, buckets: Int, keys: Seq[String],
      sortKeys: Seq[String]): Unit = {
    require(keys.nonEmpty && sortKeys.nonEmpty, "bucket and sort keys required")
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sortKeys.head, sortKeys.tail: _*)
      .saveAsTable(table)
  }

  case class CompactionStats(filesBefore: Long, filesAfter: Long, rows: Long)

  /** Promote a freshly-committed `tmp` directory over `dest` by rename —
    * the crash-safe-against-data-loss (but not writer-concurrent) swap
    * [[compactParquet]] uses, shared with every maintenance job whose
    * rewrite READS the directory it replaces (a direct
    * `mode("overwrite")` there would delete its own input mid-scan).
    * `dest` need not exist yet (first write).
    */
  def swapDir(fs: FileSystem, tmp: HPath, dest: HPath): Unit = {
    val bak = new HPath(dest.toString + ".swap.bak")
    fs.delete(bak, true)
    val hadDest = fs.exists(dest)
    if (hadDest && !fs.rename(dest, bak))
      sys.error(s"swapDir: cannot move $dest aside")
    if (!fs.rename(tmp, dest)) {
      if (hadDest) fs.rename(bak, dest) // restore — the original is intact
      sys.error(s"swapDir: cannot promote $tmp")
    }
    fs.delete(bak, true)
  }

  /** Small-file compaction for streaming-appended parquet directories — the
    * engine's analog of the reference loader's daily flush cron
    * (`loader.js:388-398`): every micro-batch of [[graft.streaming
    * .IngestPipeline]] appends a handful of row-group-sized files, and a
    * year of 30 s triggers is a million tiny files whose open/footer cost
    * dominates scans long before row data does.
    *
    * Rewrite: read → `repartition(ceil(bytes / targetFileBytes))` →
    * write to `<path>.compact.tmp` (re-partitioned by `partitionCols` so
    * pruning layout survives) → swap directories. The swap is
    * rename-based: crash-safe against losing data (the original is removed
    * only after the rewrite is fully committed) but NOT concurrent with a
    * writer — run it like the reference runs its cron: from the single
    * maintenance owner, between triggers.
    */
  def compactParquet(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): CompactionStats = {
    val hpath = new HPath(path)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listFiles(hpath, true)
    var filesBefore = 0L
    var bytes = 0L
    while (before.hasNext) {
      val f = before.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        filesBefore += 1; bytes += f.getLen
      }
    }
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new HPath(path + ".compact.tmp")
    fs.delete(tmp, true)
    val writer = (if (partitionCols.isEmpty) df.repartition(nOut)
                  else df.repartition(nOut, partitionCols.map(col): _*))
      .write.mode("overwrite")
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(tmp.toString)
    swapDir(fs, tmp, hpath)
    val after = fs.listFiles(hpath, true)
    var filesAfter = 0L
    while (after.hasNext) {
      val f = after.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) filesAfter += 1
    }
    CompactionStats(filesBefore, filesAfter, rows)
  }
}
