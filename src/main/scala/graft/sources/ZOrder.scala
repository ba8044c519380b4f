package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional file skipping for
  * the engine's plain-parquet lakes, the same idea Delta Lake's `OPTIMIZE
  * ZORDER BY` and Iceberg's sort-order rewrite apply (Morton 1966).
  *
  * [[ManifestIndex]]-style pruning is only as good as the layout, and a
  * lake sorted by ONE key prunes only that key: a query on the other
  * dimension intersects every file. Sorting by the interleaved-bit
  * z-value instead clusters BOTH dimensions at once — each file covers a
  * compact rectangle of (a, b) space, so a predicate on either dimension
  * (or a box on both) intersects O(selectivity) files. That trades a
  * little per-dimension locality for pruning on every queried dimension —
  * at 100 TB the difference between "scan 0.4% of files" and "scan all of
  * them" for the second-dimension query.
  *
  * The z-value is a pure bit shuffle (no data-dependent state), so layout
  * jobs are one `repartitionByRange(zvalue)` pass and the m5 gate row can
  * value-check the curve itself against a DuckDB bit-fold replay.
  */
object ZOrder {

  /** The Morton interleave: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1, for the low `bits` bits of each. Total order over
    * [0, 2^bits)² — inputs outside that square (or null) yield null
    * EXPLICITLY rather than silently aliasing under truncation; callers
    * bucket or normalize wider domains first. Null z-values sort together
    * under a layout job and never affect read correctness (reads always
    * re-apply the real predicate).
    *
    * Pure bit arithmetic on longs — whole-stage-codegen-friendly, no UDF:
    * 2·bits shift/mask terms OR-folded into one expression.
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column =
    zvalueN(Seq(a, b), bits)

  /** The N-dimensional interleave (Delta's `ZORDER BY (a, b, c)` shape):
    * bit i of column j lands at position N·i + j, so [[zvalue]] is the
    * N=2 special case bit for bit. N·bits must fit a signed long's 63
    * value bits; the same out-of-domain → null contract applies across
    * every column.
    */
  def zvalueN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, s"z-ordering needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n columns x $bits bits = ${n * bits} interleaved bits; must be in [$n, 63]")
    val hi = (1L << bits) - 1
    val ls = cols.map(_.cast("long"))
    val z = (for {
      i <- 0 until bits
      (c, j) <- ls.zipWithIndex
    } yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), n * i + j))
      .reduce(_.bitwiseOR(_))
    when(ls.map(_.between(0L, hi)).reduce(_ && _), z)
  }

  /** Layout job: rewrite `df` into `dir` clustered along the z-curve of
    * (`colA`, `colB`) — range-partitioned into `nFiles` spans of the curve
    * and sorted within each, so every file holds a contiguous curve
    * segment (a compact rectangle stack in (a, b) space). The z column is
    * dropped before writing: it is derivable, and layout keys don't belong
    * in the data.
    */
  def layout(df: DataFrame, dir: String, colA: String, colB: String,
             bits: Int = 16, nFiles: Int = 8): Unit =
    layoutN(df, dir, Seq(colA, colB), bits, nFiles)

  /** [[layout]] along the N-dimensional curve ([[zvalueN]]). */
  def layoutN(df: DataFrame, dir: String, cols: Seq[String],
              bits: Int = 16, nFiles: Int = 8): Unit = {
    // withColumn would silently REPLACE a pre-existing __z and the drop
    // below would lose it from the rewritten lake (ADVICE r13) — same
    // temp-name guard convention as upsample's epoch / kSuppress's __qi_n
    require(!df.columns.contains("__z"),
      "layoutN claims the temp column name __z — rename that input column")
    df.withColumn("__z", zvalueN(cols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Two-dimensional file manifest: per file, the [min,max] span of BOTH
    * columns plus the row count — [[buildManifestN]] at N=2 with the m5/m6
    * aliases (a, b).
    */
  def buildManifest(spark: SparkSession, dir: String,
                    colA: String, colB: String): DataFrame =
    buildManifestN(spark, dir, Seq(colA -> "a", colB -> "b"))

  /** N-dimensional file manifest: one (min_alias, max_alias) span per
    * (column, alias) pair plus the row count — [[ManifestIndex.spanStats]]
    * owns the row shape, so every dimensionality shares one definition.
    */
  def buildManifestN(spark: SparkSession, dir: String,
                     keys: Seq[(String, String)]): DataFrame =
    ManifestIndex.spanStats(spark.read.parquet(dir), keys, None)

  /** Planning: files whose (a, b) bounding box intersects the query box.
    * The manifest is tiny by contract; collect is the planner's job.
    */
  def prunedFiles(manifest: DataFrame, loA: Long, hiA: Long,
                  loB: Long, hiB: Long): Seq[String] =
    prunedFilesN(manifest, Seq(("a", loA, hiA), ("b", loB, hiB)))

  /** The N-dimensional prune: every aliased span must intersect its query
    * interval — the per-dimension selectivities MULTIPLY on a z-laid lake.
    */
  def prunedFilesN(manifest: DataFrame,
                   boxes: Seq[(String, Long, Long)]): Seq[String] = {
    require(boxes.nonEmpty, "need at least one (alias, lo, hi) box side")
    manifest
      .where(boxes.map { case (a, lo, hi) =>
        col(s"max_$a") >= lo && col(s"min_$a") <= hi }.reduce(_ && _))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Manifest-planned box read: scan only intersecting files
    * ([[ManifestIndex.readPruned]] — the lake directory is never listed),
    * re-apply the residual predicate on both dimensions. Correctness
    * never depends on the layout; only the pruned file count does.
    */
  def boxRead(spark: SparkSession, dir: String, manifest: DataFrame,
              colA: String, colB: String, loA: Long, hiA: Long,
              loB: Long, hiB: Long): DataFrame =
    boxReadN(spark, dir, manifest,
      Seq((colA, "a", loA, hiA), (colB, "b", loB, hiB)))

  /** The N-dimensional planned read: prune on every aliased span, scan
    * the surviving files, re-apply the full residual box. `boxes` rows
    * are (column, alias, lo, hi) with aliases matching the manifest's.
    */
  def boxReadN(spark: SparkSession, dir: String, manifest: DataFrame,
               boxes: Seq[(String, String, Long, Long)]): DataFrame = {
    require(boxes.nonEmpty, "need at least one (column, alias, lo, hi) side")
    val files = prunedFilesN(manifest,
      boxes.map { case (_, a, lo, hi) => (a, lo, hi) })
    ManifestIndex.readPruned(spark, dir, manifest, files)
      .where(boxes.map { case (c, _, lo, hi) => col(c).between(lo, hi) }
        .reduce(_ && _))
  }
}
