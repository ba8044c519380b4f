package graft

import graft.sources.ManifestIndex
import org.apache.spark.sql.functions._

/** Contracts of the file-stats manifest (ManifestIndex.scala): planning
  * from per-file min/max actually SHRINKS the file list on a
  * range-clustered lake, never loses rows on any layout (clustered,
  * shuffled, straddling bounds), and returns an empty, correctly-typed
  * frame when no file intersects.
  */
class ManifestIndexSpec extends SparkSpec {
  import spark.implicits._

  private def writeLake(clustered: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString + "/lake"
    val docs = spark.range(0, 400).select($"id".as("doc_id"),
      ($"id" % 7).as("v"))
    val laid =
      if (clustered) docs.repartitionByRange(8, $"doc_id").sortWithinPartitions($"doc_id")
      else docs.repartition(8) // round-robin: every file spans ~everything
    laid.write.mode("overwrite").parquet(dir)
    dir
  }

  test("range-clustered lake: the pruned list shrinks, rows match the plain filter") {
    val dir = writeLake(clustered = true)
    val manifest = ManifestIndex.build(spark, dir, "doc_id").localCheckpoint()
    val total = manifest.count()
    assert(total >= 8, "fixture must produce one file per range partition")
    val files = ManifestIndex.prunedFiles(manifest, 90, 140)
    assert(files.nonEmpty && files.size < total,
      s"a 50-key range must not read all $total files (got ${files.size})")
    val got = ManifestIndex.rangeRead(spark, dir, manifest, "doc_id", 90, 140)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.read.parquet(dir).where($"doc_id".between(90, 140))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.size == 51)
  }

  test("unclustered lake degrades gracefully: full list, still correct") {
    val dir = writeLake(clustered = false)
    val manifest = ManifestIndex.build(spark, dir, "doc_id").localCheckpoint()
    val got = ManifestIndex.rangeRead(spark, dir, manifest, "doc_id", 90, 140)
      .collect().map(_.getLong(0)).toSet
    assert(got == (90L to 140L).toSet)
  }

  test("no intersecting file: empty frame with the lake's schema") {
    val dir = writeLake(clustered = true)
    val manifest = ManifestIndex.build(spark, dir, "doc_id").localCheckpoint()
    assert(ManifestIndex.prunedFiles(manifest, 1000, 2000).isEmpty)
    val out = ManifestIndex.rangeRead(spark, dir, manifest, "doc_id", 1000, 2000)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "v"))
    assert(out.count() == 0)
  }

  test("refresh: appends scan only new files, compaction drops stale rows") {
    def norm(s: String) = new java.net.URI(s).getPath
    def asSet(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (norm(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val dir = writeLake(clustered = true)
    val m0 = ManifestIndex.build(spark, dir, "doc_id").localCheckpoint()
    // day 2: an append drops two new files into the lake
    spark.range(400, 500).select($"id".as("doc_id"), ($"id" % 7).as("v"))
      .repartitionByRange(2, $"doc_id").sortWithinPartitions($"doc_id")
      .write.mode("append").parquet(dir)
    val refreshed = ManifestIndex.refresh(spark, dir, "doc_id", m0).localCheckpoint()
    assert(asSet(refreshed) == asSet(ManifestIndex.build(spark, dir, "doc_id")),
      "incremental refresh must equal a full rebuild")
    assert(refreshed.count() == m0.count() + 2)
    // the refreshed manifest plans reads over the new range too
    val got = ManifestIndex.rangeRead(spark, dir, refreshed, "doc_id", 420, 430)
      .collect().map(_.getLong(0)).toSet
    assert(got == (420L to 430L).toSet)
    // compaction: the lake is rewritten, every old manifest row is stale
    spark.read.parquet(dir).repartitionByRange(3, $"doc_id")
      .sortWithinPartitions($"doc_id")
      .write.mode("overwrite").parquet(dir)
    val afterCompact = ManifestIndex.refresh(spark, dir, "doc_id", refreshed)
    assert(asSet(afterCompact) == asSet(ManifestIndex.build(spark, dir, "doc_id")),
      "stale rows for rewritten files must be dropped")
  }

  test("composed prune: IVF cluster partitions x manifest key spans multiply; served top-k parity (VERDICT r11 #9)") {
    import graft.operators.{AnnSearch, IvfIndex, VectorMetric}
    // ids ORTHOGONAL to clusters (id = i*4 + c): a per-title range query
    // and the nprobe cluster filter prune along independent axes, so the
    // surviving file count multiplies down instead of collapsing to one
    // axis. Layout: range-laid by id WITHIN each cluster partition.
    val rnd = new scala.util.Random(5L)
    val rows = for (c <- 0 until 4; i <- 0 until 60) yield {
      val v = Array.tabulate(16)(d =>
        (if (d / 4 == c) 10.0f else 0.0f) + (rnd.nextFloat() - 0.5f))
      (i * 4L + c, v)
    }
    val (assigned, model) = IvfIndex.build(rows.toDF("id", "vec"), "vec", 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-cmanifest").toString + "/ivf"
    assigned.repartitionByRange(4, $"id").sortWithinPartitions($"id")
      .write.partitionBy("cluster_id").parquet(dir)
    val manifest = ManifestIndex
      .buildPartitioned(spark, dir, "id", "cluster_id").localCheckpoint()
    val totalFiles = manifest.count()

    val q = Array.tabulate(16)(d =>
      (if (d / 4 == 2) 10.0 else 0.0) + (rnd.nextDouble() - 0.5))
    val probed = IvfIndex
      .rankCentroids(model, q.toIndexedSeq, VectorMetric.Ip, 2).toIndexedSeq
    val (lo, hi) = (40L, 140L)
    val files = ManifestIndex
      .prunedClusterRangeFiles(manifest, "cluster_id", probed, lo, hi)
    val clusterOnly = manifest.where($"cluster_id".isin(probed: _*)).count()
    // both prunes demonstrably active — each axis strictly shrinks
    assert(clusterOnly < totalFiles,
      s"cluster prune inactive: $clusterOnly of $totalFiles files")
    assert(files.nonEmpty && files.size < clusterOnly,
      s"range prune inactive: ${files.size} of $clusterOnly probed-cluster files")
    assert(files.forall(f => probed.exists(c => f.contains(s"cluster_id=$c"))))

    // the served result off the doubly-pruned scan is exactly the result
    // off the full lake under the same predicates
    def top(df: org.apache.spark.sql.DataFrame) =
      AnnSearch.exactTopK(df, "vec", "id", q.toIndexedSeq, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = top(ManifestIndex.clusterRangeRead(
      spark, dir, manifest, "id", "cluster_id", probed, lo, hi))
    val want = top(spark.read.parquet(dir)
      .where($"cluster_id".isin(probed: _*) && $"id".between(lo, hi)))
    assert(got == want && got.nonEmpty)
  }

  test("bounds straddling a file boundary: residual predicate trims the edges") {
    val dir = writeLake(clustered = true)
    val manifest = ManifestIndex.build(spark, dir, "doc_id").localCheckpoint()
    // bounds chosen to cut through file interiors on the 400/8 layout
    val got = ManifestIndex.rangeRead(spark, dir, manifest, "doc_id", 37, 363)
      .agg(count(lit(1)), min($"doc_id"), max($"doc_id"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (327L, 37L, 363L))
  }
}
