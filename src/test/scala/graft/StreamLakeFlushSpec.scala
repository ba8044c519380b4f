package graft

import graft.operators.{IncrementalDedup, TextDedup}
import graft.streaming.{StreamDoc, StreamingNearDedup}

/** VERDICT r9 #4: the streaming dedup and the incremental signature lake
  * are the same artifact at different temperatures. This spec streams a
  * corpus in TWO separate stream runs over one checkpoint (a restart),
  * flushing band signatures to a lake, then probes the flushed lake with
  * the next day's batch delta — asserting (1) the flushed lake is
  * row-for-row the batch-written lake and (2) the delta probe's pair set
  * equals the full batch recompute restricted to delta-touching pairs
  * (the e2i gold-standard contract, now reachable from a stream-built
  * lake).
  */
class StreamLakeFlushSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("stream-flushed signature lake equals the batch lake and serves the delta probe") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs.where($"doc_id" % 10 =!= 0)
    val delta = docs.where($"doc_id" % 10 === 0)

    val base = java.nio.file.Files.createTempDirectory("graft-flush").toString
    val src = s"$base/src"
    val lake = s"$base/lake"
    val ckpt = s"$base/ckpt"

    def run(): Unit = {
      val stream = spark.readStream.schema(corpus.schema).parquet(src)
        .select($"doc_id".as("id"), $"text").as[StreamDoc]
      StreamingNearDedup
        .sigLakeSink(stream, lake, ckpt, 8, 3, 4, availableNow = true)
        .awaitTermination()
    }
    // day 1, wave 1 — then a stream RESTART picks up wave 2 exactly once
    corpus.where($"doc_id" % 2 === 1).write.parquet(src)
    run()
    corpus.where($"doc_id" % 2 === 0).write.mode("append").parquet(src)
    run()

    val lakeDF = spark.read.parquet(lake).select($"doc_id", $"band", $"bsig")
    val batchSigs =
      IncrementalDedup.bandSignatures(corpus, "text", "doc_id", 8, 3, 4)
    assert(lakeDF.exceptAll(batchSigs).isEmpty && batchSigs.exceptAll(lakeDF).isEmpty,
      "flushed lake != batch bandSignatures")

    // next day: the batch delta probes the stream-built lake
    val deltaSigs =
      IncrementalDedup.bandSignatures(delta, "text", "doc_id", 8, 3, 4)
    val got = IncrementalDedup.deltaPairs(lakeDF, deltaSigs, "doc_id")
      .select($"d1", $"d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaIds = delta.select($"doc_id").collect().map(_.getLong(0)).toSet
    val want = TextDedup.minhashBandPairs(docs, "text", "doc_id", 8, 3, 4)
      .select($"d1", $"d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(got == want, s"got=${got.size} want=${want.size} " +
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")

    // the documented out-of-band maintenance step: compact the flat flushed
    // lake into the (band, bsig)-bucketed at-rest layout and prove the
    // probe gets BOTH scale properties — zero lake-side shuffles (at-rest
    // clustering satisfies the joins) and the delta's bsig keys pushed
    // into the parquet scan (row-group skipping)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val table = s"flushlake_compacted_${ProcessHandle.current().pid()}"
    graft.sources.LakeLayout.writeBucketedBy(
      spark.read.parquet(lake), table, 4, Seq("band", "bsig"), Seq("band", "bsig"))
    // AQE off so the executed plan carries concrete scan nodes, broadcasts
    // off so the pair join needs the lake's clustering (the 100 TB shape) —
    // same pinning as PlanAuditSpec's e2i audit
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = IncrementalDedup.deltaPairs(spark.table(table), deltaSigs, "doc_id")
      val gotCompacted = probe.select($"d1", $"d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotCompacted == want, "compaction must not change the pair set")
      val scans = probe.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == table) => f
      }
      assert(scans.nonEmpty && scans.forall(_.bucketedScan),
        "compacted lake must serve bucketed scans")
      assert(scans.forall(
        _.metadata.getOrElse("PushedFilters", "").contains("In(bsig")),
        "delta bsig keys must be pushed into the compacted lake scan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
