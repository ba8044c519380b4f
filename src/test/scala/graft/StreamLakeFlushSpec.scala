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
  }
}
