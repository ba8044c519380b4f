package graft

import graft.serving.SearchService
import org.apache.spark.sql.functions._

/** Pins the serving-latency ordering the bench sidecar records: once the
  * table outgrows the per-request job floor, a quantized probe (IVF prune
  * + SQ8 byte codes) must answer faster than the exact full scan — the
  * whole reason the reference serves through IVF_SQ8 (searcher.js:99-110)
  * instead of brute force. The fixture is sized so exact compute dominates
  * the floor (40k × 512 floats in ONE cached partition ≈ 20M multiply-adds
  * per request single-threaded), while the SQ8 probe scans 1/16 of the
  * rows as bytes. Medians over 21 requests; one retry absorbs a host steal
  * storm (this box's documented noise mode) without hiding a real
  * inversion, which would fail both attempts.
  */
class ServingLatencySpec extends SparkSpec {

  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  test("quantized serving p50 beats exact once the table outgrows the job floor") {
    val dim = 512
    val emb = spark.range(40000).select(
        col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), j -> cast(sin(id * j) as float))")
          .as("embedding"))
      .repartition(1).cache()
    emb.count()
    val queries = emb.limit(21).collect().map(_.getSeq[Float](1).toArray)

    def medianMs(svc: SearchService): Double = {
      queries.take(3).foreach(svc.searchVector) // warm the serving plan
      p50(queries.toIndexedSeq.map { q =>
        val t = System.nanoTime()
        svc.searchVector(q)
        (System.nanoTime() - t) / 1e6
      })
    }

    val exact = new SearchService(emb, "embedding", "vec_id", mode = "exact")
    val sq8 = new SearchService(emb, "embedding", "vec_id",
      mode = "ivf_sq8", nlist = 16, nprobe = 1)
    val ok = (1 to 2).exists { _ =>
      val (e, s) = (medianMs(exact), medianMs(sq8))
      info(f"exact p50 $e%.1f ms, ivf_sq8 p50 $s%.1f ms")
      s < e
    }
    assert(ok, "ivf_sq8 p50 did not beat exact p50 in two attempts")
    emb.unpersist()
  }
}
