package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

/** [[graft.serving.HybridSearchService]] end to end over the wire: the
  * served /hybrid response must equal the r4 batch pipeline
  * ([[graft.api.CorpusRecipe.hybridTopK]]) for the same query — same ids,
  * same ranks — and the protective surface (413/429/400/405) must answer
  * like the vector service's. The sparse leg runs off the PERSISTED
  * store, so this also exercises load() + the pushed-In(term) probe on
  * the serving path.
  */
class HybridServiceSpec extends SparkSpec {
  import spark.implicits._

  private def post(port: Int, path: String, body: Array[Byte]): (Int, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setFixedLengthStreamingMode(body.length)
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val out = if (in != null) {
      val b = new String(in.readAllBytes(), "UTF-8"); in.close(); b
    } else ""
    (code, out)
  }

  test("/hybrid equals the r4 batch pipeline; /keyword equals searchIndex; guards answer") {
    val docs = Tables.documents(spark, Sf0001)
    val corpus = docs.where($"doc_id" >= 3).select($"doc_id", $"text")
    val queryText = docs.where($"doc_id" === 0).select($"text").head().getString(0)

    val dir = graft.sources.TempDirs.register(
      s"/tmp/graft_hybrid_svc_${ProcessHandle.current().pid()}")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    val svc = new graft.serving.HybridSearchService(
      corpus, "doc_id", "text", dir, k = 10, fetchK = 20)
    val port = svc.start(0)
    try {
      val (code, body) = post(port, "/hybrid", queryText.getBytes("UTF-8"))
      assert(code == 200, body)
      // ids in served rank order, parsed from the envelope
      val served = "\"doc_id\":(\\d+)".r.findAllMatchIn(body)
        .map(_.group(1).toLong).toSeq
      val want = graft.api.CorpusRecipe(corpus)
        .hybridTopK(Seq((0L, queryText)).toDF("qid", "text"),
          "qid", "text", k = 10, fetchK = 20)
        .orderBy($"rank").collect().map(_.getLong(2)).toSeq
      assert(served == want && served.nonEmpty,
        s"served $served must equal the batch pipeline $want")

      val (kc, kb) = post(port, "/keyword", queryText.getBytes("UTF-8"))
      assert(kc == 200, kb)
      val servedK = "\"doc_id\":(\\d+)".r.findAllMatchIn(kb)
        .map(_.group(1).toLong).toSeq
      val wantK = Bm25.searchIndex(Bm25.load(spark, dir),
          Seq((0L, queryText)).toDF("qid", "text"), "qid", "text", 10)
        .orderBy($"rank").collect().map(_.getLong(2)).toSeq
      assert(servedK == wantK && servedK.nonEmpty)

      // protective surface: empty body, oversized body, wrong method.
      // The oversized case uses java.net.http.HttpClient: the server
      // 413s off the DECLARED length without reading the body, and
      // HttpURLConnection's streaming writer turns that early response
      // into a connection reset (SearchServiceSpec precedent).
      assert(post(port, "/hybrid", Array.emptyByteArray)._1 == 400)
      val big = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
            new java.net.URI(s"http://127.0.0.1:$port/hybrid"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(
            new Array[Byte]((1 << 20) + 2))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(big.statusCode() == 413)
      val get = new java.net.URL(s"http://127.0.0.1:$port/hybrid")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(get.getResponseCode == 405)
    } finally svc.stop()
  }

  test("denseMode=ivf: full-probe serving equals the exact dense leg; pruned probe serves") {
    val docs = Tables.documents(spark, Sf0001)
    val corpus = docs.where($"doc_id" >= 3).select($"doc_id", $"text")
    val queryText = docs.where($"doc_id" === 1).select($"text").head().getString(0)
    val dir = graft.sources.TempDirs.register(
      s"/tmp/graft_hybrid_ivf_${ProcessHandle.current().pid()}")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    def served(svc: graft.serving.HybridSearchService): Seq[Long] = {
      val port = svc.start(0)
      try {
        val (code, body) = post(port, "/hybrid", queryText.getBytes("UTF-8"))
        assert(code == 200, body)
        "\"doc_id\":(\\d+)".r.findAllMatchIn(body).map(_.group(1).toLong).toSeq
      } finally svc.stop()
    }
    // nprobe = nlist: the IVF leg scans every cell — wire results must
    // equal the exact-mode service's verbatim (the IvfSpec recall anchor)
    val exactSvc = new graft.serving.HybridSearchService(
      corpus, "doc_id", "text", dir, k = 10, fetchK = 20)
    val fullProbe = new graft.serving.HybridSearchService(
      corpus, "doc_id", "text", dir, k = 10, fetchK = 20,
      denseMode = "ivf", nlist = 8, nprobe = 8)
    val want = served(exactSvc)
    assert(served(fullProbe) == want && want.nonEmpty,
      "full-probe ivf dense leg must reproduce the exact service")
    // the production shape — pruned probe — answers a full top-k
    val pruned = new graft.serving.HybridSearchService(
      corpus, "doc_id", "text", dir, k = 10, fetchK = 20,
      denseMode = "ivf", nlist = 8, nprobe = 2)
    assert(served(pruned).length == 10)
  }

  test("rate limiter answers 429 past the per-second budget") {
    val docs = Tables.documents(spark, Sf0001)
    val corpus = docs.where($"doc_id" >= 3).select($"doc_id", $"text")
    val dir = graft.sources.TempDirs.register(
      s"/tmp/graft_hybrid_svc_rl_${ProcessHandle.current().pid()}")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    val svc = new graft.serving.HybridSearchService(
      corpus, "doc_id", "text", dir, maxReqPerSec = 1)
    val port = svc.start(0)
    try {
      post(port, "/keyword", "table".getBytes("UTF-8")) // warm the plan
      Thread.sleep(1100) // refill the single token
      // burst CONCURRENTLY: admission happens at request start, so a
      // 1-token bucket passes one and 429s the rest before any refill
      // (sequential requests each take longer than the refill period)
      val codes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
      val threads = (0 until 6).map(_ => new Thread(() =>
        codes.add(post(port, "/keyword", "table".getBytes("UTF-8"))._1)))
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val cs = codes.asScala.map(_.toInt).toSeq
      assert(cs.contains(429), s"expected a 429 in $cs")
      assert(cs.contains(200), s"expected a 200 in $cs")
    } finally svc.stop()
  }
}
