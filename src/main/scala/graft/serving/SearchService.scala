package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.multimodal.ImageOps
import graft.operators.AnnSearch
import org.apache.spark.sql.DataFrame

/** Serving layer (SURVEY §3.3, searcher.js): `POST /search` with raw image
  * bytes → in-JVM descriptor extraction → top-k inner-product search over a
  * cached vector table → Solr-mimic JSON envelope (`searcher.js:223-236`).
  *
  * Differences from the reference, by design:
  *  - no Solr hop (A13) and no temp-file self-upload (A14): bytes are
  *    decoded in-process (ImageOps), the query vector never touches disk;
  *  - the collection "load" (C9, `loadCollectionSync`) is `df.cache()` on a
  *    long-lived SparkSession — executors keep the columnar data hot;
  *  - search is the exact scored scan (TakeOrderedAndProject) — at cluster
  *    scale swap in IvfIndex.search for the nprobe-pruned path.
  *
  * JDK HttpServer keeps the dependency surface at zero; a production front
  * would sit behind any HTTP fabric and call [[search]] the same way.
  */
class SearchService(
    table: DataFrame,
    vecCol: String,
    idCol: String,
    grid: Int = 8,
    topK: Int = 15) { // searcher.js:103

  private val cached = table.cache()
  cached.count() // materialize — the reference's loadCollectionSync (C9)

  /** bytes → descriptor → top-k (id, score). Returns None for undecodable
    * input (reference answers 500 on bad images, searcher.js:232-236).
    */
  def search(imageBytes: Array[Byte]): Option[Seq[(Long, Double)]] =
    Option(ImageOps.intensityDescriptor(imageBytes, grid)).map { q =>
      AnnSearch.exactTopK(cached, vecCol, idCol,
          q.map(_.toDouble).toIndexedSeq, topK)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toIndexedSeq
    }

  /** Solr-mimic envelope (searcher.js:223-231). */
  def toJson(docs: Seq[(Long, Double)]): String = {
    val ds = docs.map { case (id, s) =>
      s"""{"$idCol":$id,"score":$s}"""
    }.mkString(",")
    s"""{"RawDocsCount":"${docs.size}","RawDocsSearchTime":"0","ReRankSearchTime":"0","response":{"docs":[$ds]}}"""
  }

  private var server: HttpServer = _

  def start(port: Int): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/search", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
        else {
          val bytes = ex.getRequestBody.readAllBytes()
          search(bytes) match {
            case Some(docs) => respond(ex, 200, toJson(docs))
            case None       => respond(ex, 500, """{"error":"undecodable image"}""")
          }
        }
      } catch { case e: Exception => respond(ex, 501, s"""{"error":"${e.getClass.getSimpleName}"}""") }
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    cached.unpersist()
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }
}
