package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.multimodal.ImageOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Serving layer (SURVEY §3.3, searcher.js): `POST /search` with raw image
  * bytes → in-JVM descriptor extraction → top-k inner-product search over a
  * cached vector table → Solr-mimic JSON envelope (`searcher.js:223-236`).
  *
  * Envelope parity: each doc carries the id, the requested `outputFields`
  * (the reference returns `hash_id`, `duration`, `primary_key` —
  * searcher.js:106) and the score. The reference's protective surface is
  * kept too: a request-body cap (10 MB, searcher.js:129) and a per-second
  * rate limit (100 req/s, searcher.js:125-127) answering 413/429.
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
    topK: Int = 15, // searcher.js:103
    outputFields: Seq[String] = Nil,
    maxBodyBytes: Long = 10L << 20, // searcher.js:129 "10mb"
    maxReqPerSec: Int = 100, // searcher.js:125-127
    algo: String = "in") { // loader.js:20-21: one algo keys ingest + search

  require(outputFields.forall(table.columns.contains),
    s"outputFields must exist in the table: ${outputFields.mkString(", ")}")
  require(algo == "in" || ImageOps.descriptors.contains(algo),
    s"unknown descriptor algo '$algo' (have: in, ${ImageOps.descriptors.keys.mkString(", ")})")

  // Query-side descriptor — MUST match the one the table was ingested with
  // (the reference keys both ends on TRACE_ALGO; a table of EHD vectors
  // searched with an intensity query would silently return noise).
  private val describe: Array[Byte] => Array[Float] =
    if (algo == "in") ImageOps.intensityDescriptor(_, grid)
    else ImageOps.descriptors(algo)

  private val cached = table.cache()
  cached.count() // materialize — the reference's loadCollectionSync (C9)

  private def bestDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    if (table.sparkSession.catalog.functionExists("fast_dot"))
      graft.functions.VectorFunctions.fastDot(a, b)
    else graft.functions.VectorFunctions.dot(a, b)

  /** bytes → descriptor → top-k rows of (idCol, outputFields…, score).
    * Returns None for undecodable input (reference answers 500 on bad
    * images, searcher.js:232-236).
    */
  def search(imageBytes: Array[Byte]): Option[Seq[Row]] =
    Option(describe(imageBytes)).map { q =>
      val outCols = (col(idCol) +: outputFields.map(col)) :+
        bestDot(col(vecCol), typedlit(q.map(_.toDouble).toIndexedSeq)).as("score")
      cached.select(outCols: _*)
        .orderBy(desc("score"), col(idCol))
        .limit(topK)
        .collect().toIndexedSeq
    }

  /** Solr-mimic envelope (searcher.js:223-231): docs carry id, the
    * configured output fields and the score.
    */
  def toJson(docs: Seq[Row]): String = {
    val names = (idCol +: outputFields) :+ "score"
    val ds = docs.map { r =>
      names.zipWithIndex.map { case (n, i) => s""""$n":${jsonValue(r.get(i))}""" }
        .mkString("{", ",", "}")
    }.mkString(",")
    s"""{"RawDocsCount":"${docs.size}","RawDocsSearchTime":"0","ReRankSearchTime":"0","response":{"docs":[$ds]}}"""
  }

  private def jsonValue(v: Any): String = v match {
    case null                 => "null"
    case s: String            => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case f: Float             => f.toDouble.toString
    case n: java.lang.Number  => n.toString
    case b: Boolean           => b.toString
    case other                => jsonValue(other.toString)
  }

  // Token bucket, refilled continuously — the JS express-rate-limit window
  // (searcher.js:125-127) smoothed to a steady per-second budget.
  private var tokens: Double = maxReqPerSec.toDouble
  private var lastRefill: Long = System.nanoTime()
  private def admit(): Boolean = synchronized {
    val now = System.nanoTime()
    tokens = math.min(maxReqPerSec.toDouble,
      tokens + (now - lastRefill) / 1e9 * maxReqPerSec)
    lastRefill = now
    if (tokens >= 1.0) { tokens -= 1.0; true } else false
  }

  private var server: HttpServer = _

  def start(port: Int): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/search", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
        else if (!admit()) respond(ex, 429, """{"error":"rate limit exceeded"}""")
        else {
          val declared = Option(ex.getRequestHeaders.getFirst("Content-Length"))
            .flatMap(l => scala.util.Try(l.toLong).toOption)
          if (declared.exists(_ > maxBodyBytes))
            respond(ex, 413, """{"error":"body too large"}""")
          else {
            // readNBytes caps the read even when Content-Length lies
            val bytes = ex.getRequestBody.readNBytes(maxBodyBytes.toInt + 1)
            if (bytes.length > maxBodyBytes)
              respond(ex, 413, """{"error":"body too large"}""")
            else search(bytes) match {
              case Some(docs) => respond(ex, 200, toJson(docs))
              case None       => respond(ex, 500, """{"error":"undecodable image"}""")
            }
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
