package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import graft.operators.{AnnSearch, Bm25, ChunkEmbed, IvfIndex, VectorMetric}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** TEXT retrieval serving — the hybrid (sparse + dense) half of the
  * serving surface beside [[SearchService]]'s vector search, per
  * [[Bm25]]'s own contract that production retrieval serves BOTH and
  * fuses ranks: `POST /hybrid` with a UTF-8 query string → BM25 top-fetchK
  * over a PERSISTED term-pruned store + hashed-embedding cosine top-fetchK
  * over the cached doc-embedding index → reciprocal-rank fusion → top-k
  * JSON envelope (the r4 gate row's exact pipeline, on the wire).
  * `POST /keyword` serves the sparse ranker alone (r3/r5's shape).
  *
  * Serving shape, per request:
  *  - sparse: [[Bm25.searchIndex]] over the [[Bm25.load]]ed artifact —
  *    the query's terms push into the postings lake as `In(term)`, so
  *    request IO is Σ_t df(t) over the query's handful of terms, never
  *    the lake (the bm25_probe scaling table's flat curve IS this path);
  *  - dense: cosine over the doc-grain [[ChunkEmbed.docEmbed]] index,
  *    cached at construction (C9 collection load) — exact
  *    ([[AnnSearch.batchTopK]], the anchor) or, under
  *    `denseMode = "ivf"`, KMeans-clustered at load and statically
  *    pruned to the nprobe best cells per request
  *    ([[AnnSearch.batchTopKIvf]]) — the [[SearchService]] scale path
  *    for embedding indexes past an exact per-request scan;
  *  - fusion: [[Bm25.rrf]] over the two truncated top-fetchK lists —
  *    nothing corpus-sized touches it.
  *
  * The protective surface mirrors [[SearchService]] (and the reference's
  * searcher): request-body cap → 413, token-bucket admission → 429,
  * anything thrown → 501. Queries whose terms miss the corpus entirely
  * still answer from the dense leg; empty/blank bodies answer 400.
  */
class HybridSearchService(
    corpus: DataFrame,
    idCol: String,
    textCol: String,
    /** A [[Bm25.save]]d store dir — the nightly artifact; serving never
      * refits. */
    bm25Dir: String,
    k: Int = 10,
    fetchK: Int = 20,
    dim: Int = 64,
    maxBodyBytes: Long = 1 << 20, // queries are text: 1 MB is generous
    maxReqPerSec: Int = 100,
    // Dense-leg serving mode: "exact" scores every cached vector per
    // request (the correctness anchor — right while the doc-embedding
    // index fits executor memory); "ivf" fits KMeans centroids at load
    // and each request scans only the nprobe best clusters — the
    // [[SearchService]] scale path, for corpora whose embedding index
    // outgrows an exact per-request scan. nprobe = nlist recovers exact
    // results (spec-pinned).
    denseMode: String = "exact",
    nlist: Int = 64,
    nprobe: Int = 8) {

  require(k >= 1 && fetchK >= k, s"need 1 <= k <= fetchK, got k=$k fetchK=$fetchK")
  require(Seq("exact", "ivf").contains(denseMode),
    s"unknown denseMode '$denseMode' (have: exact, ivf)")
  require(nlist >= 1 && nprobe >= 1,
    s"nlist $nlist and nprobe $nprobe must be >= 1")
  private val spark = corpus.sparkSession

  // ---- collection load (C9): the sparse artifact boots via load() (lazy
  // lake scans + 1-row stats); the dense doc-embedding index materializes
  // hot — cluster-assigned under "ivf" — the same cache-and-count
  // discipline as SearchService.
  private val bm25 = Bm25.load(spark, bm25Dir)
  require(bm25.idCol == idCol,
    s"store at $bm25Dir indexes '${bm25.idCol}', service configured for '$idCol'")
  private val denseIndex0 = ChunkEmbed.docEmbed(corpus, idCol, textCol, dim)
  private val (denseIndex, ivfModel) = denseMode match {
    case "exact" => (denseIndex0.cache(), None)
    case "ivf" =>
      // clamp k to the table size so tiny collections still load
      val n = denseIndex0.count()
      val (assigned, m) =
        IvfIndex.build(denseIndex0, "emb", math.min(nlist.toLong, n).toInt)
      (assigned.cache(), Some(m))
  }
  denseIndex.count()

  /** The per-request batch plan for a query string — public so specs can
    * compare it against the r4 batch pipeline and `.explain` what a
    * request runs. qid is fixed 0: one request, one query.
    */
  def hybridFrame(query: String): DataFrame = {
    import spark.implicits._
    val q = Seq((0L, query)).toDF("qid", textCol)
    val sparse = Bm25.searchIndex(bm25, q, "qid", textCol, fetchK)
    val qEmb = ChunkEmbed.docEmbed(q, "qid", textCol, dim)
    val dense = ivfModel match {
      case None =>
        AnnSearch.batchTopK(denseIndex, "emb", idCol,
          qEmb, "qid", "emb", fetchK, VectorMetric.Cosine)
      case Some(m) =>
        AnnSearch.batchTopKIvf(denseIndex, m, "emb", idCol, "cluster_id",
          qEmb, "qid", "emb", fetchK, nprobe, VectorMetric.Cosine)
    }
    Bm25.rrf(Seq(sparse, dense), "qid", idCol, "rank", k)
      .orderBy(col("rank"))
  }

  /** Sparse-only per-request plan (the /keyword route). */
  def keywordFrame(query: String): DataFrame = {
    import spark.implicits._
    val q = Seq((0L, query)).toDF("qid", textCol)
    Bm25.searchIndex(bm25, q, "qid", textCol, k).orderBy(col("rank"))
  }

  def search(query: String): Seq[Row] = hybridFrame(query).collect().toIndexedSeq
  def searchKeyword(query: String): Seq[Row] =
    keywordFrame(query).collect().toIndexedSeq

  /** Same envelope family as [[SearchService.toJson]]: docs carry the id,
    * the 0-based rank and the fused (or BM25) score.
    */
  private def toJson(docs: Seq[Row], scoreName: String): String = {
    import HttpServing.jsonValue
    val ds = docs.map { r =>
      s"""{"$idCol":${jsonValue(r.get(2))},"rank":${r.getLong(1)},""" +
        s""""$scoreName":${jsonValue(r.get(3))}}"""
    }.mkString(",")
    s"""{"RawDocsCount":"${docs.size}","response":{"docs":[$ds]}}"""
  }

  // the shared protective surface: admission bucket + guarded POST routes
  private val bucket = new HttpServing.TokenBucket(maxReqPerSec)

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def start(port: Int): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    server.setExecutor(pool)
    def route(path: String, run: String => Seq[Row], scoreName: String): Unit =
      HttpServing.guardedPost(server, path, maxBodyBytes, bucket, bytes => {
        val q = new String(bytes, StandardCharsets.UTF_8)
        if (q.trim.isEmpty) (400, """{"error":"empty query"}""")
        else (200, toJson(run(q), scoreName))
      })
    route("/hybrid", search, "rrf")
    route("/keyword", searchKeyword, "score")
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdown()
    denseIndex.unpersist()
  }
}
