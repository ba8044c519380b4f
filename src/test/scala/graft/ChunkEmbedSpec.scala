package graft

import graft.api.CorpusRecipe
import graft.operators.ChunkEmbed
import org.apache.spark.sql.functions._

/** [[ChunkEmbed]] — the retrieval-corpus build stage behind the r-family
  * gate rows (which hash-check it against DuckDB end to end; this spec
  * pins the pieces a hash mismatch would only report wholesale).
  */
class ChunkEmbedSpec extends SparkSpec {
  import spark.implicits._

  // the documented hash, driver-side: first 15 md5 hex chars as a long;
  // bucket = low 6 bits' residue, sign = bit 6
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }
  private def gold(chunkToks: Seq[String], dim: Int): Seq[Double] = {
    val acc = Array.fill(dim)(0.0)
    chunkToks.foreach { t =>
      val h = h60(t)
      acc((h % dim).toInt) += (if (((h >> 6) & 1) == 0) 1.0 else -1.0)
    }
    acc.toSeq
  }

  test("embed matches a driver-side replay of the documented formula") {
    val toks = (0 until 100).map(i => s"tok$i")
    val docs = Seq(
      (7L, toks.mkString(" ")), // 100 tokens -> chunks at 0, 40, 80
      (9L, "solo")              // single short chunk
    ).toDF("doc_id", "text")
    val got = ChunkEmbed.embed(docs).orderBy($"cid")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
    val want = Seq(
      700000L -> gold(toks.slice(0, 50), 64),
      700001L -> gold(toks.slice(40, 90), 64),
      700002L -> gold(toks.slice(80, 100), 64),
      900000L -> gold(Seq("solo"), 64))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("cid stays exact above 2^53/KeySpan (pure long arithmetic)") {
    // id*KeySpan = 9.1e15 > 2^53: under the old double-promoted key
    // expression the ULP here is 2, so adjacent chunk indices rounded onto
    // one cid and chunks silently merged. The guard admits this id
    // (maxId ~ 9.2e13), so only exact long arithmetic keeps keys distinct.
    val id = 91_000_000_000L
    val toks = (0 until 100).map(i => s"tok$i")
    val docs = Seq((id, toks.mkString(" "))).toDF("doc_id", "text")
    val cids = ChunkEmbed.embed(docs).orderBy($"cid")
      .collect().map(_.getLong(0)).toSeq
    assert(cids == Seq(0L, 1L, 2L).map(id * ChunkEmbed.KeySpan + _),
      s"got $cids — adjacent chunks aliased onto one cid")
  }

  test("key-domain guard: an out-of-range doc_id fails the job loudly") {
    // the r14 guard itself was never spec'd — a negative id (or one at or
    // above Long.MaxValue/KeySpan) must raise, not silently alias cids
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    val neg = intercept[Throwable] {
      ChunkEmbed.embed(Seq((-1L, "a b c")).toDF("doc_id", "text")).collect()
    }
    assert(messages(neg).contains("ChunkEmbed.embed"), messages(neg).take(400))
    val huge = intercept[Throwable] {
      ChunkEmbed.embed(
        Seq((Long.MaxValue / ChunkEmbed.KeySpan, "a b c")).toDF("doc_id", "text"))
        .collect()
    }
    assert(messages(huge).contains("ChunkEmbed.embed"), messages(huge).take(400))
  }

  test("docEmbed: one embedding per doc, gold formula over the whole token list") {
    val toks = (0 until 100).map(i => s"tok$i")
    val docs = Seq((7L, toks.mkString(" ")), (9L, "solo")).toDF("doc_id", "text")
    val got = ChunkEmbed.docEmbed(docs).orderBy($"doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
    assert(got.toSeq == Seq(7L -> gold(toks, 64), 9L -> gold(Seq("solo"), 64)))
  }

  test("chunk grain: ceil(tokens/stride) chunks per doc on the real table") {
    val docs = Tables.documents(spark, Sf0001)
    val wantChunks = docs
      .select(ceil(size(split($"text", " ")) / 40.0).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(ChunkEmbed.embed(docs).count() == wantChunks)
  }

  test("embeddings are integer-valued (FP-exact for cross-engine compares)") {
    val e = ChunkEmbed.embed(Tables.documents(spark, Sf0001))
    val offenders = e
      .select(explode($"emb").as("v")).where($"v" =!= rint($"v")).count()
    assert(offenders == 0)
  }

  test("recipe terminal delegates to the operator verbatim") {
    val docs = Tables.documents(spark, Sf0001).limit(20)
    val viaApi = CorpusRecipe(docs).chunkEmbed()
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val direct = ChunkEmbed.embed(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(viaApi == direct)
  }
}
