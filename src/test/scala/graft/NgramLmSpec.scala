package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

/** [[NgramLm]] — the t21/t22/t23 gate rows hash-check fit → score and the
  * persisted/appended stores against DuckDB; this spec pins the Stupid
  * Backoff arithmetic against a driver-side brute force on a corpus built
  * to exercise ALL THREE backoff legs, the prune-at-score-time semantics,
  * the OOV null marker, the store round-trip / append ≡ refit / compaction
  * equivalences, and the torn-store marker refusals.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // "a b c a b c": trigram (a,b,c) survives minCount=2; (b,c,a) falls to
  // the pruned-bigram check — (c,a) is a singleton bigram, so it lands on
  // the unigram floor; (c,a,b) has surviving context bigram (a,b), so it
  // takes the bigram leg. "x y z q" is all singletons — pure unigram legs.
  private val corpus = Map(
    10L -> Seq("a", "b", "c", "a", "b", "c"),
    11L -> Seq("x", "y", "z", "q"))

  private def corpusDf = corpus.toSeq
    .map { case (id, toks) => (id, toks.mkString(" ")) }
    .toDF("doc_id", "text")

  /** The same backoff, computed driver-side from first principles, with
    * the identical nested-expression shape and position-ordered fold.
    */
  private def brute(docs: Map[Long, Seq[String]],
                    minCount: Long): Map[Long, (Long, Double)] = {
    def counts(n: Int): Map[Seq[String], Long] = docs.values.toSeq
      .flatMap(_.sliding(n).filter(_.length == n).map(_.toList: Seq[String]))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val u = counts(1)
    val b = counts(2).filter(_._2 >= minCount)
    val t = counts(3).filter(_._2 >= minCount)
    val n = u.values.sum.toDouble
    docs.flatMap { case (id, toks) =>
      val tris = toks.sliding(3).filter(_.length == 3).toSeq
      if (tris.isEmpty) None
      else {
        val lps = tris.map { w =>
          val s = t.get(w) match {
            case Some(c3) => c3.toDouble / b(w.take(2)).toDouble
            case None => 0.4 * (b.get(w.drop(1)) match {
              case Some(c2) => c2.toDouble / u(Seq(w(1))).toDouble
              case None => 0.4 * (u(Seq(w(2))).toDouble / n)
            })
          }
          math.log(s)
        }
        val sum = lps.foldLeft(0.0)(_ + _)
        Some(id -> (tris.length.toLong,
          BigDecimal(-sum / tris.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
  }

  private def scored(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("minCount=2 exercises all three legs and matches the brute force") {
    val model = NgramLm.fit(corpusDf, "text")
    val got = scored(NgramLm.score(corpusDf, "doc_id", "text", model, minCount = 2L))
    val want = brute(corpus, minCount = 2L)
    assert(got == want, s"got $got want $want")
    // the corpus really does reach all three legs: doc 10 mixes trigram +
    // bigram + unigram legs, doc 11 is pure unigram floor — assert the
    // two documents disagree with a trigram-only replay
    val triOnly = brute(corpus, minCount = 1L)
    assert(got(11L) != triOnly(11L))
  }

  test("minCount=1 on the fit corpus stays on the trigram leg everywhere") {
    val model = NgramLm.fit(corpusDf, "text")
    val got = scored(NgramLm.score(corpusDf, "doc_id", "text", model))
    assert(got == brute(corpus, minCount = 1L))
  }

  test("documents with fewer than three tokens drop out") {
    val df = Seq((1L, "a b"), (2L, "a"), (3L, "a b c")).toDF("doc_id", "text")
    val model = NgramLm.fit(df, "text")
    val got = NgramLm.score(df, "doc_id", "text", model)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("an out-of-vocabulary token scores nll NULL — a marker, not a number") {
    val model = NgramLm.fit(corpusDf, "text")
    val probe = Seq((99L, "a b UNSEEN"), (98L, "a b c")).toDF("doc_id", "text")
    val rows = NgramLm.score(probe, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(rows(99L), "unseen token must yield null nll")
    assert(!rows(98L), "in-vocabulary doc must score")
  }

  test("guards: reserved idCol and minCount < 1 refuse") {
    val model = NgramLm.fit(corpusDf, "text")
    intercept[IllegalArgumentException] {
      NgramLm.score(corpusDf.withColumnRenamed("doc_id", "w1"), "w1", "text", model)
    }
    intercept[IllegalArgumentException] {
      NgramLm.score(corpusDf, "doc_id", "text", model, minCount = 0L)
    }
  }

  // --- durable store -----------------------------------------------------

  private def tmp(tag: String) = graft.sources.TempDirs.register(
    s"/tmp/graft_ngram_spec_${ProcessHandle.current().pid()}_$tag")

  private def tableSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def modelEqual(a: NgramLm.Model, b: NgramLm.Model): Unit = {
    assert(tableSet(a.trigrams) == tableSet(b.trigrams), "trigram counts differ")
    assert(tableSet(a.bigrams) == tableSet(b.bigrams), "bigram counts differ")
    assert(tableSet(a.unigrams) == tableSet(b.unigrams), "unigram counts differ")
  }

  test("save -> load round-trips the counts bit-exactly; scores identical") {
    val dir = tmp("roundtrip")
    val model = NgramLm.fit(corpusDf, "text")
    NgramLm.save(model, dir)
    val loaded = NgramLm.load(spark, dir)
    modelEqual(loaded, model)
    assert(scored(NgramLm.score(corpusDf, "doc_id", "text", loaded, 2L)) ==
      scored(NgramLm.score(corpusDf, "doc_id", "text", model, 2L)))
  }

  test("appendStore ≡ refit over the union, artifact by artifact") {
    val dir = tmp("append")
    val old = corpusDf.where($"doc_id" === 10L)
    val delta = corpusDf.where($"doc_id" === 11L)
    NgramLm.save(NgramLm.fit(old, "text"), dir)
    NgramLm.appendStore(spark, dir, delta, "text")
    modelEqual(NgramLm.load(spark, dir), NgramLm.fit(corpusDf, "text"))
  }

  test("compactStore preserves the folded counts and the store stays loadable") {
    val dir = tmp("compact")
    NgramLm.save(NgramLm.fit(corpusDf.where($"doc_id" === 10L), "text"), dir)
    NgramLm.appendStore(spark, dir, corpusDf.where($"doc_id" === 11L), "text")
    NgramLm.compactStore(spark, dir, numFiles = 1)
    modelEqual(NgramLm.load(spark, dir), NgramLm.fit(corpusDf, "text"))
    // compaction really rewrote: the trigram table is one part file now
    val parts = new java.io.File(s"$dir/trigrams")
      .listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 1, s"expected 1 compacted part file, got $parts")
  }

  test("streaming ingest feeds the count store: foreachBatch appendStore ≡ refit") {
    // the A-family tie-in: a document stream drains micro-batch by
    // micro-batch into the persisted count lake — appendStore per batch,
    // exactly-once by the sink's idempotence contract (counts ADD, so the
    // stream must not replay a batch; checkpointing owns that in the real
    // pipeline) — and the grown store is integer-identical to one fit
    // over everything the stream delivered
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("stream")
    NgramLm.save(NgramLm.fit(corpusDf.limit(0), "text"), dir) // empty boot store
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        NgramLm.appendStore(spark, dir, batch, "text")
      }
      .start()
    try {
      input.addData(10L -> corpus(10L).mkString(" "))
      q.processAllAvailable()
      input.addData(11L -> corpus(11L).mkString(" "))
      q.processAllAvailable()
    } finally q.stop()
    modelEqual(NgramLm.load(spark, dir), NgramLm.fit(corpusDf, "text"))
    assert(scored(NgramLm.score(corpusDf, "doc_id", "text",
        NgramLm.load(spark, dir), 2L)) ==
      scored(NgramLm.score(corpusDf, "doc_id", "text",
        NgramLm.fit(corpusDf, "text"), 2L)))
  }

  test("a dangling maintenance marker makes every entry point refuse") {
    val dir = tmp("marker")
    val model = NgramLm.fit(corpusDf, "text")
    NgramLm.save(model, dir)
    val f = new java.io.File(s"$dir/_append_inprogress")
    assert(f.createNewFile())
    intercept[IllegalArgumentException] { NgramLm.load(spark, dir) }
    intercept[IllegalArgumentException] {
      NgramLm.appendStore(spark, dir, corpusDf, "text")
    }
    intercept[IllegalArgumentException] { NgramLm.compactStore(spark, dir) }
    intercept[IllegalArgumentException] { NgramLm.save(model, dir) }
    assert(f.delete())
    NgramLm.load(spark, dir) // marker removed -> loads again
  }
}
