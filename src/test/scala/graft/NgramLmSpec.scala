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

  // -------------------------------------------------------------------
  // Absolute discounting (the t30 row's second score() mode)
  // -------------------------------------------------------------------

  /** Driver-side absolute-discounting brute force from first principles:
    * counts-of-counts discounts, continuation-type interpolation, the
    * same leg conditions and fold. Independent of the engine's column
    * expressions (plain recursive arithmetic).
    */
  private def bruteAd(docs: Map[Long, Seq[String]]): Map[Long, (Long, Double)] = {
    def counts(n: Int): Map[Seq[String], Long] = docs.values.toSeq
      .flatMap(_.sliding(n).filter(_.length == n).map(_.toList: Seq[String]))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val u = counts(1); val b = counts(2); val t = counts(3)
    val n = u.values.sum.toDouble
    def disc(m: Map[Seq[String], Long]): Double = {
      val n1 = m.values.count(_ == 1L).toLong
      val n2 = m.values.count(_ == 2L).toLong
      if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2).toDouble else 0.75
    }
    val d3 = disc(t); val d2 = disc(b)
    val t3 = t.keys.groupBy(_.take(2)).map { case (k, v) => k -> v.size.toLong }
    val t2 = b.keys.groupBy(_.take(1)).map { case (k, v) => k -> v.size.toLong }
    // marginal normalizers: the context's own mass IN the n-gram table
    // (doc-final occurrences continue nothing and are excluded)
    val m3 = t.groupBy(_._1.take(2)).map { case (k, v) => k -> v.values.sum }
    val m2 = b.groupBy(_._1.take(1)).map { case (k, v) => k -> v.values.sum }
    def p1(w3: String) = u(Seq(w3)).toDouble / n
    def p2(w2: String, w3: String): Double = t2.get(Seq(w2)) match {
      case Some(ty) =>
        (b.get(Seq(w2, w3)).map(c => math.max(c - d2, 0.0)).getOrElse(0.0) +
          (d2 * ty) * p1(w3)) / m2(Seq(w2))
      case None => p1(w3)
    }
    def p3(w1: String, w2: String, w3: String): Double =
      t3.get(Seq(w1, w2)) match {
        case Some(ty) =>
          (t.get(Seq(w1, w2, w3)).map(c => math.max(c - d3, 0.0)).getOrElse(0.0) +
            (d3 * ty) * p2(w2, w3)) / m3(Seq(w1, w2))
        case None => p2(w2, w3)
      }
    docs.flatMap { case (id, toks) =>
      val tris = toks.sliding(3).filter(_.length == 3).toSeq
      if (tris.isEmpty) None
      else {
        val lps = tris.map(w => math.log(p3(w(0), w(1), w(2))))
        val s = lps.foldLeft(0.0)(_ + _)
        Some(id -> (tris.size.toLong, -s / tris.size))
      }
    }
  }

  test("scoreAbsDiscount == brute force; all legs exercised; true probability") {
    // leg coverage: (a,b,c) trigram leg; (c,a,b): context (c,a) has a
    // trigram -> trigram leg with c3 present; "x y z q": every context
    // is a singleton with a continuation -> discounted legs; the word
    // pair corpus below adds a t2-missing case (word only corpus-final)
    val docs = Map(
      10L -> Seq("a", "b", "c", "a", "b", "c"),
      11L -> Seq("x", "y", "z", "q"),
      12L -> Seq("a", "b", "q"))
    val df = docs.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val model = NgramLm.fit(df, "text")
    val got = NgramLm.scoreAbsDiscount(df, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = bruteAd(docs)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nt, nll)) =>
      assert(nt == want(id)._1, s"doc $id trigram count")
      assert(math.abs(nll - want(id)._2) <= 1e-6 + 1e-9,
        s"doc $id: $nll vs ${want(id)._2}")
    }
    // TRUE probability: sums to 1 over the unigram vocabulary for EVERY
    // observed context — including boundary ones (self-review r17: an
    // earlier form divided by the lower-order count, which also counts
    // document-final occurrences, leaking mass at exactly those contexts)
    val vocab = docs.values.flatten.toSeq.distinct
    def counts(n: Int) = docs.values.toSeq
      .flatMap(_.sliding(n).filter(_.length == n).map(_.toList: Seq[String]))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bAll = counts(2); val tAll = counts(3)
    def disc(m: Map[Seq[String], Long]): Double = {
      val n1 = m.values.count(_ == 1L).toLong
      val n2 = m.values.count(_ == 2L).toLong
      if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2).toDouble else 0.75
    }
    val u = counts(1); val n = u.values.sum.toDouble
    val d3 = disc(tAll); val d2 = disc(bAll)
    val t3 = tAll.keys.groupBy(_.take(2)).map { case (k, v) => k -> v.size.toLong }
    val t2 = bAll.keys.groupBy(_.take(1)).map { case (k, v) => k -> v.size.toLong }
    val m3 = tAll.groupBy(_._1.take(2)).map { case (k, v) => k -> v.values.sum }
    val m2 = bAll.groupBy(_._1.take(1)).map { case (k, v) => k -> v.values.sum }
    def p1(w: String) = u(Seq(w)).toDouble / n
    def p2(w2: String, w3: String): Double = t2.get(Seq(w2)) match {
      case Some(ty) =>
        (bAll.get(Seq(w2, w3)).map(c => math.max(c - d2, 0.0)).getOrElse(0.0) +
          (d2 * ty) * p1(w3)) / m2(Seq(w2))
      case None => p1(w3)
    }
    // 'c' ends doc 10 (the boundary context the fix exists for), 'b' is
    // mid-doc everywhere, ("a","b") is an observed trigram context
    Seq("b", "c").foreach { w2 =>
      val mass = vocab.map(w3 => p2(w2, w3)).sum
      assert(math.abs(mass - 1.0) <= 1e-9, s"bigram mass for '$w2': $mass")
    }
    val triMass = vocab.map(w3 => (tAll.get(Seq("a", "b", w3))
      .map(c => math.max(c - d3, 0.0)).getOrElse(0.0) +
      (d3 * t3(Seq("a", "b"))) * p2("b", w3)) / m3(Seq("a", "b"))).sum
    assert(math.abs(triMass - 1.0) <= 1e-9, s"trigram mass $triMass != 1")
  }

  test("scoreAbsDiscount: OOV tokens mark nll NULL; short docs drop; guards") {
    val df = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val model = NgramLm.fit(df, "text")
    val scored = NgramLm.scoreAbsDiscount(
      Seq((5L, "a b zz"), (6L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect()
    assert(scored.length == 1 && scored.head.getLong(0) == 5L)
    assert(scored.head.isNullAt(2), "OOV must be a NULL marker")
    intercept[IllegalArgumentException] {
      NgramLm.scoreAbsDiscount(df, "t3", "text", model)
    }
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
