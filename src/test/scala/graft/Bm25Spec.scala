package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

/** [[Bm25]] — the r3/r4 gate rows hash-check the full pipeline against
  * DuckDB; this spec pins the formula against a driver-side brute force,
  * the deterministic tie-break, the inverted-index candidate contract
  * (no shared term → no candidate), the guards, and RRF's arithmetic.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "apple banana apple"),
    (11L, "banana cherry"),
    (12L, "cherry cherry cherry date"),
    (13L, "apple date elderberry fig grape"),
    (14L, "unrelated tokens only here")
  ).toDF("doc_id", "text")

  private val queries = Seq(
    (0L, "apple cherry"),
    (1L, "zebra")
  ).toDF("qid", "text")

  /** The same formula, computed driver-side from first principles. */
  private def brute(k1: Double = 1.2, b: Double = 0.75): Map[(Long, Long), Double] = {
    val docs = Map(
      10L -> Seq("apple", "banana", "apple"),
      11L -> Seq("banana", "cherry"),
      12L -> Seq("cherry", "cherry", "cherry", "date"),
      13L -> Seq("apple", "date", "elderberry", "fig", "grape"),
      14L -> Seq("unrelated", "tokens", "only", "here"))
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / docs.size
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val qs = Map(0L -> Seq("apple", "cherry"), 1L -> Seq("zebra"))
    (for {
      (qid, qts) <- qs.toSeq
      (did, toks) <- docs.toSeq
      contribs = qts.sorted.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0 || !dfm.contains(t)) None
        else {
          val df = dfm(t).toLong
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          Some(idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * toks.size) / avgdl))))
        }
      }
      if contribs.nonEmpty
    } yield (qid, did) -> BigDecimal(contribs.foldLeft(0.0)(_ + _))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  test("topK matches the driver-side brute force, docs sharing no term are absent") {
    val out = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "text", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exp = brute()
    assert(out.keySet == exp.keySet,
      s"candidate sets differ: ${out.keySet} vs ${exp.keySet}")
    assert(exp.keySet.forall(_._1 == 0L), "the zebra query matches nothing")
    assert(!out.keySet.exists(_._2 == 14L), "doc 14 shares no query term")
    out.foreach { case (k, v) => assert(v == exp(k), s"$k: $v vs ${exp(k)}") }
  }

  test("ranking: higher score first, equal scores tie-break by id ascending") {
    val dup = Seq((20L, "apple"), (21L, "apple"), (22L, "apple banana"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "apple")).toDF("qid", "text")
    val out = Bm25.topK(dup, "doc_id", "text", q, "qid", "text", 3)
      .orderBy($"rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // docs 20/21 are identical (same tf, same dl) — rank by id; 22 is
    // longer, so its tf-normalization is smaller
    assert(out.toSeq == Seq((0L, 20L), (1L, 21L), (2L, 22L)), out.toSeq)
  }

  test("k truncates per query; guards reject bad column names") {
    val out = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "text", 2)
    assert(out.collect().length == 2, "4 candidates for q0, truncated to 2")
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", queries, "doc_id", "text", 2)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "term", "text", queries, "qid", "text", 2)
    }
  }

  test("append: fit(old) + delta is bit-identical to fit(old ∪ delta), artifact by artifact") {
    val old = corpus.where($"doc_id" <= 12)
    val delta = corpus.where($"doc_id" > 12)
    val merged = Bm25.append(Bm25.fit(old, "doc_id", "text"), delta, "text")
    val full = Bm25.fit(corpus, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(merged.postings) == rows(full.postings))
    assert(rows(merged.dfs) == rows(full.dfs),
      "the full-outer df merge must equal the recomputed dictionary")
    assert(rows(merged.docStats) == rows(full.docStats))
    // and the search over the merged index answers exactly like topK
    val viaIx = Bm25.searchIndex(merged, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    val direct = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    assert(viaIx == direct && viaIx.nonEmpty)
  }

  private def tmp(tag: String) = graft.sources.TempDirs.register(
    s"/tmp/graft_bm25store_${ProcessHandle.current().pid()}_$tag")

  test("save -> load round-trips every artifact exactly; loaded index searches identically") {
    val ix = Bm25.fit(corpus, "doc_id", "text")
    val dir = tmp("roundtrip")
    Bm25.save(ix, dir)
    val loaded = Bm25.load(spark, dir)
    assert(loaded.idCol == "doc_id", "the stats artifact carries id_col")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(loaded.postings) == rows(ix.postings))
    assert(rows(loaded.dfs) == rows(ix.dfs))
    assert(rows(loaded.docStats) == rows(ix.docStats))
    val got = Bm25.searchIndex(loaded, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    val want = Bm25.searchIndex(ix, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("appendStore: delta parquet append + swap-rewritten dfs/stats equals fit-over-union") {
    val dir = tmp("appendstore")
    Bm25.save(Bm25.fit(corpus.where($"doc_id" <= 12), "doc_id", "text"), dir)
    val merged = Bm25.appendStore(spark, dir, corpus.where($"doc_id" > 12), "text")
    val full = Bm25.fit(corpus, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(merged.postings) == rows(full.postings),
      "the postings lake after the delta append must equal the recomputed lake")
    assert(rows(merged.dfs) == rows(full.dfs))
    assert(rows(merged.docStats) == rows(full.docStats))
    // and a FRESH load (the serving JVM's view) answers exactly like topK
    val got = Bm25.searchIndex(Bm25.load(spark, dir), queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    val want = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // no stale swap debris left behind
    val leftovers = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(leftovers == Set("postings", "dfs", "stats"), leftovers.toString)
  }

  test("compactStore: fewer postings files, identical index and search results") {
    val dir = tmp("compact")
    val thirds = Seq(
      corpus.where($"doc_id" % 3 === 0), corpus.where($"doc_id" % 3 === 1),
      corpus.where($"doc_id" % 3 === 2))
    Bm25.save(Bm25.fit(thirds.head, "doc_id", "text"), dir, numFiles = 4)
    thirds.tail.foreach(d => Bm25.appendStore(spark, dir, d, "text", numFiles = 4))
    def postingsFiles() = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("part-"))
    val before = postingsFiles()
    assert(before >= 8, s"two appends over 4-file writes should pile up files, got $before")
    val preRows = Bm25.load(spark, dir).postings.collect().map(_.toSeq).toSet
    val compacted = Bm25.compactStore(spark, dir, numFiles = 2)
    assert(postingsFiles() <= 2, "compaction must rewrite to the target file count")
    assert(compacted.postings.collect().map(_.toSeq).toSet == preRows,
      "compaction must not change a single posting")
    val got = Bm25.searchIndex(compacted, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    val want = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet ==
      Set("postings", "dfs", "stats"), "no compaction debris")
    // a dangling promote marker (appendStore's OR compactStore's own —
    // compaction brackets its swap in the same one) makes the next
    // maintenance job refuse loudly instead of compounding the damage
    val marker = new java.io.File(dir, "_append_inprogress")
    assert(marker.createNewFile())
    val refuse = intercept[IllegalArgumentException] {
      Bm25.compactStore(spark, dir, numFiles = 2)
    }
    assert(refuse.getMessage.contains("mid-promote"), refuse.getMessage)
    // the READER refuses too (ADVICE r15): a serving JVM must not load a
    // store some of whose artifacts carry a half-promoted delta
    val refuseLoad = intercept[IllegalArgumentException] {
      Bm25.load(spark, dir)
    }
    assert(refuseLoad.getMessage.contains("torn"), refuseLoad.getMessage)
    assert(marker.delete())
  }

  /** Collect an index's three artifacts as comparable value sets. */
  private def artifacts(ix: Bm25.Index) = (
    ix.postings.collect().map(_.toSeq).toSet,
    ix.dfs.collect().map(_.toSeq).toSet,
    ix.docStats.collect().map(_.toSeq).toSet)

  test("tombstoneStore: delete ≡ refit for search; compact+re-add ≡ refit artifact-by-artifact") {
    val dir = tmp("tomb")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    // delete docs 11 and 13 (and 99, absent — must no-op on the artifacts)
    val tombstoned = Bm25.tombstoneStore(spark, dir,
      Seq(11L, 13L, 99L).toDF("doc_id"))
    val corrected = corpus.where($"doc_id" =!= 11L && $"doc_id" =!= 13L)
    def search(ix: Bm25.Index) =
      Bm25.searchIndex(ix, queries, "qid", "text", 10)
        .collect().map(_.toSeq).toSet
    val want = Bm25.fit(corrected, "doc_id", "text")
    assert(search(tombstoned) == search(want) && search(want).nonEmpty,
      "tombstoned store must answer exactly like a refit on the corrected corpus")
    assert(artifacts(tombstoned)._2 == artifacts(want)._2, "dfs must match the refit")
    assert(artifacts(tombstoned)._3 == artifacts(want)._3, "stats must match the refit")
    assert(artifacts(tombstoned)._1 == artifacts(want)._1,
      "loaded postings (lake minus tombstones) must match the refit")

    // idempotence: re-tombstoning decrements nothing
    val again = Bm25.tombstoneStore(spark, dir, Seq(11L).toDF("doc_id"))
    assert(artifacts(again) == artifacts(want))

    // re-adding a tombstoned id before compaction refuses loudly
    val readd = Seq((11L, "banana cherry fixed")).toDF("doc_id", "text")
    val refuse = intercept[IllegalArgumentException] {
      Bm25.appendStore(spark, dir, readd, "text")
    }
    assert(refuse.getMessage.contains("compactStore first"), refuse.getMessage)

    // compact retires the tombstones physically; then the corrected doc
    // re-adds, and the store equals fit over the corrected+fixed corpus
    val compacted = Bm25.compactStore(spark, dir, numFiles = 2)
    assert(artifacts(compacted) == artifacts(want))
    assert(!new java.io.File(dir, "tombstones").exists(),
      "compaction must retire the tombstone set")
    val reAdded = Bm25.appendStore(spark, dir, readd, "text")
    val wantFixed = Bm25.fit(corrected.unionByName(readd), "doc_id", "text")
    assert(artifacts(reAdded)._2 == artifacts(wantFixed)._2)
    assert(artifacts(reAdded)._3 == artifacts(wantFixed)._3)
    assert(artifacts(reAdded)._1 == artifacts(wantFixed)._1)
    assert(search(reAdded) == {
      val s = Bm25.searchIndex(wantFixed, queries, "qid", "text", 10)
        .collect().map(_.toSeq).toSet
      s
    }, "delete -> compact -> re-add must equal a refit on the corrected corpus")
  }

  test("upsertStore: replace-by-id ≡ refit with the documents replaced; new ids insert") {
    val dir = tmp("upsert")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    // 11 gets a corrected body; 99 is brand new — one call handles both
    val batch = Seq((11L, "banana cherry corrected"),
      (99L, "zebra quagga")).toDF("doc_id", "text")
    val upserted = Bm25.upsertStore(spark, dir, batch, "text", numFiles = 2)
    val want = Bm25.fit(
      corpus.where($"doc_id" =!= 11L).unionByName(batch), "doc_id", "text")
    assert(artifacts(upserted)._1 == artifacts(want)._1)
    assert(artifacts(upserted)._2 == artifacts(want)._2)
    assert(artifacts(upserted)._3 == artifacts(want)._3)
    val got = Bm25.searchIndex(upserted, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    val exp = Bm25.searchIndex(want, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    assert(got == exp && got.nonEmpty)
    // the zebra query now has a hit (99's new body) — the upsert is live
    assert(got.exists(_.head == 1L), "query 1 ('zebra') must now match doc 99")
  }

  test("upsertStore: a pure-insert batch takes the delta-sized append path") {
    val dir = tmp("upsert_fast")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    def lakeFiles() = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSet
    val before = lakeFiles()
    val batch = Seq((100L, "durian fig")).toDF("doc_id", "text")
    val up = Bm25.upsertStore(spark, dir, batch, "text", numFiles = 2)
    // the original lake files survive untouched — appended, never rewritten
    assert(before.subsetOf(lakeFiles()) && lakeFiles().size > before.size,
      "a batch of ids new to the store must not pay the lake rewrite")
    val want = Bm25.fit(corpus.unionByName(batch), "doc_id", "text")
    assert(artifacts(up) == artifacts(want))
  }

  test("save over a tombstoned store clears the stale set; save refuses a dangling marker") {
    val dir = tmp("refit")
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    Bm25.tombstoneStore(spark, dir, Seq(11L).toDF("doc_id"))
    // the nightly refit IN PLACE: doc 11 is in the new corpus and must
    // come back — a stale tombstones/ would silently filter it forever
    Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    assert(!new java.io.File(dir, "tombstones").exists(),
      "refit must clear the prior incarnation's tombstone set")
    val re = Bm25.load(spark, dir)
    assert(artifacts(re) == artifacts(Bm25.fit(corpus, "doc_id", "text")))
    val marker = new java.io.File(dir, "_append_inprogress")
    assert(marker.createNewFile())
    val refuse = intercept[IllegalArgumentException] {
      Bm25.save(Bm25.fit(corpus, "doc_id", "text"), dir, numFiles = 2)
    }
    assert(refuse.getMessage.contains("mid-promote"), refuse.getMessage)
    assert(marker.delete())
  }

  test("term prune: capped-out and disabled paths answer identically to the pruned path") {
    val ix = Bm25.fit(corpus, "doc_id", "text")
    val pruned = Bm25.searchIndex(ix, queries, "qid", "text", 10)
      .collect().map(_.toSeq).toSet
    val disabled = Bm25.searchIndex(ix, queries, "qid", "text", 10,
      termPruneMax = 0).collect().map(_.toSeq).toSet
    val capped = Bm25.searchIndex(ix, queries, "qid", "text", 10,
      termPruneMax = 1).collect().map(_.toSeq).toSet // 3 distinct terms > 1
    assert(pruned == disabled && pruned == capped && pruned.nonEmpty)
  }

  test("rrf: fused score is the exact sum of reciprocal ranks, missing ranks add nothing") {
    val a = Seq((0L, 100L, 0L), (0L, 101L, 1L)).toDF("qid", "doc_id", "rank")
    val b = Seq((0L, 101L, 0L), (0L, 102L, 1L)).toDF("qid", "doc_id", "rank")
    val out = Bm25.rrf(Seq(a, b), "qid", "doc_id", "rank", 10)
      .collect().map(r => r.getLong(2) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(101L)._2 == 1.0 / 62.0 + 1.0 / 61.0, "in both rankers")
    assert(out(100L)._2 == 1.0 / 61.0, "rank 0 in one ranker only")
    assert(out(102L)._2 == 1.0 / 62.0)
    // 101 fuses highest; 100 (1/61) beats 102 (1/62)
    assert(out(101L)._1 == 0L && out(100L)._1 == 1L && out(102L)._1 == 2L)
  }

  test("rrf: equal fused scores tie-break by id; k truncates") {
    val a = Seq((0L, 200L, 3L), (0L, 199L, 3L), (0L, 198L, 1L)).toDF("qid", "doc_id", "rank")
    val out = Bm25.rrf(Seq(a), "qid", "doc_id", "rank", 2)
      .orderBy($"rank").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(198L, 199L), s"198 first, then the id tie: $out")
  }
}
