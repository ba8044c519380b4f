package graft

import graft.operators.{Sampling, SequencePack}
import org.apache.spark.sql.functions._

/** Training-prep operators: deterministic split assignment, the native
  * vector_sum aggregate (label centroids), and sequence packing.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("splitLabel: disjoint, exhaustive, and approximately proportional") {
    val docs = Tables.documents(spark, Sf0001)
    val assigned = docs.select($"doc_id",
      Sampling.splitLabel($"doc_id", Seq("train" -> 0.9, "val" -> 0.05), "test")
        .as("split"))
    val counts = assigned.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count(), "every document gets exactly one split")
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // md5 draw is uniform: 90/5/5 within generous tolerance at fixture size
    assert(counts("train").toDouble / total > 0.8, counts.toString)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("splitLabel: assignment is stable under corpus growth") {
    val docs = Tables.documents(spark, Sf0001)
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id",
        Sampling.splitLabel($"doc_id", Seq("train" -> 0.8, "val" -> 0.1), "test")
          .as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = assign(docs.where($"doc_id" % 2 === 0))
    val full = assign(docs)
    half.foreach { case (id, split) =>
      assert(full(id) == split, s"doc $id split changed when the corpus grew")
    }
  }

  test("splitLabel: rejects fractions past 1.0 and negative shares") {
    intercept[IllegalArgumentException] {
      Sampling.splitLabel($"doc_id", Seq("a" -> 0.9, "b" -> 0.2), "c")
    }
    intercept[IllegalArgumentException] {
      Sampling.splitLabel($"doc_id", Seq("a" -> -0.1), "c")
    }
  }

  test("vector_sum: equals the posexplode gold; null-skip and empty-group-null contracts") {
    val e = Tables.embeddings(spark, Sf0001)
    val got = e.groupBy($"label")
      .agg(call_function("vector_sum", $"embedding").as("vs"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Double](1)).toMap
    // gold: the dim-times-larger explode route
    val gold = e.select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos").agg(sum($"x".cast("double")).as("s"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"s"))).as("ps"))
      .collect()
      .map(r => r.get(0).toString ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)))
      .toMap
    assert(got.keySet == gold.keySet)
    got.foreach { case (label, vs) =>
      val g = gold(label)
      assert(vs.length == g.length)
      vs.zip(g).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"label $label diverged: $a vs $b")
      }
    }

    // nulls are skipped; a group of only nulls sums to NULL
    val withNulls = Seq(
      ("a", Some(Seq(1.0f, 2.0f))), ("a", None),
      ("b", None))
      .toDF("k", "v")
    val r = withNulls.groupBy($"k")
      .agg(call_function("vector_sum", $"v").as("vs"))
      .collect().map(row => row.getString(0) -> Option(row.get(1))).toMap
    assert(r("a").get.asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(1.0, 2.0))
    assert(r("b").isEmpty, "all-null group must yield NULL")
  }

  test("vector_sum: stable under repartitioning (partial aggregation merges)") {
    val e = Tables.embeddings(spark, Sf0001)
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"label").agg(call_function("vector_sum", $"embedding").as("vs"))
        .collect().map(r => r.get(0).toString -> r.getSeq[Double](1).map(x => math.round(x * 1e6)))
        .toMap
    assert(sums(e) == sums(e.repartition(17)))
  }

  test("vector_sum: dimension mismatch in a group throws, never truncates") {
    val bad = Seq(("a", Seq(1.0f, 2.0f)), ("a", Seq(1.0f))).toDF("k", "v")
    val ex = intercept[Exception] {
      bad.groupBy($"k").agg(call_function("vector_sum", $"v")).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch")
      || Option(ex.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("vector_sum: a zero-length vector throws in ANY row order (no sentinel collision)") {
    // [] first used to be silently swallowed by the empty-buffer sentinel
    // while [v, []] threw — order-dependent across shuffles
    for (rows <- Seq(
        Seq(("a", Seq.empty[Float]), ("a", Seq(1.0f, 2.0f))),
        Seq(("a", Seq(1.0f, 2.0f)), ("a", Seq.empty[Float])))) {
      val ex = intercept[Exception] {
        rows.toDF("k", "v").groupBy($"k")
          .agg(call_function("vector_sum", $"v")).collect()
      }
      assert(ex.getMessage.contains("zero-length")
        || Option(ex.getCause).exists(_.getMessage.contains("zero-length")))
    }
  }

  test("packManifest: matches the single-partition window gold; chunk maths hold") {
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
    val ctx = 512L
    val got = SequencePack.packManifest(docs, "doc_id", "n_tok", ctx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)

    // gold: driver-side sequential prefix sum in (draw, id) order
    val rows = docs.select($"doc_id", $"n_tok",
        Sampling.drawHex($"doc_id").as("draw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(_._2 > 0)
      .sortBy { case (id, _, draw) => (draw, id) }
    var cum = 0L
    val gold = rows.map { case (id, tok, _) =>
      val off = cum; cum += tok
      val first = off / ctx
      val last = (off + tok - 1) / ctx
      (id, tok, off, first, last, last - first + 1)
    }.sortBy(_._1)
    assert(got.toSeq == gold.toSeq)

    // global properties: offsets tile the concatenation exactly
    val total = rows.map(_._2).sum
    assert(got.map(_._2).sum == total)
    val byOffset = got.sortBy(_._3)
    byOffset.sliding(2).foreach {
      case Array((_, tok, off, _, _, _), (_, _, off2, _, _, _)) =>
        assert(off + tok == off2, "offsets must tile with no gaps or overlaps")
      case _ =>
    }
  }

  test("q7's scale twin: approx_percentile tracks the exact percentile within bound") {
    val ev = Tables.events(spark, Sf0001)
    val ps = Seq(0.5, 0.9, 0.99)
    // the sketch guarantees RANK error (<= n/accuracy), not value error —
    // at a heavy-tailed p99 adjacent ranks can be far apart in value, so
    // the assertion brackets the approx value between exact quantiles at
    // p ± 0.05 (generous: fixture groups are only ~hundreds of rows)
    val lo = ps.map(p => math.max(0.0, p - 0.05))
    val hi = ps.map(p => math.min(1.0, p + 0.05))
    val exact = ev.groupBy($"event_type")
      .agg(percentile($"value", typedlit(lo)).as("lo"),
        percentile($"value", typedlit(hi)).as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Double](2)))
      .toMap
    val approx = ev.groupBy($"event_type")
      .agg(approx_percentile($"value", typedlit(ps), lit(10000)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (los, his)) =>
      approx(k).zipWithIndex.foreach { case (a, i) =>
        assert(a >= los(i) - 1e-9 && a <= his(i) + 1e-9,
          s"group $k p=${ps(i)}: approx $a outside exact [${los(i)}, ${his(i)}]")
      }
    }
  }

  test("packNoSplit: matches a sequential greedy fold; invariants hold") {
    val ctx = 16L
    val shardDocs = 5
    val docs = Seq.tabulate(37)(i => (i.toLong, 1L + (i * 7) % 18)) // some > ctx
      .toDF("doc_id", "n_tok")
    val got = SequencePack.packNoSplit(docs, "doc_id", "n_tok", ctx, shardDocs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // single-threaded replay of the documented recurrence
    val draw = docs.select($"doc_id", Sampling.drawHex($"doc_id").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordered = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) => (draw(id), id) }
    val gold = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    ordered.zipWithIndex.foreach { case ((id, n), idx) =>
      val shard = idx / shardDocs
      val (fill, bin) =
        if (idx % shardDocs == 0) (ctx, -1L) // shard start: sentinel
        else {
          val prev = ordered(idx - 1)._1
          val (_, _, pb, po) = gold(prev)
          (po + gold(prev)._1, pb) // fill = prev off + prev tokens
        }
      val (nb, off) = if (fill + n > ctx) (bin + 1, 0L) else (bin, fill)
      gold(id) = (n, shard, nb, off)
    }
    assert(got == gold.toMap, s"diff=${got.toSet.diff(gold.toSet)}")
    // invariants: docs intact & unique, window fits unless a lone oversize,
    // bins dense per shard
    assert(got.size == 37)
    got.values.foreach { case (n, _, _, off) =>
      assert(off + n <= ctx || off == 0, "only a lone oversized doc may overflow")
    }
    got.values.groupBy { case (_, s, b, _) => (s, b) }.foreach { case (_, docs) =>
      assert(docs.map(_._1).sum <= ctx || docs.size == 1)
    }
    got.values.groupBy(_._2).foreach { case (_, inShard) =>
      val bins = inShard.map(_._3).toSet
      assert(bins == (0L to bins.max).toSet, "bins must be dense from 0")
    }
  }

  test("packNoSplit: random corpora match the sequential replay (3 seeds)") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val ctx = 8L + rnd.nextInt(40)
      val shardDocs = 3 + rnd.nextInt(9)
      val n = 20 + rnd.nextInt(60)
      val lens = Seq.tabulate(n)(i => (i.toLong, 1L + rnd.nextInt(2 * ctx.toInt)))
      val docs = lens.toDF("doc_id", "n_tok").repartition(1 + rnd.nextInt(6))
      val got = SequencePack.packNoSplit(docs, "doc_id", "n_tok", ctx, shardDocs)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val draw = docs.select($"doc_id", Sampling.drawHex($"doc_id").as("d"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val ordered = lens.sortBy { case (id, _) => (draw(id), id) }
      var (fill, bin) = (ctx, -1L)
      val gold = ordered.zipWithIndex.map { case ((id, tok), idx) =>
        if (idx % shardDocs == 0) { fill = ctx; bin = -1L }
        val over = fill + tok > ctx
        if (over) { bin += 1; fill = tok } else fill += tok
        id -> ((idx / shardDocs).toLong, bin, if (over) 0L else fill - tok)
      }.toMap
      assert(got == gold, s"seed=$seed ctx=$ctx shardDocs=$shardDocs")
    }
  }

  test("packNoSplit: stable under input repartitioning") {
    val docs = Seq.tabulate(50)(i => (i.toLong, 1L + i % 9)).toDF("doc_id", "n_tok")
    def run(df: org.apache.spark.sql.DataFrame) =
      SequencePack.packNoSplit(df, "doc_id", "n_tok", 32L, 8)
        .collect().map(_.toSeq).toSet
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
  }

  test("packManifest: zero-token documents are dropped") {
    val docs = Seq((1L, 0L), (2L, 10L), (3L, 5L)).toDF("doc_id", "n_tok")
    val got = SequencePack.packManifest(docs, "doc_id", "n_tok", 8L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("packNoSplit: string doc ids keep their type and values (ADVICE r10 #1)") {
    // the old col(idCol).cast("long") silently nulled non-numeric ids
    val docs = Seq.tabulate(12)(i => (s"doc-$i", 1L + i % 7)).toDF("doc_id", "n_tok")
    val got = SequencePack.packNoSplit(docs, "doc_id", "n_tok", 16L, 5)
    assert(got.schema("doc_id").dataType == org.apache.spark.sql.types.StringType)
    val rows = got.collect()
    assert(rows.map(_.getString(0)).toSet == (0 until 12).map(i => s"doc-$i").toSet,
      "every id must survive unchanged")
    val byId = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 12).foreach(i => assert(byId(s"doc-$i") == 1L + i % 7))
  }

  // driver-side twin of Sampling.drawHex — the packing order's sort key
  private def drawHexLocal(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, 8)
  }

  // per-doc id rows at the tokenIds grain: (doc_id, pos, token_id)
  private def idRows(docs: Seq[(Long, Seq[Long])]) =
    docs.flatMap { case (id, toks) =>
      toks.zipWithIndex.map { case (t, p) => (id, p.toLong, t) }
    }.toDF("doc_id", "pos", "token_id")

  test("packTokenIds: flattened chunks are the docs in draw order, sep-terminated") {
    val docs = Seq(
      1L -> Seq(10L, 11L, 12L), 2L -> Seq(20L), 3L -> Seq(30L, 31L),
      4L -> Seq(40L, 41L, 42L, 43L, 44L, 45L, 46L), 5L -> Seq(50L, 51L))
    val got = SequencePack.packTokenIds(idRows(docs), "doc_id", 5L,
        sepId = Some(999L))
      .orderBy($"chunk_id").collect()
    // chunk ids are contiguous from 0; every chunk full except the last
    assert(got.map(_.getLong(0)).toSeq == got.indices.map(_.toLong))
    got.dropRight(1).foreach { r =>
      assert(r.getLong(1) == 5L && r.getSeq[Long](2).length == 5)
    }
    assert(got.last.getLong(1) == got.last.getSeq[Long](2).length)
    // the flattened stream IS the corpus: docs sorted by (md5 draw, id),
    // each followed by its separator
    val expected = docs.sortBy { case (id, _) => (drawHexLocal(id), id) }
      .flatMap { case (_, toks) => toks :+ 999L }
    val flat = got.flatMap(_.getSeq[Long](2)).toSeq
    assert(flat == expected, s"flat=$flat expected=$expected")
    assert(flat.length == docs.map(_._2.length + 1).sum)
  }

  test("packTokenIds: no separator without sepId; empty docs occupy nothing") {
    val docs = Seq(1L -> Seq(10L, 11L), 2L -> Seq.empty[Long], 3L -> Seq(30L))
    val got = SequencePack.packTokenIds(idRows(docs), "doc_id", 4L)
      .orderBy($"chunk_id").collect()
    val expected = docs.filter(_._2.nonEmpty)
      .sortBy { case (id, _) => (drawHexLocal(id), id) }
      .flatMap(_._2)
    assert(got.flatMap(_.getSeq[Long](2)).toSeq == expected)
    // empty doc contributes nothing even under a sep discipline (it has no
    // id rows, so there is no boundary to mark — the manifest's tokens > 0
    // contract)
    val withSep = SequencePack.packTokenIds(idRows(docs), "doc_id", 4L,
        sepId = Some(7L))
      .orderBy($"chunk_id").collect().flatMap(_.getSeq[Long](2)).toSeq
    assert(withSep == docs.filter(_._2.nonEmpty)
      .sortBy { case (id, _) => (drawHexLocal(id), id) }
      .flatMap { case (_, t) => t :+ 7L })
  }

  test("packTokenIds agrees with packManifest: ids land inside the doc's chunk range") {
    val docs = Seq.tabulate(20)(i =>
      (i + 1).toLong -> Seq.tabulate(1 + i % 6)(j => (i * 10 + j).toLong))
    val rows = idRows(docs)
    val ctx = 7L
    val counts = rows.groupBy($"doc_id").agg(count(lit(1)).as("n_tok"))
    val manifest = SequencePack.packManifest(counts, "doc_id", "n_tok", ctx)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val chunks = SequencePack.packTokenIds(rows, "doc_id", ctx)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    docs.foreach { case (id, toks) =>
      val (first, last) = manifest(id)
      val inRange = (first to last).flatMap(chunks(_))
      toks.foreach(t => assert(inRange.contains(t),
        s"doc $id token $t missing from its manifest chunk range [$first,$last]"))
    }
  }

  test("sepPerDoc manifest agrees with a sep-packed packTokenIds run (ADVICE r16)") {
    val docs = Seq.tabulate(20)(i =>
      (i + 1).toLong -> Seq.tabulate(1 + i % 6)(j => (i * 10 + j).toLong))
    val rows = idRows(docs)
    val ctx = 7L
    val counts = rows.groupBy($"doc_id").agg(count(lit(1)).as("n_tok"))
    // the PLAIN manifest mislocates under a sep-packed run (the grain
    // contract the flag exists for): assert it actually disagrees
    val sepChunks = SequencePack
      .packTokenIds(rows, "doc_id", ctx, sepId = Some(999L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    val plain = SequencePack.packManifest(counts, "doc_id", "n_tok", ctx)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sep = SequencePack
      .packManifest(counts, "doc_id", "n_tok", ctx, sepPerDoc = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(plain != sep, "the two grains must differ on this corpus")
    // global stream replay: doc d's ids occupy [off, off+tokens) in the
    // flattened sep-packed stream — the sep-aware offsets, exactly
    val flat = sepChunks.toSeq.sortBy(_._1).flatMap(_._2)
    val lens = docs.toMap.view.mapValues(_.length).toMap
    docs.foreach { case (id, toks) =>
      val (off, first, last) = sep(id)
      assert(flat.slice(off.toInt, off.toInt + toks.length) == toks,
        s"doc $id ids not at sep-aware offset $off")
      assert(first == off / ctx && last == (off + lens(id) - 1) / ctx,
        s"doc $id chunk range excludes only the separator")
      (first to last).foreach { c =>
        assert(toks.exists(sepChunks(c).contains),
          s"doc $id claims chunk $c but none of its ids are there")
      }
    }
  }

  test("packTokenIds: stable under input repartitioning") {
    val docs = Seq.tabulate(30)(i =>
      (i + 1).toLong -> Seq.tabulate(1 + i % 5)(j => (i * 100 + j).toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      SequencePack.packTokenIds(df, "doc_id", 8L, sepId = Some(-1L))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](2))).toMap
    val rows = idRows(docs)
    assert(run(rows.repartition(1)) == run(rows.repartition(13)))
  }
}
