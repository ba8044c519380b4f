package graft

import graft.functions.TextFunctions._
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Specs for the round-7 curation operators: passage overlap (the exact
  * substring dedup signal), URL domain extraction + per-domain caps, and
  * the SemDeDup gate row's deterministic clustering/closure contract.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("passageOverlap: planted shared passages counted, short/disjoint docs report 0") {
    // d1 and d2 share exactly their first 8 tokens (one 8-token passage);
    // d3 is disjoint; d4 duplicates d1 (all 3 of d1's passages shared);
    // d5 is shorter than 8 tokens.
    val t1 = "a b c d e f g h i j"
    val t2 = "a b c d e f g h x y"
    val t3 = "p q r s t u v w z1 z2"
    val t5 = "tiny doc"
    val df = Seq((1L, t1), (2L, t2), (3L, t3), (4L, t1), (5L, t5))
      .toDF("doc_id", "text")
    val got = TextDedup.passageOverlap(df, "text", "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // d1 has 3 passages: [a..h], [b..i], [c..j]. All 3 are shared with d4;
    // [a..h] is also in d2. d2 shares only [a..h].
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 3L, 5L -> 0L), got.toString)
  }

  test("passageScrub: shared passages removed from BOTH docs, rest untouched, order kept") {
    // d1/d2 share their first 8 tokens; d1's tail survives, d2's tail
    // survives; d3 disjoint (untouched); d4 shorter than 8 (untouched);
    // an in-doc repeat that is NOT cross-doc must survive (cross-doc only)
    val t1 = "a b c d e f g h tail1 tailX"
    val t2 = "a b c d e f g h tail2"
    val t3 = "p q r s t u v w x y"
    val t4 = "too short"
    val df = Seq((1L, t1), (2L, t2), (3L, t3), (4L, t4)).toDF("doc_id", "text")
    val got = TextDedup.passageScrub(df, "text", "doc_id", 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("tail1 tailX", 2L, 8L)), got(1L).toString)
    assert(got(2L) == (("tail2", 1L, 8L)), got(2L).toString)
    assert(got(3L) == ((t3, 10L, 0L)), got(3L).toString)
    assert(got(4L) == ((t4, 2L, 0L)), got(4L).toString)
  }

  test("passageScrub: overlapping shared passages merge their covered spans") {
    // d1 and d2 share a 9-token run -> two overlapping 8-grams; covered
    // positions must union (9 tokens removed, not 16)
    val run = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val df = Seq((1L, s"$run endA"), (2L, s"pre $run")).toDF("doc_id", "text")
    val got = TextDedup.passageScrub(df, "text", "doc_id", 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("endA", 1L, 9L)), got(1L).toString)
    assert(got(2L) == (("pre", 1L, 9L)), got(2L).toString)
  }

  test("passageOverlap: DF is counted, never pair-expanded (no self-join of postings)") {
    // 100 copies of the same text: a pair expansion would be 4950 rows per
    // passage; the DF-count shape keeps one counter per hash. Assert the
    // result (every doc shares all its passages) and that the plan has no
    // join of the shingle relation with itself on equal ids.
    val df = (0L until 100L).map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    val res = TextDedup.passageOverlap(df, "text", "doc_id", 8)
    assert(res.collect().forall(_.getLong(1) == 2L)) // 2 passages each, both shared
  }

  test("urlHost/registeredDomain: www-strip, deep subdomains, query strings, schemeless") {
    val cases = Seq(
      ("https://www.site7.com/page/1?ref=x", "www.site7.com", "site7.com"),
      ("http://u3.site19.org/p", "u3.site19.org", "site19.org"),
      ("https://a.b.site2.net?q=1", "a.b.site2.net", "site2.net"),
      ("https://site0.com", "site0.com", "site0.com"),
      ("notaurl", "", ""))
    val got = cases.map(_._1).toDF("url")
      .select($"url", urlHost($"url").as("h"), registeredDomain($"url").as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == cases.map(c => (c._1, c._2, c._3)), got.mkString("\n"))
  }

  test("u1_domain_cap: per-domain counts capped at 5, deterministic across runs") {
    val a = Queries.u1DomainCap(spark, Sf0001).collect()
    val b = Queries.u1DomainCap(spark, Sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "cap must be deterministic")
    val perDomain = a.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(perDomain.values.forall(_ <= 5), perDomain.toMap.toString)
    assert(a.forall(_.getString(1).matches("[a-z0-9]+\\.(com|org|net)")),
      "registered domains must be the synthesized 2-label shapes")
    assert(a.nonEmpty)
  }

  test("hammingNearPairs: generic 64-bit path equals brute force, incl. negative longs") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(40)(rnd.nextLong()) // negative longs exercised
    // plant near-dups: flip ≤3 bits of some fingerprints
    val fps = base.zipWithIndex.flatMap { case (f, i) =>
      val mut = f ^ (1L << (i % 64)) ^ (if (i % 3 == 0) 1L << ((i * 7) % 64) else 0L)
      Seq((i.toLong * 2, f), (i.toLong * 2 + 1, mut))
    }
    val df = fps.toSeq.toDF("id", "fp")
    val got = graft.operators.TextDedup
      .hammingNearPairs(df, "fp", "id", bits = 64, maxHamming = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      if java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2) <= 3
    } yield {
      val (a, b) = (fps(i)._1, fps(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.nonEmpty, "fixture must produce near pairs")
  }

  test("image near-dup dedup: dHash + hammingNearPairs pairs re-encoded/resized copies only") {
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    import graft.multimodal.ImageOps
    val grad = png(64, 48)((x, y) => x * 3 + y)       // smooth gradient
    val gradBig = png(128, 96)((x, y) => (x * 3) / 2 + y / 2) // same scene, resized
    val checker = png(64, 48)((x, y) => if (((x / 8) + (y / 8)) % 2 == 0) 230 else 20)
    val junk = Array[Byte](1, 2, 3)
    val df = Seq((1L, grad), (2L, gradBig), (3L, checker), (4L, junk))
      .toDF("img_id", "bytes")
    val hashes = ImageOps.dHashes(df, "img_id", "bytes")
    val ok = hashes.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(ok == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false), ok.toString)
    val pairs = graft.operators.TextDedup
      .hammingNearPairs(hashes.where($"ok"), "dhash", "img_id",
        bits = 64, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"resized copy must pair with the original and nothing else: $pairs")
    // determinism of the fingerprint itself
    val again = ImageOps.dHash(grad)
    assert(again == ImageOps.dHash(grad) && again.isDefined)
    // area-average stability on LARGE sources: a 1200x900 original and its
    // 300x225 re-render must stay within the hamming budget (one-step
    // bilinear scaling aliases here — the area-average grid must not)
    // smooth gradient + one brightness DROP at xs=150 (content-shaped, no
    // mod-256 wrap — a wrapping sawtooth makes the gradient signs
    // legitimately chance-level at cell granularity)
    def scene(s: Int)(x: Int, y: Int): Int = {
      val (xs, ys) = (x / s, y / s)
      math.min(40 + xs / 2 + ys / 3 - (if (xs > 150) 40 else 0), 255)
    }
    val big = png(1200, 900)(scene(4))
    val small = png(300, 225)(scene(1))
    val (hb, hs) = (ImageOps.dHash(big).get, ImageOps.dHash(small).get)
    val dist = java.lang.Long.bitCount(hb ^ hs)
    assert(dist <= 6, s"large-vs-small re-render drifted $dist bits")
  }

  test("SemDedup: k-means production path merges planted near-identical vectors only") {
    val rnd = new scala.util.Random(11)
    // 3 well-separated centers; 10 points each; every third point gets a
    // near-identical twin (tiny perturbation -> cosine ~ 1)
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 5) 10f else 0f),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 10f else 0f),
      Array.tabulate(16)(i => if (i >= 10) 10f else 0f))
    val base = for {
      c <- centers.indices; p <- 0 until 10
    } yield {
      // noise wide enough that DISTINCT same-cluster points sit well below
      // tau (cos ~ 0.99), while twins (delta 0.001) stay ~ 1 - 1e-9
      val v = centers(c).map(x => x + rnd.nextFloat() * 2f)
      ((c * 10 + p).toLong, v)
    }
    val twins = base.filter(_._1 % 3 == 0)
      .map { case (id, v) => (1000L + id, v.map(_ + 0.001f)) }
    val df = (base ++ twins).map { case (id, v) => (id, v.toSeq) }
      .toDF("vid", "vec")
      .select($"vid", $"vec".cast("array<float>").as("vec"))
    val res = graft.operators.SemDedup(df, "vec", "vid", nlist = 3, tau = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val byId = res.map(r => r._1 -> r).toMap
    // every twin merges with its base (rep = min id = base id), bases keep
    twins.foreach { case (tid, _) =>
      assert(byId(tid)._2 == tid - 1000L && !byId(tid)._3, byId(tid).toString)
      assert(byId(tid - 1000L)._3, "the base of a twin pair must be kept")
    }
    // non-twinned points survive as their own representatives
    base.filter(_._1 % 3 != 0).foreach { case (id, _) =>
      assert(byId(id)._2 == id && byId(id)._3, byId(id).toString)
    }
  }

  test("sd1_semantic_dedup: matches a driver-side brute-force recomputation") {
    // Recompute the whole row in plain Scala with the SAME fold orders the
    // engine uses (sequential left-to-right double accumulation), then
    // compare exactly: cluster = first-max 8-dim block sum, pairs = exact
    // within-cluster cosine > 0.3, rep = min id of the connected group.
    val rows = Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def blockSum(v: Array[Float], c: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < 8) { acc += v(c * 8 + i).toDouble; i += 1 }
      acc
    }
    val cluster = rows.map { case (id, v) =>
      var bestC = 0; var bestS = blockSum(v, 0)
      for (c <- 1 until 8) { val s = blockSum(v, c); if (s > bestS) { bestS = s; bestC = c } }
      id -> bestC
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    // union-find with min-id representatives
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for {
      i <- rows.indices; j <- (i + 1) until rows.length
      (id1, v1) = rows(i); (id2, v2) = rows(j)
      if cluster(id1) == cluster(id2)
      if dot(v1, v2) / (norm(v1) * norm(v2)) > 0.3
    } {
      val (ra, rb) = (find(id1), find(id2))
      val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
      parent(hi) = lo
    }
    val expected = rows.map { case (id, _) =>
      (id, cluster(id), find(id), find(id) == id)
    }.toSeq
    val got = Queries.sd1SemanticDedup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // sanity: the fixture must actually exercise a merge (some vec not kept)
    assert(expected.exists(!_._4), "fixture produced no semantic duplicates")
  }
}
