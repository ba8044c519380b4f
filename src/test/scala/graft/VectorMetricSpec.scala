package graft

import graft.functions.VectorFunctions
import graft.operators.{AnnSearch, IvfIndex, Pq, Sq8, VectorMetric}
import graft.plans.IvfRegistry
import org.apache.spark.sql.functions._

/** The distance-metric surface (SURVEY §1.3): IP / cosine / L2 through the
  * exact scan, the IVF prune, the SQ8 and PQ codecs, and the optimizer
  * rewrite. The reference serves IP only (searcher.js:104); these specs pin
  * that the widened surface keeps each path's exactness/recall contract per
  * metric.
  */
class VectorMetricSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    (e.where($"vec_id" =!= 0), q)
  }

  test("fast_l2sq: native expression is bit-identical to the composed fold") {
    val (base, q) = fixture
    val rows = base.select(
        VectorFunctions.fastL2Sq($"embedding", typedlit(q)).as("native"),
        VectorFunctions.l2Sq($"embedding", typedlit(q)).as("composed"))
      .limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"fast_l2sq diverged from composed fold: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("fast_l2sq: length mismatch yields NULL, not an error") {
    val (base, q) = fixture
    val r = base.select(
      VectorFunctions.fastL2Sq($"embedding", typedlit(q ++ Seq(0.0))).as("s"))
      .head()
    assert(r.isNullAt(0))
  }

  test("exactTopK(L2): ascending squared distance, matches driver brute force") {
    val (base, q) = fixture
    val got = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15, VectorMetric.L2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // driver-side gold: same sequential fold over the same rows
    val gold = base.select($"vec_id", $"embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var acc = 0.0
        var i = 0
        while (i < v.length) { val d = v(i).toDouble - q(i); acc += d * d; i += 1 }
        (r.getLong(0), acc)
      }
      .sortBy { case (id, s) => (s, id) }.take(15).toSeq
    assert(got == gold)
    // ascending: nearest first
    assert(got.map(_._2) == got.map(_._2).sorted)
  }

  test("exactTopK(Cosine) equals exactTopKCosine (delegation)") {
    val (base, q) = fixture
    val a = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15, VectorMetric.Cosine)
      .collect().toSeq
    val b = AnnSearch.exactTopKCosine(base, "embedding", "vec_id", q, 15)
      .collect().toSeq
    assert(a == b)
  }

  test("IVF search(L2): centroids rank ascending; equals exact L2 within probed set") {
    val (base, q) = fixture
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val indexed = assigned.select($"vec_id", $"embedding", $"cluster_id").cache()
    indexed.count()
    try {
      val probed = IvfIndex.rankCentroids(model, q, VectorMetric.L2, 3).toSeq
      assert(probed.size == 3)
      // ranked by centroid distance ascending
      def d2(c: Array[Double]) =
        c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      val dists = probed.map(i => d2(model.centroids(i)))
      assert(dists == dists.sorted, s"centroid ranking not ascending: $dists")

      val viaSearch = IvfIndex.search(indexed, model, "embedding", "vec_id",
          q, 15, nprobe = 3, VectorMetric.L2)
        .collect().map(_.getLong(0)).toSeq
      val manual = AnnSearch.exactTopK(
          indexed.where($"cluster_id".isin(probed: _*)),
          "embedding", "vec_id", q, 15, VectorMetric.L2)
        .collect().map(_.getLong(0)).toSeq
      assert(viaSearch == manual)

      // full-probe IVF L2 must equal the global exact L2 answer
      val all = IvfIndex.search(indexed, model, "embedding", "vec_id",
          q, 15, nprobe = 8, VectorMetric.L2)
        .collect().map(_.getLong(0)).toSeq
      val exact = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15,
          VectorMetric.L2)
        .collect().map(_.getLong(0)).toSeq
      assert(all == exact)
    } finally indexed.unpersist()
  }

  test("SQ8 L2/cosine: LUT score equals the metric of the decoded vector; recall high") {
    val (base, q) = fixture
    val model = Sq8.fit(base, "embedding")
    val enc = Sq8.encode(base, "embedding", model).cache()
    enc.count()
    try {
      val qn = math.sqrt(q.map(x => x * x).sum)
      val rows = enc.select($"codes",
          Sq8.score($"codes", model, q, VectorMetric.L2).as("l2"),
          Sq8.score($"codes", model, q, VectorMetric.Cosine).as("cos"))
        .limit(50).collect()
      rows.foreach { r =>
        val codes = r.getAs[Array[Byte]](0)
        val dec = codes.indices.map(i =>
          model.mins(i) + model.scales(i) * (codes(i) & 0xff))
        val l2 = dec.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        val ip = dec.zip(q).map { case (a, b) => a * b }.sum
        val cos = ip / (math.sqrt(dec.map(x => x * x).sum) * qn)
        assert(math.abs(r.getDouble(1) - l2) < 1e-6 * math.max(1.0, math.abs(l2)),
          s"SQ8 L2 LUT diverged: ${r.getDouble(1)} vs $l2")
        assert(math.abs(r.getDouble(2) - cos) < 1e-6,
          s"SQ8 cosine diverged: ${r.getDouble(2)} vs $cos")
      }

      for (metric <- Seq(VectorMetric.L2, VectorMetric.Cosine)) {
        val exact = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15, metric)
          .collect().map(_.getLong(0)).toSet
        val approx = Sq8.searchTopK(enc, "codes", "vec_id", model, q, 15, metric)
          .collect().map(_.getLong(0)).toSet
        val recall = exact.intersect(approx).size / 15.0
        info(f"SQ8 ${metric.name} recall@15: $recall%.2f")
        assert(recall >= 0.8, s"low SQ8 ${metric.name} recall: $recall")
      }
    } finally enc.unpersist()
  }

  test("PQ L2/cosine: ADC score equals the metric of the decoded reconstruction") {
    val (base, q) = fixture
    val model = Pq.fit(base, "embedding", m = 8, ksub = 16)
    val enc = Pq.encode(base, "embedding", model)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val rows = enc.select($"pq_codes",
        Pq.score($"pq_codes", model, q, VectorMetric.L2).as("l2"),
        Pq.score($"pq_codes", model, q, VectorMetric.Cosine).as("cos"))
      .limit(50).collect()
    rows.foreach { r =>
      val dec = Pq.decode(model, r.getAs[Array[Byte]](0))
      val l2 = dec.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      val ip = dec.zip(q).map { case (a, b) => a * b }.sum
      val cos = ip / (math.sqrt(dec.map(x => x * x).sum) * qn)
      assert(math.abs(r.getDouble(1) - l2) < 1e-9,
        s"PQ ADC L2 must be exact on the reconstruction: ${r.getDouble(1)} vs $l2")
      assert(math.abs(r.getDouble(2) - cos) < 1e-9,
        s"PQ ADC cosine must be exact on the reconstruction: ${r.getDouble(2)} vs $cos")
    }
  }

  test("IvfTopKRewrite: ascending fast_l2sq top-k prunes to the nearest clusters") {
    val (base, q) = fixture
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val indexed = assigned.select($"vec_id", $"embedding", $"cluster_id").cache()
    indexed.count()
    try {
      val before = AnnSearch.exactTopK(indexed, "embedding", "vec_id", q, 15,
        VectorMetric.L2)
      assert(!before.queryExecution.optimizedPlan.toString.contains("cluster_id IN"))

      IvfRegistry.register(model, nprobe = 2)
      val after = AnnSearch.exactTopK(indexed, "embedding", "vec_id", q, 15,
        VectorMetric.L2)
      val planStr = after.queryExecution.optimizedPlan.toString
      assert(planStr.contains("cluster_id"), s"L2 shape not pruned:\n$planStr")
      val rewritten = after.collect().map(_.getLong(0)).toSeq
      val manual = IvfIndex.search(indexed, model, "embedding", "vec_id", q, 15,
          nprobe = 2, VectorMetric.L2)
        .collect().map(_.getLong(0)).toSeq
      assert(rewritten == manual,
        "optimizer L2 path must equal the explicit nprobe=2 L2 search")
    } finally {
      IvfRegistry.clear()
      indexed.unpersist()
    }
  }

  test("IvfTopKRewrite: farthest-neighbor shapes (IP asc / L2 desc) stay exact") {
    import org.apache.spark.sql.functions.{asc, desc, col, expr}
    val (base, q) = fixture
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val indexed = assigned.select($"vec_id", $"embedding", $"cluster_id").cache()
    indexed.count()
    try {
      IvfRegistry.register(model, nprobe = 2)
      val qLit = org.apache.spark.sql.functions.typedlit(q)
      // k LEAST similar by IP — a legitimate exact audit query
      val ipAsc = indexed
        .select($"vec_id",
          graft.functions.VectorFunctions.fastDot($"embedding", qLit).as("score"))
        .orderBy(asc("score"), col("vec_id")).limit(15)
      assert(!ipAsc.queryExecution.optimizedPlan.toString.contains("cluster_id IN"),
        "ascending IP top-k must not be approximated")
      // k FARTHEST by L2 — same
      val l2Desc = indexed
        .select($"vec_id",
          graft.functions.VectorFunctions.fastL2Sq($"embedding", qLit).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(15)
      assert(!l2Desc.queryExecution.optimizedPlan.toString.contains("cluster_id IN"),
        "descending L2 top-k must not be approximated")
    } finally {
      IvfRegistry.clear()
      indexed.unpersist()
    }
  }

  test("cosine scoring: zero-norm rows and zero queries score 0, never throw") {
    import org.apache.spark.sql.functions.lit
    val rows = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // the ingest's preserved zero vector
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = AnnSearch.exactTopK(rows, "embedding", "vec_id",
        Seq(1.0, 0.0, 0.0, 0.0), 3, VectorMetric.Cosine)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0 && got(2L) == 1.0 && got(3L) == 0.0)
    // zero QUERY: all scores 0, ties broken by id, no ANSI divide error
    val zq = AnnSearch.exactTopK(rows, "embedding", "vec_id",
        Seq(0.0, 0.0, 0.0, 0.0), 3, VectorMetric.Cosine)
      .collect().map(_.getDouble(1))
    assert(zq.forall(_ == 0.0))
  }

  test("VectorMetric: parses names, rejects unknowns") {
    assert(VectorMetric("ip") == VectorMetric.Ip)
    assert(VectorMetric("COSINE") == VectorMetric.Cosine)
    assert(VectorMetric("l2") == VectorMetric.L2)
    intercept[IllegalArgumentException] { VectorMetric("hamming") }
  }
}
