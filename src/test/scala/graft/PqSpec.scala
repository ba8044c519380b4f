package graft

import graft.operators.{AnnSearch, IvfIndex, Pq, VectorMetric}
import graft.plans.IvfRegistry
import org.apache.spark.sql.functions._

/** Product quantization: ADC scoring exactness (score ≡ IP with the decoded
  * centroids, by construction), code shape, recall on clusterable data, and
  * the IVF_PQ composition.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("PQ: ADC score equals the IP of the decoded reconstruction exactly") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)

    val model = Pq.fit(base, "embedding", m = 8, ksub = 16)
    assert(model.dim == q.length && model.m == 8 && model.dsub == q.length / 8)
    val enc = Pq.encode(base, "embedding", model)

    val rows = enc.select($"vec_id", $"pq_codes",
        Pq.score($"pq_codes", model, q).as("score"))
      .limit(50).collect()
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]](1)
      assert(codes.length == 8)
      assert(codes.forall(c => (c & 0xff) < 16), "codes must stay below ksub")
      val reconstructed = Pq.decode(model, codes)
      val ip = reconstructed.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getDouble(2) - ip) < 1e-9,
        s"ADC must be exact on the reconstruction: ${r.getDouble(2)} vs $ip")
    }
  }

  test("PQ: recall@15 vs exact top-k is well above random") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)

    val (enc, model) = Pq.fitEncodeCached(spark, "spec#pq", base, "embedding",
      m = 8, ksub = 16)
    val exact = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15)
      .collect().map(_.getLong(0)).toSet
    val approx = Pq.searchTopK(enc, "pq_codes", "vec_id", model, q, 15)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size / 15.0
    info(f"PQ recall@15: $recall%.2f")
    // near-random synthetic embeddings are PQ's hardest case; the floor for
    // a random 15-of-N pick is 15/N ≈ 0.03 at sf0.001 — demand far above it
    assert(recall >= 0.2, s"PQ recall $recall at chance level")
  }

  test("PQ gridFit: constant-vector grid codebooks; encode is nearest-level-to-mean") {
    val base = Tables.embeddings(spark, Sf0001).where($"vec_id" =!= 0)
    val gm = Pq.gridFit(base, "embedding", m = 8, ksub = 16)
    assert(gm.m == 8 && gm.ksub == 16 && gm.dsub == gm.dim / 8)
    gm.codebooks.foreach { book =>
      book.foreach(c => assert(c.forall(_ == c(0)),
        "grid centroids must be constant vectors"))
      val levels = book.map(_(0))
      assert(levels.zip(levels.tail).forall { case (a, b) => a <= b },
        "levels must ascend mn → mx")
    }
    // the scaladoc claim the oracle relies on: for constant-vector
    // codebooks, encodeVec's per-subspace argmin over squared-diff sums
    // picks the nearest grid level to the subvector mean (first-wins ties)
    val rows = base.limit(40).select($"vec_id", $"embedding").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray.map(_.toDouble)
      val got = Pq.encodeVec(gm, v)
      val want = (0 until gm.m).map { j =>
        var s = 0.0
        (0 until gm.dsub).foreach(i => s += v(j * gm.dsub + i))
        val mean = s / gm.dsub
        val levels = gm.codebooks(j).map(_(0))
        levels.indices.minBy(c => (levels(c) - mean) * (levels(c) - mean))
      }
      assert(got.map(_.toInt).toSeq == want, s"vec ${r.getLong(0)}")
    }
    // ADC exactness holds for grid codebooks through the same score path
    val q = Tables.embeddings(spark, Sf0001).where($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val enc = Pq.encode(base, "embedding", gm)
    enc.select($"pq_codes", Pq.score($"pq_codes", gm, q).as("score"))
      .limit(20).collect().foreach { r =>
        val ip = Pq.decode(gm, r.getAs[Array[Byte]](0))
          .zip(q).map { case (a, b) => a * b }.sum
        assert(math.abs(r.getDouble(1) - ip) < 1e-9)
      }
  }

  test("PQ: m must divide dim; ksub capped at one byte") {
    val base = Tables.embeddings(spark, Sf0001).where($"vec_id" =!= 0)
    intercept[IllegalArgumentException] {
      Pq.fit(base, "embedding", m = 7, ksub = 8)
    }
    intercept[IllegalArgumentException] {
      Pq.fit(base, "embedding", m = 8, ksub = 300)
    }
  }

  test("IVF_PQ composition: pruned ADC search ranks like unpruned on probed set") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)

    val (assigned, ivf) = IvfIndex.build(base, "embedding", nlist = 8)
    val pq = Pq.fit(base, "embedding", m = 8, ksub = 16)
    val enc = Pq.encode(assigned, "embedding", pq).cache()
    enc.count()

    // prune to nprobe=3 clusters exactly as IvfIndex.search does
    val probed = ivf.centroids.zipWithIndex
      .map { case (c, i) => (i, c.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(3).map(_._1)
    val pruned = enc.where($"cluster_id".isin(probed.toIndexedSeq: _*))

    val prunedTop = Pq.searchTopK(pruned, "pq_codes", "vec_id", pq, q, 15)
      .collect().map(_.getLong(0)).toSeq
    // every pruned result must be the same as scoring the probed subset fully
    val prunedIds = pruned.select($"vec_id").collect().map(_.getLong(0)).toSet
    val subsetTop = Pq.searchTopK(enc, "pq_codes", "vec_id", pq, q, 1000)
      .collect().map(_.getLong(0)).filter(prunedIds.contains).take(15).toSeq
    assert(prunedTop == subsetTop, "IVF pruning must only restrict the candidate set")
    enc.unpersist()
  }

  test("IvfTopKRewrite: byte_lut_sum ADC shape prunes when the PQ model is registered") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val (assigned, ivf) = IvfIndex.build(base, "embedding", nlist = 8)
    val pq = Pq.fit(base, "embedding", m = 8, ksub = 16)
    val indexed = Pq.encode(assigned, "embedding", pq)
      .select($"vec_id", $"pq_codes", $"cluster_id").cache()
    indexed.count()
    def planOf(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.toString
    val prunedRe = "cluster_id#\\d+ IN".r // attributes print with expr ids
    try {
      // unregistered: the ADC scan stays unpruned
      val before = Pq.searchTopK(indexed, "pq_codes", "vec_id", pq, q, 15)
      assert(prunedRe.findFirstIn(planOf(before)).isEmpty, planOf(before))

      // IVF alone is NOT enough for the ADC shape — the LUT hides the query
      IvfRegistry.register(ivf, nprobe = 2)
      val ivfOnly = Pq.searchTopK(indexed, "pq_codes", "vec_id", pq, q, 15)
      assert(prunedRe.findFirstIn(planOf(ivfOnly)).isEmpty,
        "ADC shape must not rewrite without the PQ codebooks")

      IvfRegistry.registerPq(pq)
      val after = Pq.searchTopK(indexed, "pq_codes", "vec_id", pq, q, 15)
      assert(planOf(after).contains("cluster_id"), s"not pruned:\n${planOf(after)}")
      val rewritten = after.collect().map(_.getLong(0)).toSeq
      // parity: manual prune in the same ADC space, then the same top-k
      val probed = ivf.centroids.zipWithIndex.map { case (c, i) =>
        val codes = Pq.encodeVec(pq, c)
        val lutScore = codes.zipWithIndex.map { case (code, j) =>
          pq.codebooks(j)(code & 0xff).zip(q.slice(j * pq.dsub, (j + 1) * pq.dsub))
            .map { case (a, b) => a * b }.sum
        }.sum
        (i, lutScore)
      }.sortBy(-_._2).take(2).map(_._1)
      val manual = Pq.searchTopK(
          indexed.where($"cluster_id".isin(probed.toIndexedSeq: _*)),
          "pq_codes", "vec_id", pq, q, 15)
        .collect().map(_.getLong(0)).toSeq
      assert(rewritten == manual)
    } finally {
      IvfRegistry.clear()
      indexed.unpersist()
    }
  }

  test("direction guard: a distance LUT sorted DESC (farthest) stays exact; ASC prunes") {
    // ADVICE r10 #2: the LUT's metric kind is recorded at build time, so
    // an ADC L2 score sorted DESC (k FARTHEST neighbors — a legitimate
    // exact query) must never be nprobe-approximated, while the normal
    // ASC nearest form is
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val (assigned, ivf) = IvfIndex.build(base, "embedding", nlist = 8)
    val pq = Pq.fit(base, "embedding", m = 8, ksub = 16)
    // cache so cluster_id is a MATERIALIZED column of the relation — on
    // the raw lineage Catalyst collapses the projects and the rewrite
    // correctly declines (cluster_id would be recomputed, not pruned on)
    val indexed = Pq.encode(assigned, "embedding", pq)
      .select($"vec_id", $"pq_codes", $"cluster_id").cache()
    indexed.count()
    def planOf(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.toString
    val prunedRe = "cluster_id#\\d+ IN".r
    try {
      IvfRegistry.register(ivf, nprobe = 2)
      IvfRegistry.registerPq(pq)
      val dist = Pq.score($"pq_codes", pq, q, VectorMetric.L2)
      val nearest = indexed.select($"vec_id", dist.as("score"))
        .orderBy(asc("score"), $"vec_id").limit(15)
      assert(prunedRe.findFirstIn(planOf(nearest)).isDefined,
        s"nearest (ASC over a distance LUT) should prune:\n${planOf(nearest)}")
      val farthest = indexed.select($"vec_id", dist.as("score"))
        .orderBy(desc("score"), $"vec_id").limit(15)
      assert(prunedRe.findFirstIn(planOf(farthest)).isEmpty,
        s"farthest (DESC over a distance LUT) must stay exact:\n${planOf(farthest)}")
      // and symmetrically: an IP LUT prunes DESC only
      val ip = Pq.score($"pq_codes", pq, q, VectorMetric.Ip)
      val ipDesc = indexed.select($"vec_id", ip.as("score"))
        .orderBy(desc("score"), $"vec_id").limit(15)
      assert(prunedRe.findFirstIn(planOf(ipDesc)).isDefined)
      val ipAsc = indexed.select($"vec_id", ip.as("score"))
        .orderBy(asc("score"), $"vec_id").limit(15)
      assert(prunedRe.findFirstIn(planOf(ipAsc)).isEmpty,
        "least-similar (ASC over an IP LUT) must stay exact")
    } finally { IvfRegistry.clear(); indexed.unpersist(); () }
  }
}
