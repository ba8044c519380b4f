package graft

import graft.operators.{AnnSearch, IvfIndex, Sq8}
import graft.plans.IvfRegistry
import org.apache.spark.sql.functions._

class Sq8Spec extends SparkSpec {
  import spark.implicits._

  test("SQ8: byte codes approximate IP scores; recall@15 vs exact is high") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)

    val model = Sq8.fit(base, "embedding")
    assert(model.dim == q.length)
    val enc = Sq8.encode(base, "embedding", model)
    val codes = enc.select($"codes").head().getAs[Array[Byte]](0)
    assert(codes.length == model.dim)

    val exact = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val approx = Sq8.searchTopK(enc, "codes", "vec_id", model, q, 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq

    val recall = approx.map(_._1).toSet.intersect(exact.map(_._1).toSet).size / 15.0
    info(f"SQ8 recall@15: $recall%.2f")
    assert(recall >= 0.8, s"low SQ8 recall: $recall")

    // per-score quantization error bounded by sum of |q_i|*scale_i/2 (+slack)
    val bound = q.indices.map(i => math.abs(q(i)) * model.scales(i) / 2).sum * 1.5
    val exactById = exact.toMap
    approx.filter(p => exactById.contains(p._1)).foreach { case (id, s) =>
      assert(math.abs(s - exactById(id)) <= bound,
        s"score error for $id: $s vs ${exactById(id)} (bound $bound)")
    }
  }

  test("IvfTopKRewrite: registered model prunes the scored top-k scan (Rule)") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val indexed = assigned.select($"vec_id", $"embedding", $"cluster_id").cache()
    indexed.count()
    try {
      // Without registration: plain exact top-k over the indexed table.
      val before = AnnSearch.exactTopK(indexed, "embedding", "vec_id", q, 15)
      assert(!before.queryExecution.optimizedPlan.toString.contains("cluster_id IN"))
      val exactIds = before.collect().map(_.getLong(0)).toSeq

      // Registered: SAME user query gets rewritten to an nprobe-pruned scan.
      IvfRegistry.register(model, nprobe = 2)
      val after = AnnSearch.exactTopK(indexed, "embedding", "vec_id", q, 15)
      val planStr = after.queryExecution.optimizedPlan.toString
      assert(planStr.contains("cluster_id"), s"no pruning filter in:\n$planStr")
      val rewrittenIds = after.collect().map(_.getLong(0)).toSeq
      // must equal the explicit IVF search with the same nprobe
      val manual = IvfIndex.search(indexed, model, "embedding", "vec_id", q, 15, nprobe = 2)
        .collect().map(_.getLong(0)).toSeq
      assert(rewrittenIds == manual)
      val recall = rewrittenIds.toSet.intersect(exactIds.toSet).size / 15.0
      info(f"rewrite recall@15 nprobe=2/8: $recall%.2f")
    } finally {
      IvfRegistry.clear()
      indexed.unpersist()
    }
  }

  test("IvfTopKRewrite: cosine, byte_dot and filtered shapes all prune (hardened matching)") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val sq8 = Sq8.fit(base, "embedding")
    val indexed = Sq8.encode(assigned, "embedding", sq8)
      .select($"vec_id", $"embedding", $"codes", $"cluster_id").cache()
    indexed.count()
    def planOf(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.toString
    try {
      IvfRegistry.register(model, nprobe = 2)

      // cosine shape: fast_dot nested under a divide still matches
      val cos = AnnSearch.exactTopKCosine(indexed, "embedding", "vec_id", q, 15)
      assert(planOf(cos).contains("cluster_id"), s"cosine not pruned:\n${planOf(cos)}")
      assert(cos.collect().length == 15)

      // byte_dot shape: SQ8 scored scan matches via the scale-weighted query
      val sq = Sq8.searchTopK(indexed, "codes", "vec_id", sq8, q, 15)
      assert(planOf(sq).contains("cluster_id"), s"sq8 not pruned:\n${planOf(sq)}")
      assert(sq.collect().length == 15)

      // intervening Filter: user predicate stays, prune lands below it
      val filtered = AnnSearch.exactTopK(
        indexed.where($"vec_id" % 2 === 0), "embedding", "vec_id", q, 15)
      val fp = planOf(filtered)
      assert(fp.contains("cluster_id"), s"filtered shape not pruned:\n$fp")
      val ids = filtered.collect().map(_.getLong(0)).toSeq
      assert(ids.nonEmpty && ids.forall(_ % 2 == 0), "user filter must still apply")
      // parity with the explicit IVF search over the same filtered base
      val manual = IvfIndex.search(indexed.where($"vec_id" % 2 === 0), model,
          "embedding", "vec_id", q, 15, nprobe = 2)
        .collect().map(_.getLong(0)).toSeq
      assert(ids == manual)

      // idempotency: explicit IVF search (already cluster-filtered) untouched
      val explicitSearch = IvfIndex.search(indexed, model, "embedding", "vec_id", q, 15, 2)
      val inCount = "cluster_id".r.findAllIn(planOf(explicitSearch)).size
      assert(explicitSearch.collect().map(_.getLong(0)).toSeq ==
        IvfIndex.search(indexed, model, "embedding", "vec_id", q, 15, 2)
          .collect().map(_.getLong(0)).toSeq)
      assert(inCount >= 1)
    } finally {
      IvfRegistry.clear()
      indexed.unpersist()
    }
  }

  test("c8_ann_rewrite gate row: equals the explicit IVF path; registry left clean") {
    val sf = Sf0001
    def rows(name: String) = SparkEntry.queries(name)(spark, sf)
      .orderBy(desc("score"), col("vec_id")).collect().map(_.toSeq).toSeq
    val rewritten = rows("c8_ann_rewrite")
    val explicitPath = rows("c8_ann_ivf")
    assert(rewritten == explicitPath,
      s"optimizer path diverged from IvfIndex.search:\n$rewritten\n$explicitPath")
    // the gate must not leak its registration into later queries
    assert(IvfRegistry.current.isEmpty, "gate row left the IVF registry registered")
  }
}
