package graft

import graft.operators.{AnnSearch, VectorMetric}
import org.apache.spark.sql.functions._

/** [[AnnSearch.batchTopK]] — the nightly offline-eval shape (score a whole
  * query batch in ONE lake scan). Pins per-metric parity with the serving
  * path's per-query `exactTopK`, and the ADVICE r12 regression: a queries
  * frame sharing column names with the base frame must analyze (the
  * crossJoin now joins minimal renamed projections, so name overlap can't
  * make `col()` resolution ambiguous).
  */
class AnnBatchSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val e = Tables.embeddings(spark, Sf0001)
    val base = e.where($"vec_id" >= 3)
    // queries keep the BASE's own column names ("embedding") on purpose —
    // the collision case the pre-join projections exist for
    val queries = e.where($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    (base, queries)
  }

  test("batchTopK == per-query exactTopK, every metric, rank order preserved") {
    val (base, queries) = fixture
    val qvecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toSeq
    for (m <- Seq(VectorMetric.Ip, VectorMetric.L2, VectorMetric.Cosine)) {
      val got = AnnSearch
        .batchTopK(base, "embedding", "vec_id", queries, "qid", "embedding", 15, m)
        .orderBy($"qid", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = qvecs.flatMap { case (qid, qv) =>
        AnnSearch.exactTopK(base, "embedding", "vec_id", qv, 15, m)
          .select($"vec_id").collect().map(_.getLong(0))
          .zipWithIndex.map { case (id, rank) => (qid, rank.toLong, id) }
      }
      assert(got == want, s"batch/per-query divergence under $m")
    }
  }

  test("shared column names between base and queries analyze cleanly") {
    val (base, _) = fixture
    // worst case: queries IS the base frame (every name collides), only the
    // query-id column renamed to satisfy the distinct-output contract
    val q = base.limit(2).select($"vec_id".as("qid"), $"embedding")
    val out = AnnSearch.batchTopK(base, "embedding", "vec_id", q, "qid", "embedding", 5)
    assert(out.count() == 10)
    assert(out.columns.toSeq == Seq("qid", "rank", "vec_id"))
  }

  test("qidCol == idCol is rejected up front (ambiguous output)") {
    val (base, _) = fixture
    val q = base.limit(1)
    val ex = intercept[IllegalArgumentException] {
      AnnSearch.batchTopK(base, "embedding", "vec_id", q, "vec_id", "embedding", 5)
    }
    assert(ex.getMessage.contains("qidCol"))
  }

  test("single-query search/rankCentroids reject k < 1 and nprobe < 1 like the batch path") {
    // ADVICE r14: batchTopKIvf throws on these edges but search() silently
    // returned zero rows — the documented parity now extends to the guards
    val e = Tables.embeddings(spark, Sf0001)
    val dim = e.select(size($"embedding")).head().getInt(0)
    val model = Queries.axisBlockIvfModel(dim)
    val indexed = graft.operators.IvfIndex.assign(e, "embedding", model)
    val q = Seq.fill(dim)(0.1)
    intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.search(indexed, model, "embedding", "vec_id", q, 0, 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.search(indexed, model, "embedding", "vec_id", q, 5, 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.rankCentroids(model, q, VectorMetric.Ip, 0)
    }
  }

  test("batchTopKIvf == per-query IvfIndex.search, every metric") {
    val e = Tables.embeddings(spark, Sf0001)
    val dim = e.select(size($"embedding")).head().getInt(0)
    val model = Queries.axisBlockIvfModel(dim)
    val indexed = graft.operators.IvfIndex
      .assign(e.where($"vec_id" >= 3), "embedding", model)
    val queries = e.where($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    val qvecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toSeq
    for (m <- Seq(VectorMetric.Ip, VectorMetric.L2, VectorMetric.Cosine)) {
      val got = AnnSearch
        .batchTopKIvf(indexed, model, "embedding", "vec_id", "cluster_id",
          queries, "qid", "embedding", 10, nprobe = 3, m)
        .orderBy($"qid", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = qvecs.flatMap { case (qid, qv) =>
        graft.operators.IvfIndex
          .search(indexed, model, "embedding", "vec_id", qv, 10, nprobe = 3, m)
          .select($"vec_id").collect().map(_.getLong(0))
          .zipWithIndex.map { case (id, rank) => (qid, rank.toLong, id) }
      }
      assert(got == want, s"batched/per-query IVF divergence under $m")
    }
  }

  test("batchTopKIvf joins on the cluster key — equi-join, no cross product") {
    val e = Tables.embeddings(spark, Sf0001)
    val model = Queries.axisBlockIvfModel(64)
    val indexed = graft.operators.IvfIndex
      .assign(e.where($"vec_id" >= 3), "embedding", model)
    val queries = e.where($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    val plan = AnnSearch
      .batchTopKIvf(indexed, model, "embedding", "vec_id", "cluster_id",
        queries, "qid", "embedding", 10, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe set must broadcast-HASH-join the lake on the cluster key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the batched IVF path must never fall back to a cross product")
  }

  test("batchTopKIvf over a partitioned lake: probe set statically prunes cluster partitions") {
    val e = Tables.embeddings(spark, Sf0001)
    val model = Queries.axisBlockIvfModel(64)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-lake").toString
    graft.operators.IvfIndex.write(
      graft.operators.IvfIndex.assign(e.where($"vec_id" >= 3), "embedding", model),
      dir)
    val lake = spark.read.parquet(dir)
    val queries = e.where($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    val out = AnnSearch.batchTopKIvf(lake, model, "embedding", "vec_id",
      "cluster_id", queries, "qid", "embedding", 10, nprobe = 3)
    // results from the partitioned-lake read equal the in-memory assign path
    val fromAssign = AnnSearch.batchTopKIvf(
      graft.operators.IvfIndex.assign(e.where($"vec_id" >= 3), "embedding", model),
      model, "embedding", "vec_id", "cluster_id",
      queries, "qid", "embedding", 10, nprobe = 3)
    assert(out.orderBy($"qid", $"rank").collect().toSeq ==
      fromAssign.orderBy($"qid", $"rank").collect().toSeq)
    // the scan must carry a STATIC partition filter on cluster_id (the
    // collected probe set's isin — stronger than DPP, which only fires
    // when its cost model approves): the lake reads only partitions some
    // query probed. PlanAuditSpec additionally pins the selected-partition
    // count.
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partitionfilters") && plan.contains("cluster_id") &&
      plan.contains(" in ("),
      s"expected a static cluster_id IN partition filter:\n$plan")
  }

  test("one scan, one shuffle: plan has a broadcast nested-loop join, no sort") {
    val (base, queries) = fixture
    val plan = AnnSearch
      .batchTopK(base, "embedding", "vec_id", queries, "qid", "embedding", 15)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"queries side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "the scored cross product must never shuffle-join")
  }
}
