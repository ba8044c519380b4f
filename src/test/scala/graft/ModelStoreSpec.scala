package graft

import graft.operators.{IvfIndex, Pq, Sq8}
import graft.sources.ModelStore

/** Durable model artifacts: bit-exact round-trips and cross-"JVM" serving
  * parity — a model fitted by the build job and a model loaded from its
  * parquet artifact must produce IDENTICAL search results (doubles survive
  * parquet bit-for-bit; load order pinned by stored indices).
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) = graft.sources.TempDirs.register(
    s"/tmp/graft_modelstore_${ProcessHandle.current().pid()}_$tag")

  test("IVF model: round-trip exact; loaded model searches identically") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val path = tmp("ivf")
    ModelStore.saveIvf(spark, model, path)
    val loaded = ModelStore.loadIvf(spark, path)
    assert(loaded.centroids.length == model.centroids.length)
    loaded.centroids.zip(model.centroids).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, "centroids must round-trip bit-exactly")
    }
    val got = IvfIndex.search(assigned, loaded, "embedding", "vec_id", q, 15, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = IvfIndex.search(assigned, model, "embedding", "vec_id", q, 15, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("PQ model: round-trip exact incl. converged-short subspaces; ADC parity") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val model = Pq.fit(base, "embedding", m = 8, ksub = 16)
    val path = tmp("pq")
    ModelStore.savePq(spark, model, path)
    val loaded = ModelStore.loadPq(spark, path)
    assert(loaded.m == model.m && loaded.dsub == model.dsub)
    (0 until model.m).foreach { j =>
      assert(loaded.codebooks(j).length == model.codebooks(j).length,
        s"subspace $j centroid count must survive (KMeans may converge short)")
      loaded.codebooks(j).zip(model.codebooks(j)).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq)
      }
    }
    val enc = Pq.encode(base, "embedding", model)
    val got = Pq.searchTopK(enc, "pq_codes", "vec_id", loaded, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Pq.searchTopK(enc, "pq_codes", "vec_id", model, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("SQ8 model: round-trip exact; encode+score parity") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val model = Sq8.fit(base, "embedding")
    val path = tmp("sq8")
    ModelStore.saveSq8(spark, model, path)
    val loaded = ModelStore.loadSq8(spark, path)
    assert(loaded.mins.toSeq == model.mins.toSeq)
    assert(loaded.scales.toSeq == model.scales.toSeq)
    val enc = Sq8.encode(base, "embedding", model)
    val got = Sq8.searchTopK(enc, "codes", "vec_id", loaded, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Sq8.searchTopK(enc, "codes", "vec_id", model, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("corrupt artifacts fail loudly: empty and permuted ids rejected") {
    import org.apache.spark.sql.functions._
    val empty = tmp("ivf_empty")
    spark.emptyDataFrame.select(lit(0).as("cluster_id"),
        array(lit(0.0)).as("centroid"))
      .write.mode("overwrite").parquet(empty)
    intercept[IllegalArgumentException] { ModelStore.loadIvf(spark, empty) }
    val gapped = tmp("ivf_gap")
    Seq((0, Seq(1.0)), (2, Seq(2.0))).toDF("cluster_id", "centroid")
      .write.mode("overwrite").parquet(gapped)
    intercept[IllegalArgumentException] { ModelStore.loadIvf(spark, gapped) }
  }
}
