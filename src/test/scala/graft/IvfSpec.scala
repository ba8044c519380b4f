package graft

import graft.operators.{AnnSearch, IvfIndex}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF with nprobe == nlist reproduces exact top-k; pruning keeps recall") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)

    val exact = AnnSearch.exactTopK(base, "embedding", "vec_id", q, 15)
      .collect().map(_.getLong(0)).toSeq

    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val full = IvfIndex.search(assigned, model, "embedding", "vec_id", q, 15, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, "nprobe == nlist must be exhaustive == exact")

    val pruned = IvfIndex.search(assigned, model, "embedding", "vec_id", q, 15, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = pruned.intersect(exact.toSet).size / 15.0
    info(f"recall@15 nprobe=2/8: $recall%.2f")
    assert(recall >= 0.2, "pruned search should retain some of the true top-k")
  }

  test("assign: expression nearest-centroid matches the KMeans build assignment") {
    val e = Tables.embeddings(spark, Sf0001)
    val (assigned, model) = IvfIndex.build(e, "embedding", nlist = 8)
    val fromBuild = assigned.select($"vec_id", $"cluster_id".as("built"))
    val fromExpr = IvfIndex.assign(e, "embedding", model)
      .select($"vec_id", $"cluster_id".as("assigned"))
    val mismatches = fromBuild.join(fromExpr, "vec_id")
      .where($"built" =!= $"assigned").count()
    assert(mismatches == 0, s"$mismatches vectors assigned differently")
  }

  test("exactTopK is the sorted prefix of the full scored scan") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val top = AnnSearch.exactTopK(e, "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.length == 10)
    assert(top.map(-_._2) == top.map(-_._2).sorted) // descending scores
  }

  test("appendToLake: grown lake ≡ rebuild under the fixed centroids, row for row") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0 && $"vec_id" % 3 =!= 1)
    val delta = e.where($"vec_id" =!= 0 && $"vec_id" % 3 === 1)
    val (_, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val pid = ProcessHandle.current().pid()
    val grown = graft.sources.TempDirs.register(s"/tmp/graft_ivfappend_${pid}_grown")
    val rebuilt = graft.sources.TempDirs.register(s"/tmp/graft_ivfappend_${pid}_rebuilt")
    IvfIndex.write(IvfIndex.assign(base, "embedding", model), grown)
    IvfIndex.appendToLake(delta, "embedding", model, grown)
    // the periodic full rebuild under the SAME centroids — append must be
    // indistinguishable from it, file layout aside
    IvfIndex.write(IvfIndex.assign(base.unionByName(delta), "embedding", model), rebuilt)
    def rows(dir: String) = spark.read.parquet(dir)
      .select($"vec_id", $"cluster_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).toSet
    assert(rows(grown) == rows(rebuilt) && rows(grown).nonEmpty)
    // and the pruned probe over the grown lake answers like the rebuild
    def probe(dir: String) = IvfIndex.search(
        spark.read.parquet(dir), model, "embedding", "vec_id", q, 15, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(grown) == probe(rebuilt))
  }
}
