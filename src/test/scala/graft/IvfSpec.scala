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

  test("broadcast centroid_argmin == literal-form assign bit-for-bit (nulls, mismatched dims, ties, NaN)") {
    // fixture engineered for the null/tie edges the two forms must agree
    // on: a null vector, a wrong-length vector (matches NO centroid ->
    // null cluster), a NaN element, an exact tie between two centroids
    // (first-min wins), plus random vectors
    val rnd = new scala.util.Random(7L)
    val dim = 8
    val ramp = Array.tabulate(dim)(_.toDouble)
    val model = IvfIndex.Model(
      Array.fill(4)(Array.fill(dim)(rnd.nextDouble() * 4 - 2)) ++
        Array(ramp.clone(), ramp.clone())) // c4 == c5: the exact-tie pair
    val rows: Seq[(Long, Array[Float])] =
      (0L until 50L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 4 - 2))) ++
        Seq((100L, null), (101L, Array.fill(dim + 3)(1.0f)),
          (102L, Array.fill(dim)(Float.NaN)),
          (103L, Array.tabulate(dim)(_.toFloat))) // equidistant to c4 == c5
    val df = rows.toDF("id", "vec")
    assert(spark.catalog.functionExists("centroid_argmin"),
      "session must register the graft extensions")
    val bcForm = IvfIndex.assign(df, "vec", model)
      .select($"id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val litForm = IvfIndex.assignLiteral(df, "vec", model)
      .select($"id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(bcForm == litForm, {
      val diff = (bcForm.keySet ++ litForm.keySet)
        .filter(k => bcForm.get(k) != litForm.get(k))
      s"forms diverge at ids $diff: bc=${diff.map(bcForm.get)}, lit=${diff.map(litForm.get)}"
    })
    assert(bcForm(100L) == null, "null vector must assign null")
    assert(bcForm(101L) == null, "no-matching-length vector must assign null")
    assert(bcForm(103L) == 4, "exact tie must take the FIRST min centroid")
  }

  test("centroid_argmin plan size is independent of nlist (the e9b plan-literal audit)") {
    val dim = 32
    def planLen(nlist: Int): Int = {
      val rnd = new scala.util.Random(nlist.toLong)
      val model = IvfIndex.Model(
        Array.fill(nlist)(Array.fill(dim)(rnd.nextDouble())))
      val df = Seq((1L, Array.fill(dim)(0.5f))).toDF("id", "vec")
      IvfIndex.assign(df, "vec", model)
        .queryExecution.executedPlan.toString.length
    }
    val small = planLen(8)
    // 4096 centroids x 32 dims ~ 2.6 MB of literals in the r18 form; the
    // broadcast form's plan must stay the size of a handle string
    val big = planLen(4096)
    assert(math.abs(big - small) < 500,
      s"plan grew with nlist: $small chars at nlist=8 vs $big at nlist=4096")
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
