package graft

/** ANN quality gate on the CLUSTERED embedding fixture (VERDICT r5 #3): the
  * raw synthetic embeddings are near-random, so recall against them cannot
  * distinguish a good index from a broken one. The clustered fixture plants
  * recoverable structure; a correct IVF/SQ8/PQ index must hit recall@15 ≥
  * 0.8 there. Runs at the gate SF (0.01) — the same data and the same code
  * path ([[AnnRecall]]) whose numbers Verify dumps into recall.json.
  */
class RecallSpec extends SparkSpec {
  private val Sf001 = "/root/testdata/sf0.01"

  test("clustered fixture: ivf/sq8/pq recall@15 >= 0.8 at gate SF") {
    val r = AnnRecall.clusteredRecall(spark, Sf001)
    assert(r.keySet == Set("clustered_ivf", "clustered_sq8", "clustered_pq"))
    r.foreach { case (k, v) =>
      assert(v >= 0.8, f"$k recall@15 = $v%.2f, want >= 0.8")
    }
  }

  test("nprobe curve: recall monotone non-decreasing in nprobe per codec; full probe = codec ceiling (VERDICT r11 #3)") {
    val pts = AnnRecall.nprobeCurve(spark, Sf001)
    assert(pts.map(_.codec).toSet == Set("ivf", "ivf_sq8", "ivf_pq"))
    pts.groupBy(_.codec).foreach { case (codec, ps) =>
      val byNp = ps.sortBy(_.nprobe)
      assert(byNp.map(_.nprobe) == Seq(1, 2, 4, 8, 16), s"$codec nprobes")
      // probed cluster sets are NESTED (rankCentroids takes a prefix), so
      // more probes can only add candidates; for the exact-scored ivf path
      // a true neighbor in the candidate set always makes the top-k, and
      // on this fixture the quantized codecs preserve that monotonicity
      byNp.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.recall >= a.recall,
            f"$codec recall fell ${a.recall}%.2f@${a.nprobe} -> ${b.recall}%.2f@${b.nprobe}")
        case _ => ()
      }
      // nprobe=16 of 32 cells must recover the codec's recall ceiling —
      // every cell of the query's planted cluster ranks ahead of the rest
      assert(byNp.last.recall >= 0.8,
        f"$codec nprobe=16 recall ${byNp.last.recall}%.2f < 0.8")
      // the curve must be INFORMATIVE, not a saturated flat line: with
      // nlist=32 the planted cluster spans ~4 cells, so one probe cannot
      // already hold the whole top-15 (the r12 flat-curve regression test)
      assert(byNp.head.recall < byNp.last.recall,
        f"$codec curve is flat at ${byNp.head.recall}%.2f — nlist no longer " +
          "overshards the fixture's clusters")
    }
  }

  test("clustered fixture really is clustered: exact top-15 shares the query's cluster") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ce = Tables.clusteredEmbeddings(spark, Sf001)
    val q = ce.where(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble)
    val exact = graft.operators.AnnSearch
      .exactTopK(ce.where(col("vec_id") =!= 0), "embedding", "vec_id", q, 15)
      .select("vec_id").as[Long].collect()
    // query is vec_id 0 → cluster 0; every exact neighbor must be cluster 0
    assert(exact.length == 15)
    assert(exact.forall(_ % 8 == 0), s"non-cluster-0 members in top-15: ${exact.toSeq}")
  }
}
