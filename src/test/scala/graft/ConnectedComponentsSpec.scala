package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("minLabel: chains collapse to min id; singletons keep their own id") {
    // components: {1,2,3,4} (a 3-link chain), {5,6}, {7} isolated
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (5L, 6L)).toDF("d1", "d2")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L)
    // distributed rounds (localThreshold = 0) and driver finish (default)
    // must produce the identical closure
    assert(asMap(ConnectedComponents.minLabel(verts, pairs, "d1", "d2",
      localThreshold = 0)) == expect)
    assert(asMap(ConnectedComponents.minLabel(verts, pairs, "d1", "d2")) == expect)
  }

  test("alternatingStar: long chain (diameter 63) collapses in O(log n) rounds") {
    val n = 64L
    val verts = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = ConnectedComponents.alternatingStar(verts, pairs, "d1", "d2",
      maxIter = 10, localThreshold = 0)
    assert(asMap(got) == (0L until n).map(_ -> 0L).toMap)
  }

  test("alternatingStar agrees with minLabel on chains, singletons and random graphs") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (5L, 6L)).toDF("d1", "d2")
    val star = ConnectedComponents.alternatingStar(verts, pairs, "d1", "d2",
      localThreshold = 0)
    assert(asMap(star) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))

    val rnd = new scala.util.Random(7)
    val n = 80
    val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val vdf = (0L until n.toLong).toDF("id")
    val edf = edges.toDF("d1", "d2")
    assert(asMap(ConnectedComponents.alternatingStar(vdf, edf, "d1", "d2",
      localThreshold = 0)) ==
      asMap(ConnectedComponents.minLabel(vdf, edf, "d1", "d2", localThreshold = 0)))
  }

  test("minLabel matches brute-force closure on a random graph (distributed path)") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // brute-force union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val got = ConnectedComponents.minLabel(
      (0L until n.toLong).toDF("id"), edges.toDF("d1", "d2"), "d1", "d2",
      localThreshold = 0)
    assert(asMap(got) == expect)
  }

  test("driver local finish agrees with both distributed algorithms on a random graph") {
    val rnd = new scala.util.Random(13)
    val n = 100
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val vdf = (0L until n.toLong).toDF("id")
    val edf = edges.toDF("d1", "d2")
    val local = asMap(ConnectedComponents.minLabel(vdf, edf, "d1", "d2"))
    assert(local == asMap(ConnectedComponents.minLabel(vdf, edf, "d1", "d2",
      localThreshold = 0)))
    assert(local == asMap(ConnectedComponents.alternatingStar(vdf, edf, "d1", "d2",
      localThreshold = 0)))
    assert(local == asMap(ConnectedComponents.alternatingStar(vdf, edf, "d1", "d2")))
  }

  test("alternatingStar local finish engages mid-loop when the graph shrinks under threshold") {
    // threshold 40 < initial 63 chain edges: at least one distributed star
    // round must run before the driver finish takes over — exercises the
    // handoff on a partially-contracted edge set.
    val n = 64L
    val verts = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = ConnectedComponents.alternatingStar(verts, pairs, "d1", "d2",
      localThreshold = 40)
    assert(asMap(got) == (0L until n).map(_ -> 0L).toMap)
  }
}
