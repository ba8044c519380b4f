package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("within: inclusive band edge, cross-bucket matches, exactly-once pairs") {
    // tol=100; times straddle bucket boundaries (99|100) and hit the exact
    // band edge (0↔100) and just outside it (0↔101)
    val l = Seq((1L, 0L), (2L, 99L), (3L, 250L)).toDF("lid", "t1")
    val r = Seq((10L, 100L), (11L, 101L), (12L, 199L), (13L, 350L), (14L, 351L))
      .toDF("rid", "t2")
    val got = RangeJoin.within(l, r, "t1", "t2", 100L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = Set(
      1L -> 10L,              // |0-100| = 100 inclusive edge
      2L -> 10L, 2L -> 11L, 2L -> 12L, // 99 vs 100,101,199
      3L -> 12L, 3L -> 13L)   // 250 vs 199 (cross-bucket down), 350 (edge)
    assert(got == expect)     // 1-11 (101) and 3-14 (351) excluded
  }

  test("pointInInterval: half-open boundaries, cross-bucket intervals, empty intervals dropped") {
    val pts = Seq((1L, 0L), (2L, 100L), (3L, 250L), (4L, 399L), (5L, 400L))
      .toDF("pid", "t")
    val ivs = Seq(
      (10L, 0L, 100L),    // [0,100): holds t=0, NOT t=100
      (11L, 100L, 400L),  // spans 3 width-100 buckets: holds 100,250,399, NOT 400
      (12L, 500L, 500L),  // empty — matches nothing
      (13L, 600L, 550L))  // inverted — matches nothing
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 100L)
      .select($"pid", $"iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set(1L -> 10L, 2L -> 11L, 3L -> 11L, 4L -> 11L), got.toString)
  }

  test("pointInInterval matches a brute-force cross join filter on random data") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(5000).toLong)).toDF("pid", "t")
    val ivs = Seq.tabulate(100) { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, s, s + rnd.nextInt(700).toLong) // some empty (len 0)
    }.toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 250L)
      .select($"pid", $"iid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val brute = pts.crossJoin(ivs).where($"t" >= $"s" && $"t" < $"e")
      .select($"pid", $"iid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(got.length == brute.length && got.sameElements(brute))
  }

  test("within matches a brute-force cross join filter on random data") {
    val rnd = new scala.util.Random(7)
    val a = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(5000).toLong)).toDF("lid", "t1")
    val b = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(5000).toLong)).toDF("rid", "t2")
    val tol = 137L
    val got = RangeJoin.within(a, b, "t1", "t2", tol)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val brute = a.crossJoin(b).where(abs($"t1" - $"t2") <= tol)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(got.length == brute.length)
    assert(got.sameElements(brute))
  }
}
