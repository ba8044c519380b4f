package graft

import graft.sources.{ManifestIndex, TempDirs, ZOrder}
import org.apache.spark.sql.functions._

/** [[ZOrder]] — m5 hash-checks the curve, m6 hash-checks the planned box
  * read; this spec pins the claim those rows rest on: a z-ordered lake
  * prunes files on BOTH dimensions, where a single-key-sorted lake prunes
  * only its sort key.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def zOf(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue matches a driver-side interleave replay; nulls and range guarded") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (1023L, 1023L))
      .toDF("a", "b")
      .select($"a", $"b", ZOrder.zvalue($"a", $"b", bits = 10).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == zOf(r.getLong(0), r.getLong(1), 10))
    }
    // out of range / negative / null -> null, never a truncated alias
    val bad = Seq((1024L, 0L), (-1L, 3L), (0L, 1024L)).toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", bits = 10).as("z")).collect()
    assert(bad.forall(_.isNullAt(0)))
    val nul = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", bits = 10).as("z")).collect()
    assert(nul.head.isNullAt(0))
    intercept[IllegalArgumentException] { ZOrder.zvalue($"a", $"b", 0) }
    intercept[IllegalArgumentException] { ZOrder.zvalue($"a", $"b", 32) }
  }

  test("zvalueN: 3-column interleave replays bit for bit; 2-column case is zvalue exactly") {
    def z3(a: Long, b: Long, c: Long, bits: Int): Long = {
      var z = 0L
      var i = 0
      while (i < bits) {
        z |= ((a >> i) & 1L) << (3 * i)
        z |= ((b >> i) & 1L) << (3 * i + 1)
        z |= ((c >> i) & 1L) << (3 * i + 2)
        i += 1
      }
      z
    }
    val rows = Seq((0L, 0L, 0L), (1L, 2L, 4L), (7L, 0L, 7L), (255L, 255L, 255L))
    val got = rows.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        ZOrder.zvalueN(Seq($"a", $"b", $"c"), bits = 8).as("z")).collect()
    got.foreach(r =>
      assert(r.getLong(3) == z3(r.getLong(0), r.getLong(1), r.getLong(2), 8)))
    val two = Seq((5L, 9L)).toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", 10).as("z1"),
        ZOrder.zvalueN(Seq($"a", $"b"), 10).as("z2")).head
    assert(two.getLong(0) == two.getLong(1))
    intercept[IllegalArgumentException] { ZOrder.zvalueN(Seq($"a"), 8) }
    intercept[IllegalArgumentException] { ZOrder.zvalueN(Seq($"a", $"b", $"c"), 22) }
  }

  test("z-curve locality: a curve-contiguous run spans a bounded box, not a stripe") {
    // walk one 32-value z segment; its (a, b) bounding box must stay small
    // (the property that makes file spans compact rectangles)
    val pts = (0L until 1024L).map { z =>
      var a = 0L; var b = 0L
      (0 until 10).foreach { i =>
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    pts.grouped(32).foreach { seg =>
      val (as, bs) = (seg.map(_._1), seg.map(_._2))
      assert((as.max - as.min) <= 8 && (bs.max - bs.min) <= 8,
        s"curve segment sprawls: a ${as.min}..${as.max} b ${bs.min}..${bs.max}")
    }
  }

  test("both dimensions prune on the z lake; the single-sort lake prunes one") {
    val pid = ProcessHandle.current().pid()
    val zDir = TempDirs.register(s"/tmp/graft_zspec_z_$pid")
    val aDir = TempDirs.register(s"/tmp/graft_zspec_a_$pid")
    // uniform grid so selectivity translates directly into file counts
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).as("b"))
    ZOrder.layout(df, zDir, "a", "b", bits = 6, nFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(aDir)

    val zMan = ZOrder.buildManifest(spark, zDir, "a", "b").localCheckpoint()
    val aMan = ZOrder.buildManifest(spark, aDir, "a", "b").localCheckpoint()
    val (zTotal, aTotal) = (zMan.count(), aMan.count())
    // range boundaries are sampled; file counts near but not exactly nFiles
    assert(zTotal >= 8 && aTotal >= 8, s"z $zTotal a $aTotal")

    // narrow band in a: both layouts prune
    assert(ZOrder.prunedFiles(zMan, 0, 7, 0, 63).size < zTotal / 2)
    assert(ZOrder.prunedFiles(aMan, 0, 7, 0, 63).size < aTotal / 2)
    // narrow band in b: z still prunes; the a-sorted lake cannot
    assert(ZOrder.prunedFiles(zMan, 0, 63, 0, 7).size < zTotal / 2,
      "z-order must prune on the second dimension")
    assert(ZOrder.prunedFiles(aMan, 0, 63, 0, 7).size == aTotal,
      "a-sorted lake has no b locality — every file intersects")
    // box read returns exactly the predicate rows either way
    val want = df.where(col("a").between(3, 12) && col("b").between(5, 20)).count()
    assert(ZOrder.boxRead(spark, zDir, zMan, "a", "b", 3, 12, 5, 20).count() == want)
    assert(ZOrder.boxRead(spark, aDir, aMan, "a", "b", 3, 12, 5, 20).count() == want)
  }

  test("3-D: layoutN + buildManifestN + boxReadN prune on every dimension, lose no rows") {
    val pid = ProcessHandle.current().pid()
    val dir = TempDirs.register(s"/tmp/graft_zspec_3d_$pid")
    // 16x16x16 uniform grid
    val df = spark.range(0, 4096).select(
      (col("id") % 16).as("a"), ((col("id") / 16) % 16).as("b"),
      (col("id") / 256).as("c"))
    ZOrder.layoutN(df, dir, Seq("a", "b", "c"), bits = 4, nFiles = 16)
    val man = ZOrder.buildManifestN(spark, dir,
      Seq("a" -> "a", "b" -> "b", "c" -> "c")).localCheckpoint()
    val total = man.count()
    assert(total >= 8, s"expected a multi-file lake, got $total")
    // a narrow band on EACH dimension prunes — no stripe-blind axis
    Seq("a", "b", "c").foreach { d =>
      val boxes = Seq("a", "b", "c").map(x =>
        if (x == d) (x, 0L, 1L) else (x, 0L, 15L))
      assert(ZOrder.prunedFilesN(man, boxes).size < total,
        s"dimension $d must prune on a 3-D z lake")
    }
    // the 3-D box read is exactly the plain predicate
    val boxes = Seq(("a", "a", 2L, 9L), ("b", "b", 1L, 6L), ("c", "c", 4L, 12L))
    val want = df.where(col("a").between(2, 9) && col("b").between(1, 6) &&
      col("c").between(4, 12)).count()
    assert(ZOrder.boxReadN(spark, dir, man, boxes).count() == want && want > 0)
  }

  test("empty intersection keeps the schema without listing the lake") {
    val pid = ProcessHandle.current().pid()
    val dir = TempDirs.register(s"/tmp/graft_zspec_e_$pid")
    val df = Seq((1L, 2L, "x")).toDF("a", "b", "v")
    ZOrder.layout(df, dir, "a", "b", bits = 4, nFiles = 2)
    val man = ZOrder.buildManifest(spark, dir, "a", "b")
    val out = ZOrder.boxRead(spark, dir, man, "a", "b", 100, 200, 100, 200)
    assert(out.columns.toSeq == Seq("a", "b", "v") && out.count() == 0)
  }
}
