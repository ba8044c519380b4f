package graft

import graft.operators.{CdcMerge, SnapshotDiff}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** [[CdcMerge]] — the m4 gate row hash-checks a two-batch changelog apply
  * against DuckDB; this spec pins the merge semantics edges and the plan
  * shape the 100 TB claim rests on (snapshot never shuffles).
  */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*): DataFrame =
    rows.toDF("id", "text", "src")
  private def chg(rows: (Long, Long, String, String, String)*): DataFrame =
    rows.toDF("id", "seq", "op", "text", "src")

  private def applied(s: DataFrame, c: DataFrame, bcast: Boolean = true) =
    CdcMerge.apply(s, c, "id", "seq", "op", Seq("text", "src"),
        broadcastDelta = bcast)
      .orderBy($"id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("insert, update, delete, and untouched passthrough") {
    val got = applied(
      snap((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")),
      chg((2L, 1L, "U", "b2", "y"), (3L, 1L, "D", null, null),
          (4L, 1L, "I", "d", "w")))
    assert(got == Seq((1L, "a", "x"), (2L, "b2", "y"), (4L, "d", "w")))
  }

  test("last writer wins per key: update-then-delete dies, delete-then-insert lives") {
    val got = applied(
      snap((1L, "a", "x"), (2L, "b", "y")),
      chg((1L, 1L, "U", "a2", "x"), (1L, 2L, "D", null, null),
          (2L, 1L, "D", null, null), (2L, 2L, "I", "b2", "y2")))
    assert(got == Seq((2L, "b2", "y2")))
  }

  test("equal-seq ties break on the (op, payload) struct order, not partitioning") {
    val c = chg((1L, 5L, "U", "hi", "x"), (1L, 5L, "D", null, null))
    val one = applied(snap((1L, "a", "x")), c)
    val other = applied(snap((1L, "a", "x")), c.repartition(7))
    // 'U' > 'D' in the tie struct, so the update deterministically wins
    assert(one == Seq((1L, "hi", "x")) && other == one)
  }

  test("roundtrip: apply(before, SnapshotDiff.changelog(before, after)) == after") {
    val before = snap((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
    val after = snap((2L, "b", "y"), (3L, "c2", "z"), (4L, "d", "w"))
    val log = SnapshotDiff.changelog(before, after, "id", Seq("text", "src"), seq = 7L)
    val got = applied(before, log)
    assert(got == Seq((2L, "b", "y"), (3L, "c2", "z"), (4L, "d", "w")))
    // and the changelog itself is minimal: one row per differing key
    assert(log.count() == 3)
  }

  test("broadcastDelta=false gives the same answer") {
    val s = snap((1L, "a", "x"), (2L, "b", "y"))
    val c = chg((1L, 1L, "U", "a2", "x"), (3L, 1L, "I", "c", "z"))
    assert(applied(s, c, bcast = false) == applied(s, c, bcast = true))
  }

  test("plan: delta broadcasts — the snapshot side of the anti join has no exchange") {
    val s = snap((1L, "a", "x"), (2L, "b", "y"))
    val c = chg((1L, 1L, "U", "a2", "x"))
    val p = CdcMerge.apply(s, c, "id", "seq", "op", Seq("text", "src"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti join:\n$p")
  }

  test("merge-on-read: a streamed changelog lake folds into the base; compact resets it") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pid = ProcessHandle.current().pid()
    val baseDir = graft.sources.TempDirs.register(s"/tmp/graft_cdc_base_$pid")
    val logDir = graft.sources.TempDirs.register(s"/tmp/graft_cdc_log_$pid")
    val ckpt = graft.sources.TempDirs.register(s"/tmp/graft_cdc_ckpt_$pid")
    val v2Dir = graft.sources.TempDirs.register(s"/tmp/graft_cdc_v2_$pid")
    snap((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .write.mode("overwrite").parquet(baseDir)

    def view(base: String, log: String) =
      CdcMerge.readMerged(spark, base, log, "id", "seq", "op", Seq("text", "src"))
        .orderBy($"id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    // empty log: the view IS the base
    assert(view(baseDir, logDir) == Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")))

    // stream two micro-batches of changes into the log (exactly-once sink)
    val input = MemoryStream[(Long, Long, String, String, String)]
    val q = input.toDF().toDF("id", "seq", "op", "text", "src")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", logDir)
      .outputMode("append").start()
    try {
      input.addData((2L, 1L, "U", "b2", "y"), (4L, 1L, "I", "d", "w"))
      q.processAllAvailable()
      input.addData((1L, 2L, "D", null, null), (2L, 2L, "U", "b3", "y"))
      q.processAllAvailable()
    } finally q.stop()

    val live = view(baseDir, logDir)
    assert(live == Seq((2L, "b3", "y"), (3L, "c", "z"), (4L, "d", "w")),
      s"MOR view must fold both batches last-writer-wins: $live")

    // time travel: asOfSeq truncates the log prefix — seq 1 shows batch 1
    // only, a cutoff below every logged seq shows the bare base
    def asOf(v: Long) =
      CdcMerge.readMerged(spark, baseDir, logDir, "id", "seq", "op",
          Seq("text", "src"), asOfSeq = Some(v))
        .orderBy($"id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(asOf(1L) ==
      Seq((1L, "a", "x"), (2L, "b2", "y"), (3L, "c", "z"), (4L, "d", "w")),
      "batch 2's delete of 1 and update of 2 must be invisible as of seq 1")
    assert(asOf(0L) == Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")))
    assert(asOf(2L) == live, "a cutoff at the head equals the live view")

    // compaction: the folded view becomes the next base version; the view
    // over (v2, fresh empty log) is unchanged
    CdcMerge.compact(spark, baseDir, logDir, v2Dir,
      "id", "seq", "op", Seq("text", "src"))
    val emptyLog = graft.sources.TempDirs.register(s"/tmp/graft_cdc_log2_$pid")
    assert(view(v2Dir, emptyLog) == live)
  }

  test("CDC maintains a served ANN index: deletes vanish from top-k, assigned inserts surface") {
    import graft.operators.{IvfIndex, VectorMetric}
    val e = Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val (indexed0, model) = IvfIndex.build(e, "embedding", nlist = 4)
    val indexed = indexed0.select($"vec_id", $"embedding", $"cluster_id")
    val q = e.where($"vec_id" === 7L).head.getSeq[Double](1)

    def topIds(ix: DataFrame) =
      IvfIndex.search(ix, model, "embedding", "vec_id", q, 5,
          nprobe = 4, VectorMetric.Cosine)
        .collect().map(_.getLong(0)).toSeq

    assert(topIds(indexed).head == 7L, "a vector's own embedding is its cosine top-1")

    // the maintenance loop: deletes arrive as bare keys; inserts are
    // ASSIGNED to their cluster first (the real ingest path), then both
    // merge into the index lake like any other CDC batch — no rebuild
    val del = Seq(7L, 11L).toDF("vec_id")
      .select($"vec_id", lit(1L).as("seq"), lit("D").as("op"),
        lit(null).cast("array<double>").as("embedding"),
        lit(null).cast("int").as("cluster_id"))
    val ins = IvfIndex.assign(Seq((9001L, q)).toDF("vec_id", "embedding"),
        "embedding", model)
      .select($"vec_id", lit(2L).as("seq"), lit("I").as("op"),
        $"embedding", $"cluster_id")
    val merged = CdcMerge.apply(indexed, del.unionByName(ins),
      "vec_id", "seq", "op", Seq("embedding", "cluster_id"))

    val top = topIds(merged)
    assert(top.head == 9001L, s"the re-added twin of q must serve: $top")
    assert(!top.contains(7L) && !top.contains(11L),
      s"deleted vectors must never surface: $top")
    assert(merged.count() == indexed.count() - 2 + 1)
  }

  test("payload must not repeat the key; empty payload rejected") {
    val s = snap((1L, "a", "x"))
    intercept[IllegalArgumentException] {
      CdcMerge.apply(s, s, "id", "seq", "op", Seq("id", "text"))
    }
    intercept[IllegalArgumentException] {
      CdcMerge.apply(s, s, "id", "seq", "op", Seq.empty)
    }
  }
}
