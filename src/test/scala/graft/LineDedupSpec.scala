package graft

import graft.operators.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "all rights reserved"

  test("removeBoilerplate: frequent lines drop, unique lines survive in order") {
    val docs = Seq(
      (1L, s"alpha one\nbody of doc one\n$footer"),
      (2L, s"beta two\n$footer\nmore two"),
      (3L, s"gamma three\n$footer"),
      (4L, "delta four stands alone"),
      (5L, footer)) // every line boilerplate → empty survivor
      .toDF("id", "text")
    val out = LineDedup.removeBoilerplate(docs, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getString(1) == "alpha one\nbody of doc one")
    assert(out(2L).getString(1) == "beta two\nmore two", "order must be preserved")
    assert(out(3L).getString(1) == "gamma three")
    assert(out(4L).getString(1) == "delta four stands alone", "untouched doc passes through")
    assert(out(5L).getString(1) == "" && out(5L).getLong(2) == 0L,
      "all-boilerplate doc survives empty for the caller to gate")
    assert(out(1L).getLong(2) == 2L && out(1L).getLong(3) == 1L)
    assert(out(4L).getLong(3) == 0L)
  }

  test("removeBoilerplate: threshold counts DISTINCT documents, not occurrences") {
    // "spam" appears 3 times but only in 2 distinct docs → under minDocs=3
    val docs = Seq(
      (1L, "spam\nspam\nkeep one"),
      (2L, "spam\nkeep two"),
      (3L, "keep three"))
      .toDF("id", "text")
    val out = LineDedup.removeBoilerplate(docs, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "spam\nspam\nkeep one", "2 distinct docs < 3 → kept")

    val fired = LineDedup.removeBoilerplate(docs, "id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fired(1L) == "keep one" && fired(2L) == "keep two")
  }

  test("removeBoilerplate: cleaning pass is a broadcast, never a corpus shuffle") {
    val docs = (0L until 50L)
      .map(i => (i, s"unique line $i\n$footer"))
      .toDF("id", "text")
    val out = LineDedup.removeBoilerplate(docs, "id", "text", minDocs = 10)
    assert(out.where($"n_removed" === 1L).count() == 50L)
    // the only join in the plan is the broadcast of the 1-row boilerplate
    // array; the streamed document side (printed between the join node and
    // the BroadcastExchange build side) must reach it without an Exchange
    val plan = out.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("BroadcastNestedLoopJoin")
    assert(joinIdx >= 0, s"boilerplate set must broadcast:\n$plan")
    val buildIdx = plan.indexOf("BroadcastExchange", joinIdx)
    assert(buildIdx > joinIdx, s"broadcast build side missing:\n$plan")
    val docSide = plan.substring(joinIdx, buildIdx)
    assert(!docSide.contains("Exchange"),
      s"document side must not shuffle before the cleaning join:\n$plan")
  }
}
