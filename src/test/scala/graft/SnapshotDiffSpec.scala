package graft

import graft.operators.SnapshotDiff

/** [[SnapshotDiff]] — the m3 gate row hash-checks the full pipeline
  * against DuckDB; this spec pins the classification edges.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def d(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  test("classifies added/removed/changed and omits unchanged") {
    val before = d(Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")))
    val after = d(Seq((2L, "b", "y"), (3L, "c2", "z"), (4L, "d", "w")))
    val got = SnapshotDiff.diff(before, after, "doc_id", Seq("text", "source"))
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("the separator keeps column boundaries: (ab, c) != (a, bc)") {
    val got = SnapshotDiff.diff(
      d(Seq((1L, "ab", "c"))), d(Seq((1L, "a", "bc"))),
      "doc_id", Seq("text", "source")).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "changed"))
  }

  test("null vs empty content is a change (null-distinct encoding)") {
    val before = Seq((1L, Option.empty[String], "x")).toDF("doc_id", "text", "source")
    val after = d(Seq((1L, "", "x")))
    val got = SnapshotDiff.diff(before, after, "doc_id", Seq("text", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "changed"))
  }

  test("a value moving between columns is a change (ADVICE r13: " +
      "concat_ws's null-dropping would alias (a, NULL) with (NULL, a))") {
    val before = Seq((1L, Option("a"), Option.empty[String]))
      .toDF("doc_id", "text", "source")
    val after = Seq((1L, Option.empty[String], Option("a")))
      .toDF("doc_id", "text", "source")
    val got = SnapshotDiff.diff(before, after, "doc_id", Seq("text", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "changed"))
  }

  test("identical snapshots diff to nothing") {
    val a = d(Seq((1L, "a", "x"), (2L, "b", "y")))
    assert(SnapshotDiff.diff(a, a, "doc_id", Seq("text", "source")).count() == 0)
  }
}
