package graft

import graft.operators.Anonymize
import org.apache.spark.sql.functions._

/** [[Anonymize]] — the u2 gate row hash-checks suppression against DuckDB;
  * this spec pins the k boundary, null-QI grouping, the mask twin, and the
  * plan shape (one hash shuffle on the QI key, non-empty partition spec).
  */
class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "en", "a", "keep me"), (2L, "en", "a", "keep me too"),
    (3L, "en", "a", "three makes k"), (4L, "en", "b", "rare pair"),
    (5L, "de", "a", "also rare"), (6L, null, "a", "null qi 1"),
    (7L, null, "a", "null qi 2"), (8L, null, "a", "null qi 3")
  ).toDF("id", "lang", "src", "text")

  test("kSuppress: groups at exactly k survive, under-k groups drop") {
    val kept = Anonymize.kSuppress(df, Seq($"lang", $"src"), 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 6L, 7L, 8L),
      s"(en,a) and (null,a) have 3 members, the rest are rare: $kept")
  }

  test("kSuppress: nulls group together — an all-null QI is still a QI") {
    val kept = Anonymize.kSuppress(df, Seq($"lang"), 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(6L) && kept.contains(7L) && kept.contains(8L))
    assert(!kept.contains(5L), "de has one member")
  }

  test("kMask keeps every row and nulls only the rare groups' masked columns") {
    val out = Anonymize.kMask(df, Seq($"lang", $"src"), 3L, Seq("lang", "src"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), Option(r.getString(3)))).toList
    assert(out.size == df.count())
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(4L)._2 && byId(5L)._2, "rare rows masked")
    assert(!byId(1L)._2, "safe rows untouched")
    assert(byId(4L)._3.contains("rare pair"), "non-masked payload survives")
  }

  test("k=1 keeps everything; derived-expression QI works") {
    assert(Anonymize.kSuppress(df, Seq($"lang"), 1L).count() == df.count())
    // bucketed expression as QI (the u2 gate shape)
    val bucketed = Anonymize.kSuppress(
      df.withColumn("n", length($"text")), Seq(floor($"n" / 10)), 2L)
    assert(bucketed.count() >= 2)
  }

  test("a caller column named __qi_n is rejected, not silently clobbered") {
    val clash = df.withColumn("__qi_n", lit(99L))
    intercept[IllegalArgumentException] {
      Anonymize.kSuppress(clash, Seq($"lang"), 2L)
    }
    intercept[IllegalArgumentException] {
      Anonymize.kMask(clash, Seq($"lang"), 2L, Seq("src"))
    }
  }

  test("plan: one exchange, window partition spec is the QI key (never empty)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val plan = Anonymize.kSuppress(docs, Seq(col("lang"), col("source")), 5L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) Exchange".r.findAllIn(plan).length == 1, plan.take(400))
    assert(!plan.contains("SinglePartition"),
      "the QI window must hash-partition, not collapse to one partition")
  }
}
