package graft

import graft.sources.LakeLayout
import org.apache.spark.sql.functions._

class LakeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join and aggregate with NO shuffle on the bucket key") {
    val orders = Tables.orders(spark, Sf0001)
    val lineitem = Tables.lineitem(spark, Sf0001)
    LakeLayout.writeBucketed(orders, "orders_b", 8, "o_orderkey")
    LakeLayout.writeBucketed(
      lineitem, "lineitem_b", 8, "l_orderkey", Seq("l_orderkey", "l_linenumber"))
    try {
      val o = spark.table("orders_b")
      val l = spark.table("lineitem_b")
      // disable broadcast so the join would normally shuffle both sides
      val joined = o.hint("merge").join(l, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val viaBuckets = joined.agg(sum($"n")).head().getLong(0)
      val direct = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("compactParquet: many appended small files -> few files, identical rows (loader.js:388-398)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/frames"
    // simulate 12 streaming micro-batch appends, partitioned like the frames table
    (0 until 12).foreach { b =>
      Seq((b, s"doc$b", if (b % 2 == 0) "cl" else "eh"))
        .toDF("n", "name", "algo")
        .write.mode("append").partitionBy("algo").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted
    val stats = LakeLayout.compactParquet(spark, dir, partitionCols = Seq("algo"))
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(stats.rows == 12)
    assert(stats.filesBefore >= 12, stats.toString)
    assert(stats.filesAfter <= 2, stats.toString) // one per algo partition
    assert(after.toSeq == before.toSeq)
  }
}
