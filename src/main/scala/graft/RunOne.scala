package graft

/** Dev utility: run one named gate query and print its warm time —
  * `runMain graft.RunOne <query> [sfDir] [reps]`. Warmup at sf0.001 pays
  * JIT/codegen once (same protocol as [[Bench]]) so the printed seconds are
  * comparable to the per-query bench numbers.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: RunOne <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val warmDir = "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      fn(spark, sfDir).explain("formatted")
      spark.stop()
      return
    }
    // Bench.materialize (noop sink): the full plan executes — count()
    // would column-prune projection-only queries down to a row count
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      Bench.materialize(df)
    materialize(fn(spark, warmDir))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      materialize(fn(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name $dt%.3f s")
      dt
    }
    println(f"[runone] $name min=${times.min}%.3f s")
    spark.stop()
  }
}
