package graft.tools

/** Focused serving-throughput probe: runs ONLY Bench's hybrid_rps
  * sidecar (the VERDICT r16 #3 metric) without the full benchmark
  * surface — the iteration loop for serving-tier work. Usage:
  * `runMain graft.tools.ServeBench <sfDir>`.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local()
    println("HYBRID_RPS " + graft.Bench.hybridRps(spark, sfDir))
    println("SERVING_RPS " + graft.Bench.servingRps(spark, sfDir))
    spark.stop()
  }
}
