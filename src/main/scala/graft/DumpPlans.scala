package graft

/** Dev utility: dump `.explain("formatted")` for a list of gate queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization-round evidence
  * files (the judge checks plan claims against these).
  * `runMain graft.DumpPlans <tag> <suffix> <q1,q2,...> [sfDir]`
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq.filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          dir.resolve(s"${n}_$suffix.txt"), plan.getBytes("UTF-8"))
        println(s"[dumpplans] wrote ${n}_$suffix.txt (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[dumpplans] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
