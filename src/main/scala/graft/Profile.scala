package graft

/** Scratch profiling main (not part of the engine surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val which = args.headOption.getOrElse("sig")
    which match {
      case "sig" =>
        import org.apache.spark.sql.functions._
        val docs = Tables.documents(spark, sfDir)
        val wide = graft.operators.TextDedup.minhashWide(docs, "text", "doc_id", 8, 3)
        time("wide")(wide.count())
        time("wide2")(wide.count())
        val stackArgs = (0 until 8).map(j => s"$j, m$j").mkString(", ")
        val st = wide.selectExpr("doc_id", s"stack(8, $stackArgs) AS (j, minh)")
        time("stack")(st.count())
        val ord = st.orderBy(col("doc_id"), col("j"))
        time("orderBy")(ord.count())
        val full = Queries.e2MinhashSig(spark, sfDir)
        time("full")(full.count())
        full.explain("formatted")
      case "jac" =>
        val full = Queries.e4JaccardPairs(spark, sfDir)
        time("full")(full.count())
        time("full2")(full.count())
        full.explain("formatted")
      case "bisect" =>
        // Run the timed-pass prefix (sorted order, sf0.1) up to arg(1) names
        // from a comma list, then time sig.
        val names = args(1).split(",").toSeq
        names.foreach { n =>
          val t0 = System.nanoTime()
          try Queries.all(n)(spark, sfDir).count() catch { case _: Throwable => }
          println(f"PROF run:$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        (1 to 20).foreach { i =>
          time(s"sig$i")(Queries.e2MinhashSig(spark, sfDir).count())
        }
        println("PROF persistentRDDs=" + spark.sparkContext.getPersistentRDDs.size)
      case "bench2" =>
        // Mimic Bench: warm every query at sf0.001, then time sig at sfDir.
        val warmDir = "/root/testdata/sf0.001"
        Queries.all.toSeq.sortBy(_._1).foreach { case (n, fn) =>
          val t0 = System.nanoTime()
          try fn(spark, warmDir).count() catch { case _: Throwable => }
          println(f"PROF warm:$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        time("pairs")(Queries.e2MinhashPairs(spark, sfDir).count())
        time("sig")(Queries.e2MinhashSig(spark, sfDir).count())
        time("sig2")(Queries.e2MinhashSig(spark, sfDir).count())
      case q =>
        val full = Queries.all(q)(spark, sfDir)
        time("full")(full.count())
        full.explain("formatted")
    }
    spark.stop()
  }
}
