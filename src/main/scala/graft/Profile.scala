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
        // from a comma list, then time sig with per-stage metrics.
        import org.apache.spark.scheduler._
        val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val m = si.taskMetrics
            val wall = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
            stages.add(f"PROFSTAGE id=${si.stageId} tasks=${si.numTasks} " +
              f"wallMs=${wall.getOrElse(-1L)} runMs=${m.executorRunTime} " +
              f"cpuMs=${m.executorCpuTime / 1000000} gcMs=${m.jvmGCTime} " +
              f"deserMs=${m.executorDeserializeTime} resSerMs=${m.resultSerializationTime} " +
              f"name=${si.name.take(60)}")
          }
        })
        val names = args(1).split(",").toSeq.filter(_.nonEmpty)
        names.foreach { n =>
          val t0 = System.nanoTime()
          try Queries.all(n)(spark, sfDir).count() catch { case _: Throwable => }
          println(f"PROF run:$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        (1 to 12).foreach { i =>
          stages.clear()
          val t0 = System.nanoTime()
          Queries.e2MinhashSig(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"PROF sig$i t=$wall%.2f")
          if (wall > 8) stages.forEach(s => println(s"  $s"))
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
      case "reps" =>
        // args(1) = query name: 6 materialized reps with per-stage metrics
        // and driver GC deltas, to localize a per-rep degradation
        import org.apache.spark.scheduler._
        val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val m = si.taskMetrics
            val wall = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
            stages.add(f"PROFSTAGE id=${si.stageId} tasks=${si.numTasks} " +
              f"wallMs=${wall.getOrElse(-1L)} runMs=${m.executorRunTime} " +
              f"cpuMs=${m.executorCpuTime / 1000000} gcMs=${m.jvmGCTime} " +
              f"deserMs=${m.executorDeserializeTime} name=${si.name.take(50)}")
          }
        })
        val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        def gcMs(): Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
        val fn = Queries.all(args(1))
        Bench.materialize(fn(spark, "/root/testdata/sf0.001")) // warm
        (1 to 6).foreach { i =>
          stages.clear()
          val g0 = gcMs()
          val t0 = System.nanoTime()
          Bench.materialize(fn(spark, sfDir))
          val wall = (System.nanoTime() - t0) / 1e9
          val rt = Runtime.getRuntime
          println(f"PROF rep$i t=$wall%.2f driverGcMs=${gcMs() - g0} " +
            f"heapUsedMb=${(rt.totalMemory() - rt.freeMemory()) / 1048576}")
          stages.forEach(s => println(s"  $s"))
        }
      case q =>
        val t0 = System.nanoTime()
        val full = Queries.all(q)(spark, sfDir)
        println(f"PROF build t=${(System.nanoTime() - t0) / 1e9}%.2f")
        time("full")(full.count())
        time("rebuild+count") {
          Queries.all(q)(spark, sfDir).count()
        }
        full.explain("formatted")
    }
    spark.stop()
  }
}
