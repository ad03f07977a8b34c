package graft
import org.apache.spark.sql.SparkSession

/** Isolated-session perf probe: 4 passes over the named queries at
  * sf0.1, optionally preceded by a one-shot pollution phase
  * (SPARK_GRAFT_PREP: comma-separated query names, or "headline" for
  * Bench's set) — for bisecting cross-query session degradation. */
object PrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    val prep = sys.env.getOrElse("SPARK_GRAFT_PREP", "") match {
      case "" => Nil
      case s  => s.split(",").map(_.trim).filter(all.contains).toSeq
    }
    for (nm <- prep) {
      val t0 = System.nanoTime()
      all(nm)(spark, sfDir).count()
      println(f"prep $nm: ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (sys.env.get("SPARK_GRAFT_PREP_CLEAN").contains("true")) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("true")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = s.stageInfo
            val wall = (for {a <- i.completionTime; b <- i.submissionTime}
              yield a - b).getOrElse(-1L)
            val run = i.taskMetrics.executorRunTime
            val gc = i.taskMetrics.jvmGCTime
            val spill = i.taskMetrics.memoryBytesSpilled
            val deser = i.taskMetrics.executorDeserializeTime
            if (wall > 300) println(
              f"  stage ${i.stageId}%4d wall=${wall}%5d ms run=${run}%6d " +
              f"gc=${gc}%5d deser=${deser}%5d spillMB=${spill / 1000000}%4d " +
              i.name.takeWhile(_ != '\n').take(60))
          }
        })
    }
    val nStages = new java.util.concurrent.atomic.AtomicInteger
    val nJobs = new java.util.concurrent.atomic.AtomicInteger
    val stageMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          nStages.incrementAndGet()
          val i = s.stageInfo
          stageMs.addAndGet((for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(0L))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          nJobs.incrementAndGet()
      })
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pagerank")
    for (i <- 1 to 4; nm <- names) {
      val (s0, j0, m0) = (nStages.get, nJobs.get, stageMs.get)
      val t0 = System.nanoTime()
      val n = all(nm)(spark, sfDir).count()
      val sec = (System.nanoTime()-t0)/1e9
      Thread.sleep(200) // let listener drain
      println(f"pass $i $nm: $sec%.2f s  rows=$n  jobs=${nJobs.get - j0} " +
        f"stages=${nStages.get - s0} stageWallMs=${stageMs.get - m0}")
    }
    spark.stop()
  }
}
