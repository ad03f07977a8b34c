package graft.probe
import org.apache.spark.sql.SparkSession

/** Per-job decomposition of any registry query: args = query name
  * [passes=3]. Prints, per pass, wall seconds, job count, summed job
  * time (overlap = sum/wall), and the slowest jobs with their stage
  * names + task counts — the tool that separates "plan does too much"
  * from "Spark's per-job floor" (see SCALE.md round-10). */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <query> [passes]")
    val qname = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val stages = j.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '\n')}[${si.numTasks}]").mkString(" <- ")
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .map(d => s"{$d} ").getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), (desc + stages).take(150)))
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) done.add(((System.nanoTime() - s._1) / 1e9, s._2))
      }
    })
    val fn = graft.SparkEntry.queries(qname)
    (1 to passes).foreach { i =>
      val j0 = jobs.get()
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus: poll until every seen job-start
      // has its job-end (waitUntilEmpty is private[spark]); a fixed
      // sleep under-counted job durations on busy passes
      val deadline = System.nanoTime() + 3000000000L
      while (!starts.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      import scala.jdk.CollectionConverters._
      val sum = done.asScala.map(_._1).sum
      println(f"pass $i: $dt%6.2f s, ${jobs.get() - j0} jobs, job-time sum $sum%.2f s")
      if (i == passes) done.asScala.toSeq.sortBy(-_._1).take(12).foreach {
        case (d, n) => println(f"  ${d}%6.2f  $n") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
