package graft.probe
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage wall profile of one registry query (arg 0): runs twice,
  * prints top stages of pass 2 with their RDD scope names. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q_ann_pq_residual"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.ArrayBuffer[(String, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val rdds = i.rddInfos.map(_.name).filter(_ != null).distinct.take(8)
          .mkString("|")
        stages.synchronized { stages += ((rdds.take(180),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks.toLong)) }
      }
    })
    val fn = graft.SparkEntry.queries(q)
    fn(spark, sfDir).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    Thread.sleep(500)
    stages.synchronized(stages.clear())
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(800)
    stages.synchronized(stages.sortBy(-_._2).take(10)).foreach {
      case (n, ms, t) => println(f"$ms%7d ms $t%3d tasks  $n") }
    spark.stop()
  }
}
