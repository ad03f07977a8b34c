package graft.probe
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Cold-pass decomposition of one registry query (arg 0): times the
  * FIRST execution in a fresh JVM and prints its top stage walls plus
  * the driver-side residue (total − Σ stage wall, ≈ planning + codegen
  * + JIT + job-barrier gaps) — separates "real distributed work grew"
  * from "first-run compilation". Pass 2 printed for the steady anchor. */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q_triangles"
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
        val rdds = i.rddInfos.map(_.name).filter(_ != null).distinct.take(6)
          .mkString("|")
        stages.synchronized { stages += ((rdds.take(120),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks.toLong)) }
      }
    })
    val fn = graft.SparkEntry.queries(q)
    for (pass <- 1 to 2) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val snap = stages.synchronized(stages.toVector)
      val sumMs = snap.map(_._2).sum
      println(f"pass $pass: total $total%.2f s, ${snap.size} stages, " +
        f"stage-wall sum ${sumMs / 1e3}%.2f s, driver residue ${total - sumMs / 1e3}%.2f s")
      snap.sortBy(-_._2).take(8).foreach { case (n, ms, t) =>
        println(f"  $ms%7d ms $t%3d tasks  $n") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
