package graft.probe

import org.apache.spark.sql.SparkSession

/** Dev-only: total shuffle write/read bytes and records for one
  * registry query (args: query [passes=2]) — the evidence that an
  * exchange was actually deleted, visible even for exchanges inside
  * engine-internal checkpoint jobs that the final plan cannot show. */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ShuffleBytesProbe <query> [passes]")
    val qname = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = new java.util.concurrent.atomic.AtomicLong
    val r = new java.util.concurrent.atomic.AtomicLong
    val wr = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          w.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          wr.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          r.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          tasks.incrementAndGet()
        }
      }
    })
    val fn = graft.SparkEntry.queries(qname)
    (1 to passes).foreach { i =>
      w.set(0); r.set(0); wr.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"pass $i: $dt%6.2f s, shuffleWrite ${w.get / 1048576.0}%.1f MB " +
        f"(${wr.get} rows), shuffleRead ${r.get / 1048576.0}%.1f MB, " +
        f"tasks ${tasks.get}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
