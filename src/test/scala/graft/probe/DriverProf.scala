package graft.probe
import org.apache.spark.sql.SparkSession

/** Driver-side stack sampler for one registry query: samples ALL JVM
  * threads every 25 ms during a steady pass and prints the hottest
  * driver frames (graft/catalyst/codegen), splitting "driver planning/
  * codegen floor" from "scheduler/compute" — the tool for tails like
  * q_ann_pq_residual's ~2.7 s ADC-plan future (SCALE.md r10/r11).
  * args = query [passes=3] */
object DriverProf {
  def main(args: Array[String]): Unit = {
    val qname = if (args.nonEmpty) args(0) else "q_ann_pq_residual"
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(qname)
    (1 to passes - 1).foreach { _ =>
      fn(spark, sfDir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // sample the steady pass
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var run = true
    val sampler = new Thread(() => {
      while (run) {
        val stacks = Thread.getAllStackTraces()
        stacks.forEach { (t, st) =>
          // skip executor task threads: we want the DRIVER-side floor
          if (!t.getName.startsWith("Executor task launch")) {
            val hot = st.find { e =>
              val c = e.getClassName
              (c.startsWith("org.apache.spark.sql.catalyst") ||
                c.startsWith("org.apache.spark.sql.execution") ||
                c.startsWith("org.codehaus.janino") ||
                c.startsWith("graft.")) && !c.startsWith("graft.probe")
            }
            hot.foreach { e =>
              val key = s"${t.getName.replaceAll("[0-9]+", "N")} :: " +
                s"${e.getClassName.split("\\.").takeRight(2).mkString(".")}.${e.getMethodName}"
              counts.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    val t0 = System.nanoTime()
    sampler.start()
    fn(spark, sfDir).count()
    run = false
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"steady pass: $dt%.2f s; hottest driver-side frames (25ms samples):")
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, c) =>
      println(f"  ${c * 25}%6d ms  $k")
    }
    spark.stop()
  }
}
