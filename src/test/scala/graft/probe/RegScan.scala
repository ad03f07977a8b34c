package graft
import org.apache.spark.sql.SparkSession

/** Registry-wide timing scan: min-of-2 count() per query at sf0.1,
  * sorted slowest-first — finds slow queries the headline bench does
  * not cover. Report written to /tmp/regscan.txt. */
object RegScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new StringBuilder
    val times = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          out.append(s"ERR $name: ${e.getMessage.take(80)}\n"); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> samples.min
    }
    times.sortBy(-_._2).foreach { case (n, s) =>
      out.append(f"$s%7.2f  $n%s\n") }
    out.append(f"TOTAL(min-of-2) ${times.map(_._2).sum}%.1f s over ${times.size} queries\n")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/regscan.txt"),
      out.toString.getBytes)
    println("wrote /tmp/regscan.txt")
    spark.stop()
  }
}
