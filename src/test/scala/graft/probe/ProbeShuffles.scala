package graft
import org.apache.spark.sql.SparkSession

/** Static shuffle-count audit over the WHOLE query registry (the bench
  * reports the headline subset): flags multi-consumer re-execution bugs
  * of the q_triangles class — a plan whose exchange count is far above
  * its family's norm is re-running a shared subtree per consumer.
  * Writes name,count to /tmp/shuffles.txt, highest first. */
object ProbeShuffles {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val n = Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
          "Exchange SinglePartition").map(k => p.sliding(k.length).count(_ == k)).sum
        Some(name -> n)
      } catch { case e: Throwable =>
        System.err.println(s"$name FAILED: ${e.getMessage}"); None }
    }
    val out = rows.sortBy(-_._2).map { case (n, c) => s"$n $c" }.mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/shuffles.txt"), out + "\n")
    println("wrote /tmp/shuffles.txt")
    spark.stop()
  }
}
