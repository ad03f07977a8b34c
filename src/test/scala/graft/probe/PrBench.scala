package graft
import org.apache.spark.sql.SparkSession
object PrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pagerank")
    for (i <- 1 to 4; nm <- names) {
      val t0 = System.nanoTime()
      val n = all(nm)(spark, sfDir).count()
      println(f"pass $i $nm: ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    spark.stop()
  }
}
