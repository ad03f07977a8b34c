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
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = all("q_pagerank")(spark, sfDir).count()
      val rdds = spark.sparkContext.getPersistentRDDs.size
      println(f"pass $i: ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n  persistentRDDs=$rdds")
    }
    spark.stop()
  }
}
