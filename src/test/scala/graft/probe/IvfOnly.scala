package graft.probe
import org.apache.spark.sql.SparkSession
object IvfOnly {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q_ann_ivf_kmeans")
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"ivf_kmeans: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    spark.stop()
  }
}
