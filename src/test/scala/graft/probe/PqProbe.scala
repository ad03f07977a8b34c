package graft.probe
import org.apache.spark.sql.SparkSession

object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_ann_pq_residual", "q_ann_ivf_kmeans", "q_semdedup")) {
      val fn = graft.SparkEntry.queries(q)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      println(f"$q%s: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }
    spark.stop()
  }
}
