package graft.probe
import org.apache.spark.sql.SparkSession

object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"${(System.nanoTime()-t0)/1e9}%7.2f  $name")
    }
    val qa = graft.SparkEntry.queries("q_bpe_apply")
    val qt = graft.SparkEntry.queries("q_bpe_train")
    (1 to 3).foreach { i =>
      time(s"train pass $i") { qt(spark, sfDir).count() }
      time(s"apply pass $i") { qa(spark, sfDir).count() }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // stage split: rules only vs full apply
    time("rules only") {
      graft.text.TextOps.bpeLearnedRules(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 8, 4L)
    }
    spark.stop()
  }
}
