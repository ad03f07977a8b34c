package graft.probe

import org.apache.spark.sql.SparkSession
import graft.text.TextOps
import graft.Tables

/** Dev probe: isolate the LSH candidate-generation stage cost —
  * uncapped collect_list vs capped variants — at a given SF. */
object ProbeCap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def bands = TextOps.lshBandsArr(
      TextOps.minhashSigArray(docs, "doc_id", "text", 5, 12), "doc_id", 4, 3)
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag%-10s run$i n=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("bands")(bands.count())
    time("uncapped")(TextOps.lshCandidates(bands, "doc_id").count())
    time("capped")(TextOps.lshCandidatesCapped(bands, "doc_id", 1024).count())
    spark.stop()
  }
}
