package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev-only: exchange/broadcast audit of the round-5 query plans. */
object ProbePlans5 {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probeplans5.out"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q_ann_lsh_multi", "q_token_mix", "q_label_purity",
        "q_knn_eval", "q_bpe_apply")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      val nSp = "Exchange SinglePartition".r.findAllIn(plan).size
      val nBc = "BroadcastExchange".r.findAllIn(plan).size
      val nSort = "Sort ".r.findAllIn(plan).size
      out.println(s"$q: hashEx=$nEx singleEx=$nSp broadcast=$nBc sort=$nSort")
    }
    out.close()
    spark.stop()
  }
}
