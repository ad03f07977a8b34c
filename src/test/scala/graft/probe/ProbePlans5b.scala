package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev-only: exchange/broadcast/reuse audit of the round-5b plans. */
object ProbePlans5b {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probeplans5b.out"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q_boilerplate", "q_bm25", "q_pagerank",
        "q_dedup_containment", "q_cube", "q_winsorize", "q_zorder",
        "q_ohlc_bars", "q_resample_ffill")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      val nSp = "Exchange SinglePartition".r.findAllIn(plan).size
      val nBc = "BroadcastExchange".r.findAllIn(plan).size
      val nRe = "ReusedExchange".r.findAllIn(plan).size
      val nTop = "TakeOrderedAndProject".r.findAllIn(plan).size
      out.println(s"$q: hashEx=$nEx singleEx=$nSp broadcast=$nBc reused=$nRe topk=$nTop")
    }
    out.close()
    spark.stop()
  }
}
