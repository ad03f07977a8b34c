package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans of the headline queries to
  * /tmp/plans.out for the scale audit (exchanges, pushed filters,
  * broadcast vs SMJ, codegen coverage). */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/plans.out"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = Seq(
      "q_filter", "q_rsum", "q_ema", "q_zip", "q_ziplatest", "q_switch",
      "q_sample", "q_tpch3_topn", "q_tpch5_nation_rev",
      "q_dedup_exact", "q_dedup_minhash", "q_ann_lsh", "q_ann_ivf",
      "q_token_stats", "q_grouped_window", "q_chunkwith",
      "q_join_asof", "q_dedup_cosine_lsh", "q_ann_lsh_mp", "q_tfidf",
      "q_sessionize", "q_sample_stratified", "q_pipeline_train",
      "q_token_quantiles")
    val all = SparkEntry.queries
    names.foreach { n =>
      out.println("=" * 78)
      out.println(s"== $n")
      out.println("=" * 78)
      try out.println(all(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => out.println(s"ERROR: $e") }
      out.flush()
    }
    out.close()
    spark.stop()
  }
}
