package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev-only: sf0.1 robustness + timing for the round-3 queries that are
  * not bench headliners (iterative components, verify joins, windows). */
object ProbeR3 {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probe.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val all = SparkEntry.queries
    Seq("q_join_asof", "q_sessionize", "q_sample_stratified", "q_tfidf",
      "q_token_quantiles", "q_dedup_cosine_lsh", "q_ann_lsh_mp",
      "q_dedup_clusters", "q_dedup_verified", "q_pipeline_train",
      "q_pipeline_dedup", "q_time_window", "q_tpch17_smallqty",
      "q_rollup", "q_pivot", "q_percentile_rank", "q_distinct_kmv",
      "q_multimodal_frames", "q_sample_weighted", "q_ann_recall",
      "q_ann_ivf2", "q_chunk_docs", "q_decontaminate", "q_redact")
      .foreach { n =>
        val t0 = System.nanoTime()
        try {
          val c = all(n)(spark, dir).count()
          p(f"$n%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$c")
        } catch { case e: Throwable => p(s"$n FAILED: ${e.toString.take(300)}") }
      }
    out.close()
    spark.stop()
  }
}
