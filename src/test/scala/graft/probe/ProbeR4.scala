package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev-only: sf0.1 timing + exchange counts for the round-4 queries. */
object ProbeR4 {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probe_r4.out"))
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
    // q_dedup_spans twice: second run isolates steady-state cost from
    // first-touch codegen JIT (the SCALE.md cold-dominated claim).
    Seq("q_dedup_spans", "q_dedup_spans", "q_dsir_weights", "q_pack_sequences",
      "q_source_stats", "q_token_bpe", "q_split", "q_source_overlap",
      "q_vocab_growth", "q_histogram",
      "q_ann_pq", "q_ann_ivf_kmeans", "q_semdedup", "q_dedup_incremental",
      "q_pipeline_corpus", "q_quality_repetition", "q_ann_tuning")
      .foreach { n =>
        val t0 = System.nanoTime()
        try {
          val df = all(n)(spark, dir)
          val c = df.count()
          val plan = df.queryExecution.executedPlan.toString
          val nEx = "Exchange".r.findAllIn(plan).length -
            "ReusedExchange".r.findAllIn(plan).length
          p(f"$n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$c%-8d exchanges=$nEx")
        } catch { case e: Throwable => p(s"$n FAILED: ${e.toString.take(300)}") }
      }
    out.close()
    spark.stop()
  }
}
