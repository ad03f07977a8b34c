package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import graft.ml.Similarity

/** Dev-only: recall of k-means-refined IVF across configs at sf0.01. */
object ProbeKm {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probekm.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.topK(emb, "vec_id", "embedding", 3).select("a", "b").cache()
    val n = exact.count()
    p(s"n_exact=$n")
    for (cells <- Seq(8, 16, 32); iters <- Seq(0, 1, 2, 3); np <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val km = Similarity
        .topKIvfKmeans(emb, "vec_id", "embedding", 3, cells, iters, 64, np)
        .select("a", "b")
      val hits = exact.join(km, Seq("a", "b"), "left_semi").count()
      p(f"cells=$cells%-3d iters=$iters np=$np recall=${hits.toDouble / n}%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    out.close()
    spark.stop()
  }
}
