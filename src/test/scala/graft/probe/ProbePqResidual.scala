package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import graft.ml.Similarity

/** Dev-only: residual-PQ vs raw-PQ recall at sf0.01. */
object ProbePqResidual {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probepqr.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    val exact = Similarity.topK(emb, "vec_id", "embedding", 3).select("a", "b").cache()
    val n = exact.count()
    p(s"n_exact=$n")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      exact.join(df.select("a", "b"), Seq("a", "b"), "left_semi").count().toDouble / n
    for (rerank <- Seq(0, 12, 24, 48)) {
      val t0 = System.nanoTime()
      val raw = Similarity.topKIvfPq(emb, "vec_id", "embedding", 3,
        16, 2, 64, 4, 8, 16, 1, rerank)
      val rRaw = recall(raw)
      val t1 = System.nanoTime()
      val res = Similarity.topKIvfPqResidual(emb, "vec_id", "embedding", 3,
        16, 2, 64, 4, 8, 16, 1, rerank)
      val rRes = recall(res)
      val t2 = System.nanoTime()
      p(f"rerank=$rerank raw=$rRaw%.3f (${(t1 - t0) / 1e9}%.1f s) " +
        f"residual=$rRes%.3f (${(t2 - t1) / 1e9}%.1f s)")
    }
    out.close()
    spark.stop()
  }
}
