package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Dev-only: recall/cost frontier for WIDER k-means IVF configs — the
  * round-5 hunt for ≥0.75 recall at <50% of exact candidate cost. */
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/prober5.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    val nVec = emb.count()
    val exactCost = nVec * (nVec - 1)
    val exact = Similarity.topK(emb, "vec_id", "embedding", 3).select("a", "b").cache()
    val n = exact.count()
    p(s"n_vec=$nVec n_exact=$n exact_cost=$exactCost")
    for ((cells, np) <- Seq((16, 4), (16, 6), (16, 8), (32, 8), (32, 10),
        (32, 12), (64, 16), (64, 20), (8, 4)); iters <- Seq(2)) {
      val t0 = System.nanoTime()
      val km = Similarity
        .topKIvfKmeans(emb, "vec_id", "embedding", 3, cells, iters, 64, np)
        .select("a", "b")
      val hits = exact.join(km, Seq("a", "b"), "left_semi").count()
      val assign = Similarity.ivfKmeansAssign(emb, "vec_id", "embedding",
        cells, iters, 64, np)
      val cands = assign.groupBy("cell").agg(count(lit(1)).as("m"))
        .join(assign.filter(col("isHome")).groupBy("cell")
          .agg(count(lit(1)).as("h")), "cell")
        .agg(sum(col("m") * col("h")).as("mh"))
        .select((col("mh") - nVec).as("n_cands"))
        .collect()(0).getLong(0)
      p(f"cells=$cells%-3d np=$np%-3d iters=$iters recall=${hits.toDouble / n}%.3f " +
        f"cost=${cands.toDouble / exactCost}%.3f ($cands cands, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    out.close()
    spark.stop()
  }
}
