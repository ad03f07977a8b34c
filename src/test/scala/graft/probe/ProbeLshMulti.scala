package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Dev-only: recall/cost of multi-table LSH configs at sf0.01. */
object ProbeLshMulti {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probelshm.out"))
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
    for ((planes, tables) <- Seq((4, 2), (4, 4), (4, 6), (4, 8), (5, 4),
        (5, 8), (6, 4), (3, 4))) {
      val t0 = System.nanoTime()
      val approx = Similarity
        .topKLshMulti(emb, "vec_id", "embedding", 3, planes, 64, tables)
        .select("a", "b")
      val hits = exact.join(approx, Seq("a", "b"), "left_semi").count()
      // distinct scored pairs = the config's exact-cosine cost
      val tb = emb.select(col("vec_id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), Similarity.lshBucket(col("embedding"), planes, 64,
          t * planes).as("bucket"))): _*)).as("tb"))
        .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
      val cands = tb.as("l").join(tb.as("r"), Seq("t", "bucket"))
        .filter(col("l.vec_id") =!= col("r.vec_id"))
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b")).distinct().count()
      p(f"planes=$planes tables=$tables recall=${hits.toDouble / n}%.3f " +
        f"cost=${cands.toDouble / exactCost}%.3f ($cands pairs, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    out.close()
    spark.stop()
  }
}
