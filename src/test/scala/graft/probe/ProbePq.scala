package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Dev-only: IVF-PQ smoke + recall vs exact top-k on the fixture. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probe_pq.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    p(s"vectors: ${emb.count()}")

    val exact = Similarity.topK(emb, "vec_id", "embedding", 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (nProbe <- Seq(4); rerank <- Seq(48, 96)) {
      val t0 = System.nanoTime()
      val pq = Similarity.topKIvfPq(emb, "vec_id", "embedding", 3,
          16, 2, 64, nProbe, 8, 16, 1, rerank)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = pq.intersect(exact).size
      p(f"nProbe=$nProbe rerank=$rerank  recall=${hits.toDouble / exact.size}%.3f " +
        f"(${hits}/${exact.size})  rows=${pq.size}  $sec%.1f s")
    }
    out.close()
    spark.stop()
  }
}
