package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Dev-only: stage timing for the ANN LSH path at sf0.1. */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probe.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count() // warm file listing

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      p(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    time("bucket-only") {
      emb.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b")).groupBy("b").count().count()
    }
    time("pairs-no-score") {
      val bucketed = emb.select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), 8, 64).as("bucket"))
      bucketed.groupBy("bucket")
        .agg(collect_list(struct(col("vec_id").as("id"), col("embedding").as("v"))).as("ms"))
        .select(explode(col("ms")).as("x"), col("ms"))
        .select(col("x"), explode(col("ms")).as("y"))
        .filter(col("x.id") =!= col("y.id")).count()
    }
    time("full-lsh") {
      Similarity.topKLsh(emb, "vec_id", "embedding", 3, 8, 64).count()
    }
    time("full-lsh-2nd") {
      Similarity.topKLsh(emb, "vec_id", "embedding", 3, 8, 64).count()
    }
    out.close()
    spark.stop()
  }
}
