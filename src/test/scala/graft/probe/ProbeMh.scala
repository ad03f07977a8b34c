package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Dev-only: stage timing for the MinHash+LSH dedup path at sf0.1. */
object ProbeMh {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      p(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    val K = 5; val H = 12; val BANDS = 4; val R = 3

    time("warm-tiny-3docs") {
      val tiny = docs.limit(3)
      val sigs = TextOps.minhashSigArray(tiny, "doc_id", "text", K, H)
      val bands = TextOps.lshBandsArr(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidates(bands, "doc_id").count()
    }
    time("arr-cold-first") {
      val sigs = TextOps.minhashSigArray(docs, "doc_id", "text", K, H)
      val bands = TextOps.lshBandsArr(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidates(bands, "doc_id").count()
    }
    time("arr-sigs-only") {
      TextOps.minhashSigArray(docs, "doc_id", "text", K, H).count()
    }
    time("arr-bands-only") {
      val sigs = TextOps.minhashSigArray(docs, "doc_id", "text", K, H)
      TextOps.lshBandsArr(sigs, "doc_id", BANDS, R).count()
    }
    time("tokens-only") {
      docs.select(TextOps.tokens(col("text")).as("t")).selectExpr("sum(size(t))").count()
    }
    time("token-fps") {
      docs.select(TextOps.tokenFingerprints(TextOps.tokens(col("text"))).as("f"))
        .selectExpr("sum(size(f))").count()
    }
    time("edges") {
      TextOps.shingleSidEdges(docs, "doc_id", "text", K, dedup = false).count()
    }
    time("sigs-narrow") {
      TextOps.minhashSignaturesNarrow(docs, "doc_id", "text", K, H).count()
    }
    time("bands") {
      val sigs = TextOps.minhashSignaturesNarrow(docs, "doc_id", "text", K, H)
      TextOps.lshBands(sigs, "doc_id", BANDS, R).count()
    }
    time("full") {
      val sigs = TextOps.minhashSignaturesNarrow(docs, "doc_id", "text", K, H)
      val bands = TextOps.lshBands(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidates(bands, "doc_id").count()
    }
    time("full-2nd") {
      val sigs = TextOps.minhashSignaturesNarrow(docs, "doc_id", "text", K, H)
      val bands = TextOps.lshBands(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidates(bands, "doc_id").count()
    }
    time("full-arr-cold") {
      val sigs = TextOps.minhashSigArray(docs, "doc_id", "text", K, H)
      val bands = TextOps.lshBandsArr(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidates(bands, "doc_id").count()
    }
    time("full-arr-2nd") {
      val sigs = TextOps.minhashSigArray(docs, "doc_id", "text", K, H)
      val bands = TextOps.lshBandsArr(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidates(bands, "doc_id").count()
    }
    out.close()
    spark.stop()
  }
}
