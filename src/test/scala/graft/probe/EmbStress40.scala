package graft.probe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Diagnose the s=40 EmbStress broadcast blow-up: candidate counts,
  * final AQE plan of topKLshMulti, per-join strategy. */
object EmbStress40 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter("/tmp/embstress40.out")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val n0 = base.count()
    val s = if (args.nonEmpty) args(0).toInt else 40
    val copies = (0 until s).map { k =>
      if (k == 0) base
      else base.select(
        (col("vec_id") + lit(k * n0)).as("vec_id"),
        // d's multiplier must be coprime with the modulus (see
        // EmbStress): d*7%7 degenerates to a constant per-copy shift,
        // piling every copy into its base vector's bucket. That
        // degenerate shape (1785 candidates/vector, 143M pairs at 40×)
        // COMPLETES under the capped/spillable paths — kept reproducible
        // by flipping this back — but the headline number should be the
        // realistic distribution.
        expr(s"transform(embedding, (x, d) -> x + " +
          s"cast(((vec_id * 31 + $k * 17 + d * 5) % 7 - 3) as float) * 0.05f)")
          .as("embedding"))
    }
    val e = copies.reduce(_.unionByName(_)).repartition(
      spark.sparkContext.defaultParallelism).localCheckpoint(true)
    val n = s * n0
    val planes = Similarity.lshPlanesFor(n, 96L, 2)
    out.println(s"n=$n planes=$planes")
    val cand = Similarity.lshMultiCandidates(e, "vec_id", "embedding", planes, 64, 4,
      planeStride = 4)
    val t0 = System.nanoTime()
    val nc = cand.count()
    out.println(f"candidates=$nc%d  (${(System.nanoTime()-t0)/1e9}%.1f s)  " +
      f"per-vector=${nc.toDouble/n}%.1f")
    val topk = Similarity.topKLshMulti(e, "vec_id", "embedding", 3, planes, 64, 4,
      planeStride = 4)
    val t1 = System.nanoTime()
    try {
      val rows = topk.count()
      out.println(f"topk rows=$rows (${(System.nanoTime()-t1)/1e9}%.1f s)")
    } catch { case ex: Throwable => out.println("FAILED: " + ex.getMessage.take(300)) }
    val planStr = topk.queryExecution.executedPlan.toString
    planStr.linesIterator.filter(l => l.contains("Join") || l.contains("Broadcast") ||
      l.contains("AdaptiveSparkPlan")).foreach(out.println)
    out.close()
    spark.stop()
  }
}
