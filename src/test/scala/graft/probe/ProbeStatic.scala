package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.StaticPlan
import graft.ml.Similarity

/** Dev-only: reproduce the StaticPlan × DeduplicateRelations
  * "Conflicting attributes" failure and try fixes. */
object ProbeStatic {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probestatic.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    def tryCase(name: String)(f: => Long): Unit =
      try p(s"OK   $name -> n=$f")
      catch { case e: Throwable =>
        p(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage.take(12000)}") }

    StaticPlan.scoped(spark, 8) {
      tryCase("checkpoint joined with ORIGINAL scan") {
        val c = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)
        c.join(emb.select(col("vec_id")), "vec_id").count()
      }
      tryCase("SHUFFLED checkpoint joined with ORIGINAL scan") {
        val c = emb.repartition(8, col("vec_id")).localCheckpoint(true)
        c.join(emb.select(col("vec_id")), "vec_id").count()
      }
      tryCase("WINDOWED checkpoint joined with ORIGINAL scan") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("vec_id"))
        val c = emb.withColumn("r", row_number().over(w)).localCheckpoint(true)
        c.join(emb.select(col("vec_id")), "vec_id").count()
      }
      tryCase("two-level: ckpt A, ckpt B(from A), join A-deriv with B-deriv and scan") {
        val a = emb.repartition(8, col("vec_id")).localCheckpoint(true)
        val b = a.groupBy(col("vec_id") % 7 as "g")
          .agg(count(lit(1)).as("n")).localCheckpoint(true)
        a.join(b, col("vec_id") % 7 === col("g"))
          .join(emb.select(col("vec_id")), "vec_id").count()
      }
      tryCase("simple self-join of static checkpoint") {
        val c = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)
        c.alias("l").join(c.alias("r"), col("l.vec_id") === col("r.vec_id")).count()
      }
      tryCase("shuffled self-join of static checkpoint") {
        val c = emb.repartition(8, col("vec_id")).localCheckpoint(true)
        c.alias("l").join(c.alias("r"), col("l.vec_id") === col("r.vec_id")).count()
      }
      tryCase("windowed+checkpointed then self-join") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("vec_id"))
        val c = emb.withColumn("r", row_number().over(w)).localCheckpoint(true)
        c.alias("l").join(c.alias("r"), col("l.vec_id") === col("r.vec_id")).count()
      }
      tryCase("rerankShortlist shape (short join emb join emb)") {
        val short = emb.select(col("vec_id").as("a")).limit(10)
          .crossJoin(emb.select(col("vec_id").as("b")).limit(5))
          .localCheckpoint(true)
        Similarity.rerankShortlist(emb, "vec_id", "embedding", short, 3).count()
      }
      tryCase("full topKIvfPq under static") {
        Similarity.topKIvfPq(emb, "vec_id", "embedding", 3, 16, 2, 64, 4, 8, 16, 1, 48, 4).count()
      }
      tryCase("full topKIvfPqResidual under static") {
        Similarity.topKIvfPqResidual(emb, "vec_id", "embedding", 3, 16, 2, 64, 4, 8, 16, 1, 48, 4).count()
      }
    }
    out.close()
    spark.stop()
  }
}
