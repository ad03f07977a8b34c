package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Dev-only: where does q_ann_pq_residual time go at sf0.1? Stage-level
  * timing of the residual-PQ pipeline pieces (min-of-2 each). */
object ProbeR8 {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/prober8.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    @volatile var jobs = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val j0 = jobs
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
        (dt, n, jobs - j0)
      }
      p(f"${ts.map(_._1).min}%7.2f s  $name (n=${ts.head._2}, jobs=${ts.map(_._3).min})")
    }
    // pieces of the residual pipeline
    val embQ = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qq"))
    time("kmeans16x2 (sampled)") {
      Similarity.kmeansCentroids(embQ.select(col("vec_id"), col("qq").as("q")),
        "vec_id", 16, 2, 64, 4).count()
    }
    time("ivfKmeansAssignRanked 16/4") {
      Similarity.ivfKmeansAssignRanked(emb, "vec_id", "embedding", 16, 2, 64, 4, 4).count()
    }
    time("full topKIvfPq rerank48") {
      Similarity.topKIvfPq(emb, "vec_id", "embedding", 3, 16, 2, 64, 4, 8, 16, 1, 48, 4).count()
    }
    time("full topKIvfPqResidual rerank48") {
      Similarity.topKIvfPqResidual(emb, "vec_id", "embedding", 3, 16, 2, 64, 4, 8, 16, 1, 48, 4).count()
    }
    time("residual ADC only (no rerank)") {
      Similarity.topKIvfPqResidual(emb, "vec_id", "embedding", 3, 16, 2, 64, 4, 8, 16, 1, 0, 4).count()
    }
    locally {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q_ann_tuning")(spark, "/root/testdata/sf0.1")
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      p(f"tuning: construct=${(t1 - t0) / 1e9}%.2f s  action1=${(t2 - t1) / 1e9}%.2f s  action2=${(t3 - t2) / 1e9}%.2f s  jobs=$jobs")
    }
    // node-level metrics of the ADC query
    locally {
      val df = Similarity.topKIvfPqResidual(emb, "vec_id", "embedding", 3, 16, 2, 64, 4, 8, 16, 1, 0, 4)
      df.count()
      val ex = df.queryExecution.executedPlan
      def walk(sp: org.apache.spark.sql.execution.SparkPlan): Unit = {
        sp.foreach { n =>
          val interesting = n.metrics.filter { case (k, m) =>
            (k.contains("time") || k.contains("duration")) && m.value > 300 }
          if (interesting.nonEmpty)
            p(s"  ${n.nodeName}: " + interesting.map { case (k, m) =>
              s"$k=${m.value}" }.mkString(", "))
          n match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan)
            case _ =>
          }
        }
      }
      walk(ex)
    }
    out.close()
    spark.stop()
  }
}
