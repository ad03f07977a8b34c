package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.EventStream

/** Dev-only: A/B of the zip encodings at sf0.1 in ONE JVM — old
  * per-side-index + equi-join vs new union + one window + one agg —
  * plus exchange counts from the executed plans. */
object ProbeZip {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probezip.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def sub(t: String): EventStream = {
      val e = queries.EventQueries.ev(spark, d)
      e.derive(e.df.filter(col("event_type") === t))
    }
    // OLD encoding (index each side, equi-join)
    def zipOld(a: EventStream, b: EventStream, idxAs: String): EventStream = {
      val ad = a.df.withColumn(idxAs, row_number().over(a.w).cast("long"))
      val bd = b.df.withColumn(idxAs, row_number().over(b.w).cast("long"))
      val joinCols = a.keys :+ idxAs
      val bCols = bd.columns.diff(joinCols)
      val bRenamed = bCols.foldLeft(bd)((d2, c) => d2.withColumnRenamed(c, s"${c}_r"))
      a.derive(ad.join(bRenamed, joinCols, "inner"))
    }
    def run(name: String, mk: () => EventStream): Unit = {
      val plan = mk().df.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = mk().df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        p(f"$name pass $i: $n pairs in $sec%.2f s = ${n / sec}%.0f pairs/s (plan exchanges: $nEx)")
      }
    }
    run("old", () => zipOld(sub("click"), sub("purchase"), "i"))
    run("new", () => EventStream.zip(sub("click"), sub("purchase"), "i"))
    run("old", () => zipOld(sub("click"), sub("purchase"), "i"))
    run("new", () => EventStream.zip(sub("click"), sub("purchase"), "i"))
    out.close()
    spark.stop()
  }
}
