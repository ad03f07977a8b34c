package graft

import org.apache.spark.sql.SparkSession
import java.io.{File, PrintWriter}

/** Dev-only scratch main: schema/feature probes. Writes /tmp/probe.out. */
object Probe {
  def main(args: Array[String]): Unit = {
    val out = new PrintWriter(new File("/tmp/probe.out"))
    def p(s: String): Unit = { out.println(s); out.flush() }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      p("raw schema: " + raw.schema.treeString)
      p(raw.limit(3).collect().mkString("\n"))
    } catch {
      case e: Throwable => p(s"RAW READ FAILED: ${e.toString.take(600)}")
    }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      p("nanosAsLong schema: " + raw.schema.treeString)
      p(raw.limit(2).collect().mkString("\n"))
    } catch {
      case e: Throwable => p(s"NANOS-AS-LONG FAILED: ${e.toString.take(600)}")
    }
    try {
      val ev = Tables.events(spark, dir)
      p("events schema: " + ev.schema.treeString)
      p(ev.limit(3).collect().mkString("\n"))
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("user_id")).orderBy(col("seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = ev.withColumn("ema", graft.functions.Aggregators.ema(col("value"), 0.25).over(w))
        .filter(col("user_id") === 12).orderBy("seq")
        .select("seq", "value", "ema").limit(5).collect()
      p("ema rows:\n" + got.mkString("\n"))
    } catch {
      case e: Throwable => p(s"EVENTS/EMA FAILED: ${e.toString.take(1200)}")
    }
    out.close()
    spark.stop()
  }
}
