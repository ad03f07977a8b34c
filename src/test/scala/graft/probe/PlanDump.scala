package graft.probe

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev-only: dump the `.explain("formatted")` physical plan of the
  * named registry queries, one file per query, for the optimization
  * round's committed plan evidence (plans/r15/<q>_<tag>.txt).
  *
  * usage: PlanDump <tag> <q1,q2,...> [outDir=/root/repo/plans/r15]
  *
  * Runs at the bench's own settings (local[32], 32 shuffle partitions,
  * AQE on) against sf0.1 so the captured plan is the one the bench
  * executes, not a toy-width variant. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <q1,q2,...> [outDir]")
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val outDir = if (args.length > 2) args(2) else "/root/repo/plans/r15"
    new File(outDir).mkdirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    names.foreach { n =>
      val out = new PrintWriter(new File(outDir, s"${n}_$tag.txt"))
      try out.println(all(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => out.println(s"ERROR: $e") }
      out.close()
      println(s"wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
