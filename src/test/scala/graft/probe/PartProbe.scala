package graft.probe
import org.apache.spark.sql.SparkSession

/** A/B the session shuffle-partition count for one registry query —
  * the static scopes inside the ANN queries inherit it, so this
  * measures how much of the sf0.1 wall is 32-task scheduling floor vs
  * genuine parallel compute. args = query [passes] [parts,parts,...] */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val qname = if (args.nonEmpty) args(0) else "q_ann_tuning"
    val passes = if (args.length > 1) args(1).toInt else 3
    val partsList = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(32, 8, 4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(qname)
    partsList.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        val h = rows.map(_.toString).sorted.mkString("|").hashCode
        println(f"parts=$p%3d pass $i: $dt%6.2f s  rows=${rows.length}%5d hash=$h")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
