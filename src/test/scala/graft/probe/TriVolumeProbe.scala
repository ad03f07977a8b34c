package graft.probe

import org.apache.spark.sql.functions._

/** Dev-only: volume decomposition of q_triangles' wedge phase at the
  * bench SF — canonical edges m, oriented out-degree distribution, the
  * wedge count (rows entering the closure exchange) and the triangle
  * count (rows leaving it), to size a Bloom/broadcast pre-filter of the
  * closure join (guide §3.2). */
object TriVolumeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val po = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p"), col("l_orderkey").as("o"))
      .repartition(col("p")).dropDuplicates("p", "o")
    val keep = po.groupBy("p").agg(count(lit(1)).as("c"))
      .filter(col("c") <= 25).select("p")
    val ed = po.join(broadcast(keep), "p")
      .join(po.withColumnRenamed("o", "o2"), "p")
      .filter(col("o") < col("o2"))
      .select(col("o"), col("o2"))
    val canon = ed.filter(col("o") =!= col("o2"))
      .select(least(col("o"), col("o2")).as("u"), greatest(col("o"), col("o2")).as("v"))
      .distinct().localCheckpoint(true)
    val m = canon.count()
    val deg = canon.select(col("u").as("node")).union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d")).localCheckpoint(true)
    val j = canon
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    val uLess = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = j.select(
      when(uLess, col("u")).otherwise(col("v")).as("src"),
      when(uLess, col("v")).otherwise(col("u")).as("dst"),
      when(uLess, col("dv")).otherwise(col("du")).as("dd"))
      .localCheckpoint(true)
    val odeg = o.groupBy("src").agg(count(lit(1)).as("od"))
    val wedges = odeg.agg(coalesce(sum(expr("od * (od - 1) div 2")), lit(0L)))
      .head().getLong(0)
    val maxOd = odeg.agg(max(col("od"))).head().getLong(0)
    val tris = o.select(col("src"), col("dst").as("b"), col("dd").as("db"))
      .join(o.select(col("src"), col("dst").as("c"), col("dd").as("dc")), Seq("src"))
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
      .join(o.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .count()
    println(s"TRIVOL m=$m wedges=$wedges maxOutDeg=$maxOd triangles=$tris " +
      s"wedgesPerEdge=${wedges.toDouble / m} closureSelectivity=${tris.toDouble / wedges}")
    spark.stop()
  }
}
