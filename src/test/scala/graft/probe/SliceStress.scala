package graft.probe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Does probe-depth slicing pay at scale? At sf0.1 the tuning report's
  * sliced scoring measured a wash (checkpoint jobs ≈ the saved
  * quadratic work); this probe grows the quadratic term with the
  * EmbStress synthetic corpus and compares, per scale,
  *   separate: topKFromAssign at depth 2 + topKFromAssign at depth 4
  *   sliced:   topKFromAssignSlices(Seq(2, 4)) — ONE scored pass
  * over the SAME pre-materialized ranked assignment (production
  * corpus-derived cell count, sampled training), so the delta is
  * exactly the scoring+ranking stage the slicing dedups. */
object SliceStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val n0 = base.count()
    def scaled(s: Int): DataFrame = {
      val copies = (0 until s).map { k =>
        if (k == 0) base
        else base.select(
          (col("vec_id") + lit(k * n0)).as("vec_id"),
          expr(s"transform(embedding, (x, d) -> x + " +
            s"cast(((vec_id * 31 + $k * 17 + d * 5) % 7 - 3) as float) * 0.05f)")
            .as("embedding"))
      }
      copies.reduce(_.unionByName(_)).repartition(
        spark.sparkContext.defaultParallelism).localCheckpoint(true)
    }
    def time(f: => Unit): Double = {
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
      dt
    }
    println(f"canary_sec ${graft.HostCanary.canarySec(spark, "/root/testdata/sf0.1")}%.3f")
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    scales.foreach { s =>
      val e = scaled(s)
      val n = s * n0
      val cells = Similarity.ivfCellsFor(n, 128L, 16)
      val ranked = graft.engine.StaticPlan.ckptFresh(
        Similarity.ivfKmeansAssignRanked(e, "vec_id", "embedding",
          cells, 2, 64, 4, trainMod = 16))
      // min-of-2 per variant, alternating order to cancel JIT ramp
      def sep(): Unit = {
        Similarity.topKFromAssign(ranked.filter(col("rank") <= 2)
          .drop("rank"), "vec_id", "embedding", 3).count()
        Similarity.topKFromAssign(ranked.filter(col("rank") <= 4)
          .drop("rank"), "vec_id", "embedding", 3).count()
      }
      def sli(): Unit = {
        val m = Similarity.topKFromAssignSlices(ranked, "vec_id",
          "embedding", 3, Seq(2, 4),
          materialize = df => graft.engine.StaticPlan.ckptFresh(df))
        m(2).count(); m(4).count()
      }
      val t1 = time(sep()); val t2 = time(sli())
      val t3 = time(sep()); val t4 = time(sli())
      println(f"s=$s%3d cells=$cells%5d separate=${math.min(t1, t3)}%7.2f s  sliced=${math.min(t2, t4)}%7.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
