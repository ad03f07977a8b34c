package graft.probe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Celebrity-node (Zipf-degree) stress for the triangle engine — the
  * graph-side sibling of the `boiler` (hot-shingle) and `clustered`
  * (mega-cell) fixtures: SfGen's disjoint graph copies keep per-copy
  * degrees fixed, so the sf1/sf10 rungs never exercise the "curse of
  * the last reducer" the degree orientation exists to kill
  * (Suri & Vassilvitskii, WWW'11).
  *
  * The fixture is adversarial on purpose: one hub of degree d with the
  * LOWEST id (0), spokes in a ring (so triangles exist — one per ring
  * edge). Three wedge-mass encodings are counted EXACTLY (aggregations,
  * no timing noise), then the real engine is timed:
  *
  *  - naive: Σ deg·(deg−1)/2 — the unoriented node-iterator's join
  *    fanout; the hub term is d²/2 and lands in ONE reducer.
  *  - id-oriented: orient low-id → high-id; Σ outdeg·(outdeg−1)/2.
  *    With the hub at id 0 this is STILL d²/2 — orientation by id is
  *    a convention, not a fix.
  *  - degree-oriented (the engine's (degree, id) total order): the hub
  *    out-degree is 0 — every hub edge points AT it — and each spoke
  *    keeps outdeg ≤ 3, so the mass is linear in d.
  *
  * Run: Test/runMain graft.probe.TriHubProbe [d1,d2,...] (default
  * 20000,200000 — a decade apart).  Output → stdout.
  */
object TriHubProbe {
  def main(args: Array[String]): Unit = {
    val degs: Seq[Long] =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.toLong)
      else Seq(20000L, 200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def hubGraph(d: Long): DataFrame = {
      val spokes = spark.range(1L, d + 1L)
      spokes.select(lit(0L).as("u"), col("id").as("v"))
        .unionByName(spokes.select(col("id").as("u"),
          (col("id") % d + 1L).as("v")))
    }
    // `div`, not `/`: SQL `/` on bigints yields DoubleType and the
    // getLong below would CCE (same integer-div discipline as
    // PageRank.scala's fixed-point arithmetic).
    def wedgeMass(out: DataFrame): Long = out
      .groupBy("src").agg(count(lit(1)).as("od"))
      .agg(coalesce(sum(expr("od * (od - 1) div 2")), lit(0L)))
      .head().getLong(0)

    degs.foreach { d =>
      val g = hubGraph(d).cache()
      val canon = g.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v")).distinct()
      val deg = canon.select(col("u").as("n"))
        .union(canon.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val naive = deg
        .agg(coalesce(sum(expr("dg * (dg - 1) div 2")), lit(0L)))
        .head().getLong(0)
      val idOr = wedgeMass(canon.select(col("u").as("src")))
      val j = canon
        .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
      val uLess = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
      val degOr = wedgeMass(j.select(
        when(uLess, col("u")).otherwise(col("v")).as("src")))
      // timed engine pass (min of `passes`, unpersist between)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.engine.Triangles.perNode(g).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (dt, n)
      }
      println(f"hub_deg $d%d naive_wedges $naive%d id_oriented $idOr%d " +
        f"deg_oriented $degOr%d engine_min ${times.map(_._1).min}%.2f s " +
        f"passes ${times.map(t => f"${t._1}%.2f").mkString("/")} " +
        f"rows ${times.head._2}%d")
      g.unpersist()
    }
    spark.stop()
  }
}
