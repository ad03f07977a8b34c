package graft.probe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Serving-path scale probe: does a top-k serve against a PERSISTED
  * postings table read the whole corpus or only the probed cells?
  * Postings are written PARTITIONED BY cell; the serve join's query
  * side is broadcast, so dynamic partition pruning should reduce the
  * postings scan to the cells the batch actually probes — the layout
  * that makes serve latency track candidates, not corpus size.
  * Prints, per scale: serve seconds against cell-partitioned vs flat
  * postings, and whether the partitioned plan carries a dynamic
  * pruning filter. */
object ServeStress {
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
    println(f"canary_sec ${graft.HostCanary.canarySec(spark, "/root/testdata/sf0.1")}%.3f")
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 16, 40)
    scales.foreach { s =>
      val e = scaled(s)
      val n = s * n0
      val cells = Similarity.ivfCellsFor(n, 128L, 16)
      val cents = Similarity.kmeansCentroids(
        e.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q")),
        "vec_id", cells, 2, 64, trainMod = 16)
      val postings = Similarity.ivfAssignFromCentroids(
          e, "vec_id", "embedding", cents, 1)
        .filter(col("isHome"))
        .select(col("vec_id"), col("embedding"), col("cell"))
      val pPart = s"/tmp/serve_stress_part_$s"
      val pFlat = s"/tmp/serve_stress_flat_$s"
      postings.write.mode("overwrite").partitionBy("cell").parquet(pPart)
      postings.write.mode("overwrite").parquet(pFlat)
      val queries = e.filter(col("vec_id") < 64).localCheckpoint(true)
      def serve(path: String, prune: Boolean): (Double, Long) = {
        val posted = spark.read.parquet(path)
        val df = Similarity.serveTopK(queries, posted, "vec_id",
          "embedding", 3, cents, 2, pruneCells = prune)
        // capture the row count from the timed passes themselves — a
        // fourth untimed count() re-ran a full serve per configuration
        var rows = 0L
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); rows = df.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        // serving-loop hygiene (serveTopK scaladoc): free THIS batch's
        // assignment pin, keep the loop-reused query checkpoint
        graft.engine.Checkpoints.releaseExcept(df, queries)
        (t, rows)
      }
      val (tp, np) = serve(pPart, prune = false)
      val (tpp, npp) = serve(pPart, prune = true)
      val (tf, _) = serve(pFlat, prune = false)
      val (tfp, _) = serve(pFlat, prune = true)
      assert(np == npp, s"pruned serve changed the result: $np vs $npp")
      println(f"s=$s%3d cells=$cells%5d part=$tp%6.2f part+prune=$tpp%6.2f " +
        f"flat=$tf%6.2f flat+prune=$tfp%6.2f s")
      // WIDE batch (probes most cells): the prune must fall back to the
      // broadcast semi-join (IN budget exceeded) — bounded plan size,
      // row-identical to the unpruned serve. Timed: plan+run must stay
      // in the same regime as the unpruned serve, not blow up planning.
      val wideQ = e.filter(col("vec_id") % 7 === 0).localCheckpoint(true)
      def serveWide(prune: Boolean): (Double, Long) = {
        val posted = spark.read.parquet(pPart)
        val df = Similarity.serveTopK(wideQ, posted, "vec_id",
          "embedding", 3, cents, 2, pruneCells = prune, pruneInMax = 64)
        var rows = 0L
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); rows = df.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        graft.engine.Checkpoints.releaseExcept(df, wideQ)
        (t, rows)
      }
      val (twn, nwn) = serveWide(prune = false)
      val (tws, nws) = serveWide(prune = true)
      assert(nwn == nws, s"semi-join fallback changed the result: $nwn vs $nws")
      println(f"s=$s%3d wide-batch unpruned=$twn%6.2f semiJoinFallback=$tws%6.2f s " +
        f"(rows=$nwn)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
