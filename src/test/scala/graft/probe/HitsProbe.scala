package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe: HITS as ONE fully-unrolled lazy plan (no per-round
  * checkpoints; dedup left to AQE exchange/stage reuse) vs the
  * production per-round-checkpoint graft.engine.Hits. */
object HitsProbe {
  def unrolled(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var hub = nodes.withColumn("hub", lit(scale))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = hub.join(e, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("araw"))
      val aSumDf = authRaw.agg(coalesce(sum(col("araw")), lit(0L)).as("__asum"))
      val authN = authRaw.crossJoin(broadcast(aSumDf))
        .select(col("dst").as("anode"), expr(s"(araw * $scale) div __asum").as("auth"))
      val hubRaw = authN.join(e, col("anode") === col("dst"))
        .select(col("src"), col("auth"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hraw"))
      val hSumDf = hubRaw.agg(coalesce(sum(col("hraw")), lit(0L)).as("__hsum"))
      val hubN = hubRaw.crossJoin(broadcast(hSumDf))
        .select(col("src").as("node"), expr(s"(hraw * $scale) div __hsum").as("hub"))
      hub = hubN; auth = authN
    }
    nodes.join(auth.withColumnRenamed("anode", "node"), Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** Variant: every per-round raw table is a LAZY localCheckpoint; the
    * broadcast L1-sum subqueries cascade-materialize them (each once,
    * persist-on-first-compute), and the only eager job is the final
    * rebase. Intermediates freed after. */
  def lazyChain(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst")
      .localCheckpoint(false)
    val eByDst = e.repartition(col("dst")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(false)
    var hub = nodes.withColumn("hub", lit(scale)).localCheckpoint(false)
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = hub.join(e, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("araw"))
        .localCheckpoint(false)
      val aSumDf = authRaw.agg(coalesce(sum(col("araw")), lit(0L)).as("__asum"))
      val authN = authRaw.crossJoin(broadcast(aSumDf))
        .select(col("dst").as("anode"), expr(s"(araw * $scale) div __asum").as("auth"))
      val hubRaw = authN.join(eByDst, col("anode") === col("dst"))
        .select(col("src"), col("auth"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hraw"))
        .localCheckpoint(false)
      val hSumDf = hubRaw.agg(coalesce(sum(col("hraw")), lit(0L)).as("__hsum"))
      val hubN = hubRaw.crossJoin(broadcast(hSumDf))
        .select(col("src").as("node"), expr(s"(hraw * $scale) div __hsum").as("hub"))
      hub = hubN; auth = authN
    }
    val preFinal = sc.getPersistentRDDs.keySet
    val out = nodes.join(auth.withColumnRenamed("anode", "node"), Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
      .localCheckpoint(true)
    val dead = preFinal.toSet -- before.toSet
    sc.getPersistentRDDs.foreach { case (id, r) =>
      if (dead.contains(id)) r.unpersist(false) }
    out
  }

  /** Production shape but with AQE disabled (and optionally a smaller
    * shuffle partition count) scoped to the algorithm body: non-AQE
    * physical plans keep their outputPartitioning across
    * localCheckpoint, so per-round joins are exchange-free. */
  def scopedStatic(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, parts: String): DataFrame = {
    val ss = edges.sparkSession
    val aqe0 = ss.conf.get("spark.sql.adaptive.enabled", "true")
    val par0 = ss.conf.get("spark.sql.shuffle.partitions")
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    ss.conf.set("spark.sql.shuffle.partitions", parts)
    try graft.engine.Hits.run(edges, srcCol, dstCol, iters)
    finally {
      ss.conf.set("spark.sql.adaptive.enabled", aqe0)
      ss.conf.set("spark.sql.shuffle.partitions", par0)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same edge table q_hits uses: customer -> supplier trade graph
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
    val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("it"))
    val nJobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        nJobs.incrementAndGet()
    })
    if (sys.env.get("SPARK_GRAFT_PLAN").contains("true")) {
      val scale = 1000000L
      val e = edges.select(col("u").cast("long").as("src"),
        col("it").cast("long").as("dst"))
        .repartition(col("src")).dropDuplicates("src", "dst").localCheckpoint(true)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
      val hub = nodes.withColumn("hub", lit(scale)).localCheckpoint(true)
      val authRaw = hub.join(e, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("araw"))
      authRaw.count()
      println("=== round-1 authRaw executed plan ===")
      println(authRaw.queryExecution.executedPlan.toString.take(4000))
      val eByDst = e.repartition(col("dst")).localCheckpoint(true)
      val authCk = authRaw.localCheckpoint(true)
      val aSumDf = authCk.agg(coalesce(sum(col("araw")), lit(0L)).as("__asum"))
      val authN = authCk.crossJoin(broadcast(aSumDf))
        .select(col("dst").as("anode"), expr(s"(araw * $scale) div __asum").as("auth"))
      val hubRaw = authN.join(eByDst, col("anode") === col("dst"))
        .select(col("src"), col("auth"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hraw"))
      hubRaw.count()
      println("=== round-1 hubRaw executed plan ===")
      println(hubRaw.queryExecution.executedPlan.toString.take(4000))
      spark.stop(); return
    }
    for (i <- 1 to 4) {
      val j0 = nJobs.get
      val t0 = System.nanoTime()
      val n = scopedStatic(edges, "u", "it", 3, "32").count()
      val sec = (System.nanoTime()-t0)/1e9
      val j1 = nJobs.get
      val t1 = System.nanoTime()
      val n3 = scopedStatic(edges, "u", "it", 3, "8").count()
      val sec3 = (System.nanoTime()-t1)/1e9
      val j2 = nJobs.get
      val t2 = System.nanoTime()
      val n2 = graft.engine.Hits.run(edges, "u", "it", 3).count()
      val sec2 = (System.nanoTime()-t2)/1e9
      Thread.sleep(200)
      println(f"pass $i static32: $sec%.2f s rows=$n jobs=${j1-j0}  " +
        f"static8: $sec3%.2f s rows=$n3 jobs=${j2-j1}  " +
        f"aqe-ckpt: $sec2%.2f s rows=$n2 jobs=${nJobs.get-j2}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
