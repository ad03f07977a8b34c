package graft

import org.apache.spark.sql.functions._
import graft.engine.CheckpointScope

/** Exact checkpoint-id attribution and scope isolation — the storage
  * hygiene underneath every iterative graph engine. */
class CheckpointScopeSpec extends SparkSpec {

  private def persistedIds = spark.sparkContext.getPersistentRDDs.keySet

  test("ckpt attributes exactly the pinned RDD id (read from the plan, not a global diff)") {
    val scope = new CheckpointScope(spark.sparkContext)
    val df = scope.ckpt(spark.range(100).select(col("id"), (col("id") * 2).as("y")))
    assert(scope.last.size === 1)
    assert(persistedIds.contains(scope.last.head))
    assert(df.count() === 100)
    scope.freeAllBut(Nil)
  }

  test("two interleaved scopes never free each other's live checkpoints") {
    val s1 = new CheckpointScope(spark.sparkContext)
    val s2 = new CheckpointScope(spark.sparkContext)
    // interleave: s1, s2, s1, s2 — global diffing would attribute
    // later ids to whichever scope diffs next; exact attribution can't
    val a1 = s1.ckpt(spark.range(10).toDF())
    val b1 = s2.ckpt(spark.range(20).toDF())
    val b1Id = s2.last.head
    val a2 = s1.ckpt(a1.withColumn("z", col("id") + 1))
    val b2 = s2.ckpt(b1.withColumn("z", col("id") + 2))
    val b2Id = s2.last.head
    // free ALL of scope 1; scope 2's checkpoints must stay persisted
    // and computable (a localCheckpoint freed by mistake would be
    // unrecomputable, not just slow)
    s1.freeAllBut(Nil)
    assert(persistedIds.contains(b1Id))
    assert(persistedIds.contains(b2Id))
    assert(b1.count() === 20)
    assert(b2.count() === 20)
    assert(a2.columns.contains("z")) // plan object still valid
    s2.freeAllBut(Nil)
  }

  test("ckptLazy materializes once inside the first consuming action and is freeable") {
    val scope = new CheckpointScope(spark.sparkContext)
    val lazyDf = scope.ckptLazy(spark.range(50).select((col("id") * 3).as("v")))
    val lazyId = scope.last.head
    // registered as persistent immediately (pre-materialization)
    assert(persistedIds.contains(lazyId))
    val out = scope.ckpt(lazyDf.agg(sum(col("v")).as("s")))
    assert(out.head().getLong(0) === (0 until 50).map(_ * 3L).sum)
    scope.free(List(lazyId))
    scope.freeAllBut(Nil)
  }

  test("Checkpoints.release: two sequential engine runs leave zero pinned RDDs") {
    import org.apache.spark.sql.DataFrame
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val edges: DataFrame = spark.range(40)
      .select(col("id").as("src"), ((col("id") * 7 + 1) % 40).as("dst"))
    val r1 = graft.engine.PageRank.run(edges, "src", "dst", iters = 2)
    assert(r1.count() > 0)
    assert(graft.engine.Checkpoints.pinnedIds(r1).nonEmpty)
    graft.engine.Checkpoints.release(r1)
    val r2 = graft.engine.PageRank.run(edges, "src", "dst", iters = 2)
    assert(r2.count() > 0)
    graft.engine.Checkpoints.release(r2)
    assert(persistedIds.isEmpty,
      s"released engine results still pin RDDs: $persistedIds")
  }

  test("engine failure path frees every pinned checkpoint (scope.guarded)") {
    import org.apache.spark.sql.DataFrame
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val edges: DataFrame = spark.range(30)
      .select(col("id").as("src"), ((col("id") * 7 + 1) % 30).as("dst"))
    // scale below the node count trips Hits' require AFTER the edge
    // layouts were pinned — the failure must not leak them
    intercept[IllegalArgumentException] {
      graft.engine.Hits.run(edges, "src", "dst", iters = 2, scale = 3L)
    }
    assert(persistedIds.isEmpty,
      s"engine failure leaked pinned checkpoints: $persistedIds")
  }

  test("StaticPlan.ckptFresh: static checkpoint re-joins the original plan " +
      "(round-7 'Conflicting attributes' regression)") {
    // Under a static scope a plain localCheckpoint keeps both its
    // attribute-referencing outputPartitioning AND the original
    // attribute ids; deep pipelines that join such a checkpoint back
    // against the original scan failed analysis with "Failure when
    // resolving conflicting references in Join" (the r7 negative result
    // that forced q_ann_tuning to stay adaptive). ckptFresh re-aliases
    // the exposed output, so the same pipeline must now analyze and run.
    import graft.engine.StaticPlan
    // The exact reproducer is the residual-PQ pipeline: its checkpoints
    // (resid, codebooks) expose the scan's ids while a later join brings
    // the live scan back on the other side. Simpler checkpoint-vs-scan
    // joins do NOT trip the bug (probed explicitly) — so the regression
    // lock IS the pipeline, on a tiny synthetic embedding table.
    val emb = spark.range(40).select(col("id").as("vec_id"),
      org.apache.spark.sql.functions.array((0 until 8).map(d =>
        (((col("id") * (d + 3) + d) % 13 + 1) / lit(14.0)).cast("float")): _*)
        .as("embedding"))
    val n = StaticPlan.scoped(spark, 4) {
      graft.ml.Similarity.topKIvfPqResidual(emb, "vec_id", "embedding",
        3, 4, 1, 8, 2, 2, 4, 1, 6, 2).count()
    }
    assert(n > 0)
    // and a fresh-aliased static checkpoint still self-joins cleanly
    StaticPlan.scoped(spark, 4) {
      val c = StaticPlan.ckptFresh(emb.repartition(4, col("vec_id")))
      assert(c.alias("l").join(c.alias("r"),
        col("l.vec_id") === col("r.vec_id")).count() === 40)
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  test("FusedRounds: odd rounds lazy, last round eager, deferred frees " +
      "only flush after an eager materialization") {
    import graft.engine.FusedRounds
    val scope = new CheckpointScope(spark.sparkContext)
    val fused = new FusedRounds(scope, rounds = 3)
    var cur = scope.ckpt(spark.range(50).toDF())   // state_0, eager
    var curIds = scope.last
    val state0Ids = curIds
    // round 1: LAZY — state_0 must NOT be freed yet (the lazy plan
    // still references it and a localCheckpoint is unrecomputable)
    cur = fused.ckptRound(cur.withColumn("r", lit(1)), curIds)
    curIds = fused.last
    val r1Ids = curIds
    assert(state0Ids.forall(persistedIds.contains),
      "lazy round freed its not-yet-materialized input")
    // round 2: EAGER — materializes round 1 inside its own job, then
    // flushes both the round-1 input (deferred) and round-1 itself...
    cur = fused.ckptRound(cur.withColumn("r", lit(2)), curIds)
    curIds = fused.last
    assert(state0Ids.forall(id => !persistedIds.contains(id)),
      "deferred free of state_0 did not flush at the eager round")
    assert(r1Ids.forall(id => !persistedIds.contains(id)),
      "round-1 state should be dead after round 2 materializes")
    // round 3 (the last): always EAGER even though 3 is odd
    cur = fused.ckptRound(cur.withColumn("r", lit(3)), curIds)
    assert(cur.count() === 50)
    assert(cur.columns.count(_ == "r") === 1)
    scope.freeAllBut(Nil)
  }

  test("FusedRounds: a single-round loop stays eager (the caller consumes it)") {
    import graft.engine.FusedRounds
    val scope = new CheckpointScope(spark.sparkContext)
    val fused = new FusedRounds(scope, rounds = 1)
    val base = scope.ckpt(spark.range(10).toDF())
    val baseIds = scope.last
    val out = fused.ckptRound(base.withColumn("r", lit(1)), baseIds)
    // eager: the round materialized and freed its input immediately
    assert(baseIds.forall(id => !persistedIds.contains(id)))
    assert(out.count() === 10)
    scope.freeAllBut(Nil)
  }
}
