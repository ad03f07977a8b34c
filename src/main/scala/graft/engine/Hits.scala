package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HITS hubs-and-authorities (Kleinberg, JACM'99) in fixed-point integer
 * arithmetic — the natural ranking for BIPARTITE interaction graphs
 * (buyers→sellers, crawlers→hosts, queries→documents), where PageRank's
 * single score conflates the two roles: a hub is good because it points
 * at good authorities, an authority because good hubs point at it.
 *
 * Per iteration (mutual recursion, L1-normalized):
 *
 *   auth'(v) = Σ_{u→v} hub(u)      then  auth = (auth' · scale) / Σ auth'
 *   hub'(u)  = Σ_{u→v} auth(v)     then  hub  = (hub'  · scale) / Σ hub'
 *
 * with every division a floor — all-Long math, bit-identical across
 * engines, partitionings and retries. L1 (not the classical L2)
 * because the sum needs no square root, keeping the recursion closed
 * over the integers; the fixed point only differs by per-round scaling,
 * which normalization absorbs.
 *
 * Overflow discipline: with the default scale 10^6, normalized scores
 * are ≤ scale, so a raw sum is ≤ max-degree·scale and the normalization
 * product is ≤ max-degree·scale² — safe in a signed 64-bit Long while
 * max-degree < 2^63/scale² ≈ 9.2·10^6. For graphs with hotter hubs,
 * lower `scale` (precision trades against headroom exactly).
 *
 * Scale shape mirrors [[PageRank]], with two HITS-specific twists:
 *
 *  - the edge table is checkpointed TWICE, once hash-partitioned by src
 *    (the auth pass joins ranks on node = src) and once by dst (the hub
 *    pass joins the fresh auth on node = dst) — two static layouts
 *    bought once instead of re-shuffling the edges by dst every round;
 *  - the per-round raw score tables (one row per scored node — graph-
 *    node-sized, not edge-sized) are checkpointed so the L1 sum, the
 *    normalization and the next pass all read a materialized aggregate
 *    instead of re-executing the edge-sized join+agg chain once per
 *    consumer (the un-checkpointed form measured ~3× the work per
 *    round). The auth-side checkpoint is LAZY: it materializes inside
 *    the hub-side's eager checkpoint job, so each round schedules ONE
 *    action, not two.
 *
 * Per round that leaves: two keyed partial-agg shuffles (the mutual
 * recursion's irreducible data movement), two in-plan broadcast 1-row
 * L1 sums (no driver round-trip), and one scheduled action; dead rounds
 * freed via [[CheckpointScope]]. The returned DataFrame is a scan over
 * one materialized node-sized table — every intermediate is released
 * before returning.
 */
object Hits {

  /** Run `iters` HITS iterations over (srcCol → dstCol) edges.
    * Returns (node, hub, auth) — scores in units of 1/scale, L1 sums
    * equal to ~scale each (floors shave ≤1 unit per node). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val scope = new CheckpointScope(spark.sparkContext)
    // Canonicalize ONCE under the caller's (adaptive) planning — the
    // only pass over the raw input; its row count sizes the static
    // round partitioning (see [[StaticPlan]]).
    val canon = scope.ckpt(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .dropDuplicates("src", "dst"))
    val nEdges = canon.count()
    // big-rung heap survival: round generations past the threshold pin
    // serialized blocks (see StaticPlan.SER_CKPT_ROWS)
    scope.serialized = nEdges > StaticPlan.SER_CKPT_ROWS
    // no edges: no nodes either — every score table is empty
    if (nEdges == 0) {
      val out = scope.ckpt(canon
        .select(col("src").as("node"), lit(0L).as("hub"), lit(0L).as("auth")))
      scope.freeAllBut(scope.last)
      return out
    }
    scope.guarded(StaticPlan.scoped(spark,
        StaticPlan.roundPartitions(nEdges, spark)) {
      runStatic(scope, canon, iters, scale)
    })
  }

  /** Iteration body — runs under [[StaticPlan.scoped]] so the pinned
    * edge layouts and per-round raw tables KEEP their partitioning
    * across checkpoints (exchange-free round joins) and each
    * checkpoint is one scheduled job, not one per exchange. */
  private def runStatic(scope: CheckpointScope, canon: DataFrame,
      iters: Int, scale: Long): DataFrame = {
    // sortWithinPartitions: the checkpoint also carries outputOrdering
    // under static planning, so every round's sort-merge join skips
    // re-sorting the edge side (the big side) — only the node-sized
    // rank tables sort per round
    // LAZY setup checkpoints (setup fusion, see [[FusedRounds]]): the
    // two edge layouts materialize inside the node-count action / the
    // first eager round's job with their pinned layouts intact; nodes
    // stays eager because its count() gates the scale precondition
    val e = scope.ckptLazy(canon.repartition(col("src"))
      .sortWithinPartitions(col("src")))
    val eByDst = scope.ckptLazy(e.repartition(col("dst"))
      .sortWithinPartitions(col("dst")))
    val nodes = scope.ckpt(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())

    // scale >= node count guarantees the largest normalized score is
    // >= 1, so the per-round L1 sums can never floor to zero (which
    // would divide by zero next round); it is also the precision floor
    val nNodes = nodes.count()
    require(scale >= nNodes,
      s"scale ($scale) must be >= node count ($nNodes): L1-normalized " +
        "integer scores need scale units of mass to spread over the nodes")

    // The recursion itself only ever consumes the HUB table (nodes
    // absent from it have hub 0 and contribute nothing to any sum, so
    // the inner contribution join is exact without them) — the full
    // (node, hub, auth) rebase is assembled ONCE after the last round,
    // not materialized per round. Per round that leaves exactly ONE
    // scheduled action: the auth raw table is a LAZY checkpoint that
    // materializes inside the hub raw table's eager-checkpoint job (its
    // L1-sum broadcast subquery computes every authRaw partition first,
    // persisting it; the main path then reads the persisted blocks) —
    // computed once, lineage-cut, no extra barrier.
    var hub = scope.ckptLazy(nodes.withColumn("hub", lit(scale)))
    var prevIds = scope.last
    var auth: DataFrame = null
    // two hub/auth rounds per scheduled job (see [[FusedRounds]]): the
    // hub-side checkpoint is the round's one action; on odd rounds it
    // goes lazy and the next eager round's job materializes both
    val fused = new FusedRounds(scope, iters)
    for (_ <- 1 to iters) {
      // with ≥1 edge, hub mass crosses it, so aSum/hSum are ≥ 1 and the
      // floor divisions below are safe. Raw aggregates are node-sized,
      // and their groupBy partitioning (hash(dst) / hash(src)) is
      // exactly what the NEXT consumer joins on — a rollup same-shuffle
      // total was measured and rejected: its (key, gid) exchange key
      // broke that co-partitioning and re-shuffled every round. The
      // auth side is a LAZY checkpoint: it materializes inside the hub
      // side's eager-checkpoint job (its L1-sum broadcast subquery
      // computes every authRaw partition first, persisting it; the
      // main path reads the persisted blocks), so each round schedules
      // ONE action, not two.
      val authRaw = scope.ckptLazy(hub.join(e, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("araw")))
      val authRawIds = scope.last
      // L1 sums stay IN-PLAN as broadcast 1-row scalars over the
      // checkpointed raw tables — no per-round driver head(); the
      // engine's `div` on positive Longs is the same floor the old
      // driver-literal form applied
      val aSumDf = authRaw.agg(coalesce(sum(col("araw")), lit(0L)).as("__asum"))
      val authN = authRaw.crossJoin(broadcast(aSumDf))
        .select(col("dst").as("anode"),
          expr(s"(araw * $scale) div __asum").as("auth"))
      val hubRaw = fused.ckptRound(
        authN.join(eByDst, col("anode") === col("dst"))
          .select(col("src"), col("auth"))
          .groupBy(col("src")).agg(sum(col("auth")).as("hraw")),
        prevIds)
      val hubRawIds = fused.last
      val hSumDf = hubRaw.agg(coalesce(sum(col("hraw")), lit(0L)).as("__hsum"))
      val hubN = hubRaw.crossJoin(broadcast(hSumDf))
        .select(col("src").as("node"),
          expr(s"(hraw * $scale) div __hsum").as("hub"))
      // the previous round's tables die once this round's raw
      // aggregates are materialized — ckptRound frees them then
      // (deferred across lazy rounds; see [[FusedRounds]])
      hub = hubN; auth = authN
      prevIds = authRawIds ::: hubRawIds
    }
    // Materialize the final (node, hub, auth) rebase as ONE checkpoint
    // and free every intermediate — node-sized joins over already-
    // materialized tables, so the extra action is cheap, and the
    // returned plan pins exactly one node-sized RDD instead of the
    // final round's raws + node table (which callers had no way to
    // release; a long-lived session running many Hits calls accumulated
    // pinned executor storage).
    val out = scope.ckpt(nodes
      .join(auth.withColumnRenamed("anode", "node"), Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth")))
    scope.freeAllBut(scope.last)
    out
  }
}
