package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank in FIXED-POINT integer arithmetic (Page et al. 1999; the
 * web-graph authority signal corpus-curation pipelines use to weight
 * crawl domains, e.g. Common-Crawl host ranking). Damping 0.85 is the
 * rational 85/100 applied with integer floor division to ranks scaled
 * by `scale` (default 1e12), so EVERY operation is exact long math:
 * results are bit-identical across engines, partitionings and retries —
 * no floating-point sum-order nondeterminism, which a distributed
 * double-precision PageRank cannot promise.
 *
 * Per iteration: r'(v) = (scale·15/100)/N  +  D/N  +  Σ_{u→v} d(u)/outdeg(u)
 * where d(u) = r(u)·85/100 (all divisions floor) and D is the damped
 * mass of dangling nodes (no out-edges), redistributed uniformly.
 * Floors shave ≤1 unit per division (≤ N·iters total mass, invisible
 * at scale=1e12); what matters is the result is deterministic.
 *
 * Scale shape — per iteration exactly ONE shuffle executes:
 *
 *  - `outdeg` is STATIC, so it is attached to the rank table once at
 *    init instead of re-joined every round (`ranks` carries
 *    (node, outdeg, pr)); the old per-iteration ranks⋈deg shuffle is
 *    gone entirely.
 *  - N is static and the dangling mass D is one row per round: both are
 *    driver-side Long scalars (a count at init, a 1-row agg per round),
 *    folded into the plan as literals — no broadcast exchange per
 *    iteration, and the floor math `(scale·15/100)/N` / `D/N` on driver
 *    Longs is identical to the engine's integral divide on positives.
 *  - Partitionings are ALIGNED and localCheckpoint preserves them:
 *    edges are hash-partitioned by src once; the rank table is born
 *    hash-partitioned by node (and each round's output inherits node
 *    partitioning from the rebase join). The contribution join
 *    (node = src) and the rebase join (node = dst) therefore need no
 *    exchange on either side — the only shuffle left per round is the
 *    groupBy(dst) partial-agg that pools inflow, which is the
 *    irreducible data movement of PageRank.
 *  - Each round's rank table is localCheckpoint'ed (same pattern as
 *    [[ConnectedComponents]]): it is read twice (dangling scalar +
 *    contribution join) and feeds the next round — without the cut the
 *    unrolled lineage duplicates the damped subtree exponentially
 *    (measured: 139 exchanges for 3 un-checkpointed iterations).
 */
object PageRank {

  /** Run `iters` PageRank iterations over (srcCol → dstCol) edges.
    * Returns (node: long, pr: long) — pr in units of 1/scale. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // Checkpoint hygiene via [[CheckpointScope]]: free every
    // intermediate checkpoint at return, keep only the result's blocks
    // (unfreed intermediates measurably degrade repeated runs).
    val scope = new CheckpointScope(edges.sparkSession.sparkContext)
    def ckpt(df: DataFrame): DataFrame = scope.ckpt(df)
    // repartition-then-dedup is ONE shuffle: HashPartitioning(src)
    // already satisfies the (src,dst) clustered distribution, so the
    // dedup aggregate runs partition-local and the edge table comes out
    // hash-partitioned by src — exactly what the contribution join needs
    val e = ckpt(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst"))
    // distinct leaves nodes hash-partitioned by node; the left join
    // against deg (partitioned by src from the partition-local groupBy)
    // aligns on both keys, so base is born node-partitioned — no
    // explicit repartition needed (checkpoint pins the partitioning)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = ckpt(nodes.join(deg, col("node") === col("src"), "left")
      .select(col("node"), col("outdeg")))
    val n = base.count()
    // no nodes: every iteration is vacuous (driver division by N would
    // throw where the old in-plan `div` simply never ran on zero rows)
    if (n == 0) {
      val out = ckpt(base.select(col("node"), lit(0L).as("pr")))
      scope.freeAllBut(scope.last)
      return out
    }

    var ranks = ckpt(base.withColumn("pr", lit(scale / n)))
    for (_ <- 1 to iters) {
      // dangling mass: 1-row agg → driver Long (no broadcast exchange);
      // ranks is already materialized so this is a narrow re-scan
      val dang = ranks.where(col("outdeg").isNull)
        .agg(coalesce(sum(expr("(pr * 85) div 100")), lit(0L)))
        .head.getLong(0)
      val inflow = ranks.where(col("outdeg").isNotNull)
        .join(e, col("node") === col("src"))
        .select(col("dst"), expr("((pr * 85) div 100) div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      // rebase: floor((scale·15/100)/N) + floor(D/N) are positive-Long
      // driver divisions — identical to the engine's `div` on the same
      // operands — so the distributed part is just the inflow coalesce
      ranks = ckpt(base.join(inflow, col("node") === col("dst"), "left")
        .select(col("node"), col("outdeg"),
          (lit(scale * 15 / 100 / n + dang / n) +
            coalesce(col("inflow"), lit(0L))).as("pr")))
    }
    // the final ranks checkpoint is the return value; every other
    // checkpoint (edges, base, intermediate rounds) is dead weight now
    scope.freeAllBut(scope.last)
    ranks.select("node", "pr")
  }
}
