package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core membership by iterative peeling (Seidman 1983; the
 * link-farm / dense-community signal of web-graph curation — a page's
 * coreness separates organically-linked content from sparse spam
 * periphery, complementing [[PageRank]]'s authority and
 * [[Triangles]]' local density).
 *
 * Synchronous peeling: each round removes every node whose CURRENT
 * degree in the surviving subgraph is < k; removing a node lowers its
 * neighbors' degrees, so peeling cascades. `run` executes a FIXED
 * number of rounds — deterministic plan, bit-identical across engines
 * — and returns each surviving node with its degree inside the
 * surviving subgraph. A fixture where round R equals round R-1 has
 * converged, and the result IS the k-core (the spec asserts this on
 * the test graphs; the paired oracle unrolls the same R rounds).
 *
 * Scale shape, per round:
 *  - degree = one partial-agg shuffle over the surviving symmetrized
 *    edges (map-side combine applies);
 *  - survivor filter is a narrow pass over the degree table;
 *  - edge restriction = two semi-joins against the survivor set — the
 *    src side co-partitioned with the edge table's pinned layout, the
 *    dst side one keyed exchange. Nothing is broadcast: the survivor
 *    set is node-sized and at web scale does not fit an executor.
 * Each round's edge table is checkpointed (lineage cut — the peel is
 * a chain of joins otherwise) and dead rounds freed via
 * [[CheckpointScope]]. Work shrinks monotonically: every round's
 * input is the previous round's surviving edge cut.
 */
object KCore {

  /**
   * @param edges  two-column undirected edge list (names positional;
   *               self-loops and duplicates canonicalized away)
   * @param k      minimum within-subgraph degree to survive
   * @param rounds number of peeling rounds (>= 1); converged when a
   *               round removes nothing
   * @return (node, d) for nodes surviving `rounds` rounds, with d the
   *         node's degree inside the surviving subgraph
   */
  def run(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val a = edges.columns(0)
    val b = edges.columns(1)
    val spark = edges.sparkSession
    val scope = new CheckpointScope(spark.sparkContext)
    // symmetrize + dedup once under the caller's (adaptive) planning;
    // the count sizes the static round partitioning (see [[StaticPlan]]).
    // Canonical-orient THEN explode both orientations: a union of two
    // projections would execute whatever join built `edges` TWICE and
    // dedup at full symmetric size — this reads the input once and
    // dedups at half size, then the explode is free.
    // LAZY + count (setup fusion, r15): the sizing count() is the job
    // that materializes the checkpoint — the eager form scheduled a
    // separate persist job before an identically-shaped count.
    val canon = scope.ckptLazy(
      edges.filter(col(a) =!= col(b))
        .select(least(col(a).cast("long"), col(b).cast("long")).as("u"),
          greatest(col(a).cast("long"), col(b).cast("long")).as("v"))
        .distinct()
        .select(explode(array(
          struct(col("u").as("src"), col("v").as("dst")),
          struct(col("v").as("src"), col("u").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")))
    val canonIds = scope.last
    val nEdges = canon.count()
    // big-rung heap survival: round generations past the threshold pin
    // serialized blocks (see StaticPlan.SER_CKPT_ROWS)
    scope.serialized = nEdges > StaticPlan.SER_CKPT_ROWS
    scope.guarded(StaticPlan.scoped(spark,
        StaticPlan.roundPartitions(nEdges, spark,
        StaticPlan.GRAPH_ROUND_ROWS)) {
      runStatic(scope, canon, canonIds, k, rounds)
    })
  }

  private def runStatic(scope: CheckpointScope, canon: DataFrame,
      canonIds: List[Int], k: Int, rounds: Int): DataFrame = {
    // LAZY layout checkpoint (setup fusion): it materializes inside the
    // first eager round's job with its pinned layout intact
    var e = scope.ckptLazy(canon.repartition(col("src"))
      .sortWithinPartitions(col("src")))
    // canon's only consumer is the layout table above — once that
    // materializes, the full-size DESERIALIZED canon generation is
    // dead; folding its ids into the first round's dead list frees it
    // at the first eager materialization instead of scope end (at the
    // sf10 rung that is ~5 GB of object-form edges not held across the
    // whole peel)
    var eIds = canonIds ::: scope.last
    // fused peel rounds (see [[FusedRounds]]): the per-round checkpoint
    // job IS the engine's sf-scale cost — below the big-table gate the
    // whole peel materializes in ONE job, above it rounds pair up
    val fused = new FusedRounds(scope, rounds,
      StaticPlan.fuseDepth(scope.serialized, rounds))
    for (_ <- 1 to rounds) {
      // degree in the CURRENT surviving subgraph (symmetrized edges:
      // count per src IS the undirected degree)
      val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("src").as("node"))
      val next = fused.ckptRound(e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst"),
        eIds)
      e = next
      eIds = fused.last
    }
    scope.freeAllBut(eIds)
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
  }
}
