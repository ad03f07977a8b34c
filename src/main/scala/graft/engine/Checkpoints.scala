package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * PUBLIC release handle for engine results.
 *
 * The iterative engines ([[PageRank]], [[Hits]], [[Triangles]],
 * [[KCore]], [[Sssp]], [[Bfs]], [[LabelPropagation]],
 * [[ConnectedComponents]]) free their per-round intermediates via the
 * internal [[CheckpointScope]], but the RESULT they return is itself
 * backed by one pinned node-sized `localCheckpoint` — deliberately: a
 * checkpoint's lineage is truncated, so the result stays cheap to
 * re-consume, but it also stays pinned in executor storage until
 * someone frees it. A long-lived session making many engine calls
 * accumulates one result table per call (the measured failure mode:
 * PageRank degraded 2.6 s → 8.7 s over six calls purely from dead
 * blocks).
 *
 * `release(df)` is the documented way for an external caller to free a
 * result it has finished consuming: it unpersists exactly the RDDs the
 * result's own plan pins (read from its `LogicalRDD` leaves — the same
 * exact-attribution trick `CheckpointScope` uses, so unrelated cached
 * tables are never touched).
 *
 * IMPORTANT: a localCheckpoint is UNRECOMPUTABLE once freed — only call
 * `release` when the DataFrame (and anything derived from it lazily)
 * will not be used again. Typical lifecycle:
 *
 * {{{
 *   val ranks = PageRank.run(edges, "src", "dst", iters = 10)
 *   ranks.write.parquet(out)          // consume
 *   graft.engine.Checkpoints.release(ranks)  // free the pinned blocks
 * }}}
 */
object Checkpoints {

  /** Unpersist every checkpointed RDD the DataFrame's plan pins.
    * No-op for plans without `LogicalRDD` leaves. After this call the
    * DataFrame is unrecomputable — release only after final use. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Ids the DataFrame's plan pins (diagnostic companion to
    * [[release]]). */
  def pinnedIds(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }

  /** [[release]] restricted to pins NOT shared with `keep`: frees the
    * RDDs `df`'s plan pins except any that also back a `keep` frame.
    * The serving-loop shape ([[graft.ml.Similarity.serveTopK]] with
    * `pruneCells = true`): each batch's result plan pins that batch's
    * query-assignment checkpoint, but may also reference long-lived
    * pins the loop reuses across batches (a checkpointed postings or
    * query table) — `releaseExcept(result, postings, queries)` frees
    * only the per-batch pin. Same caveat as [[release]]: the freed
    * pins are unrecomputable, so call only after the result's final
    * use. */
  def releaseExcept(df: DataFrame, keep: DataFrame*): Unit = {
    val kept = keep.flatMap(pinnedIds).toSet
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD
          if !kept.contains(l.rdd.id) => l.rdd
    }.foreach(_.unpersist(blocking = false))
  }
}
