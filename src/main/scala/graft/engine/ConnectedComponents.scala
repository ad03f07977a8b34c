package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list — the step that
 * turns near-duplicate candidate PAIRS into duplicate CLUSTERS so a
 * dedup pipeline can keep one canonical document per cluster (the
 * pair list alone can't: a~b and b~c must collapse to one keeper, not
 * two).
 *
 * Algorithm: min-label propagation. Every node starts labeled with its
 * own id; each round, a node adopts the minimum label among itself and
 * its neighbors; fixpoint is reached in O(component diameter) rounds.
 * Each round is one join + one groupBy on the (small) label table
 * against the symmetrized edge list — keyed shuffles only, no driver
 * data. Near-dup graphs are overwhelmingly short-diameter (pairs and
 * small cliques), so 3-5 rounds typically converge; `maxIter` bounds
 * pathological chains.
 *
 * Scale notes: `localCheckpoint` truncates the growing lineage each
 * round (on a cluster, prefer `checkpoint` to reliable storage). The
 * convergence probe is a count of changed labels — one lightweight
 * action per round. For graphs with huge high-degree components the
 * large-star/small-star variant halves round count; min-label is the
 * right default for dedup-shaped graphs.
 */
object ConnectedComponents {

  /**
   * @param edges two-column DataFrame of undirected edges; column names
   *              are taken positionally (first = a, second = b)
   * @return (node, comp) — comp is the minimum node id reachable from
   *         `node`; only nodes present in `edges` appear
   */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val a = edges.columns(0)
    val b = edges.columns(1)
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(col("src").as("n")).agg(min(col("comp")).as("nbr"))
      val next = labels.join(nbrMin, labels("node") === nbrMin("n"), "left")
        .select(col("node"), least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("comp", "old"), "node")
        .filter(col("comp") =!= col("old")).count()
      labels = next
      iter += 1
    }
    // A silent non-converged return would hand downstream dedup WRONG
    // labels (documents kept/dropped against the wrong cluster) with no
    // signal — fail loudly instead. Long-diameter graphs should use
    // [[runStar]], which converges in O(log n) rounds.
    if (changed > 0)
      throw new IllegalStateException(
        s"ConnectedComponents.run did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter or use runStar " +
          "for high-diameter graphs")
    labels
  }
}
