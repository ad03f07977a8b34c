package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable frequency/cardinality sketches as reusable plan fragments.
 *
 * Both sketches here are the fixed-size, associatively-mergeable kind a
 * 100 TB pipeline ships between stages instead of raw keys: a count-min
 * grid (Cormode & Muthukrishnan 2005) and a HyperLogLog register file
 * (Flajolet et al. 2007). The merge laws — cell-wise SUM for CMS,
 * register-wise MAX for HLL — are what make per-partition / per-day
 * partial sketches combinable without re-reading data; they are
 * property-tested against whole-corpus recomputation in PropertySpec.
 *
 * Everything is integer 64-bit arithmetic (mixing hashes, shifts,
 * binary-string lengths) so a DuckDB oracle reproduces results
 * bit-for-bit; the single float op in HLL is the final alpha*m^2
 * division.
 */
object Sketches {

  // ---- HyperLogLog: m = 64 registers (p = 6), 26-bit rho domain.
  /** alpha_64 * m^2 * 2^27 — numerator of the raw HLL estimate over the
    * 2^27-scaled integer register sum. */
  val HllNum: Double = 0.709 * 4096.0 * 134217728.0

  /**
   * Per-group HLL register file over an integer id column: one row per
   * (group, register) with the max leading-zero rank `mrho`. The mixing
   * hash is id*knuth mod 2^32 (exact in 64-bit); register = low 6 bits,
   * rho = leading zeros of the remaining 26 bits + 1 via the
   * binary-string length (bin() agrees across engines — no log2).
   * Duplicate ids are absorbed by max() for free, so no distinct pass.
   * Shape: one narrow projection + one (group, idx) groupBy — at scale
   * the grid is ≤ 64 rows per group no matter the input size.
   */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], id: Column): DataFrame = {
    val g = groupCols.map(col)
    // Mask, not mod: id*knuth overflows Long for id > ~3.46e9 (or
    // negative ids), and `% 2^32` of a negative Long is negative —
    // giving a negative register index and a nonsense rho. The bitmask
    // keeps h in [0, 2^32) for EVERY Long input and agrees with the mod
    // exactly on the non-overflowing domain.
    val h = (id * 2654435761L + 104729L).bitwiseAND(lit(4294967295L))
    df.select(g :+ (h % 64).as("idx") :+ shiftright(h, 6).as("sfx"): _*)
      .select(g :+ col("idx") :+
        when(col("sfx") === 0, lit(27))
          .otherwise(lit(27) - length(bin(col("sfx")))).as("rho"): _*)
      .groupBy((groupCols :+ "idx").map(col): _*).agg(max("rho").as("mrho"))
  }

  /** Merge two register files: register-wise max — the HLL union law.
    * Registers absent from one side pass through (outer-union shape). */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "idx").map(col): _*).agg(max("mrho").as("mrho"))

  /**
   * Collapse a register file to per-group (registers_hit, sum_scaled,
   * hll_est). The register sum stays INTEGER — sum(2^(27-rho)) plus
   * 2^27 per never-hit register — so the one float op is the final
   * constant division. Raw estimate only: the paper's small/large-range
   * corrections need ln, which is not bit-reproducible across engines.
   */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("registers_hit"),
      (sum(expr("shiftleft(CAST(1 AS BIGINT), 27 - mrho)")) +
        (lit(64L) - count(lit(1))) * 134217728L).as("sum_scaled"))
      .withColumn("hll_est", lit(HllNum) / col("sum_scaled").cast("double"))

  // ---- Count-min sketch: D independent rows of W buckets.

  /** The D (row, bucket) cells an id hashes into, as an array of
    * structs `(r, b)` with h_j(fp) = (fp*a_j + b_j) mod 1000003 mod w. */
  def cmsHashes(fp: Column, w: Int, a: Seq[Long], b: Seq[Long]): Column =
    array(a.indices.map(j =>
      struct(lit(j).as("r"),
        ((fp * a(j) + b(j)) % 1000003L % w).as("b"))): _*)

  /**
   * The D×W count grid from a pre-aggregated (fp, weight) frame: each
   * fingerprint adds its weight to one bucket per row. ≤ D·W rows total
   * — constant-size, broadcastable, mergeable by cell-wise sum — with
   * map-side partial aggregation doing the heavy lifting.
   */
  def cmsGrid(counts: DataFrame, fp: Column, weight: Column,
              w: Int, a: Seq[Long], b: Seq[Long]): DataFrame =
    counts.select(explode(cmsHashes(fp, w, a, b)).as("rb"), weight.as("wt"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum("wt").as("cell"))

  /** Merge two grids: cell-wise sum — the CMS union law. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "b").agg(sum("cell").as("cell"))
}
