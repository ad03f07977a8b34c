package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hot-key mitigation (SCALE.md): when one key holds a disproportionate
 * share of rows, a plain `groupBy(key)` puts that key's whole share on
 * one task. Two-stage salted aggregation bounds the per-task share at
 * 1/`saltBuckets` for any decomposable aggregate: stage 1 aggregates on
 * (key, salt), stage 2 merges the partials. Salt mixes the row's
 * physical position (partition id + per-partition counter) — no
 * rand(), plans stay replayable for a fixed input partitioning, and
 * fully-identical duplicate rows of a hot key still spread across
 * buckets (a content hash would send them all to one bucket, keeping
 * the straggler exactly in the duplicate-row-skew case).
 *
 * (Join-side skew is handled by AQE's skew-join splitting, which is on;
 * this covers aggregation skew, which AQE does not re-balance.)
 */
object Skew {

  /** Position-derived salt in [0, saltBuckets): deterministic for a
    * fixed input partitioning, distinct for duplicate row contents. */
  private def rowSalt(saltBuckets: Int): Column =
    pmod(hash(spark_partition_id(), monotonically_increasing_id()), lit(saltBuckets))

  /** Pick an internal column name not present on any input. */
  private def fresh(base: String, taken: Set[String]): String =
    Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()

  /** Salted sum: exact for any row distribution (partial sums merge
    * regardless of which bucket a row landed in). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
      saltBuckets: Int): DataFrame = {
    val keyCols = keys.map(col)
    val salt = fresh("__salt", df.columns.toSet)
    df.withColumn(salt, rowSalt(saltBuckets))
      .groupBy(keyCols :+ col(salt): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(as))
  }

  /**
   * Salted equi-join for a skewed BIG side against a modest (but not
   * broadcastable) small side: the big side salts deterministically
   * into `saltBuckets`, the small side replicates once per bucket, and
   * the join key becomes (keys, salt) — a hot key's rows now spread
   * over `saltBuckets` tasks instead of one straggler. Use when AQE's
   * skew splitting can't help (e.g. the skew is in a shuffle feeding a
   * sort-merge join it can't re-split, or outside AQE). Cost: small
   * side shuffles ×`saltBuckets`. Inner-join semantics.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    val salt = fresh("__salt", big.columns.toSet ++ small.columns)
    val bigS = big.withColumn(salt, rowSalt(saltBuckets))
    val smallS = small.withColumn(salt,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, keys :+ salt).drop(salt)
  }

  /** Salted distinct-count: exact — stage 1 dedups within salt buckets
    * (dedup is idempotent across buckets for hash-partitioned values),
    * stage 2 counts. Salt by the VALUE so equal values land in the same
    * bucket and cross-bucket duplicates cannot occur. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
      as: String, saltBuckets: Int): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ value.as("__v"): _*)
      .withColumn("__salt", pmod(hash(col("__v")), lit(saltBuckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count_distinct(col("__v")).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(as))
  }
}
