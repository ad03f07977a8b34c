package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hot-key mitigation (SCALE.md): when one key holds a disproportionate
 * share of rows, a plain `groupBy(key)` puts that key's whole share on
 * one task. Two-stage salted aggregation bounds the per-task share at
 * 1/`saltBuckets` for any decomposable aggregate: stage 1 aggregates on
 * (key, salt), stage 2 merges the partials. Salt is a deterministic
 * hash of the projected columns — no rand(), so plans stay replayable.
 *
 * (Join-side skew is handled by AQE's skew-join splitting, which is on;
 * this covers aggregation skew, which AQE does not re-balance.)
 */
object Skew {

  /** Salted sum: exact for any row distribution. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
      saltBuckets: Int): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt",
        pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
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
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltBuckets)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
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
