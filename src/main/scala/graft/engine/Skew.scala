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
