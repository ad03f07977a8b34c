package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver's parquet fixtures (TESTDATA.md). All loaders
 * project/cast into the exact shapes the queries consume so that column
 * pruning reaches the parquet scan.
 */
object Tables {

  // Catalog-style handle cache: DataFrames are immutable, so reusing the
  // resolved handle per (session, path) skips repeated file listing and
  // parquet footer/schema reads on every query construction — the same
  // metadata caching a real catalog provides. Keyed by session so a
  // restarted session re-resolves.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Drop cached handles (fixtures are immutable in normal use; call
    * after rewriting files in place or stopping a session to release
    * its entries). */
  def invalidate(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach(cache.remove)

  /**
   * The `events` table is the canonical eventkit stream stand-in:
   * event_id → seq, ts → event time, user_id → stream key.
   *
   * Its parquet ts is TIMESTAMP(NANOS); we normalize to microsecond
   * TIMESTAMP (matching DuckDB's epoch_us truncation) and derive
   * `cents` = value in integer cents so aggregate queries stay exact
   * (bit-identical across engines regardless of summation order).
   */
  def events(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$dir/events.parquet#normalized"),
      eventsUncached(spark, dir))

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = {
    // The fixture's ts is INT64 TIMESTAMP(NANOS) which vanilla Spark
    // refuses ([PARQUET_TYPE_ILLEGAL]); read nanos as long and convert.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val tsUs = raw.schema("ts").dataType.typeName match {
      case "long" => timestamp_micros(expr("ts div 1000"))
      case _      => col("ts").cast("timestamp")
    }
    raw.select(
      col("event_id").as("seq"),
      tsUs.as("ts"),
      col("user_id"),
      col("event_type"),
      col("value"),
      round(col("value") * 100, 0).cast("long").as("cents"),
      col("props"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}
