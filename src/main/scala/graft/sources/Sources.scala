package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Creation operators (SURVEY.md §2.1, reference `ops/create.py`).
 * Each returns a stream-shaped DataFrame `(seq BIGINT, ts TIMESTAMP, ...)`
 * built from declarative Spark primitives (`spark.range`, `sequence` +
 * `explode`), so even synthetic sources scale out.
 */
object Sources {

  val EPOCH = "2024-01-01 00:00:00"

  /** Sequence (`ops/create.py:60-76`): emit given values, paced by
    * `intervalSec` starting at the epoch. Emit order via explicit index
    * (NOT monotonically_increasing_id, which is not contiguous). */
  def fromSeq[T](spark: SparkSession, values: Seq[T], intervalSec: Double = 1.0)(
      implicit enc: org.apache.spark.sql.Encoder[(Long, T)]): DataFrame =
    spark.createDataset(values.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("seq", "value")
      .select(col("seq"),
        timestamp_micros(lit(epochUs) + col("seq") * math.round(intervalSec * 1e6)).as("ts"),
        col("value"))

  def fromLongs(spark: SparkSession, values: Seq[Long], intervalSec: Double = 1.0): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    fromSeq(spark, values, intervalSec)
  }

  private val epochUs: Long = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Wait (`ops/create.py:10-35`): an awaited result becomes a one-row
    * stream — emit the single value at the epoch, then done. */
  def waitValue(spark: SparkSession, value: org.apache.spark.sql.Column): DataFrame =
    spark.range(1).select(
      lit(0L).as("seq"),
      timestamp_micros(lit(epochUs)).as("ts"),
      value.as("value"))

  /** Range (`ops/create.py:86-90`): `spark.range` is already distributed. */
  def range(spark: SparkSession, start: Long, end: Long, step: Long): DataFrame =
    spark.range(start, end, step).select(col("id"))

  /** Repeat (`ops/create.py:79-83`, documented semantics — the reference
    * body has an arg-order bug we do not replicate). */
  def repeat(spark: SparkSession, value: String, count: Int, intervalSec: Double): DataFrame =
    spark.range(count).select(
      col("id").as("seq"),
      timestamp_micros(lit(epochUs) + col("id") * math.round(intervalSec * 1e6)).as("ts"),
      lit(value).as("value"))

  /** Timer (`ops/create.py:100-112`): the reference's loop starts at
    * i = 1 — the first tick fires after `interval` (never at t = 0) and
    * carries value `i*interval`. */
  def timer(spark: SparkSession, intervalSec: Double, count: Int): DataFrame =
    spark.range(count).select(
      col("id").as("seq"),
      timestamp_micros(lit(epochUs) + (col("id") + 1) * math.round(intervalSec * 1e6)).as("ts"),
      ((col("id") + 1) * intervalSec).as("value"))

  /** Timerange (`ops/create.py:93-97`): datetimes start..end paced by step. */
  def timerange(spark: SparkSession, start: String, end: String, stepExpr: String): DataFrame =
    spark.range(1)
      .select(explode(expr(
        s"sequence(TIMESTAMP '$start', TIMESTAMP '$end', INTERVAL $stepExpr)")).as("ts"))
      .select(col("ts"))

  /**
   * Marble-diagram source (`ops/create.py:115-123`): each non-`-`/space
   * char of `s` is an event whose time is its position (seconds after
   * the epoch); `|` ends the stream; `_` is stripped first.
   * The reference's Rx-style test DSL, as data.
   */
  def marbleRows(s: String): Seq[(Long, Long, String)] = {
    val cleaned = s.replace("_", "")
    val upTo = cleaned.indexOf('|') match {
      case -1 => cleaned.length
      case i  => i
    }
    cleaned.take(upTo).zipWithIndex.collect {
      case (c, i) if c != '-' && c != ' ' =>
        (i.toLong, epochUs + i * 1000000L, c.toString)
    }.zipWithIndex.map { case ((_, tsUs, c), n) => (n.toLong, tsUs, c) }
  }

  def marble(spark: SparkSession, s: String): DataFrame = {
    import spark.implicits._
    marbleRows(s).toDF("seq", "ts_us", "value")
      .select(col("seq"), timestamp_micros(col("ts_us")).as("ts"), col("value"))
  }

  /**
   * Distributed global sequence assignment — the scale path for un-keyed
   * streams (SURVEY.md §7.4 #1). `row_number() OVER (ORDER BY …)` forces
   * a single partition; this instead range-repartitions on the order
   * columns, sorts within partitions, and assigns contiguous ids via the
   * classic two-pass count-then-offset (`zipWithIndex`: one tiny job for
   * per-partition counts, then a narrow map). No partition ever holds
   * more than its share of rows. The one justified RDD use in the engine
   * (per-partition imperative indexing has no Dataset equivalent).
   */
  def withGlobalSeq(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      as: String = "seq", numPartitions: Int = 0): DataFrame = {
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, orderCols: _*)
      else df.repartitionByRange(orderCols: _*) // session default; AQE may coalesce
    val sorted = ranged.sortWithinPartitions(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(as, org.apache.spark.sql.types.LongType,
          nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
