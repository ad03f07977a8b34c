package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.EventStream
import graft.sources.Sources

/** Shared local session + tiny-stream helpers for golden-value specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Un-keyed stream of ints at 1s intervals (the reference's
    * `Event.sequence(array)` test source). */
  def seqStream(values: Seq[Int]): EventStream =
    EventStream(Sources.fromLongs(spark, values.map(_.toLong)), keys = Nil)

  /** Collect one column ordered by seq. */
  def valuesOf[T: scala.reflect.ClassTag](es: EventStream, c: String): Seq[T] =
    es.df.orderBy(es.seqCol).select(c).collect().map(_.getAs[T](0)).toSeq

  def longs(es: EventStream, c: String): Seq[Long] = valuesOf[Long](es, c)
}
