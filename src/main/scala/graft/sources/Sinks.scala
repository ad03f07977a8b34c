package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.EventStream

/**
 * Consumption surface (SURVEY.md §2.9): the reference ends at `run()` /
 * listeners; an analytics engine ends at tables. Batch writes partition
 * by the stream keys so downstream reads prune; the streaming sink is
 * the durable `connect` (exactly-once parquet append with checkpoint).
 */
object Sinks {

  /** Materialize a stream as a key-partitioned parquet table. */
  def toParquet(es: EventStream, path: String): Unit = {
    val w = es.df.write.mode("overwrite")
    (if (es.keys.nonEmpty) w.partitionBy(es.keys: _*) else w).parquet(path)
  }

  /**
   * Bucketed table write: co-locates rows by hash(bucketCols) at WRITE
   * time so every later equi-join or aggregation on those columns skips
   * its shuffle entirely — the "pay the exchange once" amortization
   * that matters most at 100 TB, where a fact-fact join's shuffle IS
   * the job. `sortBy` the same columns so sort-merge joins also skip
   * the per-task sort. (Parquet path tables can't carry bucket
   * metadata; bucketing requires `saveAsTable`.)
   */
  def toBucketedTable(df: DataFrame, table: String, nBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Durable streaming sink: parquet append with checkpointed progress. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
