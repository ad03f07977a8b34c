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

  /**
   * Append into an existing bucketed table with the SAME bucket spec —
   * the update step of an incremental index: after a daily batch is
   * probed against the standing index (zero index-side shuffle, see
   * TextOps.dedupIncremental), its own keys are appended so TOMORROW's
   * batch sees today's documents. Each append adds one file set per
   * bucket; periodic compaction (rewrite via [[toBucketedTable]])
   * bounds file counts, exactly like any LSM-ish index maintenance.
   */
  def appendBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode("append")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /**
   * Compact a bucketed table in place: read the accumulated append
   * file sets and rewrite them as a SINGLE write's file set under the
   * same bucket spec (staged through a temp table — a bucketed
   * saveAsTable cannot overwrite its own input). Run periodically
   * after [[appendBucketed]]: each append adds a full file set, so an
   * index probed daily accretes files linearly in batch count;
   * compaction resets that to one write's worth (per-bucket file count
   * bounded by the writer's task count, not by append history) — the
   * LSM maintenance cycle in miniature.
   *
   * Crash safety: write-new-then-swap, never overwrite-in-place. The
   * full compacted copy is materialized under a UNIQUE temp name first
   * (concurrent compactions of different tables can't collide), so a
   * failure before the swap leaves the live table untouched, and a
   * failure between the drop and the rename leaves the complete temp
   * table on disk for manual recovery (its name is in the thrown
   * error's stack — nothing is deleted until the swap succeeded).
   * Single-writer per TABLE is assumed, as with any non-transactional
   * catalog: two concurrent compactions of the SAME table race the
   * drop/rename pair.
   */
  def compactBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      nBuckets: Int, bucketCols: Seq[String]): Unit = {
    val tmp = s"${table}__compact_${java.util.UUID.randomUUID.toString.take(8)}"
    toBucketedTable(spark.table(table), tmp, nBuckets, bucketCols)
    // staged copy fully materialized; swap is the only destructive step
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /**
   * Size- and cluster-controlled parquet write: range-partition on
   * `sortCols` into `nFiles` output tasks, sort within each, and cap
   * rows per file. Files then carry DISJOINT sort-key ranges, so
   * parquet min/max footer stats prune whole files for predicates on
   * the leading sort column — and with a
   * [[graft.functions.ZOrder.morton2]] key as the sort column, for
   * box predicates on BOTH interleaved dimensions. At 100 TB file
   * sizing is a first-order concern: unmanaged writes produce
   * too-many-tiny or too-few-huge files, and either kills the read
   * side (task-launch overhead vs no parallelism/skipping).
   */
  def clusteredWrite(df: DataFrame, path: String, sortCols: Seq[String],
      nFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Durable streaming sink: parquet append with checkpointed progress. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
