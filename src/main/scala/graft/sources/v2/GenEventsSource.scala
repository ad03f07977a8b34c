package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `graft-events` — a DataSource V2 synthetic event generator: the
 * source-side rung of the extension ladder (expressions → kernels,
 * plans → [[graft.plans.RewriteIntervalJoin]], sources → THIS).
 * Deterministic integer column math, so any engine can reproduce the
 * exact table (the DuckDB oracle regenerates it from the same
 * formulas) and a 1000-executor cluster generating test/load data gets
 * identical bytes on every retry.
 *
 *   user_id = ((seq · 2654435761 + 104729) mod 1000003) mod users
 *   type_id = ((seq · 40503 + 17) mod 97) mod 5
 *   cents   = (seq · 31 + 7) mod 100000
 *
 * Scale behaviors a real source must have, all implemented and
 * spec-proved:
 *
 *  - **Partition planning**: `rows` split into `partitions` contiguous
 *    seq-ranges — parallel, executor-side generation, no driver data.
 *  - **Filter pushdown** (`SupportsPushDownFilters`): comparisons on
 *    `seq` are ACCEPTED (they narrow the generated range exactly — the
 *    source honors them, Spark re-evaluates nothing); everything else
 *    is returned as residual for Spark to evaluate. Accepted filters
 *    appear as `PushedFilters` in explain.
 *  - **Source-level partition pruning**: input partitions whose
 *    seq-range misses the pushed bounds are never planned — the
 *    DSv2 analogue of parquet row-group skipping (a `seq >= N-k`
 *    probe plans only the tail partitions, visible as
 *    `rdd.getNumPartitions`).
 *  - **Column pruning** (`SupportsPushDownRequiredColumns`): readers
 *    emit exactly the projected fields in projected order (explain's
 *    `ReadSchema`).
 */
class GenEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenEventsSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GenEventsTable(
      properties.asScala.getOrElse("rows", "100000").toLong,
      properties.asScala.getOrElse("partitions", "8").toInt,
      properties.asScala.getOrElse("users", "1000").toLong,
      properties.asScala.getOrElse("rowsPerBatch", "1000").toLong)
}

object GenEventsSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("type_id", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  /** Column generators, shared by every reader (and mirrored verbatim
    * in the DuckDB oracle SQL). */
  def userId(seq: Long, users: Long): Long =
    ((seq * 2654435761L + 104729L) % 1000003L) % users
  def typeId(seq: Long): Long = ((seq * 40503L + 17L) % 97L) % 5L
  def cents(seq: Long): Long = (seq * 31L + 7L) % 100000L
}

private[v2] class GenEventsTable(rows: Long, partitions: Int, users: Long,
    rowsPerBatch: Long)
    extends Table with SupportsRead {
  require(rows >= 0 && partitions >= 1 && users >= 1 && rowsPerBatch >= 1,
    s"invalid graft-events options: rows=$rows partitions=$partitions " +
      s"users=$users rowsPerBatch=$rowsPerBatch")
  override def name(): String = s"graft-events($rows)"
  override def schema(): StructType = GenEventsSource.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenEventsScanBuilder(rows, partitions, users, rowsPerBatch)
}

private[v2] class GenEventsScanBuilder(rows: Long, partitions: Int, users: Long,
    rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  // seq bounds narrowed by accepted filters; [lo, hi] inclusive
  private var lo: Long = 0L
  private var hi: Long = rows - 1
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GenEventsSource.SCHEMA

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long              => Some(l)
    case i: Int               => Some(i.toLong)
    case l: java.lang.Long    => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case _                    => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("seq", v) =>
        asLong(v).exists { l => lo = lo.max(l + 1); true }
      case GreaterThanOrEqual("seq", v) =>
        asLong(v).exists { l => lo = lo.max(l); true }
      case LessThan("seq", v) =>
        asLong(v).exists { l => hi = hi.min(l - 1); true }
      case LessThanOrEqual("seq", v) =>
        asLong(v).exists { l => hi = hi.min(l); true }
      case EqualTo("seq", v) =>
        asLong(v).exists { l => lo = lo.max(l); hi = hi.min(l); true }
      case _ => false
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GenEventsScan(lo, hi, rows, partitions, users, rowsPerBatch,
      required, accepted)
}

private[v2] class GenEventsScan(lo: Long, hi: Long, rows: Long,
    partitions: Int, users: Long, rowsPerBatch: Long, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GenEventsMicroBatchStream(rows, partitions, users, rowsPerBatch, required)
  override def description(): String =
    s"graft-events rows=$rows seq=[$lo,$hi] " +
      s"cols=${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    if (rows == 0 || lo > hi) return Array.empty
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).iterator.map { i =>
      val s = i * per
      val e = ((i + 1) * per - 1).min(rows - 1)
      (s, e)
    }.filter { case (s, e) => s <= e && e >= lo && s <= hi }
      // clamp each surviving range to the pushed bounds: pruning AND
      // row-exact filtering both happen at the source
      .map { case (s, e) =>
        GenEventsPartition(s.max(lo), e.min(hi)): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenEventsReaderFactory(users, required)
}

private[v2] case class GenEventsPartition(start: Long, end: Long)
  extends InputPartition

/** Offset = the exclusive upper seq bound emitted so far. */
private[v2] case class GenEventsOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/**
 * Micro-batch form of the generator (the rate-source shape with
 * deterministic CONTENT): each trigger emits the next `rowsPerBatch`
 * seqs until `rows` are out, so a restarted query resumes from the
 * checkpointed offset with identical bytes — replayable source
 * semantics from pure math, no external storage.
 */
private[v2] class GenEventsMicroBatchStream(rows: Long, partitions: Int,
    users: Long, rowsPerBatch: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // the watermark of generated data: each trigger makes rowsPerBatch
  // more seqs "available", so Spark's committed end offsets always
  // equal what was actually emitted (returning `rows` at once would
  // commit data the batch never contained). After a restart the first
  // trigger(s) may plan empty batches until `available` catches the
  // checkpointed start — commit() fast-forwards it to make that one
  // trigger at most.
  private var available = 0L
  override def initialOffset(): Offset = GenEventsOffset(0L)
  override def latestOffset(): Offset = {
    available = (available + rowsPerBatch).min(rows)
    GenEventsOffset(available)
  }
  override def deserializeOffset(json: String): Offset =
    GenEventsOffset(json.toLong)
  override def commit(end: Offset): Unit =
    available = available.max(end.asInstanceOf[GenEventsOffset].pos)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenEventsOffset].pos
    val e = end.asInstanceOf[GenEventsOffset].pos.min(rows)
    if (s >= e) return Array.empty
    val span = e - s
    val per = (span + partitions - 1) / partitions
    (0 until partitions).iterator
      .map(i => (s + i * per, (s + (i + 1) * per - 1).min(e - 1)))
      .filter { case (ps, pe) => ps <= pe }
      .map { case (ps, pe) => GenEventsPartition(ps, pe): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenEventsReaderFactory(users, required)
}

private[v2] class GenEventsReaderFactory(users: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenEventsPartition]
    new PartitionReader[InternalRow] {
      private var seq = p.start - 1
      // projection resolved once per reader, not per row
      private val gens: Array[Long => Long] = required.fieldNames.map {
        case "seq"     => (s: Long) => s
        case "user_id" => (s: Long) => GenEventsSource.userId(s, users)
        case "type_id" => (s: Long) => GenEventsSource.typeId(s)
        case "cents"   => (s: Long) => GenEventsSource.cents(s)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { seq += 1; seq <= p.end }
      override def get(): InternalRow = {
        val vals = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { vals(i) = gens(i)(seq); i += 1 }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
