package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, Trigger, ValueState}

/**
 * Structured Streaming variants of the eventkit surface (SURVEY.md §2.10).
 *
 * Batch is the semantic source of truth (every operator in
 * [[graft.engine.EventStream]] is defined over an already-ended stream);
 * this module adds the genuinely-streaming capabilities:
 *
 *  - `EventBus`   — the reference's `connect`/`emit` pub-sub surface
 *                   (`event.py:87-225`): injected rows flow through a
 *                   live query into per-batch listener callbacks.
 *  - `timer`      — the reference's `Timer` (`ops/create.py:100`) as a
 *                   rate source.
 *  - windowed aggregation with watermarks — `ChunkWith`/tumbling windows.
 *  - `debounceBursts` — the reference's `Debounce` (`ops/timing.py:67`)
 *                   as event-time-timeout keyed state: emits the last
 *                   row of a burst once the quiet gap elapses.
 *
 * All state is keyed (`groupByKey(user)`), so streaming state shards
 * across executors exactly like the batch windows do.
 */
object Streaming {

  case class Ev(user_id: Long, tsUs: Long, value: Double)

  /**
   * Pub-sub bridge: `emit` injects rows (reference `Event.emit`), a
   * started query pushes them to the sink (reference listeners).
   */
  final class EventBus(spark: SparkSession) {
    import spark.implicits._
    private val mem = MemoryStream[Ev](spark, 1)

    def emit(rows: Ev*): Unit = mem.addData(rows)

    /** The live stream, typed (for keyed-state operators). */
    def eventsTyped: Dataset[Ev] = mem.toDS()

    /** The live stream as (seq-less) event-time rows. */
    def events: DataFrame = mem.toDF()
      .select(col("user_id"), timestamp_micros(col("tsUs")).as("ts"), col("value"))
  }

  /** Timer source: i-th tick carries i*intervalSec (i from 1, matching
    * the reference loop — `ops/create.py:100-112`) at processing time. */
  def timer(spark: SparkSession, intervalSec: Double): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1, (1 / intervalSec).toInt).toString)
      .load()
      .select(col("value").as("seq"), col("timestamp").as("ts"),
        ((col("value") + 1) * intervalSec).as("value"))

  /** Tumbling event-time window with watermark — ChunkWith's streaming
    * form (`ops/transform.py:179-211`). */
  def windowedCounts(events: DataFrame, window_ : String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /**
   * Live OHLC bars (tick stream → candles, the reference ecosystem's
   * headline reduction): tumbling event-time windows per key with
   * open/close picked by `min_by`/`max_by` over the (tsUs, seq)
   * order — declarative aggregates, so this runs as a NATIVE streaming
   * windowed aggregation (partial aggregation per micro-batch, state =
   * one row per open bar, bars finalize and evict at the watermark).
   * Expects columns (key, seq, tsUs, cents, ts); emits one row per
   * (key, window) with integer-cent OHLC + volume, the same bar the
   * batch q_ohlc_bars computes.
   */
  def ohlcBars(events: DataFrame, window_ : String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("key"))
      .agg(
        min_by(col("cents"), struct(col("tsUs"), col("seq"))).as("open_c"),
        max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
        max_by(col("cents"), struct(col("tsUs"), col("seq"))).as("close_c"),
        count(lit(1)).as("n"), sum(col("cents")).as("vol_c"))

  /**
   * Debounce (last-of-burst) with keyed state + event-time timeout:
   * buffer the newest row per user; when no row arrives within `gapSec`
   * (by watermark time), emit it stamped at burst_ts + gap.
   */
  def debounceBursts(
      events: Dataset[Ev], gapSec: Double, watermark: String): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = math.round(gapSec * 1e6)
    events
      .withColumn("ts", timestamp_micros(col("tsUs"))).as[(Long, Long, Double, java.sql.Timestamp)]
      .toDF("user_id", "tsUs", "value", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), Ev](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (lastUs, v) = state.get
            state.remove()
            Iterator(Ev(user, lastUs + gapUs, v))
          } else {
            // Bursts can complete *within* one micro-batch: walk rows in
            // event-time order, emitting a burst whenever the quiet gap
            // elapses between consecutive rows; only the still-open burst
            // waits on the event-time timer.
            val out = Seq.newBuilder[Ev]
            var cur = state.getOption
            rows.toSeq.sortBy(_._2).foreach { r =>
              cur match {
                case Some((pUs, pV)) if r._2 - pUs >= gapUs =>
                  out += Ev(user, pUs + gapUs, pV)
                  cur = Some((r._2, r._3))
                case Some((pUs, _)) if r._2 >= pUs => cur = Some((r._2, r._3))
                case Some(_) => // late row older than burst head: drop
                case None => cur = Some((r._2, r._3))
              }
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c._1 / 1000 + math.round(gapSec * 1000))
            }
            out.result().iterator
          }
      }
  }

  /**
   * Streaming Sample (`ops/timing.py:187-211`): the latest value per key
   * as of each regular grid tick — a tumbling event-time window with
   * `max_by(value, ts)`, tick-stamped at window end. Deterministic
   * (event-time, watermark-bounded state), sharded per key; the batch
   * `EventStream.sample` computes the same thing against an explicit
   * timer stream.
   */
  def sampleGrid(events: DataFrame, interval: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), interval), col("user_id"))
      .agg(max_by(col("value"), col("ts")).as("value"))
      .select(col("window.end").as("ts"), col("user_id"), col("value"))

  /** Streaming running aggregates (§2.4 in update mode): per-key count /
    * sum / max maintained across micro-batches. */
  def runningTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
        max(col("value")).as("vmax"))

  /** The reference's `connect` surface (`event.py:87-140`): a listener
    * invoked per micro-batch of rows. Returns the started query; stop it
    * to disconnect. */
  def connect(events: DataFrame, listener: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], _: Long) => listener(batch.toDF()))
      .start()

  /**
   * Streaming Throttle (`ops/timing.py:104-184`) on the
   * `transformWithState` API (Spark 4 stateful processor + RocksDB
   * state store): values are never dropped; each row's timestamp is
   * rewritten to when the per-key sliding-window rate limiter
   * (`maximum` per `intervalSec`) admits it — the same semantics as the
   * batch `EventStream.throttle` scan. State is the bounded list of the
   * last `maximum` admitted times.
   *
   * Requires `spark.sql.streaming.stateStore.providerClass =
   * ...RocksDBStateStoreProvider` (transformWithState's backing store).
   */
  class ThrottleProcessor(maximum: Int, intervalUs: Long)
    extends StatefulProcessor[Long, Ev, Ev] {

    @transient private var admitted: ValueState[Seq[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      admitted = getHandle.getValueState[Seq[Long]](
        "admitted", implicitly[org.apache.spark.sql.Encoder[Seq[Long]]], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[Ev] = {
      var window = if (admitted.exists()) admitted.get() else Seq.empty[Long]
      val out = rows.toSeq.sortBy(_.tsUs).map { ev =>
        // Arrival order is FIFO (reference queue, ops/timing.py:119-121):
        // an admit never precedes the previous one, so clamping to the
        // last admitted time keeps `window` sorted ascending across
        // micro-batches — which indexing the (size-maximum)-th element
        // relies on.
        val floor = window.lastOption.getOrElse(Long.MinValue)
        val rateFloor =
          if (window.size < maximum) Long.MinValue
          else window(window.size - maximum) + intervalUs
        val admitTs = math.max(ev.tsUs, math.max(floor, rateFloor))
        window = (window :+ admitTs).takeRight(maximum)
        Ev(ev.user_id, admitTs, ev.value)
      }
      admitted.update(window)
      out.iterator
    }
  }

  /** Streaming throttle: ts-rewrite rate limiting with keyed RocksDB
    * state via `transformWithState`. */
  def throttleStream(events: Dataset[Ev], maximum: Int, intervalSec: Double): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new ThrottleProcessor(maximum, math.round(intervalSec * 1e6)),
        TimeMode.None(), OutputMode.Append())
  }

  case class TaggedEv(user_id: Long, tsUs: Long, value: Double, src: Int)
  case class ZipOut(user_id: Long, idx: Long, a: Double, b: Double)
  case class ZipLatestOut(user_id: Long, tsUs: Long, a: Option[Double], b: Option[Double])

  /**
   * Streaming Zip (`ops/combine.py:219-260`): pair the i-th event of
   * source A with the i-th event of source B, per key — the reference's
   * positional zip, sharded. State per key is the pair of pending
   * queues plus the running pair index; each incoming event appends to
   * its side's queue and every complete (head, head) pair is emitted
   * immediately, across micro-batch boundaries. Like the reference,
   * buffering is unbounded if one side stalls (zip's semantics require
   * it); state size equals the inter-stream lag, not history.
   */
  class ZipProcessor extends StatefulProcessor[Long, TaggedEv, ZipOut] {
    @transient private var st: ValueState[(Seq[Double], Seq[Double], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[(Seq[Double], Seq[Double], Long)](
        "zipq",
        implicitly[org.apache.spark.sql.Encoder[(Seq[Double], Seq[Double], Long)]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TaggedEv], timers: TimerValues): Iterator[ZipOut] = {
      var (qa, qb, idx) = if (st.exists()) st.get() else (Seq.empty[Double], Seq.empty[Double], 0L)
      val out = Seq.newBuilder[ZipOut]
      rows.toSeq.sortBy(r => (r.tsUs, r.src)).foreach { r =>
        if (r.src == 0) qa = qa :+ r.value else qb = qb :+ r.value
        if (qa.nonEmpty && qb.nonEmpty) {
          out += ZipOut(key, idx, qa.head, qb.head)
          qa = qa.tail; qb = qb.tail; idx += 1
        }
      }
      st.update((qa, qb, idx))
      out.result().iterator
    }
  }

  /**
   * Streaming Ziplatest (`ops/combine.py:262-302`): on every event from
   * either source emit the latest value of both, `None` standing in for
   * the reference's NO_VALUE until a side has emitted (`strict = true`
   * suppresses rows until both sides have a value — the reference's
   * `partial=False`). State per key is just the two latest values —
   * bounded regardless of history.
   */
  class ZipLatestProcessor(strict: Boolean)
    extends StatefulProcessor[Long, TaggedEv, ZipLatestOut] {
    @transient private var st: ValueState[(Option[Double], Option[Double])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[(Option[Double], Option[Double])](
        "latest",
        implicitly[org.apache.spark.sql.Encoder[(Option[Double], Option[Double])]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TaggedEv], timers: TimerValues): Iterator[ZipLatestOut] = {
      var (la, lb) = if (st.exists()) st.get() else (Option.empty[Double], Option.empty[Double])
      val out = Seq.newBuilder[ZipLatestOut]
      rows.toSeq.sortBy(r => (r.tsUs, r.src)).foreach { r =>
        if (r.src == 0) la = Some(r.value) else lb = Some(r.value)
        if (!strict || (la.isDefined && lb.isDefined))
          out += ZipLatestOut(key, r.tsUs, la, lb)
      }
      st.update((la, lb))
      out.result().iterator
    }
  }

  private def taggedUnion(a: Dataset[Ev], b: Dataset[Ev]): Dataset[TaggedEv] = {
    val spark = a.sparkSession
    import spark.implicits._
    a.map(e => TaggedEv(e.user_id, e.tsUs, e.value, 0))
      .union(b.map(e => TaggedEv(e.user_id, e.tsUs, e.value, 1)))
  }

  /**
   * Streaming Merge (`ops/combine.py:97-102`): interleave N live
   * streams by arrival. In Structured Streaming this IS `union` — each
   * micro-batch emits whatever any source delivered, no state, no
   * shuffle; event-time ordering downstream comes from the usual
   * watermark machinery, exactly how the reference's merge defers
   * ordering to the consumer. Mergemap (`ops/transform.py` flatten of N
   * inner streams) reduces to the same union once the inner streams
   * exist, so this is the streaming path for both.
   */
  def mergeStream(sources: Seq[Dataset[Ev]]): Dataset[Ev] =
    sources.reduce(_ unionByName _)

  /** Streaming positional zip of two live streams, keyed state via
    * `transformWithState` (requires the RocksDB state-store provider,
    * like [[throttleStream]]). */
  def zipStream(a: Dataset[Ev], b: Dataset[Ev]): Dataset[ZipOut] = {
    val spark = a.sparkSession
    import spark.implicits._
    taggedUnion(a, b).groupByKey(_.user_id)
      .transformWithState(new ZipProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Streaming ziplatest of two live streams (partial by default). */
  def ziplatestStream(a: Dataset[Ev], b: Dataset[Ev],
      strict: Boolean = false): Dataset[ZipLatestOut] = {
    val spark = a.sparkSession
    import spark.implicits._
    taggedUnion(a, b).groupByKey(_.user_id)
      .transformWithState(new ZipLatestProcessor(strict), TimeMode.None(), OutputMode.Append())
  }

  /**
   * Streaming Switch (`ops/combine.py:104-139`): of N live sources,
   * events pass only from the currently-active one; a source's FIRST
   * emission steals activity, and the displaced source is removed
   * permanently. Same reduction as the batch
   * [[graft.functions.Aggregators.SwitchAgg]]: "src was never seen" ⇔
   * "this emission un-removes it", so state per key is just the active
   * source id plus the ever-seen set — O(#sources), independent of
   * event count. Rows are processed in (event-time, src) order within a
   * batch; per-key ordered delivery across micro-batches is assumed
   * (as for [[AsofProcessor]]).
   */
  class SwitchProcessor extends StatefulProcessor[Long, TaggedEv, TaggedEv] {
    @transient private var st: ValueState[(Long, Seq[Int])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[(Long, Seq[Int])](
        "switch", implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Int])]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TaggedEv], timers: TimerValues): Iterator[TaggedEv] = {
      var (active, seen) =
        if (st.exists()) st.get() else (Long.MinValue, Seq.empty[Int])
      val out = Seq.newBuilder[TaggedEv]
      rows.toSeq.sortBy(r => (r.tsUs, r.src)).foreach { r =>
        val pass = r.src == active || !seen.contains(r.src)
        if (!seen.contains(r.src)) seen = seen :+ r.src
        if (pass) { active = r.src; out += r }
      }
      st.update((active, seen))
      out.result().iterator
    }
  }

  /** Streaming switch over N live streams (source index = position). */
  def switchStream(sources: Seq[Dataset[Ev]]): Dataset[TaggedEv] = {
    val spark = sources.head.sparkSession
    import spark.implicits._
    sources.zipWithIndex
      .map { case (s, i) => s.map(e => TaggedEv(e.user_id, e.tsUs, e.value, i)) }
      .reduce(_ union _)
      .groupByKey(_.user_id)
      .transformWithState(new SwitchProcessor, TimeMode.None(), OutputMode.Append())
  }

  /**
   * Streaming Concat (`ops/combine.py:142-174`): when a later source
   * emits its first event, every earlier source is disconnected
   * permanently. Live form of the batch kill-boundary encoding
   * ([[graft.engine.EventStream.concat]]): state per key is the
   * first-emission event time of each source seen so far (bounded by
   * the source count, not history), and a row of source i passes iff
   * `ts <= kill(i)` where kill(i) = min first-emission time over
   * sources j > i — the SAME rule the batch operator evaluates, so an
   * event-time-earlier row of a lower source arriving in a LATER
   * micro-batch than its killer still passes (a row at the kill
   * instant passes too, identical to the batch tie rule). The one
   * residual append-mode divergence: rows already emitted cannot be
   * retracted if a killer's true first emission itself arrives late
   * with a smaller event time than anything seen before.
   */
  class ConcatProcessor extends StatefulProcessor[Long, TaggedEv, TaggedEv] {
    @transient private var st: ValueState[Seq[(Int, Long)]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[Seq[(Int, Long)]](
        "concat", implicitly[org.apache.spark.sql.Encoder[Seq[(Int, Long)]]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TaggedEv], timers: TimerValues): Iterator[TaggedEv] = {
      var firsts = if (st.exists()) st.get().toMap else Map.empty[Int, Long]
      val out = Seq.newBuilder[TaggedEv]
      rows.toSeq.sortBy(r => (r.tsUs, r.src)).foreach { r =>
        val kill = firsts.collect { case (s, t) if s > r.src => t }
        val pass = kill.isEmpty || r.tsUs <= kill.min
        firsts = firsts.updated(r.src,
          math.min(firsts.getOrElse(r.src, Long.MaxValue), r.tsUs))
        if (pass) out += r
      }
      st.update(firsts.toSeq)
      out.result().iterator
    }
  }

  case class SpawnedEv(user_id: Long, tsUs: Long, pseq: Long, j: Long, c: String)
  case class MergedChild(user_id: Long, tsUs: Long, pseq: Long, c: String,
      outseq: Long)

  // ================= streaming higher-order (emap family) =================
  // Each live parent row spawns a bounded child sequence on the executor
  // (`flatMap` — fully parallel, stateless, the live analogue of the
  // batch explode); a keyed small-state scan then applies the family's
  // join rule (`ops/transform.py:291-346`). Per-key event-time-ordered
  // delivery across micro-batches is assumed (as for [[ConcatProcessor]])
  // — append mode cannot retract already-emitted children.

  /**
   * Streaming Mergemap (`ops/transform.py:321-325`): children of all
   * parents interleave in child event-time order — the same
   * (child_ts, parent_seq) rule the batch
   * [[graft.engine.EventStream.emapMerge]] window evaluates. State per
   * key is ONE counter.
   */
  def mergemapStream(parents: Dataset[Ev],
      spawn: Ev => Seq[SpawnedEv]): Dataset[MergedChild] = {
    val spark = parents.sparkSession
    import spark.implicits._
    spawned(parents, spawn)
      .transformWithState(
        new SpawnSeqProcessor(r => (r.tsUs, r.pseq, r.j)),
        TimeMode.None(), OutputMode.Append())
  }

  /**
   * Streaming Chainmap (`ops/transform.py:328-332`): child stream i is
   * drained fully before i+1 — batch order (parent_seq, child_idx)
   * ([[graft.engine.EventStream.emapChain]]). With bounded spawns a
   * parent's children all arrive with it, so the chain order is exact
   * whenever parents arrive in creation order.
   */
  def chainmapStream(parents: Dataset[Ev],
      spawn: Ev => Seq[SpawnedEv]): Dataset[MergedChild] = {
    val spark = parents.sparkSession
    import spark.implicits._
    spawned(parents, spawn)
      .transformWithState(
        new SpawnSeqProcessor(r => (r.pseq, r.j, r.tsUs)),
        TimeMode.None(), OutputMode.Append())
  }

  /**
   * Streaming Concatmap (`ops/transform.py:335-339`): child k is
   * disconnected at the first emission of ANY later child — a row
   * passes iff `ts <= kill(k)` where kill(k) = min first-child-emission
   * time over parents q > k, the batch
   * [[graft.engine.EventStream.emapConcat]] rule (a row at the kill
   * instant passes). State per key: each parent's first child event
   * time (bounded by parent count) + the output counter.
   */
  def concatmapStream(parents: Dataset[Ev],
      spawn: Ev => Seq[SpawnedEv]): Dataset[MergedChild] = {
    val spark = parents.sparkSession
    import spark.implicits._
    spawned(parents, spawn)
      .transformWithState(new SpawnKillProcessor(nextOnly = false),
        TimeMode.None(), OutputMode.Append())
  }

  /**
   * Streaming Switchmap (`ops/transform.py:342-346`): the batch
   * encoding ([[graft.engine.EventStream.emapSwitch]]) — child k is
   * truncated at the NEXT parent's first child emission (`ts <= nxt`
   * passes; valid when children first emit at creation, the reference's
   * shape). Divergence note shared with batch: a parent that spawns
   * NOTHING leaves the previous child untruncated in the batch
   * encoding; live, an empty spawn simply never registers, so the kill
   * falls through to the next spawning parent — avoid empty spawns.
   */
  def switchmapStream(parents: Dataset[Ev],
      spawn: Ev => Seq[SpawnedEv]): Dataset[MergedChild] = {
    val spark = parents.sparkSession
    import spark.implicits._
    spawned(parents, spawn)
      .transformWithState(new SpawnKillProcessor(nextOnly = true),
        TimeMode.None(), OutputMode.Append())
  }

  private def spawned(parents: Dataset[Ev], spawn: Ev => Seq[SpawnedEv]) = {
    val spark = parents.sparkSession
    import spark.implicits._
    parents.flatMap(spawn(_)).groupByKey(_.user_id)
  }

  /** Keyed running output counter over `order`-sorted spawned children
    * — the sequencing half shared by merge/chain. */
  class SpawnSeqProcessor(order: SpawnedEv => (Long, Long, Long))
      extends StatefulProcessor[Long, SpawnedEv, MergedChild] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[Long](
        "spawnseq", implicitly[org.apache.spark.sql.Encoder[Long]], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[SpawnedEv], timers: TimerValues): Iterator[MergedChild] = {
      var n = if (st.exists()) st.get() else 0L
      val out = rows.toSeq.sortBy(order).map { r =>
        n += 1
        MergedChild(r.user_id, r.tsUs, r.pseq, r.c, n)
      }
      st.update(n)
      out.iterator
    }
  }

  /** Kill-boundary filter + output counter for concatmap/switchmap.
    * State: (per-parent first child event time, counter). `nextOnly`
    * false = concat rule (kill = min first over ALL later parents);
    * true = switch rule (kill = first of the IMMEDIATELY next spawning
    * parent). Rows process in (ts, pseq, j) scan order, so a row at the
    * kill instant is checked before its killer registers — the batch
    * tie rule. */
  class SpawnKillProcessor(nextOnly: Boolean)
      extends StatefulProcessor[Long, SpawnedEv, MergedChild] {
    @transient private var st: ValueState[(Seq[(Long, Long)], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[(Seq[(Long, Long)], Long)](
        "spawnkill",
        implicitly[org.apache.spark.sql.Encoder[(Seq[(Long, Long)], Long)]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[SpawnedEv], timers: TimerValues): Iterator[MergedChild] = {
      var (firsts, n) =
        if (st.exists()) { val (f, c) = st.get(); (f.toMap, c) }
        else (Map.empty[Long, Long], 0L)
      val out = Seq.newBuilder[MergedChild]
      rows.toSeq.sortBy(r => (r.tsUs, r.pseq, r.j)).foreach { r =>
        val laters = firsts.keys.filter(_ > r.pseq)
        val kill =
          if (laters.isEmpty) None
          else if (nextOnly) Some(firsts(laters.min))
          else Some(laters.map(firsts).min)
        firsts = firsts.updated(r.pseq,
          math.min(firsts.getOrElse(r.pseq, Long.MaxValue), r.tsUs))
        if (kill.forall(r.tsUs <= _)) {
          n += 1
          out += MergedChild(r.user_id, r.tsUs, r.pseq, r.c, n)
        }
      }
      st.update((firsts.toSeq, n))
      out.result().iterator
    }
  }

  /** Streaming concat over N live streams (source index = position). */
  def concatStream(sources: Seq[Dataset[Ev]]): Dataset[TaggedEv] = {
    val spark = sources.head.sparkSession
    import spark.implicits._
    sources.zipWithIndex
      .map { case (s, i) => s.map(e => TaggedEv(e.user_id, e.tsUs, e.value, i)) }
      .reduce(_ union _)
      .groupByKey(_.user_id)
      .transformWithState(new ConcatProcessor, TimeMode.None(), OutputMode.Append())
  }

  case class AsofOut(user_id: Long, tsUs: Long, value: Double,
      asof_ts: Option[Long], asof_value: Option[Double])

  /**
   * Streaming as-of join ([[graft.engine.AsofJoin]] live form): stamp
   * each event of a query stream with the most recent value of a
   * slowly-changing reference stream for the same key and
   * `ref.ts <= event.ts` (inclusive, LEFT semantics — no reference yet
   * ⇒ None). The training-pipeline join at serving time: events stamped
   * with the prevailing model version / config / quote.
   *
   * State per key is the reference history pruned to what future events
   * can still need: after stamping an event at time t, every reference
   * row strictly older than the match is discarded (per-key event-time
   * ordered delivery across micro-batches is assumed, as for a
   * changelog; within a batch rows are sorted, reference-before-event
   * at equal timestamps). So state holds the lag between the two
   * streams, not history.
   */
  class AsofProcessor extends StatefulProcessor[Long, TaggedEv, AsofOut] {
    @transient private var st: ValueState[Seq[(Long, Double)]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[Seq[(Long, Double)]](
        "refs", implicitly[org.apache.spark.sql.Encoder[Seq[(Long, Double)]]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TaggedEv], timers: TimerValues): Iterator[AsofOut] = {
      // refs sorted ascending by ts; src 0 = reference, src 1 = query
      var refs = if (st.exists()) st.get() else Seq.empty[(Long, Double)]
      val out = Seq.newBuilder[AsofOut]
      rows.toSeq.sortBy(r => (r.tsUs, r.src)).foreach { r =>
        if (r.src == 0) {
          refs = (refs :+ (r.tsUs, r.value)).sortBy(_._1)
        } else {
          val m = refs.filter(_._1 <= r.tsUs).lastOption
          out += AsofOut(key, r.tsUs, r.value, m.map(_._1), m.map(_._2))
          // older references can never match a later (ordered) event
          m.foreach { hit => refs = refs.dropWhile(_._1 < hit._1) }
        }
      }
      st.update(refs)
      out.result().iterator
    }
  }

  /** Streaming as-of stamp: `events` enriched with the latest `refs`
    * value per key as of each event's time, via `transformWithState`
    * (RocksDB provider required). */
  def asofStream(events: Dataset[Ev], refs: Dataset[Ev]): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    refs.map(e => TaggedEv(e.user_id, e.tsUs, e.value, 0))
      .union(events.map(e => TaggedEv(e.user_id, e.tsUs, e.value, 1)))
      .groupByKey(_.user_id)
      .transformWithState(new AsofProcessor, TimeMode.None(), OutputMode.Append())
  }

  /**
   * Streaming exact dedup: drop rows whose `keyCols` were already seen
   * within the watermark horizon — the streaming form of the dedup
   * family (q_dedup_exact), e.g. suppressing re-crawled documents by
   * content hash. `dropDuplicatesWithinWatermark` keys RocksDB state by
   * the dedup columns and EVICTS entries older than the watermark, so
   * state is bounded by the horizon (a bare dropDuplicates would grow
   * forever on an unbounded stream).
   */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Streaming sessionization — the live form of `q_sessionize`:
   * `session_window(ts, gap)` merges events whose gaps stay under
   * `gap` into one growing window per key; the watermark closes (and
   * evicts) sessions once event time passes their end, so state is
   * bounded by the number of OPEN sessions, not history.
   */
  def sessionize(events: DataFrame, gap: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  case class DocEv(doc_id: Long, text: String)
  case class CandPair(a: Long, b: Long)

  /**
   * Streaming MinHash near-dup detection — the live form of
   * `q_dedup_minhash`: stage 1 computes signatures and band keys with
   * the SAME codegen kernels as batch (stateless projections stream
   * as-is); stage 2 keys state by band bucket and emits a candidate
   * pair the moment a new document lands in a bucket with prior
   * members. State shards by bucket (never by corpus), and holds doc
   * ids only — the streaming analogue of the batch groupBy. A
   * production deployment adds TTL/eviction on the bucket state; a
   * downstream `dropDuplicates` dedups pairs colliding in >1 band,
   * exactly like the batch path's distinct.
   */
  def minhashCandStream(docs: Dataset[DocEv], k: Int, numHashes: Int,
      numBands: Int, rowsPerBand: Int): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bandKeys = (0 until numBands).map { b =>
      concat_ws("_", lit(b) +:
        (0 until rowsPerBand).map(r =>
          element_at(col("__hs"), b * rowsPerBand + r + 1)): _*)
    }
    val withBands = docs.toDF()
      .select(col("doc_id"),
        graft.functions.VectorFunctions.minhashSigs(
          graft.functions.VectorFunctions.shingleSids(
            graft.text.TextOps.tokens(col("text")), k),
          numHashes).as("__hs"))
      .filter(size(col("__hs")) > 0)
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("bucket"))
      .as[(Long, String)]
    withBands.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, rows: Iterator[(Long, String)], state: GroupState[Seq[Long]]) => {
          var seen = state.getOption.getOrElse(Vector.empty[Long])
          val out = Vector.newBuilder[CandPair]
          // Membership must be checked against the UPDATED list: a
          // filterNot(seen.contains) here would eta-expand over the
          // pre-batch Vector, so a doc_id delivered twice in one
          // micro-batch would bypass the dedup and emit a degenerate
          // (id, id) pair plus duplicates.
          rows.foreach { case (id, _) =>
            if (!seen.contains(id)) {
              seen.foreach(p =>
                out += CandPair(math.min(id, p), math.max(id, p)))
              seen = seen :+ id
            }
          }
          state.update(seen)
          out.result().iterator
        })
  }

  /**
   * Streaming IVF serving + drift monitoring — the LIVE half of the
   * index lifecycle that [[graft.ml.Similarity.kmeansCentroids]]
   * (train, sampled) / `ivfAssignFromCentroids` (batch assign) /
   * `ivfIncremental` (batch append) cover offline. Incoming vectors
   * are assigned to their nearest trained cell in a STATELESS
   * broadcast-centroid projection (streams as-is, no state), carrying
   * the integer squared residual norm against the training-time cell
   * mean — so a downstream windowed aggregate is a live drift monitor
   * (mean residual norm per cell per window rising above the
   * training-time baseline = retrain alarm), and the assignment rows
   * themselves are the live posting updates an index sink appends.
   *
   * `cents` and `mu` are COLLECTED index artifacts (nCells rows) —
   * the same constant-size tables the batch paths ship; they ride
   * into the stream as driver-resident structures, exactly like the
   * ADC tables ([[graft.functions.AdcLookup]]).
   *
   * @param vecs  streaming (idCol, vecCol: array<float>, ts)
   * @param cents trained centroids (cid, cq) — BATCH frame, collected
   * @param mu    training-time floor-integer cell means (cell, mu) —
   *              BATCH frame, collected
   * @param keepVec when true the output also carries `vecCol` — the
   *                shape a postings SINK appends (serving needs the
   *                vector next to its cell); the default drops it (a
   *                drift monitor needs only the residual)
   * @return streaming (idCol, ts, cell, rsq[, vecCol]) — home-cell
   *         assignment + integer squared residual norm vs the
   *         training mean
   */
  def ivfAssignStream(vecs: DataFrame, idCol: String, vecCol: String,
      tsCol: String, cents: DataFrame, mu: DataFrame,
      keepVec: Boolean = false): DataFrame = {
    import graft.ml.Similarity
    val centRows = cents.select(col("cid"), col("cq")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    // complete the mean map with the centroid fallback (the
    // [[graft.ml.Similarity.ivfCellMeans]] contract) so a live vector
    // landing in a memberless cell still carries a real residual —
    // out-of-distribution rows are exactly the drift evidence a
    // monitor must count, not NULL silently out of the window average
    val muMember = mu.select(col("cell"), col("mu")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val muLit = typedlit(centRows.map { case (cid, cq) =>
      cid -> muMember.getOrElse(cid, cq) }.toMap)
    val q = Similarity.quantize(col(vecCol))
    // nearest cell by the same score/tie-break as the batch assigner:
    // dot(q, cq)/||cq|| DESC, cid ASC — the shared array-backed matrix
    // kernel ([[graft.functions.NearestCells]]), stateless per row.
    // The centroid matrix and its precomputed norms ride OUTSIDE the
    // plan as driver-resident arrays (the AdcLookup reference-object
    // discipline): ONE plan node at any cell count, where the round-9
    // per-centroid fold built O(nCells) expression nodes and stopped
    // planning in bounded time past a few hundred cells. An all-zero
    // centroid scores 0 for every vector (kernel guard) instead of 0/0.
    val centArr = centRows.toSeq.map { case (cid, cq) =>
      cid -> cq.map(_.toDouble).toArray }
    val best = element_at(graft.functions.VectorFunctions
      .nearestCells(q, centArr, 1), 1)
    val keep = if (keepVec) Seq(col(vecCol)) else Nil
    vecs
      .select(Seq(col(idCol), col(tsCol), q.as("__q"), best.as("cell")) ++ keep: _*)
      .select(Seq(col(idCol), col(tsCol), col("cell"),
        aggregate(zip_with(col("__q"), element_at(muLit, col("cell")),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x).as("rsq"))
        ++ keep: _*)
  }

  /** Live retrain alarm over [[ivfAssignStream]] output — the
    * streaming half of `ivfIncremental`'s drift metric: per-cell
    * windowed mean residual, alarmed when it exceeds `alarmFactor` ×
    * the cell's TRAINING-time base mean squared residual (`baseMsr` =
    * sq_base/n_base, the constant-size artifact the batch path
    * divides by — persisted with the centroids). A cell with no base
    * statistic alarms on ANY activity: live rows landing where the
    * training corpus had nothing are themselves drift evidence.
    * `tsCol` must be a timestamp; emits (window, cell, n, mean_rsq,
    * base_msr, alarm). */
  def ivfDriftMonitor(assigned: DataFrame, tsCol: String,
      windowDur: String, baseMsr: Map[Long, Double],
      alarmFactor: Double): DataFrame = {
    val baseLit = typedlit(baseMsr)
    assigned
      .withWatermark(tsCol, windowDur)
      .groupBy(window(col(tsCol), windowDur).as("w"), col("cell"))
      .agg(count(lit(1)).as("n"), avg(col("rsq")).as("mean_rsq"))
      .withColumn("base_msr", element_at(baseLit, col("cell")))
      .withColumn("alarm",
        coalesce(col("mean_rsq") > col("base_msr") * alarmFactor, lit(true)))
  }

  case class SketchIn(group: String, sid: Long)
  case class HllReg(group: String, idx: Long, mrho: Int)
  case class CmsUpd(r: Int, b: Long, wt: Long)

  /**
   * Live HyperLogLog register maintenance — the streaming form of
   * [[graft.text.Sketches.hllRegisters]]. The stream is keyed by
   * (group, register), so state per key is ONE integer (the max rho);
   * registers only ever grow, and an update-mode row is emitted only
   * when a register actually moves — after the initial ramp, a
   * near-duplicate-heavy stream goes quiet on its own. This is the
   * merge law run incrementally: every micro-batch is "merge the
   * batch's partial register file into the standing one", which
   * PropertySpec proves equals recomputing over history. State is
   * bounded by groups × 64 forever — no watermark needed, nothing to
   * evict. The rho arithmetic is the same mix-hash / binary-length
   * sequence as the batch Column kernel (parity-tested).
   */
  def hllRegisterStream(rows: Dataset[SketchIn]): Dataset[HllReg] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.map { x =>
      val h = (x.sid * 2654435761L + 104729L) & 0xFFFFFFFFL
      val sfx = h >> 6
      val rho =
        if (sfx == 0L) 27 else 27 - java.lang.Long.toBinaryString(sfx).length
      HllReg(x.group, h % 64, rho)
    }.groupByKey(r => (r.group, r.idx))
      .transformWithState(new HllRegProcessor, TimeMode.None(), OutputMode.Update())
  }

  class HllRegProcessor
      extends StatefulProcessor[(String, Long), HllReg, HllReg] {
    @transient private var st: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[Int](
        "mrho", implicitly[org.apache.spark.sql.Encoder[Int]], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: (String, Long), rows: Iterator[HllReg], timers: TimerValues): Iterator[HllReg] = {
      val cur = if (st.exists()) st.get() else Int.MinValue
      val merged = math.max(cur, rows.map(_.mrho).max)
      if (merged > cur) {
        st.update(merged)
        Iterator.single(HllReg(key._1, key._2, merged))
      } else Iterator.empty
    }
  }

  /**
   * Live count-min grid maintenance — the streaming form of
   * [[graft.text.Sketches.cmsGrid]]. Each fingerprint fans out to its
   * D (row, bucket) cells executor-side; the stream is keyed by CELL,
   * so state per key is one counter and the hottest token only ever
   * heats D counters, not a key group. Update mode emits the new cell
   * value each time it moves; the latest row per cell IS the grid
   * (cell-wise-sum merge law, run incrementally).
   */
  def cmsCellStream(fps: Dataset[(Long, Long)], w: Int,
      a: Seq[Long], b: Seq[Long]): Dataset[CmsUpd] = {
    val spark = fps.sparkSession
    import spark.implicits._
    fps.flatMap { case (fp, wt) =>
      a.indices.map(j => CmsUpd(j, (fp * a(j) + b(j)) % 1000003L % w, wt))
    }.groupByKey(c => (c.r, c.b))
      .transformWithState(new CmsCellProcessor, TimeMode.None(), OutputMode.Update())
  }

  class CmsCellProcessor
      extends StatefulProcessor[(Int, Long), CmsUpd, CmsUpd] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[Long](
        "cell", implicitly[org.apache.spark.sql.Encoder[Long]], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: (Int, Long), rows: Iterator[CmsUpd], timers: TimerValues): Iterator[CmsUpd] = {
      val total = (if (st.exists()) st.get() else 0L) + rows.map(_.wt).sum
      st.update(total)
      Iterator.single(CmsUpd(key._1, key._2, total))
    }
  }

  case class DayCount(event_type: String, day: Long, n: Long)
  case class DayFlag(event_type: String, day: Long, n: Long, is_anomaly: Boolean)

  /**
   * Live daily-volume anomaly monitor — the streaming form of
   * `q_anomaly_days`, with the SAME cross-multiplied integer 2-sigma
   * test ((x·D − S)² > 4·(D·Q − S²), no division or sqrt). Semantics
   * are PREQUENTIAL by design: each day is judged against the stats of
   * days seen SO FAR (including itself, matching the batch formula's
   * treatment of the flagged cell), because a live monitor cannot see
   * the future — whereas the batch query re-judges every day against
   * full history. State per event type is three integers (count, sum,
   * sum of squares); days are processed in day order within a batch,
   * and per-key in-order delivery across batches is assumed, like the
   * other keyed processors here.
   */
  def anomalyStream(days: Dataset[DayCount]): Dataset[DayFlag] = {
    val spark = days.sparkSession
    import spark.implicits._
    days.groupByKey(_.event_type)
      .transformWithState(new AnomalyProcessor, TimeMode.None(), OutputMode.Append())
  }

  class AnomalyProcessor
      extends StatefulProcessor[String, DayCount, DayFlag] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[(Long, Long, Long)](
        "volstats",
        implicitly[org.apache.spark.sql.Encoder[(Long, Long, Long)]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[DayCount], timers: TimerValues): Iterator[DayFlag] = {
      var (nd, sv, qv) = if (st.exists()) st.get() else (0L, 0L, 0L)
      val out = rows.toSeq.sortBy(_.day).map { r =>
        nd += 1; sv += r.n; qv += r.n * r.n
        val dev = r.n * nd - sv
        DayFlag(key, r.day, r.n, dev * dev > 4L * (nd * qv - sv * sv))
      }
      st.update((nd, sv, qv))
      out.iterator
    }
  }

  case class WindowJoinOut(user_id: Long, l_tsUs: Long, l_value: Double,
      r_tsUs: Option[Long], r_value: Option[Double])

  /**
   * Live time-bounded stream-stream join — the streaming form of the
   * batch point-in-interval join (graft.engine.IntervalJoin /
   * q_join_interval) and the ad-tech attribution shape: every `right`
   * row landing within `[left.ts, left.ts + horizonSec]` of a same-key
   * `left` row emits a pair. This is Spark's NATIVE stream-stream
   * equi-join with an event-time range condition — no custom state:
   * the range bound plus the watermark lets Spark evict left rows once
   * the watermark passes ts + horizon and right rows at the watermark,
   * so state is bounded by the horizon, not history. Inner-join
   * emission itself never waits on the watermark, so pairs straddling
   * micro-batches appear as soon as both sides have arrived.
   *
   * `joinType = "left_outer"` adds the attribution "no conversion"
   * rows: a left row whose horizon closes with no match emits once,
   * null-padded, when the watermark passes ts + horizon (outer rows
   * MUST wait for the watermark — that is what proves no match can
   * still arrive).
   */
  def windowJoinStream(left: Dataset[Ev], right: Dataset[Ev],
      horizonSec: Long, watermark: String,
      joinType: String = "inner"): Dataset[WindowJoinOut] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(col("user_id"),
        timestamp_micros(col("tsUs")).as("l_ts"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_uid"),
        timestamp_micros(col("tsUs")).as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("user_id") === col("r_uid") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECOND"),
        joinType)
      .select(col("user_id"), unix_micros(col("l_ts")).as("l_tsUs"), col("l_value"),
        unix_micros(col("r_ts")).as("r_tsUs"), col("r_value"))
      .as[WindowJoinOut]
  }

  /**
   * Streaming Errors (`ops/misc.py:5-14`): split a stream carrying an
   * error side-channel into a MAIN output and a DEAD-LETTER output with
   * ONE pass per micro-batch — the foreachBatch analogue of the
   * reference's `error_event` tap and of the batch `q_errors`
   * dead-letter filter. The batch is persisted so the two filters scan
   * it once each from cache, not twice from source.
   *
   * Every input row lands in EXACTLY one output: a NULL predicate
   * (e.g. a nullable error column) routes to `main` — `filter(p)` and
   * `filter(!p)` both exclude NULL-predicate rows, so splitting on the
   * raw predicate would silently drop them from both sinks.
   *
   * @param isError    predicate marking dead-letter rows (NULL = not
   *                   an error)
   * @param main       sink for non-error rows (per micro-batch)
   * @param deadLetter sink for error rows (per micro-batch)
   */
  def errorSplit(events: DataFrame, isError: org.apache.spark.sql.Column,
      main: DataFrame => Unit, deadLetter: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val err = coalesce(isError, lit(false))
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF().persist()
        try {
          deadLetter(b.filter(err))
          main(b.filter(!err))
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /**
   * Streaming EndOnError (`ops/misc.py:17-27`): pass rows through until
   * the FIRST error row (in `seqCol` order), emit nothing afterwards,
   * and surface the trip so the caller can stop the query — the
   * reference disconnects from its source and re-emits the error; a
   * structured stream cannot stop itself from inside foreachBatch, so
   * the returned latch is the `error_event`.
   *
   * Within the tripping micro-batch, rows strictly before the first
   * error pass (same cut as the batch `takeWhile` encoding); later
   * micro-batches are dropped entirely.
   *
   * @return (query, tripped) — `tripped` flips exactly once, on the
   *         batch containing the first error
   */
  def endOnError(events: DataFrame, isError: org.apache.spark.sql.Column, seqCol: String,
      main: DataFrame => Unit)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         java.util.concurrent.atomic.AtomicBoolean) = {
    val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!tripped.get()) {
          val b = batch.toDF().persist()
          try {
            val firstErr = b.filter(isError)
              .agg(min(col(seqCol))).head().get(0)
            firstErr match {
              case null => main(b)
              case s =>
                main(b.filter(col(seqCol) < lit(s)))
                tripped.set(true)
            }
          } finally { b.unpersist(); () }
        }
      }
      .start()
    (q, tripped)
  }

  /** Drive a streaming DataFrame to completion into an in-memory table
    * and return the result — the batch-parity harness used in tests. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
