package graft

import org.apache.spark.sql.functions._
import graft.engine.EventStream
import graft.sources.Sources

/** Timing operators recast to event time — semantics of
  * `/root/reference/eventkit/ops/timing.py`, no sleeps. */
class TimingSpec extends SparkSpec {

  /** Stream with explicit event times (seconds offsets). */
  private def timed(sec: Seq[Double]): EventStream = {
    val base = Sources.fromLongs(spark, sec.indices.map(_.toLong), 0.0)
    val withTs = base.withColumn("ts",
      timestamp_micros(lit(1704067200000000L) +
        element_at(typedLit(sec.map(s => math.round(s * 1e6))), col("seq").cast("int") + 1)))
    EventStream(withTs, keys = Nil)
  }

  test("delay shifts event time (ops/timing.py:8-28)") {
    val got = timed(Seq(0, 1, 2)).delay("90 SECONDS")
      .df.orderBy("seq").select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1000000L, 2000000L).map(_ + 90000000L + 1704067200000000L))
  }

  test("throttle 1-per-second rewrites admit times (ops/timing.py:104-184)") {
    val got = timed(Seq(0, 0.1, 0.2, 3.0)).throttle(1, 1.0)
      .df.orderBy("seq").select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val base = 1704067200000000L
    assert(got.toSeq == Seq(0L, 1000000L, 2000000L, 3000000L).map(_ + base))
  }

  test("throttle 2-per-second keeps burst pairs (ops/timing.py:104-184)") {
    val got = timed(Seq(0, 0.1, 0.2, 0.3)).throttle(2, 1.0)
      .df.orderBy("seq").select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val base = 1704067200000000L
    // admits: 0, 0.1 (burst), then 0+1s, 0.1+1s
    assert(got.toSeq == Seq(0L, 100000L, 1000000L, 1100000L).map(_ + base))
  }

  test("debounce last-of-burst re-stamped at +gap (ops/timing.py:67-101)") {
    val es = timed(Seq(0, 0.2, 0.4, 5.0, 5.1, 20.0))
    val got = es.debounce(1.0, onFirst = false)
      .df.orderBy("seq").select(col("value"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1) - 1704067200000000L)).toSeq
    assert(got == Seq((2L, 1400000L), (4L, 6100000L), (5L, 21000000L)))
  }

  test("debounce on_first emits burst heads (ops/timing.py:80-86)") {
    val es = timed(Seq(0, 0.2, 0.4, 5.0, 5.1, 20.0))
    val got = longs(es.debounce(1.0, onFirst = true), "value")
    assert(got == Seq(0L, 3L, 5L))
  }

  test("timeout ends stream at first silent gap (ops/timing.py:31-64)") {
    val es = timed(Seq(0, 0.5, 1.0, 10.0, 10.5))
    assert(longs(es.timeout(2.0), "value") == Seq(0L, 1L, 2L))
    val markers = es.timeoutMarkers(2.0).collect()
    assert(markers.length == 1)
    assert(markers.head.getTimestamp(0).getTime == 1704067200000L + 3000L)
  }

  test("throttle status_event emits on/off at queue transitions (ops/timing.py:110-114,171-176)") {
    // 1/sec: arrivals 0, .1, .2 queue (.1 delayed to 1s, .2 to 2s) ->
    // ON at 0.1, OFF at 2.0; then 5.0 passes clean; 5.1 queues again ->
    // ON at 5.1, OFF at 6.0.
    val es = timed(Seq(0, 0.1, 0.2, 5.0, 5.1))
    val got = es.throttleStatus(1, 1.0)
      .df.orderBy("ts").select(unix_micros(col("ts")), col("active")).collect()
      .map(r => (r.getLong(0) - 1704067200000000L, r.getBoolean(1))).toSeq
    assert(got == Seq((100000L, true), (2000000L, false), (5100000L, true), (6000000L, false)))
  }

  test("throttle status is empty when nothing queues (ops/timing.py:171-176)") {
    val es = timed(Seq(0, 2, 4))
    assert(es.throttleStatus(1, 1.0).df.count() === 0)
  }

  test("throttle set_limit re-limits from the control stream (ops/timing.py:124-130)") {
    // Default 1/sec; at t=3s the limit relaxes to 2/sec. Arrivals
    // 0, .1, 3.0, 3.1, 3.2: under 1/sec admits would be 0,1,3,4,5;
    // with the relax, 3.0 and 3.1 both pass (2 in window), 3.2 waits
    // until 3.0's admission expires at 4.0.
    val es = timed(Seq(0, 0.1, 3.0, 3.1, 3.2))
    val lims = spark.range(1).select(
      timestamp_micros(lit(1704067200000000L + 3000000L)).as("ts"),
      lit(2).as("maximum"), lit(1.0).as("interval_sec"))
    val got = es.throttleDynamic(lims, defaultMax = 1, defaultIntervalSec = 1.0)
      .df.orderBy("seq").select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0) - 1704067200000000L)
    assert(got.toSeq == Seq(0L, 1000000L, 3000000L, 3100000L, 4000000L))
  }

  test("throttle set_limit tighten prunes with the new interval (ops/timing.py:151-153)") {
    // 3/sec until t=1.5s, then 1 per 3s. Arrivals 0, .1, .2, 2.0, 2.1:
    // first three pass; 2.0 sees admits {0,.1,.2} pruned with iv=3s ->
    // all live, 1-per-3s means wait for the newest's expiry clamp:
    // kept(size-1)=.2 -> admit 3.2; 2.1 then waits for 2.0's slot: 6.2.
    val es = timed(Seq(0, 0.1, 0.2, 2.0, 2.1))
    val lims = spark.range(1).select(
      timestamp_micros(lit(1704067200000000L + 1500000L)).as("ts"),
      lit(1).as("maximum"), lit(3.0).as("interval_sec"))
    val got = es.throttleDynamic(lims, defaultMax = 3, defaultIntervalSec = 1.0)
      .df.orderBy("seq").select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0) - 1704067200000000L)
    assert(got.toSeq == Seq(0L, 100000L, 200000L, 3200000L, 6200000L))
  }

  test("throttle with per-item cost (cost_func, ops/timing.py:115-117)") {
    // budget 3 per 10s; costs [2,2,2,1,3] at ts 0..4s ->
    // admits [0, 10, 20, 20, 30] (worked in the Scaladoc convention:
    // an admission's cost frees at admit + interval).
    val es = timed(Seq(0, 1, 2, 3, 4))
    val costs = Seq(2L, 2L, 2L, 1L, 3L)
    val withCost = es.derive(es.df.withColumn("cost",
      element_at(typedLit(costs), col("seq").cast("int") + 1)))
    val got = withCost.throttleCost(col("cost"), maximum = 3, intervalSec = 10.0)
      .df.orderBy("seq").select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val base = 1704067200000000L
    assert(got.toSeq == Seq(0L, 10000000L, 20000000L, 20000000L, 30000000L).map(_ + base))
  }

  test("sample picks latest value at each tick (ops/timing.py:187-211)") {
    val src = timed(Seq(0.5, 1.5, 3.5))
    val ticks = timed(Seq(1.0, 2.0, 3.0, 4.0))
    val got = src.sample(ticks, Seq("value"))
      .df.orderBy("ts").select("value").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 1L, 2L))
  }
}
