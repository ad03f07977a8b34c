package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/**
 * Golden values ported verbatim from the reference's unit tests
 * (`/root/reference/tests/aggregate_test.py`, `select_test.py`) — the
 * expected outputs are engine-independent.
 */
class GoldenOpsSpec extends SparkSpec {
  private val array = 0 until 10

  test("running sum of 0..9 (aggregate_test.py:18-21)") {
    val got = longs(seqStream(array).rsum(col("value"), "rsum"), "rsum")
    assert(got == Seq(0L, 1, 3, 6, 10, 15, 21, 28, 36, 45))
  }

  test("running product of 1..9 = factorials (aggregate_test.py:23-26)") {
    val st = seqStream(1 until 10)
    val got = valuesOf[Double](
      st.derive(st.df.withColumn("p",
        Aggregators.runningProduct(col("value").cast("double")).over(st.wRun))), "p")
    assert(got == Seq(1.0, 2, 6, 24, 120, 720, 5040, 40320, 362880))
  }

  test("running min / max (aggregate_test.py:11-16)") {
    assert(longs(seqStream(array).rmin(col("value"), "m"), "m") == Seq.fill(10)(0L))
    assert(longs(seqStream(array).rmax(col("value"), "m"), "m") == array.map(_.toLong))
  }

  test("reduceScan: no-initializer off-by-one matches the reference (ops/aggregate.py:29-31)") {
    // reference Reduce(operator.add) over [3,1,4,1,5]: first element
    // seeds prev=3 with NO emit, then emits 4, 8, 9, 14 — four values
    val st = seqStream(Seq(3, 1, 4, 1, 5))
    val got = longs(st.reduceScan[Long](_ + _, "value", "acc"), "acc")
    assert(got == Seq(4L, 8, 9, 14))
    // with an initializer the first row emits f(init, x1): Reduce(add, 100)
    val got2 = longs(
      st.reduceScan[Long](_ + _, "value", "acc", init = Some(100L)), "acc")
    assert(got2 == Seq(103L, 104, 108, 109, 114))
    // a genuinely non-commutative lambda (string-ish fold on longs):
    // f(a, x) = a*10 + x — digit concatenation, order-sensitive
    val got3 = longs(st.reduceScan[Long](10 * _ + _, "value", "acc"), "acc")
    assert(got3 == Seq(31L, 314, 3141, 31415))
  }

  test("running any / all (aggregate_test.py:28-36)") {
    val anyGot = valuesOf[Boolean](seqStream(array).rany(col("value") =!= 0, "a"), "a")
    assert(anyGot == Seq(false) ++ Seq.fill(9)(true))
    val allIn = Seq.fill(10)(1) ++ Seq.fill(10)(0)
    val allGot = valuesOf[Boolean](seqStream(allIn).rall(col("value") =!= 0, "a"), "a")
    assert(allGot == allIn.map(_ == 1))
  }

  test("asof join: latest right at-or-before, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (3L, 1L, 999L))
      .toDF("k", "t", "px")
    val got = graft.engine.AsofJoin.asofLeft(left, right, "k", "t", Seq("px"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("asof_px")).map(_.toLong)))
      .toSeq
    assert(got == Seq(
      ("a", None, None),            // before any right row
      ("b", Some(10L), Some(100L)), // tie at t=10 matches (inclusive)
      ("c", Some(15L), Some(150L)), // latest of the two priors
      ("d", None, None)))           // key with no right rows at all
  }

  test("copy/deepcopy are identity on immutable rows (ops/transform.py Copy/Deepcopy)") {
    // The reference copies the mutable payload object; DataFrame rows
    // are immutable, so both ops are the identity — asserted rather
    // than assumed: same plan, same rows, and derive() preserves them.
    val st = seqStream(array)
    val copied = st.derive(st.df)
    assert(copied.df.schema == st.df.schema)
    assert(copied.df.collect().toSeq == st.df.collect().toSeq)
  }

  test("connected components: chains collapse, components stay separate") {
    import spark.implicits._
    // 1-2-3-4-5 chain (diameter 4 — needs several propagation rounds),
    // a separate pair, edge listed high-to-low to check symmetrization.
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (9L, 7L))
      .toDF("a", "b")
    val got = graft.engine.ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("pairwise (aggregate_test.py:38-40)") {
    val st = seqStream(array).pairwise("value", "prev")
    val got = st.df.orderBy("seq").select("prev", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == array.zip(array.tail).map { case (a, b) => (a.toLong, b.toLong) })
  }

  test("chunk(3) of 0..9 (aggregate_test.py:42-44)") {
    val st = seqStream(array).chunk("value", 3, "ci", "vals")
    val got = st.df.orderBy("ci").select("vals").collect()
      .map(_.getSeq[Long](0).toList).toList
    assert(got == List(List(0L, 1, 2), List(3L, 4, 5), List(6L, 7, 8), List(9L)))
  }

  test("sliding array(5), last (aggregate_test.py:51-53)") {
    val st = seqStream(array).deque(col("value"), 5, "arr").last()
    val got = st.df.select("arr").collect().head.getSeq[Long](0)
    assert(got == (5 until 10).map(_.toLong))
  }

  test("ema matches sequential fold semantics (ops/aggregate.py:95-111)") {
    val st = seqStream(array)
    val got = valuesOf[Double](
      st.derive(st.df.withColumn("e",
        Aggregators.ema(col("value").cast("double"), 0.25).over(st.wRun))), "e")
    val expected = array.map(_.toDouble).tail
      .scanLeft(array.head.toDouble)((acc, x) => acc * 0.75 + x * 0.25)
    assert(got == expected)
  }

  test("ema over tuples folds each position independently (ops/aggregate.py:104-108)") {
    val st = seqStream(array)
    val got = st.derive(st.df.withColumn("e",
        graft.functions.Aggregators.emaVec(
          org.apache.spark.sql.functions.array(
            col("value").cast("double"), (col("value") * 10).cast("double")), 0.25)
          .over(st.wRun)))
      .df.orderBy("seq").select("e").collect()
      .map(_.getSeq[Double](0).toList).toList
    val e1 = array.map(_.toDouble).tail
      .scanLeft(array.head.toDouble)((acc, x) => acc * 0.75 + x * 0.25)
    val e2 = array.map(_.toDouble * 10).tail
      .scanLeft(array.head.toDouble * 10)((acc, x) => acc * 0.75 + x * 0.25)
    assert(got == e1.zip(e2).map { case (a, b) => List(a, b) })
  }

  test("filter odds (select_test.py:10-12)") {
    val got = longs(seqStream(array).where(col("value") % 2 =!= 0), "value")
    assert(got == array.filter(_ % 2 != 0).map(_.toLong))
  }

  test("skip / take (select_test.py:14-20)") {
    assert(longs(seqStream(array).skip(5), "value") == (5 until 10).map(_.toLong))
    assert(longs(seqStream(array).take(5), "value") == (0 until 5).map(_.toLong))
  }

  test("takewhile / dropwhile < 5 (select_test.py:22-28)") {
    assert(longs(seqStream(array).takeWhile(col("value") < 5), "value") ==
      (0 until 5).map(_.toLong))
    assert(longs(seqStream(array).dropWhile(col("value") < 5), "value") ==
      (5 until 10).map(_.toLong))
  }

  test("changes (select_test.py:30-33)") {
    val in = Seq(1, 1, 2, 1, 2, 2, 2, 3, 1, 4, 4)
    assert(longs(seqStream(in).changes(Seq("value")), "value") ==
      Seq(1L, 2, 1, 2, 3, 1, 4))
  }

  test("unique (select_test.py:35-38)") {
    val in = Seq(1, 1, 2, 1, 2, 2, 2, 3, 1, 4, 4)
    assert(longs(seqStream(in).unique(Seq("value")), "value") == Seq(1L, 2, 3, 4))
  }

  test("last (select_test.py:40-42)") {
    assert(longs(seqStream(array).last(), "value") == Seq(9L))
  }

  test("enumerate / previous / rcount") {
    assert(longs(seqStream(array).enumerate("i"), "i") == array.map(_.toLong))
    assert(longs(seqStream(array).previous("value", "p", 2), "p") ==
      (0 until 8).map(_.toLong))
    assert(longs(seqStream(array).rcount("c", start = 10, step = 2), "c") ==
      array.map(i => 10L + 2 * i))
  }

  test("chunkwith golden (aggregate_test.py:46-49, times scaled 100x)") {
    import graft.sources.Sources
    // reference: sequence(array, 0.01).chunkwith(timer(0.029, 10))
    //   -> [[0,1,2],[3,4,5],[6,7,8],[9]]
    val src = seqStream(array) // values 0..9 at 1s intervals
    val timer = graft.engine.EventStream(
      Sources.timer(spark, 2.9, 10), keys = Nil) // ticks 2.9s, 5.8s, …
    val got = src.chunkWith(timer, "value", "chunk", "vals")
      .df.orderBy("chunk").select("vals").collect()
      .map(_.getSeq[Long](0).toList).toList
    assert(got == List(List(0L, 1, 2), List(3L, 4, 5), List(6L, 7, 8), List(9L)))
  }

  test("iterate ends at the shorter side (transform_test.py, ops/transform.py:22-35)") {
    val got = valuesOf[String](seqStream(array).iterate(Seq("a", "b", "c"), "it"), "it")
    assert(got == Seq("a", "b", "c"))
  }

  test("chunkwith emit_empty default flushes [] on silent ticks (ops/transform.py:197-200)") {
    import graft.sources.Sources
    // values at 0s and 5s; ticks each 1s (bounded at source done=5s);
    // the row at exactly 5s lands in tick@5's flush ->
    // [[100],[],[],[],[200]]
    val src = graft.engine.EventStream(
      Sources.fromLongs(spark, Seq(100L, 200L), intervalSec = 5.0), keys = Nil)
    val timer = graft.engine.EventStream(Sources.timer(spark, 1.0, 30), keys = Nil)
    val got = src.chunkWith(timer, "value", "chunk", "vals")
      .df.orderBy("chunk").select("vals").collect()
      .map(_.getSeq[Long](0).toList).toList
    assert(got == List(List(100L), Nil, Nil, Nil, List(200L)))
    // emitEmpty=false drops the silent flushes
    val noEmpty = src.chunkWith(timer, "value", "chunk", "vals", emitEmpty = false)
      .df.orderBy("chunk").select("vals").collect()
      .map(_.getSeq[Long](0).toList).toList
    assert(noEmpty == List(List(100L), List(200L)))
  }

  test("chunkwith: global timer fans out over a keyed source") {
    import graft.sources.Sources
    import org.apache.spark.sql.Encoders
    // user 1: rows at 0s,1s,4s; user 2: row at 2s. ticks each 2s.
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong)
    val rows = Seq((1L, 0L, 0L, 10L), (1L, 1L, 1_000_000L, 11L),
      (1L, 2L, 4_000_000L, 12L), (2L, 0L, 2_000_000L, 20L))
    val df = spark.createDataset(rows).toDF("user_id", "seq", "ts_us", "value")
      .select(col("user_id"), col("seq"), timestamp_micros(col("ts_us") + 1704067200000000L).as("ts"), col("value"))
    val src = graft.engine.EventStream(df, keys = Seq("user_id"))
    val timer = graft.engine.EventStream(Sources.timer(spark, 2.0, 10), keys = Nil)
    val got = src.chunkWith(timer, "value", "chunk", "vals")
      .df.orderBy("user_id", "chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](3).toList)).toList
    // u1: tick@2 -> [10,11] (0s,1s); tick@4 -> [12] (at exactly 4s); done: nothing
    // u2: tick@2 -> [20] (at exactly 2s)
    assert(got == List((1L, 0L, List(10L, 11L)), (1L, 1L, List(12L)), (2L, 0L, List(20L))))
  }

  test("mapAsync: ordered bounded-parallel map (transform_test.py:92-115)") {
    import spark.implicits._
    val ds = spark.createDataset((0 until 50).map(_.toLong))
    val got = graft.engine.EventStream
      .mapAsync[Long, Long](ds, x => x * x, taskLimit = 4)
      .collect().toList
    assert(got.sorted == (0 until 50).map(i => i.toLong * i).toList)
    // ordered within partition: per-partition outputs are monotone
    val perPart = graft.engine.EventStream
      .mapAsync[Long, Long](ds.repartitionByRange(2, $"value"), x => x * x, 4)
      .mapPartitions(it => Iterator(it.toList)).collect()
    perPart.foreach(l => assert(l == l.sorted))
  }

  test("mapAsync timeout converts slow or failing calls to NO_VALUE (transform.py:252-253,283-288)") {
    import spark.implicits._
    val ds = spark.createDataset((0L until 6L).toSeq).repartition(1)
    val got = graft.engine.EventStream
      .mapAsyncTimeout[Long, Long](ds, x => {
        if (x == 2L) Thread.sleep(30000) // far past the timeout
        if (x == 4L) throw new RuntimeException("boom") // error -> NO_VALUE too
        x * x
      }, taskLimit = 4, timeoutSec = 1.0)
      .collect().toList
    assert(got == List(Some(0L), Some(1L), None, Some(9L), None, Some(25L)))
  }

  test("pipe composes operator chains (event.py:259-282)") {
    val double = (s: graft.engine.EventStream) => s.mapPayload("value" -> col("value") * 2)
    val positive = (s: graft.engine.EventStream) => s.where(col("value") > 0)
    val got = longs(seqStream(array).pipe(double, positive), "value")
    assert(got == array.filter(_ > 0).map(_ * 2L))
  }

  test("pluck nested attrs golden (transform_test.py:66-83)") {
    // Person(name, address:(city, street, ...)); pluck('0.name',
    // '.address.street') -> [('Max','Levelstreet'), ...]
    val data = Seq(
      ("Max", ("Delft", "Levelstreet")),
      ("Elena", ("Leiden", "Punt")),
      ("Fem", ("Rotterdam", "Burgundy")))
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.tuple(
      Encoders.STRING, Encoders.tuple(Encoders.STRING, Encoders.STRING))
    val df = spark.createDataset(data).toDF("name", "address")
      .select(col("name"), col("address").cast("struct<city:string,street:string>"))
    val got = df.select(col("name"), col("address.street").as("street"))
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(got == List(("Max", "Levelstreet"), ("Elena", "Punt"), ("Fem", "Burgundy")))
  }

  test("sync star map golden (transform_test.py:85-90)") {
    // map(i -> (i,i)).star().map((x,y) -> x/2 - y)
    val got = seqStream(array)
      .mapPayload("p" -> struct(col("value").as("x"), col("value").as("y")))
      .mapPayload("r" -> (col("p.x") / 2.0 - col("p.y")))
      .df.orderBy("seq").select("r").collect().map(_.getDouble(0)).toList
    assert(got == array.map(i => i / 2.0 - i).toList)
  }

  test("withGlobalSeq: contiguous order-respecting ids across partitions") {
    import graft.sources.Sources
    val df = spark.range(0, 1000).select((col("id") * 7919 % 1000).as("v"))
      .repartition(8) // deliberately scrambled across partitions
    val seqd = Sources.withGlobalSeq(df, Seq(col("v")), "gseq", numPartitions = 8)
    assert(seqd.rdd.getNumPartitions > 1) // not a single-partition sort
    val rows = seqd.orderBy("gseq").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).toSeq == (0L until 1000L))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }
}
