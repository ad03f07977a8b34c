package graft

import org.apache.spark.sql.functions._
import graft.engine.EventStream
import graft.sources.Sources

/** Reference ops treat an already-done (empty) source as done
  * immediately (`ops/op.py:50-51`); every batch encoding must return
  * empty, not throw. */
class EmptyStreamSpec extends SparkSpec {

  private def empty: EventStream = seqStream(Nil)

  test("selection/transform ops on an empty stream are empty") {
    assert(empty.where(col("value") > 0).df.count() === 0)
    assert(empty.skip(3).df.count() === 0)
    assert(empty.take(3).df.count() === 0)
    assert(empty.takeWhile(col("value") < 5).df.count() === 0)
    assert(empty.dropWhile(col("value") < 5).df.count() === 0)
    assert(empty.changes(Seq("value")).df.count() === 0)
    assert(empty.unique(Seq("value")).df.count() === 0)
    // reference Last emits NO_VALUE -> NULL on an empty source
    // (ops/select.py:133-145): one all-null row
    val lastRows = empty.last().df.collect()
    assert(lastRows.length === 1 && lastRows.head.isNullAt(0))
    assert(empty.enumerate("i").df.count() === 0)
    assert(empty.iterate(Seq("a"), "it").df.count() === 0)
    assert(empty.previous("value", "p").df.count() === 0)
    assert(empty.pairwise("value", "p").df.count() === 0)
    assert(empty.chunk("value", 3, "ci", "vals").df.count() === 0)
    assert(empty.rsum(col("value"), "rs").df.count() === 0)
    assert(empty.deque(col("value"), 3, "w").df.count() === 0)
    // reference List emits [] on done (ops/aggregate.py:130-143): one
    // row with an empty list, not zero rows
    val listRows = empty.list("value", "all").df.collect()
    assert(listRows.length === 1 && listRows.head.getSeq[Long](listRows.head.length - 1).isEmpty)
  }

  test("round-5 text/graph operators on empty input are empty, not throwing") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val noDocs = spark.createDataset(Seq.empty[(Long, String)]).toDF("doc_id", "text")
    assert(graft.text.TextOps.bm25(noDocs, "doc_id", "text", Seq("a", "b"), 5).count() === 0)
    assert(graft.text.TextOps.spanDedup(noDocs, "doc_id", "text", 3).count() === 0)
    val noDocsSrc = noDocs.withColumn("source", lit("s"))
    assert(graft.text.TextOps.boilerplate(
      noDocsSrc, "doc_id", "text", "source", 3, 2).count() === 0)
    implicit val encE = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val noEdges = spark.createDataset(Seq.empty[(Long, Long)]).toDF("a", "b")
    assert(graft.engine.PageRank.run(noEdges, "a", "b", 2).count() === 0)
    val noIv = spark.createDataset(Seq.empty[(Long, Long)]).toDF("lo", "hi")
    val noPt = spark.createDataset(Seq.empty[(Long, Long)]).toDF("p", "pid")
    assert(graft.engine.IntervalJoin.pointsInIntervals(
      noIv, noPt, "lo", "hi", "p", 10L).count() === 0)
  }

  test("combination ops with an empty side") {
    val nonEmpty = seqStream(Seq(1, 2, 3))
    assert(EventStream.zip(nonEmpty, empty, "i").df.count() === 0)
    assert(EventStream.merge(Seq(nonEmpty, empty), "src", "os").df.count() === 3)
    assert(EventStream.chain(Seq(empty, nonEmpty), "src", "os").df.count() === 3)
    assert(EventStream.ziplatest(Seq(nonEmpty, empty), "value",
      Seq("a", "b"), partial = true, "src").df.count() === 3)
  }

  test("timing ops on an empty stream are empty") {
    assert(empty.delay("10 SECONDS").df.count() === 0)
    assert(empty.debounce(1.0).df.count() === 0)
    assert(empty.throttle(1, 1.0).df.count() === 0)
    val timer = graft.engine.EventStream(Sources.timer(spark, 1.0, 3), keys = Nil)
    assert(empty.chunkWith(timer, "value", "ci", "vals").df.count() === 0)
    assert(empty.sample(timer, Seq("value")).df.count() === 0)
  }
}
