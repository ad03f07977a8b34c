package graft

import org.apache.spark.sql.functions._
import graft.engine.EventStream
import graft.sources.Sources

/**
 * Combination-operator goldens from `/root/reference/tests/combine_test.py`.
 * The reference uses real sleeps; here time is data: source k's rows are
 * shifted by `delaySec` exactly like `.delay(...)` in the tests.
 */
class CombineSpec extends SparkSpec {
  private val a1 = (0 until 10).map(_.toLong)
  private val a2 = (100 until 110).map(_.toLong)
  private val a3 = (200 until 210).map(_.toLong)

  private def src(vals: Seq[Long], intervalSec: Double, delaySec: Double): EventStream =
    EventStream(Sources.fromLongs(spark, vals, intervalSec), keys = Nil)
      .delay(s"${math.round(delaySec * 1e6)} MICROSECONDS")

  test("merge interleaves by time (combine_test.py:12-18)") {
    val m = EventStream.merge(Seq(src(a1, 0.01, 0), src(a2, 0.01, 0.001)), "src", "o")
    val got = m.df.orderBy("o").select("value").collect().map(_.getLong(0)).toSeq
    assert(got == a1.zip(a2).flatMap { case (x, y) => Seq(x, y) })
  }

  test("switch: [0, 100] ++ 200..209 (combine_test.py:19-24)") {
    val s = EventStream.switch(
      Seq(src(a1, 0.01, 0), src(a2, 0.01, 0.001), src(a3, 0.01, 0.002)), "src", "o")
    val got = s.df.orderBy("o").select("value").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 100L) ++ a3)
  }

  test("concat: earlier source killed at later source's first emit (combine_test.py:26-31)") {
    val c = EventStream.concat(Seq(src(a1, 0.02, 0), src(a2, 0.02, 0.07)), "src", "o")
    val got = c.df.orderBy("o").select("value").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1, 2, 3) ++ a2)
  }

  test("chain: full source i before i+1 (combine_test.py:33-37)") {
    val c = EventStream.chain(Seq(src(a1, 0.01, 0), src(a2, 0.01, 0.001)), "src", "o")
    val got = c.df.orderBy("o").select("value").collect().map(_.getLong(0)).toSeq
    assert(got == a1 ++ a2)
  }

  test("zip pairs positionally; self-zip (combine_test.py:39-48)") {
    val z = EventStream.zip(src(a1, 1, 0), src(a2, 1, 0.001), "i")
    val got = z.df.orderBy("i").select("value", "value_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == a1.zip(a2))

    val e1 = src(a1, 1, 0)
    val zs = EventStream.zip(e1, e1, "i")
    val gotSelf = zs.df.orderBy("i").select("value", "value_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotSelf == a1.zip(a1))
  }

  test("ziplatest with NO_VALUE priming (combine_test.py:50-55)") {
    val z = EventStream.ziplatest(
      Seq(src(Seq(0L, 1L), 0.01, 0), src(Seq(2L, 3L), 0.01, 0.001)),
      valueCol = "value", outCols = Seq("v0", "v1"), partial = true, srcAs = "src")
    val got = z.df.orderBy("ts", "src").select("v0", "v1").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    assert(got == Seq(
      (Some(0L), None), (Some(0L), Some(2L)), (Some(1L), Some(2L)), (Some(1L), Some(3L))))
  }
}
