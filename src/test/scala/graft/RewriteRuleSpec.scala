package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteIntervalJoin

/** The injected optimizer rule: natural BETWEEN range joins re-planned
  * as the bucketed equi-join, bit-identical results. */
class RewriteRuleSpec extends SparkSpec {

  private def iv = spark.range(200).select(
    col("id").as("iv_id"),
    (col("id") * 37 % 1000).as("lo"))
    // every 5th interval is EMPTY (hi < lo) and must match nothing
    .withColumn("hi",
      when(col("iv_id") % 5 === 0, col("lo") - 10).otherwise(col("lo") + 50))
    // one WILDLY inverted interval: without the empty-bounds guard the
    // bucket sequence would descend through ~10^10 phantom buckets
    .withColumn("lo", when(col("iv_id") === 1, lit(1000000000000L)).otherwise(col("lo")))
    .withColumn("hi", when(col("iv_id") === 1, lit(0L)).otherwise(col("hi")))

  private def pt = spark.range(500).select(
    col("id").as("pt_id"),
    // one null point: must match nothing under either plan
    when(col("id") === 0, lit(null).cast("long"))
      .otherwise(col("id") * 91 % 1100).as("p"))

  private def joined = {
    val i = iv; val p = pt
    i.join(p, p("p") >= i("lo") && p("p") <= i("hi"))
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("iv_id", "pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("RewriteIntervalJoin: BNLJ becomes a bucketed equi-join, results identical") {
    // built-in planner: nested loop (the quadratic fallback)
    val naivePlan = joined.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
    val expect = pairs(joined)
    assert(expect.nonEmpty)

    spark.experimental.extraOptimizations = Seq(RewriteIntervalJoin())
    try {
      spark.conf.set("spark.graft.intervalJoin.bucketWidth", "64")
      val rePlan = joined.queryExecution.executedPlan.toString
      // The hot path is the bucketed equi-join; the only nested loop
      // left is the wide-row fallback branch, whose input is filtered
      // to span > maxFanout (empty here — every interval is narrow).
      assert(rePlan.contains("Generate explode"), s"bucket fanout missing:\n$rePlan")
      assert(rePlan.split("BroadcastNestedLoopJoin").length - 1 <= 1,
        s"only the bounded fallback branch may nest-loop:\n$rePlan")
      assert(pairs(joined) == expect)

      // a width that misaligns with every interval still agrees (width
      // is a performance knob, never a correctness knob)
      spark.conf.set("spark.graft.intervalJoin.bucketWidth", "7")
      assert(pairs(joined) == expect)

      // fanout guard: with a tiny cap EVERY interval routes through the
      // wide-row fallback — results must still be identical (the guard
      // trades plan shape, never rows)
      spark.conf.set("spark.graft.intervalJoin.maxFanout", "0")
      assert(pairs(joined) == expect)
      spark.conf.unset("spark.graft.intervalJoin.maxFanout")

      // kill switch restores the built-in plan
      spark.conf.set("spark.graft.intervalJoin.enabled", "false")
      assert(joined.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset("spark.graft.intervalJoin.enabled")
      spark.conf.unset("spark.graft.intervalJoin.bucketWidth")
    }
  }

  test("RewriteIntervalJoin: leaves non-range joins untouched") {
    spark.experimental.extraOptimizations = Seq(RewriteIntervalJoin())
    try {
      val a = spark.range(10).select(col("id").as("k"), (col("id") * 2).as("va"))
      val b = spark.range(10).select(col("id").as("k2"), (col("id") * 3).as("vb"))
      val eq = a.join(b, a("k") === b("k2"))
      assert(eq.count() == 10)
      assert(!eq.queryExecution.executedPlan.toString.contains("Generate explode"))
      // one-sided inequality only: not the pattern, stays as planned
      val oneSided = a.join(b, a("k") <= b("k2"))
      assert(oneSided.count() == 55)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("per-group top-k: rank filter triggers WindowGroupLimit pushdown") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1000).select((col("id") % 7).as("g"), col("id").as("v"))
    val topk = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc)))
      .filter(col("rn") <= 3)
    // partial (pre-shuffle) + final group-limit: the exchange carries
    // only k rows per group per input partition, not the whole table
    assert(topk.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val got = topk.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (0L until 7L).flatMap { g =>
      val vs = (0L until 1000L).filter(_ % 7 == g).sortBy(-_).take(3)
      vs.zipWithIndex.map { case (v, i) => (g, v, i + 1) }
    }.toSet
    assert(got == want)
  }
}
