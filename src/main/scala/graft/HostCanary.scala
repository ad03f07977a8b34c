package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Frozen host-speed canary — the same-session anchor every perf
 * artifact carries so round-over-round numbers are readable on a host
 * whose speed drifts 2-3× within a day (measured in round 9: identical
 * r8 code 2.7-3.4× slower than its own recorded artifacts; intra-day
 * spread ~2.4× on q_triangles).
 *
 * The workload is CODE-INDEPENDENT on purpose: only Spark built-ins
 * over `range` and one fixture scan, so it times the HOST (CPU, JIT,
 * shuffle machinery, parquet I/O) and never the library under test.
 * `BENCH_rN.json` / `REGSCAN_rN.json` carry `canary_sec`, and SCALE.md
 * states perf bars as query_sec / canary_sec.
 *
 * DO NOT EDIT the workload constants: cross-round comparability of
 * every committed artifact depends on this being frozen (r10+).
 */
object HostCanary {

  /** One composite pass: codegen'd hash fold (CPU/JIT), a 64k-key
    * groupBy (shuffle machinery), and a full lineitem scan-aggregate
    * (parquet I/O). Returns seconds. */
  private def onePass(spark: SparkSession, sfDir: String): Double = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cpu = time {
      // modulo before the sum: 64M full-range hash longs would overflow
      // the ANSI sum; 64M × 1e9 stays far inside Long
      spark.range(0, 64L * 1024 * 1024, 1, 32)
        .select(sum(xxhash64(col("id")) % 1000000007L)).collect()
    }
    val shuffle = time {
      spark.range(0, 8L * 1024 * 1024, 1, 32)
        .groupBy((col("id") % 65536).as("k"))
        .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
        .select(sum(col("s") + col("c"))).collect()
    }
    val scan = time {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(sum(col("l_extendedprice")), avg(col("l_discount")),
          count(lit(1))).collect()
    }
    cpu + shuffle + scan
  }

  /** min-of-`passes` composite seconds (min strips noisy-neighbor
    * interference and JIT ramp, same as the bench protocol). */
  def canarySec(spark: SparkSession, sfDir: String, passes: Int = 3): Double =
    (1 to passes).map(_ => onePass(spark, sfDir)).min

  /**
   * JOB-FLOOR canary (new in r11, a SECOND frozen metric — the
   * composite above is untouched): seconds for 24 near-empty scheduled
   * jobs (one 4-task stage each), i.e. the per-job scheduling latency
   * the sf-scale registry tail is bound by (JobProbe r10/r11: the
   * ANN/graph tail is job-count × this floor, NOT compute). The
   * compute-bound composite canary does not track this floor — r11
   * measured them moving independently — so latency-bound bars divide
   * by THIS anchor instead. Emitted as `canary_job_sec`. Needs no
   * fixture (unlike [[canarySec]]): the probe jobs are synthetic
   * ranges, pure scheduler latency.
   */
  def canaryJobSec(spark: SparkSession, passes: Int = 3): Double =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < 24) { spark.range(0, 4, 1, 4).count(); i += 1 }
      (System.nanoTime() - t0) / 1e9
    }.min
}
