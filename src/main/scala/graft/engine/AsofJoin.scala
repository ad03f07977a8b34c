package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the most recent right row with
 * the same key and `ts <= left.ts` (inclusive; LEFT semantics — no
 * match ⇒ NULL payload). The time-series join a training pipeline needs
 * to stamp events with the prevailing state (latest model version,
 * latest quote, latest config) without a range join.
 *
 * Scale shape: implemented as tag → union → ONE keyed window scan
 * (`last(..., ignoreNulls)` carries the latest right payload forward),
 * i.e. a single hash shuffle on the key + a per-key sort — linear in
 * rows. The naive formulation (`l JOIN r ON key AND r.ts <= l.ts` +
 * max-per-left aggregate) materializes a quadratic per-key cross term
 * that a wide key (active user, hot symbol) turns into a straggler at
 * 100 TB; the union form cannot: each input row is scanned exactly
 * once. Spark has no native as-of join (pandas-on-Spark `merge_asof`
 * drops to the same union-window trick internally).
 */
object AsofJoin {

  /**
   * @param left         rows to stamp (kept in full)
   * @param right        reference stream; only `key`, `ts`, `payload`
   *                     columns are read
   * @param key          equi-join key column (both sides)
   * @param ts           event-time column (both sides); ties between a
   *                     left and right row at the same instant count as
   *                     a match (`>=`, DuckDB ASOF semantics)
   * @param payload      right columns to carry; emitted as
   *                     `<prefix><name>`
   * @param prefix       output-column prefix for the carried payload
   */
  def asofLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns
    // Internal columns must not collide with user columns on either side.
    val taken = leftCols.toSet ++ right.columns
    def fresh(base: String) =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val side = fresh("__side")
    val p = fresh("__p")
    val m = fresh("__m")
    val pStruct = struct((ts +: payload).map(col): _*)
    // Tagged union: right rows carry the payload struct, left rows NULL.
    // `side` orders a right row BEFORE a left row at the same ts so the
    // match is inclusive.
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as(side), pStruct.as(p)) ++
        leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).as(c)): _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as(side),
        lit(null).cast(r.schema(p).dataType).as(p)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    // Final `p` term breaks ties among right rows sharing (key, ts)
    // deterministically (struct ordering ⇒ the greatest payload wins);
    // without it the carried row is whichever the sort happened to put
    // last, which can disagree run-to-run and with the oracle.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side), col(p))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn(m, last(col(p), ignoreNulls = true).over(w))
    carried.filter(col(side) === 1)
      .select(leftCols.toIndexedSeq.map(col) ++
        (ts +: payload).map(c => col(s"$m.$c").as(s"$prefix$c")): _*)
  }
}
