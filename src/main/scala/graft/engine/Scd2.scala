package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension type-2 merge (Kimball) — the dimension-
 * maintenance primitive of a warehouse/training-metadata pipeline:
 * apply a CDC batch of new attribute values to a versioned dimension,
 * closing the validity interval of changed rows and opening a new
 * current row, while no-op updates (same value) create NO new version.
 *
 * Contract: `dim` carries one or more versions per key; rows with
 * `validTo IS NULL` are current, all others are immutable history.
 * `updates` carries (key, tracked..., eff). Multiple updates for a key
 * in one batch collapse deterministically to the latest by `eff`
 * (ties by tracked-value struct order) — the standard "latest CDC
 * event wins within a batch" rule. An update whose key has no current
 * row INSERTS an opened row (non-tracked dim columns NULL); an update
 * effective before the current row's `validFrom` fails loudly
 * (in-plan `raise_error`) rather than writing an inverted interval.
 *
 * Scale shape: history passes through untouched (narrow filter); the
 * merge itself is ONE left join of the current slice against the
 * collapsed batch — broadcast when the batch is small (the daily-CDC
 * norm; `broadcastUpdates = true`), a keyed shuffle join otherwise —
 * and the two output rows of a changed key are produced by a single
 * array+explode over that join, so the join is executed once, not once
 * per output branch. No driver data, no window.
 */
object Scd2 {

  /**
   * @param dim       versioned dimension: key, tracked..., validFrom,
   *                  validTo (null = current row)
   * @param updates   CDC batch: key, tracked..., effCol
   * @param key       join key column name
   * @param tracked   attribute columns whose change opens a new version
   * @param effCol    update effective-time column (same type as
   *                  validFrom/validTo)
   * @return the merged dimension with the same schema as `dim`
   */
  def merge(dim: DataFrame, updates: DataFrame, key: String,
            tracked: Seq[String], effCol: String,
            validFrom: String = "valid_from", validTo: String = "valid_to",
            broadcastUpdates: Boolean = true): DataFrame = {
    require(tracked.nonEmpty, "need at least one tracked column")
    val outCols = dim.columns.toSeq
    // latest-wins collapse of the batch: max(struct(eff, tracked...))
    // is deterministic for any arrival order
    val collapsed = updates.groupBy(col(key))
      .agg(max(struct((effCol +: tracked).map(col): _*)).as("__u"))
      .select(col(key) +: ((effCol +: tracked)
        .map(c => col(s"__u.$c").as(s"__u_$c"))): _*)
    val u = if (broadcastUpdates) broadcast(collapsed) else collapsed
    val hist = dim.filter(col(validTo).isNotNull)
    val cur = dim.filter(col(validTo).isNull)
    // null-safe "any tracked attribute differs"
    val changed = col(s"__u_$effCol").isNotNull &&
      tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    def asRow(cols: Map[String, org.apache.spark.sql.Column]) =
      struct(outCols.map(c => cols.getOrElse(c, col(c)).as(c)): _*)
    val keepRow = asRow(Map.empty)
    // an update effective BEFORE the current row's validity start would
    // write an inverted interval (valid_to < valid_from) — out-of-order
    // CDC must fail loudly, not corrupt the dimension (evaluated only
    // on the changed branch, so in-order batches never pay it)
    val guardedEff = when(col(s"__u_$effCol") < col(validFrom),
      raise_error(concat(
        lit(s"scd2: out-of-order update for key "), col(key).cast("string"),
        lit(s": eff "), col(s"__u_$effCol").cast("string"),
        lit(" < current valid_from "), col(validFrom).cast("string"))))
      .otherwise(col(s"__u_$effCol"))
    val closedRow = asRow(Map(validTo -> guardedEff))
    val openedRow = asRow(
      tracked.map(c => c -> col(s"__u_$c")).toMap ++
        Map(validFrom -> col(s"__u_$effCol"),
          validTo -> lit(null).cast(dim.schema(validTo).dataType)))
    val merged = cur.join(u, Seq(key), "left")
      .select(explode(when(changed, array(closedRow, openedRow))
        .otherwise(array(keepRow))).as("__r"))
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
    // Updates whose key has NO current row (brand-new key, or a key
    // whose history was fully closed) must INSERT an opened row — a
    // left-join-onto-current-only merge would silently drop them
    // (Delta MERGE's whenNotMatched branch). Non-key, non-tracked,
    // non-validity dim columns are NULL for such rows.
    val insertCand = collapsed.join(cur.select(col(key)), Seq(key), "left_anti")
    // The insert branch gets the SAME out-of-order guard as the matched
    // branch: for a key whose history is fully closed, an eff before
    // the last closed row's validTo would silently write OVERLAPPING
    // history. The history side is semi-filtered by the (small) insert
    // keys first, so the guard costs one narrow pass + a tiny agg, not
    // a dimension-wide shuffle. Brand-new keys (no history) pass.
    val candKeys = insertCand.select(col(key))
    val histMax = hist
      .join(if (broadcastUpdates) broadcast(candKeys) else candKeys,
        Seq(key), "left_semi")
      .groupBy(col(key)).agg(max(col(validTo)).as("__hist_max"))
    val guardedFrom = when(
      col("__hist_max").isNotNull && col(s"__u_$effCol") < col("__hist_max"),
      raise_error(concat(
        lit("scd2: out-of-order insert for key "), col(key).cast("string"),
        lit(": eff "), col(s"__u_$effCol").cast("string"),
        lit(" < last closed valid_to "), col("__hist_max").cast("string"))))
      .otherwise(col(s"__u_$effCol"))
    val inserted = insertCand
      .join(if (broadcastUpdates) broadcast(histMax) else histMax,
        Seq(key), "left")
      .select(outCols.map { c =>
        if (c == key) col(key)
        else if (tracked.contains(c)) col(s"__u_$c").as(c)
        else if (c == validFrom) guardedFrom.as(validFrom)
        else lit(null).cast(dim.schema(c).dataType).as(c)
      }: _*)
    hist.unionByName(merged).unionByName(inserted)
  }
}
