package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 build — the warehouse-classic
  * history table (Kimball): a stream of (key, ts, value) change events
  * becomes one row per VERSION with a [valid_from, valid_to) validity
  * interval, `valid_to` NULL on the current row. The batch compaction
  * dual of the streaming episode upserts (L-148) and the interval
  * representation of what LOCF (L-149) reads back out point-in-time.
  */
object Scd2 {

  /** Temporal-integrity audit for any [from, to) interval table — the
    * data-contract gate for dimension tables, session windows and
    * SCD2 output: per key, interval count, GAP count (next interval
    * opens after this one closes), OVERLAP count (next opens before
    * this closes), zero-width count, open-interval count (to IS
    * NULL — at most one is legal, and only at the end), and the
    * verdict `tiles` = a perfect gap-free overlap-free tiling with
    * at most one trailing open interval. Counts, never booleans
    * alone — how broken matters (the DataContract philosophy). One
    * key-partitioned window under the deterministic (from, to)
    * order; an SCD2 build that violates this audit is a bug BY
    * DEFINITION (the tiling contract), which makes this the
    * executable form of that contract for FOREIGN interval data too.
    */
  def intervalAudit(df: DataFrame, keyCol: String, fromCol: String,
                    toCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // asc_nulls_last: Spark defaults NULLs FIRST ascending, DuckDB
    // LAST — the open interval must sort after closed ones on BOTH
    // engines (the automation-screen NULL-ordering trap, pinned)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__f").asc, col("__t").asc_nulls_last)
    df.select(col(keyCol), col(fromCol).as("__f"), col(toCol).as("__t"))
      .withColumn("__nf", lead(col("__f"), 1).over(w))
      .withColumn("__last", lead(col("__f"), 1).over(w).isNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(when(col("__nf").isNotNull && col("__t").isNotNull &&
          col("__nf") > col("__t"), 1L).otherwise(0L)).as("n_gaps"),
        sum(when(col("__nf").isNotNull &&
          (col("__t").isNull || col("__nf") < col("__t")), 1L)
          .otherwise(0L)).as("n_overlaps"),
        sum(when(col("__t").isNotNull && col("__t") <= col("__f"), 1L)
          .otherwise(0L)).as("n_zero_width"),
        sum(when(col("__t").isNull, 1L).otherwise(0L)).as("n_open"),
        sum(when(col("__t").isNull && !col("__last"), 1L).otherwise(0L))
          .as("n_open_not_last"))
      .withColumn("tiles",
        col("n_gaps") === 0L && col("n_overlaps") === 0L &&
          col("n_zero_width") === 0L && col("n_open") <= 1L &&
          col("n_open_not_last") === 0L)
  }

  /** Build the SCD2 history: per key, order change events by
    * (ts, tie), collapse CONSECUTIVE duplicates (a no-op change must
    * not open a new version — re-publishing the same value is not
    * history), then each surviving change opens a version closed by
    * the next one's `valid_from` (half-open intervals, so versions
    * TILE: valid_to(i) = valid_from(i+1) exactly, no gaps, no
    * overlaps — an executed law). Version numbers restart at 1 per
    * key. If several changes share one (ts, tie) the LAST under the
    * (ts, tie, value) order wins deterministically — but zero-width
    * versions are collapsed out rather than emitted (a [t, t)
    * interval matches no point-in-time query and would be dead
    * history).
    *
    * Scale shape: the boundary-flag lag, the running version sum and
    * the final collapse all ride ONE key Exchange (the `episodes`
    * pattern) — a 100 TB change log builds its dimension without
    * leaving its key partition. Join-free, plan-gated.
    */
  def build(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            valueCol: String): DataFrame = {
    // (ts, tie, value) order: value as the FINAL tie makes the
    // version chain deterministic even when the tie column itself
    // collides across two different values at one instant
    val wo = Window.partitionBy(col("key"))
      .orderBy(col("__ts"), col("__tie"), col("value"))
    val flagged = df
      .select(col(keyCol).as("key"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(valueCol).as("value"))
      .withColumn("__prev", lag(col("value"), 1).over(wo))
      // a version boundary: first event of the key, or a value change
      .withColumn("__new", when(col("__prev").isNull ||
        col("__prev") =!= col("value"), 1L).otherwise(0L))
      .withColumn("__ver", sum(col("__new")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = flagged
      .groupBy(col("key"), col("__ver").as("version"))
      .agg(min(col("__ts")).as("valid_from"), max(col("value")).as("value"))
    val wv = Window.partitionBy(col("key")).orderBy(col("version"))
    val kept = versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      // zero-width versions ([t, t)) are unobservable — drop them and
      // renumber so the version chain stays dense
      .filter(col("valid_to").isNull || col("valid_to") =!= col("valid_from"))
    // Second consecutive-duplicate collapse: dropping a zero-width
    // version can butt two SAME-value versions against each other
    // (per key A@t1, then B and A colliding at t2 — B's [t2, t2) is
    // dropped, leaving A[t1,t2) followed by A[t2,…)), which would
    // violate the no-op-change contract (r9 advisor). Merge adjacent
    // equal-value versions, keeping the earlier valid_from; because
    // the kept versions still TILE, valid_to is re-derived as the
    // next merged version's valid_from — exact, not an approximation.
    // The versions table is per-key-tiny, so the extra window +
    // partial-aggregated collapse is noise next to the event scan.
    val merged = kept
      .withColumn("__p2", lag(col("value"), 1).over(wv))
      .withColumn("__n2", when(col("__p2").isNull ||
        col("__p2") =!= col("value"), 1L).otherwise(0L))
      .withColumn("__mver", sum(col("__n2")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("__mver"))
      .agg(min(col("valid_from")).as("valid_from"), max(col("value")).as("value"))
    val wm = Window.partitionBy(col("key")).orderBy(col("__mver"))
    merged
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wm))
      .withColumn("version", row_number().over(wm).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("key"), col("version"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Point-in-time join of a fact table against an SCD2 dimension
    * (the lakehouse consumption pattern `build` exists for): each
    * fact row picks the dimension version whose half-open
    * [valid_from, valid_to) interval contains its timestamp. Because
    * versions TILE (build's executed law), every fact at or after its
    * key's first version matches EXACTLY ONE row — also an executed
    * law here; facts BEFORE the first version (or with no dimension
    * key at all) surface with a NULL version, never dropped.
    *
    * Scale shape: one key equi-join with the interval predicate as
    * post-filter — SCD2 versions per key are few, so this is the
    * plain dimension-join shape (broadcast when the dimension is
    * small, key-partitioned otherwise; AQE decides), NOT the
    * bucketed interval-join machinery built for high-cardinality
    * overlapping intervals.
    */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
              tsCol: String): DataFrame = {
    val d = dim.select(col("key").as("__k"), col("version"), col("value"),
      col("valid_from"), col("valid_to"))
    facts.join(d,
        facts(keyCol) === col("__k") &&
          facts(tsCol) >= col("valid_from") &&
          (col("valid_to").isNull || facts(tsCol) < col("valid_to")),
        "left")
      .drop("__k")
  }
}
