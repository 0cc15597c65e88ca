package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Materialized

/** Incremental-view-maintenance laws: refresh ≡ recompute bit-for-bit
  * on a change batch mixing inserts, deletes and value updates; the
  * loud ledger rules (negative count on over-delete, kept
  * zero-count/nonzero-sum integrity rows, raise on bad op codes);
  * cancelled groups vanish.
  */
class MaterializedSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, typ, v), i) => (ts(t), typ, v, i.toLong) }
      .toDF("ts", "event_type", "value", "event_id")
  }

  private val base = Seq(
    ("2024-01-01 10:00:00", "view", 1.50),
    ("2024-01-01 11:00:00", "view", 2.25),
    ("2024-01-01 12:00:00", "click", 3.00),
    ("2024-01-02 09:00:00", "view", 4.75),
    ("2024-01-02 10:00:00", "click", 0.50))

  test("refresh over inserts + deletes + updates is bit-equal to a recompute") {
    val old = events(base: _*)
    val view = Materialized.dailyAgg(old, "event_type", "ts", "value")
    // the new state: drop the 11:00 view, re-value the 12:00 click
    // 3.00 → 3.10, add a day-3 purchase
    val changes = events(
      ("2024-01-01 11:00:00", "view", 2.25),   // D
      ("2024-01-01 12:00:00", "click", 3.00),  // D (old value)
      ("2024-01-01 12:00:00", "click", 3.10),  // I (new value)
      ("2024-01-03 08:00:00", "purchase", 9.99)) // I
      .withColumn("op", when(col("event_id") < 2L, "D").otherwise("I"))
    val refreshed = Materialized.refreshDailyAgg(
      view, changes, "event_type", "ts", "value", "op")
    val target = events(
      ("2024-01-01 10:00:00", "view", 1.50),
      ("2024-01-01 12:00:00", "click", 3.10),
      ("2024-01-02 09:00:00", "view", 4.75),
      ("2024-01-02 10:00:00", "click", 0.50),
      ("2024-01-03 08:00:00", "purchase", 9.99))
    val recomputed = Materialized.dailyAgg(target, "event_type", "ts", "value")
    assert(refreshed.schema == recomputed.schema, "types must match exactly")
    assert(refreshed.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(refreshed).isEmpty,
      "refresh must equal the full recompute")
  }

  test("over-delete leaves a loud negative count; cancelled groups vanish") {
    val old = events(base.take(1): _*) // one view row on day 1
    val view = Materialized.dailyAgg(old, "event_type", "ts", "value")
    // delete it twice: n goes to -1, sum to -1.50 — visible, not clamped
    val changes = events(
      ("2024-01-01 10:00:00", "view", 1.50),
      ("2024-01-01 10:00:00", "view", 1.50))
      .withColumn("op", lit("D"))
    val out = Materialized.refreshDailyAgg(
      view, changes, "event_type", "ts", "value", "op").collect()
    assert(out.length == 1 && out.head.getLong(2) == -1L)
    // exactly-cancelling delete: the group disappears entirely
    val clean = Materialized.refreshDailyAgg(
      view, changes.limit(1), "event_type", "ts", "value", "op")
    assert(clean.isEmpty)
    // value-mismatched delete: n = 0 but sum ≠ 0 — the row stays
    val bad = events(("2024-01-01 10:00:00", "view", 9.00))
      .withColumn("op", lit("D"))
    val kept = Materialized.refreshDailyAgg(
      view, bad, "event_type", "ts", "value", "op").collect()
    assert(kept.length == 1 && kept.head.getLong(2) == 0L &&
      kept.head.getDecimal(3).doubleValue() == -7.50,
      "an inconsistent delete must surface, never vanish")
  }

  test("unknown op codes fail the refresh loudly") {
    val old = events(base: _*)
    val view = Materialized.dailyAgg(old, "event_type", "ts", "value")
    val junk = events(("2024-01-01 10:00:00", "view", 1.50))
      .withColumn("op", lit("UPSERT"))
    val ex = intercept[Exception] {
      Materialized.refreshDailyAgg(
        view, junk, "event_type", "ts", "value", "op").collect()
    }
    assert(ex.getMessage.contains("unknown op") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown op")))
  }
}
