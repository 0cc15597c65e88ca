package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an additive materialized aggregate — the
  * classic delta-propagation result (self-maintainable views over
  * SUM/COUNT): a change log touches only its own (day, type) groups,
  * so the daily refresh costs the CHANGED keys, never a recompute of
  * the 100 TB history. The same touched-data-cost / full-rebuild-result
  * contract as the index maintainers (`Retrieval.updateLexIndex`,
  * `Dedup.updateMinhashIndex`), applied to the aggregate layer.
  *
  * Sums go through DECIMAL so merge order cannot matter and the
  * refreshed view is BIT-EQUAL to a recompute (spec-gated, both
  * directions of `except`).
  *
  * Loud-never-silent ledger rules: an unknown op code fails the job
  * (`raise_error`); an over-delete leaves a NEGATIVE count row in the
  * output — visible, never clamped or dropped; a group only vanishes
  * when it reaches exactly (n = 0, sum = 0), i.e. its inserts and
  * deletes cancelled completely. A delete whose value does not match
  * what was inserted leaves (n = 0, sum ≠ 0) — kept, the integrity
  * signal.
  */
object Materialized {

  /** The base view: per (day, `typeCol`) row count and exact DECIMAL
    * value sum. One partial-aggregated shuffle.
    */
  def dailyAgg(df: DataFrame, typeCol: String, tsCol: String,
               valueCol: String): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"), col(typeCol))
      .agg(count(lit(1)).as("n"),
        // pin the post-aggregate type: Spark widens SUM(decimal(18,2))
        // to (28,2), which would make refresh-vs-recompute equality a
        // type mismatch instead of a value check
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("sum_value"))

  /** Apply a change log with `opCol` ∈ {'I', 'D'} to a `dailyAgg`
    * view. Scale shape: the change log collapses to its touched keys
    * in one partial-aggregated shuffle, then ONE full-outer equi-join
    * against the view on the (day, type) key — with the view bucketed
    * on that key, the join is co-located and the untouched history
    * never moves.
    */
  def refreshDailyAgg(view: DataFrame, changes: DataFrame, typeCol: String,
                      tsCol: String, valueCol: String,
                      opCol: String): DataFrame = {
    val sign = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
      .otherwise(expr(
        s"raise_error(concat('refreshDailyAgg: unknown op ', $opCol))"))
    val delta = changes
      .select(to_date(col(tsCol)).as("day"), col(typeCol),
        sign.as("__s"), col(valueCol).cast("decimal(18,2)").as("__v"))
      .groupBy(col("day"), col(typeCol))
      .agg(sum(col("__s")).as("__dn"),
        sum(col("__v") * col("__s").cast("decimal(18,2)")).as("__dv"))
    view.join(delta, Seq("day", typeCol), "full_outer")
      .select(col("day"), col(typeCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n"),
        (coalesce(col("sum_value"), lit(BigDecimal(0)).cast("decimal(18,2)"))
          + coalesce(col("__dv"), lit(BigDecimal(0)).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_value"))
      .filter(!(col("n") === 0L && col("sum_value") === lit(BigDecimal(0))))
  }
}
