package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization — the distribution-matching transform
  * (microarray-famous, now the feature-scaling workhorse wherever
  * heterogeneous sources must become comparable): each group's values
  * are remapped so its empirical distribution matches a REFERENCE
  * group's, by sending the rank-r value of a group of size n to the
  * reference's exact order statistic at rank ceil(r·(n_ref+1)/(n+1)).
  * Everything is exact integers: values milli-quantize, ranks are
  * row_numbers under the (value, tie) total order, the target rank is
  * one ceiling division (numerator in DECIMAL(38,0) — r·n_ref can
  * square past BIGINT on a 10^10-row group), and the lookup is an
  * order-statistic read, never an interpolated double.
  */
object Normalize {

  /** Normalize `valueCol` per `groupCol` against the distribution of
    * the rows matching `refPred`. The reference collapses to its
    * VALUE HISTOGRAM with cumulative rank spans (the Gini rank-block
    * identity), so the order-statistic lookup is a broadcast range
    * join against a value-bounded table — the reference is never
    * globally sorted row-by-row, no matter how many rows match
    * `refPred`. Executed laws: the reference group normalizes to
    * ITSELF exactly (rank r of n maps to target rank r), the
    * transform is monotone within every group, and an empty
    * reference fails loudly (there is nothing to normalize against).
    * Tie handling is PINNED to the (value, tie) row_number order —
    * tied values spread across adjacent reference quantiles
    * deterministically, where the average-rank variant would need
    * fractional ranks and lose hash-exactness; the choice is the
    * contract, not an accident.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        tieCol: String, refPred: Column): DataFrame = {
    val quant = expr(s"CAST(floor($valueCol * 1000) AS BIGINT)")
    val hist = df.filter(refPred)
      .select(quant.as("__rv"))
      .groupBy(col("__rv")).agg(count(lit(1)).as("__m"))
    // bounded driver probe on the collapsed histogram (the pcaTrain
    // class): an empty reference must fail loud, not emit zero rows —
    // and the same probe yields nref as a plan literal
    val nRefRow = hist.agg(coalesce(sum(col("__m")), lit(0L))).head()
    val nRef = nRefRow.getLong(0)
    require(nRef > 0L, "quantileNormalize: empty reference distribution")
    val wv = Window.partitionBy(lit(0)).orderBy(col("__rv"))
    val spans = hist
      .withColumn("__hi", sum(col("__m")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lo", col("__hi") - col("__m") + 1L)
      .select(col("__rv"), col("__lo"), col("__hi"))
    // bucketed span lookup: a raw BETWEEN join is a nested loop that
    // re-evaluates its predicate per (row x span) pair — O(n·spans),
    // caught at 440 s on the sf0.1 bench. Spans explode into
    // fixed-width rank buckets (amplification <= nref/W + |spans|, a
    // bounded table), the target rank is computed ONCE per row, and
    // the lookup becomes a broadcast EQUI join on the bucket with the
    // BETWEEN as cheap post-filter — each rank still hits exactly one
    // span.
    val W = 1024L
    val bspans = spans.withColumn("__b",
      explode(expr(s"sequence(__lo div ${W}L, __hi div ${W}L)")))
    val wg = Window.partitionBy(col(groupCol))
    df.withColumn("__v", quant)
      .withColumn("__r", row_number().over(
        wg.orderBy(col("__v"), col(tieCol))).cast("long"))
      .withColumn("__n", count(lit(1)).over(wg))
      // target rank ceil(r·(nref+1)/(n+1)) — exact ceiling division
      // through DECIMAL(38,0), CLAMPED to nref: a group LARGER than
      // the reference ceils its top ranks past nref+1, and without
      // the clamp those rows silently vanished from the join (caught
      // at sf0.01 — 4 rows short; the every-row-emitted law pins it)
      .withColumn("__tr", expr(
        s"""least(
           |  CAST((CAST(__r AS DECIMAL(38,0)) * ${nRef + 1}L + __n)
           |    div CAST(__n + 1 AS DECIMAL(38,0)) AS BIGINT),
           |  ${nRef}L)""".stripMargin))
      .withColumn("__b", expr(s"__tr div ${W}L"))
      .join(broadcast(bspans), Seq("__b"))
      .filter(col("__tr") >= col("__lo") && col("__tr") <= col("__hi"))
      .select(col(groupCol), col(tieCol), col("__v").as("v_milli"),
        col("__r").as("rank"), col("__rv").as("norm_milli"))
  }
}
