package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Börzsönyi, Kossmann & Stocker, ICDE 2001 — the
  * "pareto-optimal rows" operator): rows not DOMINATED on a
  * (minimize, maximize) criteria pair — dominated means another row
  * is ≤ on the min axis, ≥ on the max axis, and strictly better on
  * at least one. The multi-criteria shortlist every marketplace/
  * benchmark screen wants ("cheapest for its recency").
  */
object Skyline {

  /** Compute the skyline on (minimize `minCol`, maximize `maxCol`),
    * both integer-valued columns (quantize first — the sweep uses an
    * integer RANGE frame). Exact duplicates of a skyline point are
    * ALL kept (neither strictly dominates the other — the pinned
    * tie contract).
    *
    * Scale shape: the textbook two-phase distributed skyline. Phase 1
    * runs the sort-based sweep LOCALLY per partition via
    * `mapPartitions` (genuine per-partition imperative logic): a row
    * dominated within its partition cannot be in the global skyline,
    * so survivors shrink to O(per-partition skyline) — for most data
    * distributions a tiny fraction. Phase 2 repeats the sweep
    * globally on the survivors with two windows: max over STRICTLY
    * lower min-values (an integer RANGE frame to -1 — floats would
    * make "strictly lower" ill-defined) and the per-group max for
    * equal min-values. The global window is single-partition BY
    * CONTRACT — it runs on phase-1 survivors, not the corpus (the
    * ntile-trap discipline: the corpus never global-sorts).
    */
  def skyline(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pruned = {
      val cols = df.columns
      val mi = cols.indexOf(minCol); val ma = cols.indexOf(maxCol)
      require(mi >= 0 && ma >= 0, s"skyline: missing $minCol/$maxCol")
      Seq(mi, ma).foreach(i => require(
        df.schema(i).dataType == org.apache.spark.sql.types.LongType,
        s"skyline: ${cols(i)} must be BIGINT (quantize first)"))
      val schema = df.schema
      // local sweep on each partition: sort by (min asc, max desc),
      // keep rows whose max beats every strictly-cheaper row's max
      df.mapPartitions { it =>
        val rows = it.toArray
        val sorted = rows.sortBy(r =>
          (r.getLong(mi), -r.getLong(ma)))(Ordering.Tuple2[Long, Long])
        var bestMax = Long.MinValue
        var lastMin = Long.MinValue
        var groupMax = Long.MinValue
        val out = Array.newBuilder[org.apache.spark.sql.Row]
        var i = 0
        while (i < sorted.length) {
          val r = sorted(i)
          val v = r.getLong(mi); val x = r.getLong(ma)
          if (v != lastMin) {
            // entering a new min-value group: fold the previous group
            // into the strict-lower running max
            bestMax = math.max(bestMax, groupMax)
            groupMax = x // sorted desc within group → group max
            lastMin = v
          }
          // kept iff it beats every strictly-cheaper row AND is its
          // group's max (duplicates of the group max all pass)
          if (x > bestMax && x == groupMax) out += r
          i += 1
        }
        out.result().iterator
      }(org.apache.spark.sql.Encoders.row(schema))
    }
    // phase 2: same sweep globally over the (tiny) survivor set
    val wLower = Window.orderBy(col(minCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wGroup = Window.partitionBy(col(minCol))
    pruned
      .withColumn("__lowerMax", max(col(maxCol)).over(wLower))
      .withColumn("__groupMax", max(col(maxCol)).over(wGroup))
      .filter((col("__lowerMax").isNull ||
        col(maxCol) > col("__lowerMax")) &&
        col(maxCol) === col("__groupMax"))
      .drop("__lowerMax", "__groupMax")
  }
}
