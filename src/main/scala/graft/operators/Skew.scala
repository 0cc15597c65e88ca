package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting.
  *
  * A hot join key sends all its rows to one reducer; AQE's skew-join
  * splitting handles the SORT-MERGE side but cannot split a single
  * aggregation key or help when AQE is off. Salting splits each hot
  * key into `buckets` sub-keys: the fact side scatters uniformly
  * (random-ish via id hash or round-robin), the dimension side
  * replicates into every sub-key, and the join result is identical to
  * the unsalted join.
  *
  * Cost model: dimension shuffle volume × buckets. Use for joins where
  * the dimension is small relative to the skew (the usual case); for
  * fact×fact skew prefer AQE splitting.
  */
object Skew {

  /** Inner-join `fact` with `dim` on `key`, salted `buckets` ways.
    * Result equals `fact.join(dim, key)` row-for-row.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, scatterBy: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(scatterBy), lit(buckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact key-skew profile of a prospective shuffle/join column: the
    * decision input for BOTH valves above (salt this join?) and for
    * AQE's skew threshold tuning. Salting blind is waste; salting the
    * wrong key is worse. This measures before mitigating.
    *
    * Output: the `topN` heaviest keys by exact count, each with
    *  - cnt: exact row count;
    *  - share_micro: floor(cnt·1e6 / n_rows) — this key's fraction of
    *    the table in integer micro-units;
    *  - skew_micro: floor((cnt·n_keys / n_rows)·1e6) — cnt over the
    *    MEAN rows-per-key, the "how many reducers' fair share does
    *    this one key eat" number (1e6 = perfectly uniform);
    *  - rank: 1-based by (cnt desc, key asc).
    *
    * Scale shape: one partial-agg shuffle keyed by `keyCol` (the same
    * shuffle the join under study would do, so if THIS aggregation is
    * slow the join needs the salt), a 1-row totals aggregate broadcast
    * back, then orderBy+limit — Spark plans that as TakeOrdered (each
    * partition keeps its local top-N, the driver merges N·partitions
    * rows), never a global sort. The rank window runs AFTER the limit,
    * over ≤ topN rows. All ratios are quantized through the explicit
    * IEEE sequence mirrored in the oracle (multiply, divide, multiply,
    * floor — each a single correctly-rounded op).
    */
  def skewProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, "skewProfile: topN must be positive")
    for (c <- Seq("cnt", "n_rows", "n_keys", "share_micro", "skew_micro", "rank")
         if df.columns.contains(c))
      require(false, s"skewProfile: '$c' is reserved for internal use — rename it")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).cast("long").as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topN)
      .withColumn("share_micro",
        floor(col("cnt").cast("double") * lit(1000000.0) /
          col("n_rows").cast("double")).cast("long"))
      .withColumn("skew_micro",
        floor(col("cnt").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double") * lit(1000000.0)).cast("long"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col(keyCol).asc)).cast("int"))
      .select(col(keyCol), col("cnt"), col("share_micro"),
        col("skew_micro"), col("rank"))
  }
}
