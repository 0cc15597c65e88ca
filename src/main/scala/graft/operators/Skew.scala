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
}
