package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association / co-occurrence analysis over cases (market-basket on
  * sessions): for every unordered item pair, the case support of the
  * pair plus the classic rule metrics — confidence in both directions
  * and lift — in EXACT integer micro-units (lift's cross product goes
  * through DECIMAL(38,0) ≡ DuckDB HUGEINT; no doubles anywhere, so the
  * whole table is hash-verifiable cross-engine).
  *
  * Scale shape: the corpus collapses to distinct (case, item) FIRST
  * (one natural-key shuffle); the pair join is a case EQUI-join on
  * that collapsed table with the `<` predicate as post-filter — pair
  * volume Σ m² over per-case DISTINCT item counts, bounded by the
  * item-type universe, never by events per case. Item supports ride
  * back on a broadcast (item-type-bounded), the case total on a 1-row
  * broadcast.
  */
object Baskets {

  def cooccurrence(df: DataFrame, caseCol: String, itemCol: String,
                   minSupport: Long = 1L): DataFrame = {
    val items = df.select(col(caseCol), col(itemCol)).distinct()
    val supp = items.groupBy(col(itemCol)).agg(count(lit(1)).as("supp"))
    val total = items.agg(countDistinct(col(caseCol)).as("__n_cases"))
    val lhs = items.select(col(caseCol).as("__c"), col(itemCol).as("item_a"))
    val rhs = items.select(col(caseCol).as("__c2"), col(itemCol).as("item_b"))
    lhs.join(rhs, col("__c") === col("__c2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
      .join(broadcast(supp.select(col(itemCol).as("item_a"),
        col("supp").as("supp_a"))), "item_a")
      .join(broadcast(supp.select(col(itemCol).as("item_b"),
        col("supp").as("supp_b"))), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("supp_ab"),
        col("supp_a"), col("supp_b"),
        expr("(supp_ab * 1000000L) div supp_a").as("conf_ab_micro"),
        expr("(supp_ab * 1000000L) div supp_b").as("conf_ba_micro"),
        expr("""CAST((CAST(supp_ab AS DECIMAL(38,0)) * __n_cases * 1000000)
               | div (CAST(supp_a AS DECIMAL(38,0)) * supp_b)
               |AS BIGINT)""".stripMargin).as("lift_micro"))
  }
}
