package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract assertions — the publish gate a warehouse
  * runs before a table version goes live (the great-expectations /
  * dbt-test shape, engine-side): a rule table of named predicates,
  * evaluated in ONE corpus pass, each reported with its violation
  * count — never a boolean that hides how broken the data is.
  * Complements the relation-level FK audit (L-151): that checks
  * BETWEEN tables, this checks within one.
  */
object DataContract {

  /** Row-predicate rules: each (name, predicate-that-must-hold).
    * ONE aggregate pass over the corpus — every rule is a
    * sum(CASE) in the same partial-aggregated job, so adding a rule
    * costs a column, not a scan — then the 1-row result unpivots to
    * one row per rule: (rule, n_rows, n_violations, pass). A NULL
    * predicate result counts as a VIOLATION (unknown is not
    * compliance — the null-rejecting `!=` lesson of §2.8.6).
    */
  def assertRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "assertRules: no rules declared")
    require(rules.map(_._1).distinct.size == rules.size,
      "assertRules: rule names must be unique")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stack = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', __v$i"
    }.mkString(", ")
    one.select(expr(
        s"stack(${rules.size}, $stack) AS (rule, n_violations)"),
        col("__n").as("n_rows"))
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Uniqueness rule: violations = rows beyond the first per key
    * (n_rows − n_distinct_keys) — a key duplicated k times counts
    * k − 1 violations, so the count answers "how many rows must go".
    * A row with a NULL key column counts as a FULL violation (it is
    * excluded from the distinct count — a NULL key cannot be
    * deduplicated against, and unknown is not compliance). One
    * aggregate pass. Cross-engine note: multi-column distinct with
    * NULL fields diverges between engines (struct-vs-skip), so
    * oracle-gated uses should declare NOT-NULL row rules on the key
    * columns alongside.
    */
  def assertUnique(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "assertUnique: no key columns")
    val r = df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(cols.head), cols.tail.map(col): _*).as("__nd"))
    r.select(
      lit(s"unique(${cols.mkString(", ")})").as("rule"),
      col("n_rows"),
      (col("n_rows") - col("__nd")).as("n_violations"),
      (col("n_rows") === col("__nd")).as("pass"))
  }

  /** The combined contract report: row rules + uniqueness rules,
    * unioned. Each family is one aggregate pass; rule order in the
    * output is not meaningful (sort on `rule` to pin it).
    */
  def report(df: DataFrame, rules: Seq[(String, Column)],
             uniqueKeys: Seq[Seq[String]] = Seq.empty): DataFrame =
    uniqueKeys.foldLeft(assertRules(df, rules)) { (acc, ks) =>
      acc.unionByName(assertUnique(df, ks))
    }
}
