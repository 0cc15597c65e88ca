package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a driver test-data directory
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * At cluster scale the same API fronts a partitioned/bucketed
  * warehouse path; locally each table is a single parquet file.
  * Filters and column pruning reach the scan via Catalyst (verify
  * with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read it as raw nanos and floor-divide to
    * micros — exactly what DuckDB does when it coerces nanos to its
    * micro-precision timestamps, so oracle comparisons stay bit-equal.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
}
