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

  /** The events parquet has shipped `ts` in two physical encodings
    * across driver test-data generations: TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects — read as raw nanos via the
    * legacy flag and floor-divide to micros, exactly DuckDB's nanos
    * coercion) and plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ).
    * Normalize BOTH to session-zone TimestampType; every session here
    * pins spark.sql.session.timeZone=UTC, so wall values — and the
    * DuckDB oracle hashes — are identical either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val ts = df.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000")) // raw nanos
      case _        => col("ts").cast("timestamp")           // micros NTZ
    }
    df.withColumn("ts", ts)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
}
