package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-log sources (SURVEY.md O-1/O-2/O-3).
  *
  * The reference reads `LAS2PEERMON.EVENTLOG` through a single MySQL
  * cursor (event_reader.py:71-72). Here the JDBC read is partitioned on
  * the timestamp column so N executors fetch concurrently, and all
  * predicates are plain `Column` filters that Spark's JDBC source pushes
  * into the remote WHERE clause (`pushDownPredicate` is on by default —
  * verify with `.explain`, the filters appear under `PushedFilters`).
  */
object EventLogSource {

  /** JDBC connection spec (O-3). The eager connectivity probe the
    * reference performs at engine construction maps to `probe()`.
    */
  final case class JdbcSpec(
      url: String,
      user: String,
      password: String,
      table: String = "LAS2PEERMON.EVENTLOG",
      tsColumn: String = "TIME_STAMP",
      numPartitions: Int = 32)

  /** The 8-column projection the reference always selects
    * (event_reader.py:59) — explicit so column pruning reaches the scan.
    */
  val Projection: Seq[String] = Seq(
    "EVENT_TYPE", "CASE_ID", "ACTIVITY_NAME", "TIME_STAMP",
    "LIFECYCLE_PHASE", "RESOURCE", "RESOURCE_TYPE", "REMARKS")

  /** Partitioned JDBC scan. Bounds are required for range partitioning;
    * callers that don't know them issue a cheap min/max probe first
    * (one aggregate pushed to the database).
    */
  def jdbc(spark: SparkSession, spec: JdbcSpec,
           lower: java.sql.Timestamp, upper: java.sql.Timestamp): DataFrame =
    spark.read.format("jdbc")
      .option("url", spec.url)
      .option("user", spec.user)
      .option("password", spec.password)
      .option("dbtable", spec.table)
      .option("partitionColumn", spec.tsColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", spec.numPartitions.toString)
      .load()
      .select(Projection.map(col): _*)

  /** Eager connectivity probe (O-3): fail fast before building a plan.
    * Schema resolution opens a connection and describes the table
    * without reading a row, and unlike a literal `SELECT 1` it is
    * dialect-neutral (Derby, for one, requires a FROM clause).
    */
  def probe(spark: SparkSession, spec: JdbcSpec): Unit = {
    spark.read.format("jdbc")
      .option("url", spec.url)
      .option("user", spec.user)
      .option("password", spec.password)
      .option("dbtable", spec.table)
      .load()
      .schema
    ()
  }

  /** File-backed variant used by tests and the driver harness. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

/** JSON-path lookup over the MESSAGE table (SURVEY.md O-2):
  * project one JSON field, filter on another — MySQL's `->>` maps to
  * `get_json_object` (both unquote).
  */
object MessageSource {

  /** agent ids for a bot name; null ids dropped (O-14). */
  def agentIdsForBot(messages: DataFrame, remarksCol: String, botName: String): DataFrame =
    messages
      .filter(get_json_object(col(remarksCol), "$.botName") === botName)
      .select(get_json_object(col(remarksCol), "$.agentId").as("id"))
      .filter(col("id").isNotNull)
}
