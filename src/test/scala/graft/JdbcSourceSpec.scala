package graft

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import graft.sources.EventLogSource
import graft.sources.EventLogSource.JdbcSpec

/** O-1/O-3 execution gate using embedded Derby (ships with Spark):
  * a real EVENTLOG table read through the partitioned JDBC scan, with
  * predicate pushdown visible in the plan and the eager probe live.
  */
class JdbcSourceSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dbUrl: String = {
    val dir = Files.createTempDirectory("derby-el")
    dir.toFile.deleteOnExit()
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE EVENTLOG (
          |  EVENT_TYPE VARCHAR(64), CASE_ID VARCHAR(64),
          |  ACTIVITY_NAME VARCHAR(64), TIME_STAMP TIMESTAMP,
          |  LIFECYCLE_PHASE VARCHAR(16), RESOURCE VARCHAR(128),
          |  RESOURCE_TYPE VARCHAR(16), REMARKS VARCHAR(512))""".stripMargin)
      val ins = conn.prepareStatement("INSERT INTO EVENTLOG VALUES (?,?,?,?,?,?,?,?)")
      for (i <- 1 to 20) {
        ins.setString(1, "SERVICE_CUSTOM_MESSAGE_1")
        ins.setString(2, s"c${i % 4}")
        ins.setString(3, s"act$i")
        ins.setTimestamp(4, ts(f"2024-01-01 10:${i % 60}%02d:00"))
        ins.setString(5, "complete")
        ins.setString(6, if (i % 2 == 0) "r-even" else "r-odd")
        ins.setString(7, "user")
        ins.setString(8, null)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
    url
  }

  private def spec: JdbcSpec =
    JdbcSpec(url = dbUrl, user = "", password = "", table = "EVENTLOG", numPartitions = 4)

  test("partitioned JDBC scan reads the 8-column projection across range partitions") {
    val df = EventLogSource.jdbc(spark, spec,
      ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    assert(df.columns.toSeq == EventLogSource.Projection)
    assert(df.rdd.getNumPartitions == 4) // the ranged parallel fetch
    assert(df.count() == 20)
  }

  test("filters push down into the remote WHERE clause") {
    val df = EventLogSource.jdbc(spark, spec,
        ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
      .filter(org.apache.spark.sql.functions.col("RESOURCE") === "r-even")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("RESOURCE"),
      s"expected RESOURCE filter in PushedFilters:\n$plan")
    assert(df.count() == 10)
  }

  test("aggregates push down through the DSv2 JDBC catalog") {
    // the V1 .format("jdbc") path pushes FILTERS only; GROUP-BY/agg
    // pushdown needs the DSv2 JDBCTableCatalog. At 100 TB-of-history
    // scale this is the difference between shipping every event row to
    // the cluster for a min/max/count probe and shipping back one row
    // per group — the same reason EventLogSource documents its bounds
    // probe as "one aggregate pushed to the database".
    val confs = Seq(
      "spark.sql.catalog.derby_el" ->
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
      "spark.sql.catalog.derby_el.url" -> dbUrl,
      "spark.sql.catalog.derby_el.pushDownAggregate" -> "true")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = spark.sql(
        """SELECT RESOURCE, COUNT(*) AS n, MAX(TIME_STAMP) AS latest
          |FROM derby_el.APP.EVENTLOG GROUP BY RESOURCE""".stripMargin)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregates"),
        s"expected COUNT/MAX in PushedAggregates:\n${plan.take(1200)}")
      val rows = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("r-even" -> 10L, "r-odd" -> 10L))
    } finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("eager connectivity probe succeeds on a live database and fails fast on a dead one") {
    EventLogSource.probe(spark, spec.copy(table = "SYSIBM.SYSDUMMY1"))
    intercept[Exception] {
      EventLogSource.probe(spark,
        spec.copy(url = "jdbc:derby:/nonexistent/definitely-missing-db"))
    }
  }
}
