package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import javax.xml.parsers.DocumentBuilderFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.api.{EventLogGenerator, ResultCache}
import graft.api.EventLogGenerator.Params
import graft.xes.XesWriter

/** Executes the XES sink for real (VERDICT r2 #1/#2): golden XML for a
  * single-trace fixture, DOM-verified grouping/ordering/typing for a
  * multi-trace one, the generateXes cache miss→write→hit→empty→None
  * lifecycle, and the sharded scale path.
  */
class XesWriterSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val xesSchema = StructType(Seq(
    StructField("case:concept:name", StringType),
    StructField("concept:name", StringType),
    StructField("time:timestamp", TimestampType),
    StructField("in-service-context", BooleanType),
    StructField("event_id", LongType),
    StructField("score", DoubleType)))

  private def xesDf(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, xesSchema)

  private def parse(p: Path) = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.newDocumentBuilder().parse(p.toFile)
  }

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("golden XML: escaping, attribute typing, chronological order within trace") {
    // one case, events deliberately out of chronological order, a value
    // that needs every XML escape, and a NULL attribute (must be omitted)
    val df = xesDf(Seq(
      Row("c1", """b<&>"quote"'apos'""", ts("2024-01-01 10:00:01.0"), java.lang.Boolean.FALSE, 2L, null),
      Row("c1", "a", ts("2024-01-01 10:00:00.0"), java.lang.Boolean.TRUE, 1L, java.lang.Double.valueOf(0.5))))
    val out = tmpDir("xes-golden").resolve("golden.xes")
    assert(XesWriter.write(df, out, tieCols = Seq("event_id")).contains(out))

    val expected = XesWriter.Header +
      "<trace>\n" +
      "<string key=\"concept:name\" value=\"c1\"/>\n" +
      "<event>" +
      "<string key=\"concept:name\" value=\"a\"/>" +
      "<date key=\"time:timestamp\" value=\"2024-01-01T10:00:00.000Z\"/>" +
      "<boolean key=\"in-service-context\" value=\"true\"/>" +
      "<int key=\"event_id\" value=\"1\"/>" +
      "<float key=\"score\" value=\"0.5\"/>" +
      "</event>\n" +
      "<event>" +
      "<string key=\"concept:name\" value=\"b&lt;&amp;&gt;&quot;quote&quot;&apos;apos&apos;\"/>" +
      "<date key=\"time:timestamp\" value=\"2024-01-01T10:00:01.000Z\"/>" +
      "<boolean key=\"in-service-context\" value=\"false\"/>" +
      "<int key=\"event_id\" value=\"2\"/>" +
      "</event>\n" +
      "</trace>\n" +
      XesWriter.Footer
    assert(Files.readString(out) == expected)

    // and the golden output round-trips through a real XML parser
    val doc = parse(out)
    val events = doc.getElementsByTagName("event")
    assert(events.getLength == 2)
    val strings = doc.getElementsByTagName("string")
    val values = (0 until strings.getLength).map(i =>
      strings.item(i).getAttributes.getNamedItem("value").getNodeValue)
    assert(values.contains("""b<&>"quote"'apos'""")) // unescapes back exactly
  }

  test("multi-trace grouping: every case is one trace, events stay with their case") {
    val rows = for {
      c <- Seq("ca", "cb", "cc"); i <- 1 to 4
    } yield Row(c, s"act$i", ts(s"2024-01-01 10:00:0$i.0"), java.lang.Boolean.TRUE, i.toLong, null)
    val out = tmpDir("xes-multi").resolve("multi.xes")
    assert(XesWriter.write(xesDf(rows), out, tieCols = Seq("event_id")).isDefined)

    val doc = parse(out)
    val traces = doc.getElementsByTagName("trace")
    assert(traces.getLength == 3)
    val seen = scala.collection.mutable.Map[String, Int]()
    for (i <- 0 until traces.getLength) {
      val t = traces.item(i).asInstanceOf[org.w3c.dom.Element]
      val caseId = t.getElementsByTagName("string").item(0)
        .getAttributes.getNamedItem("value").getNodeValue
      seen(caseId) = t.getElementsByTagName("event").getLength
    }
    assert(seen == Map("ca" -> 4, "cb" -> 4, "cc" -> 4))
  }

  private val elSchema = StructType(Seq(
    StructField("EVENT_TYPE", StringType),
    StructField("CASE_ID", StringType),
    StructField("ACTIVITY_NAME", StringType),
    StructField("TIME_STAMP", TimestampType),
    StructField("LIFECYCLE_PHASE", StringType),
    StructField("RESOURCE", StringType),
    StructField("RESOURCE_TYPE", StringType),
    StructField("REMARKS", StringType)))

  private def eventlog(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, elSchema)

  test("generateXes end-to-end: cache miss writes, second call is a pure cache hit") {
    val el = eventlog(Seq(
      Row("SERVICE_CUSTOM_MESSAGE_1", "c1", "hello", ts("2024-01-01 09:00:00.0"),
        "complete", "r1", "user", """{"user":"u1"}"""),
      Row("SERVICE_CUSTOM_MESSAGE_3", "c1", "lookup", ts("2024-01-01 09:00:05.0"),
        "complete", "r1", "user", null)))
    val cache = new ResultCache(tmpDir("xes-cache"), ttlSeconds = 3600)
    val params = Params(resourceIds = Seq("r1"))

    val first = EventLogGenerator.generateXes(el, params, cache)
    assert(first.isDefined)
    val path = first.get
    val doc = parse(path)
    assert(doc.getElementsByTagName("trace").getLength == 1)
    assert(doc.getElementsByTagName("event").getLength == 2)

    // mutate the cached file; a true cache hit must serve it untouched
    Files.writeString(path, Files.readString(path) + "<!--sentinel-->")
    val second = EventLogGenerator.generateXes(el, params, cache)
    assert(second.contains(path))
    assert(Files.readString(path).endsWith("<!--sentinel-->"))
  }

  test("generateXes on empty input returns None (the HTTP 204 path)") {
    val el = eventlog(Nil)
    val cache = new ResultCache(tmpDir("xes-empty"), ttlSeconds = 3600)
    assert(EventLogGenerator.generateXes(el, Params(resourceIds = Seq("rX")), cache).isEmpty)
  }

  test("writeShards: each shard is a self-contained XES document, traces partition-complete") {
    val rows = for {
      c <- Seq("s1", "s2", "s3", "s4", "s5"); i <- 1 to 3
    } yield Row(c, s"act$i", ts(s"2024-01-01 11:00:0$i.0"), java.lang.Boolean.TRUE, i.toLong, null)
    val dir = tmpDir("xes-shards").resolve("out")
    XesWriter.writeShards(xesDf(rows), dir.toString, tieCols = Seq("event_id"))

    val shardFiles = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .filter(Files.size(_) > 0).toSeq
    assert(shardFiles.nonEmpty)
    val allCases = shardFiles.flatMap { f =>
      val doc = parse(f) // throws if a shard is not well-formed XML
      val traces = doc.getElementsByTagName("trace")
      (0 until traces.getLength).map { i =>
        val t = traces.item(i).asInstanceOf[org.w3c.dom.Element]
        assert(t.getElementsByTagName("event").getLength == 3) // no split traces
        t.getElementsByTagName("string").item(0)
          .getAttributes.getNamedItem("value").getNodeValue
      }
    }
    assert(allCases.sorted == Seq("s1", "s2", "s3", "s4", "s5"))
  }
}
