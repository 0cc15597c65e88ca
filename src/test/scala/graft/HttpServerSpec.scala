package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.api.{ResultCache, XesHttpServer}

/** Curl-level integration gate for the three reference routes
  * (app.py:76,102,130): 200 with a parseable XES body, 204 on an empty
  * result, 400 on client errors, and the bot route's id resolution.
  */
class HttpServerSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val elSchema = StructType(Seq(
    StructField("EVENT_TYPE", StringType),
    StructField("CASE_ID", StringType),
    StructField("ACTIVITY_NAME", StringType),
    StructField("TIME_STAMP", TimestampType),
    StructField("LIFECYCLE_PHASE", StringType),
    StructField("RESOURCE", StringType),
    StructField("RESOURCE_TYPE", StringType),
    StructField("REMARKS", StringType)))

  private lazy val eventlog = spark.createDataFrame(Seq(
    Row("SERVICE_CUSTOM_MESSAGE_1", "c1", "hello", ts("2024-01-01 09:00:00.0"),
      "complete", "r1", "user", null),
    Row("SERVICE_CUSTOM_MESSAGE_3", "c1", "lookup", ts("2024-01-01 09:00:05.0"),
      "complete", "r1", "user", null),
    Row("SERVICE_CUSTOM_MESSAGE_1", "c2", "hi", ts("2024-01-01 10:00:00.0"),
      "complete", "r2", "user", null)).asJava, elSchema)

  private val http = HttpClient.newHttpClient()

  private def withServer[A](f: (XesHttpServer, Int) => A): A = {
    val dir = Files.createTempDirectory("http-xes")
    dir.toFile.deleteOnExit()
    val srv = new XesHttpServer(
      () => eventlog, new ResultCache(dir, ttlSeconds = 3600),
      resolveBotIds = (url, bot) => if (bot == "sam") Seq("r1", "r2") else Nil)
    val port = srv.start()
    try f(srv, port) finally srv.stop()
  }

  private def get(port: Int, pathAndQuery: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def parseTraces(xml: String): Int = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    doc.getElementsByTagName("trace").getLength
  }

  test("GET /resource/{id}: 200 with a well-formed single-trace XES document") {
    withServer { (_, port) =>
      val r = get(port, "/resource/r1")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("application/xml"))
      assert(parseTraces(r.body()) == 1)
    }
  }

  test("GET /resource/{id}: empty result is a bodyless 204") {
    withServer { (_, port) =>
      val r = get(port, "/resource/nobody")
      assert(r.statusCode() == 204)
      assert(r.body().isEmpty)
    }
  }

  test("POST /resources: multi-id body, both traces in one log; bad bodies are 400") {
    withServer { (_, port) =>
      val ok = post(port, "/resources", """{"resource_ids": ["r1", "r2"]}""")
      assert(ok.statusCode() == 200)
      assert(parseTraces(ok.body()) == 2)
      assert(post(port, "/resources", """{"wrong": 1}""").statusCode() == 400)
      assert(post(port, "/resources", """{"resource_ids": []}""").statusCode() == 400)
    }
  }

  test("GET /bot/{name}: resolves ids then runs the pipeline; param errors are 400") {
    withServer { (_, port) =>
      val r = get(port, "/bot/sam?bot-manager-url=http%3A%2F%2Fstub")
      assert(r.statusCode() == 200)
      assert(parseTraces(r.body()) == 2)
      assert(get(port, "/bot/sam").statusCode() == 400)                        // missing url
      assert(get(port, "/bot/ghost?bot-manager-url=http%3A%2F%2Fstub").statusCode() == 400) // no ids
      assert(get(port, "/resource/r1?include_bot_messages=yes").statusCode() == 400) // bad flag
    }
  }

  test("internal failures surface as 500 with the message, not a hung request") {
    val dir = Files.createTempDirectory("http-500")
    dir.toFile.deleteOnExit()
    val srv = new XesHttpServer(
      () => throw new RuntimeException("source exploded"),
      new ResultCache(dir, ttlSeconds = 3600))
    val port = srv.start()
    try {
      val r = get(port, "/resource/r1")
      assert(r.statusCode() == 500)
      assert(r.body().contains("source exploded"))
    } finally srv.stop()
  }

  test("concurrent requests run in distinct fair-scheduler pools and both complete") {
    // deterministic gate for the starvation fix: a SparkListener records
    // which pool each job ran in; two concurrent requests must land in
    // two different graft-req-* pools (FAIR then shares the cluster
    // between them instead of FIFO-queueing the second behind the first)
    import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
    val pools = new ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
          .flatMap(ps => Option(ps.getProperty("spark.scheduler.pool")))
        p.filter(_.startsWith("graft-req-")).foreach(pools.add)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try withServer { (_, port) =>
      val exec = Executors.newFixedThreadPool(2)
      val f1 = exec.submit(() => get(port, "/resource/r1?use_cache=false"))
      val f2 = exec.submit(() => get(port, "/resource/r2?use_cache=false"))
      assert(f1.get(60, TimeUnit.SECONDS).statusCode() == 200)
      assert(f2.get(60, TimeUnit.SECONDS).statusCode() == 200)
      exec.shutdown()
      // listener events are posted asynchronously; poll until delivered
      def distinctPools = pools.toArray(Array.empty[String]).toSet
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (distinctPools.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(distinctPools.size >= 2, s"expected >=2 request pools, saw $distinctPools")
      assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("use_cache=true serves the cached artifact, use_cache=false regenerates") {
    withServer { (srv, port) =>
      val first = get(port, "/resource/r1?use_cache=true")
      assert(first.statusCode() == 200)
      // poison-pill check: find the cached file and append a marker; a
      // cache hit returns the marker, a regeneration removes it
      val second = get(port, "/resource/r1?use_cache=true")
      assert(second.statusCode() == 200 && second.body() == first.body())
      val fresh = get(port, "/resource/r1?use_cache=false")
      assert(fresh.statusCode() == 200 && fresh.body() == first.body())
    }
  }
}
