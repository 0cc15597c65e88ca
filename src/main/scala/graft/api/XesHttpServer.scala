package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame

import graft.sources.{BotManagerClient, MiniJson}

/** The reference's HTTP surface (app.py:76-170), three routes over one
  * pipeline:
  *
  *   GET  /resource/{resourceId}   — one resource's XES log
  *   POST /resources               — JSON body {"resource_ids": [...]}
  *   GET  /bot/{botName}?bot-manager-url=… — ids resolved via the
  *        bot-manager /bots endpoint, then the same pipeline
  *
  * Shared query params (reference names, app.py:79-84): `start_date`,
  * `end_date`, `include_bot_messages`, `include_life_cycle_start`,
  * `use_cache`. Decided divergences (SURVEY §2.8): flags parse as real
  * booleans ("false" is false — the reference treated any non-empty
  * string as truthy), `use_cache` actually gates the cache probe (the
  * reference's check was dead code), and the empty-result path returns
  * a real 204 (the reference's None-check tested the wrong variable,
  * §2.8.4). Errors map like app.py:96-99: client errors → 400,
  * everything else → 500.
  *
  * Glue, not engine: one request = one Spark job chain on the shared
  * session. Request concurrency rides Spark's scheduler (the
  * reference's gunicorn 4×2 workers correspond to concurrent jobs on
  * one SparkSession; use fair-scheduler pools when requests contend).
  */
final class XesHttpServer(
    eventlog: () => DataFrame,
    cache: ResultCache,
    resolveBotIds: (String, String) => Seq[String] =
      (url, bot) => new BotManagerClient(url).resourceIdsForBot(bot),
    port: Int = 0) {

  private final case class BadRequest(msg: String) extends RuntimeException(msg)

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  // the JDK default executor serializes requests; the reference serves
  // 8 concurrently (gunicorn --workers=4 --threads=2, Dockerfile:26).
  // Concurrent handlers become concurrent Spark jobs on the shared
  // session; each request runs in its OWN fair-scheduler pool (set
  // per-thread below), so under spark.scheduler.mode=FAIR a small
  // request's stages share the cluster with a big one instead of
  // queueing behind all of its jobs. Unconfigured pools default to
  // weight 1 / minShare 0, which is exactly the equal-share intent;
  // under the default FIFO mode the property is inert, so setting it
  // is always safe.
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "graft-http"); t.setDaemon(true); t
  }))

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort

  private def handle(ex: HttpExchange): Unit = {
    try {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val method = ex.getRequestMethod
      (method, path.split("/").drop(1).toList) match {
        case ("GET", "resource" :: id :: Nil) if id.nonEmpty =>
          generateAndReply(ex, Seq(id), query(ex))
        case ("POST", "resources" :: Nil) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val fields = MiniJson.parseObject(body)
          val ids = fields.get("resource_ids") match {
            case Some(MiniJson.JArr(items)) =>
              items.collect { case MiniJson.JStr(s) => s }
            case _ => throw BadRequest("body must contain resource_ids: [string, ...]")
          }
          if (ids.isEmpty) throw BadRequest("resource_ids is empty")
          generateAndReply(ex, ids, query(ex))
        case ("GET", "bot" :: botName :: Nil) if botName.nonEmpty =>
          val q = query(ex)
          val url = q.getOrElse("bot-manager-url",
            throw BadRequest("bot-manager-url parameter is required"))
          val ids = resolveBotIds(url, botName)
          if (ids.isEmpty) throw BadRequest(s"no resources found for bot $botName")
          generateAndReply(ex, ids, q)
        case _ =>
          respond(ex, 404, "not found")
      }
    } catch {
      case BadRequest(msg)                => respond(ex, 400, msg)
      case e: IllegalArgumentException    => respond(ex, 400, String.valueOf(e.getMessage))
      case e: Throwable                   => respond(ex, 500, String.valueOf(e.getMessage))
    } finally ex.close()
  }

  private def generateAndReply(ex: HttpExchange, ids: Seq[String],
                               q: Map[String, String]): Unit = {
    val params = EventLogGenerator.Params(
      resourceIds = ids,
      startDate = q.get("start_date").filter(_.nonEmpty),
      endDate = q.get("end_date").filter(_.nonEmpty),
      includeBotMessages = flag(q, "include_bot_messages"),
      includeLifecycleStart = flag(q, "include_life_cycle_start"),
      deserializeRemarks = flag(q, "deserialize_remarks"))
    val df = eventlog()
    // pool assignment is a thread-local property, so it scopes exactly
    // to the Spark jobs this handler thread submits. The pool NAME is
    // per-worker-thread, not per-request: Spark creates a Pool object
    // the first time a name appears and never removes it, so
    // per-request unique names would leak one Pool per request served
    // forever. Concurrent requests always run on distinct threads of
    // the fixed pool, so thread-keyed names give the same FAIR
    // isolation with at most 8 pools alive.
    val sc = df.sparkSession.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", s"graft-req-${Thread.currentThread().getId}")
    try {
      EventLogGenerator.generateXes(df, params, cache,
          useCache = flag(q, "use_cache")) match {
        case Some(path) => respondFile(ex, path)
        case None       => respond(ex, 204, "")
      }
    } finally sc.setLocalProperty("spark.scheduler.pool", null)
  }

  private def flag(q: Map[String, String], name: String): Boolean =
    q.get(name) match {
      case None | Some("")       => false
      case Some("true")          => true
      case Some("false")         => false
      case Some(other)           => throw BadRequest(s"$name must be true or false, got '$other'")
    }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).fold(Map.empty[String, String]) { raw =>
      raw.split("&").iterator.filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => decode(k) -> decode(v)
          case Array(k)    => decode(k) -> ""
        }
      }.toMap
    }

  private def decode(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    if (code == 204) ex.sendResponseHeaders(204, -1)
    else {
      ex.getResponseHeaders.add("Content-Type", "text/plain; charset=utf-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    }
  }

  private def respondFile(ex: HttpExchange, path: Path): Unit = {
    val bytes = Files.readAllBytes(path)
    ex.getResponseHeaders.add("Content-Type", "application/xml; charset=utf-8")
    ex.getResponseHeaders.add("Content-Disposition",
      s"""attachment; filename="${path.getFileName}"""")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}
