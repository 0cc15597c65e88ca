package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP JSON lookup (SURVEY.md O-6): `GET {botManagerUrl}/bots` returns
  * `{resourceId: {"name": botName, ...}, ...}`; keep the keys whose
  * value is an object with `name == botName` (reference app.py:251-261,
  * including the isinstance guard for non-object values).
  *
  * Driver-side by design — the result is a small id list that feeds the
  * membership filter (O-7) as an `isin`, i.e. an implicit broadcast
  * semi-join. For id lists too large to inline, callers should switch to
  * `spark.createDataset(ids)` + `left_semi` join instead.
  *
  * The JSON parsing is a minimal recursive-descent parser: only the
  * object/string/skip subset this endpoint shape needs, to avoid adding
  * a dependency (build is zero-egress).
  */
final class BotManagerClient(baseUrl: String,
                             timeout: Duration = Duration.ofSeconds(10)) {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  def fetchBots(): String = {
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/bots"))
      .timeout(timeout).GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  def resourceIdsForBot(botName: String): Seq[String] =
    BotManagerClient.idsForBot(fetchBots(), botName)
}

object BotManagerClient {

  /** Pure function over the /bots response body — unit-testable without
    * a live endpoint (FIXTURES.md A4).
    */
  def idsForBot(json: String, botName: String): Seq[String] = {
    val top = MiniJson.parseObject(json)
    top.collect {
      case (id, MiniJson.JObj(fields))
          if fields.get("name").contains(MiniJson.JStr(botName)) => id
    }.toSeq.sorted
  }
}

/** Tiny JSON reader sufficient for the bot-manager payload: objects,
  * strings, numbers, booleans, null, arrays (arrays/numbers parsed but
  * only object/string shapes are matched on).
  */
private[graft] object MiniJson {
  sealed trait JValue
  final case class JStr(s: String) extends JValue
  final case class JObj(fields: Map[String, JValue]) extends JValue
  final case class JArr(items: Seq[JValue]) extends JValue
  final case class JOther(raw: String) extends JValue

  def parseObject(s: String): Map[String, JValue] = {
    val p = new P(s)
    p.ws()
    p.obj() match {
      case JObj(f) => f
      case _       => Map.empty
    }
  }

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i")
      i += 1
    }
    def obj(): JValue = {
      expect('{'); ws()
      val b = Map.newBuilder[String, JValue]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(b.result()) }
      var done = false
      while (!done) {
        ws()
        val k = str(); ws(); expect(':'); ws()
        b += k -> value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JObj(b.result())
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.toString
    }
    def value(): JValue = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '"' => JStr(str())
        case '[' =>
          expect('['); ws()
          val items = Seq.newBuilder[JValue]
          if (i < s.length && s.charAt(i) == ']') { i += 1 }
          else {
            var done = false
            while (!done) {
              items += value(); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect(']'); done = true }
            }
          }
          JArr(items.result())
        case _ =>
          val start = i
          while (i < s.length && !",}] \t\n\r".contains(s.charAt(i))) i += 1
          JOther(s.substring(start, i))
      }
    }
  }
}
