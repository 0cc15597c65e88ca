package graft.xes

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** XES XML source — the other half of the reference's artifact
  * lifecycle: the service SERVES .xes files (app.py:230) and its
  * consumers load them with `pm4py.read_xes`, so a library user needs
  * the read path to swap engines completely. Parses the writer's own
  * single-file and sharded outputs (and any XES whose attributes are
  * flat typed key/values) back into one row per event.
  *
  * Spark-first shape: files parse DISTRIBUTED via `wholeTextFiles` —
  * one task per shard file, so reading the sharded sink's output
  * scales with executors (a single-file log is inherently one task,
  * same note as the single-file writer). Schema is inferred from the
  * typed attribute tags in TWO passes over the files (exactly like
  * `spark.read.json` without a user schema): pass 1 unions the
  * (key → XES type) set; pass 2 parses rows into that fixed schema.
  * A key observed under conflicting tags widens to string with the
  * raw attribute text.
  *
  * Type mapping (inverse of XesWriter's): date → timestamp,
  * int → long, float → double, boolean → boolean, string → string.
  * The trace's own `concept:name` becomes the case column; an absent
  * attribute is null (the writer omits null attributes symmetrically,
  * so write → read round-trips losslessly up to the date format's
  * millisecond precision — XesReaderSpec pins it, and the
  * q_xes_roundtrip oracle proves it against the raw table).
  */
object XesReader {

  /** key → (xes tag, raw value) per event, with its trace's case id. */
  private[xes] final case class RawEvent(caseId: String,
                                         attrs: Map[String, (String, String)])

  /** DOM-parse one XES document (shared with the V2 source). */
  private[xes] def parseFileRaw(xml: String): Seq[RawEvent] = parseFile(xml)

  private def parseFile(xml: String): Seq[RawEvent] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    val traces = doc.getElementsByTagName("trace")
    (0 until traces.getLength).flatMap { i =>
      val tr = traces.item(i).asInstanceOf[org.w3c.dom.Element]
      val kids = tr.getChildNodes
      var caseId: String = null
      val evs = Seq.newBuilder[Map[String, (String, String)]]
      var j = 0
      while (j < kids.getLength) {
        kids.item(j) match {
          case e: org.w3c.dom.Element if e.getTagName == "event" =>
            val ats = e.getChildNodes
            val m = Map.newBuilder[String, (String, String)]
            var k = 0
            while (k < ats.getLength) {
              ats.item(k) match {
                case a: org.w3c.dom.Element =>
                  m += a.getAttribute("key") -> ((a.getTagName, a.getAttribute("value")))
                case _ =>
              }
              k += 1
            }
            evs += m.result()
          case e: org.w3c.dom.Element
            if e.getTagName == "string" && e.getAttribute("key") == "concept:name" =>
            caseId = e.getAttribute("value")
          case _ =>
        }
        j += 1
      }
      val cid = caseId
      evs.result().map(RawEvent(cid, _))
    }
  }

  private[xes] def typeOfTag(tag: String): DataType = typeOf(tag)

  private def typeOf(tag: String): DataType = tag match {
    case "date" => TimestampType
    case "int" => LongType
    case "float" => DoubleType
    case "boolean" => BooleanType
    case _ => StringType
  }

  private def parseValue(dt: DataType, raw: String): Any = dt match {
    case TimestampType =>
      java.sql.Timestamp.from(java.time.OffsetDateTime.parse(raw).toInstant)
    case LongType => java.lang.Long.valueOf(raw)
    case DoubleType => java.lang.Double.valueOf(raw)
    case BooleanType => java.lang.Boolean.valueOf(raw)
    case _ => raw
  }

  /** Read XES file(s) at `path` (a file, a sharded directory, or a
    * glob) into an event DataFrame. Column order: the case column,
    * then attribute keys sorted.
    */
  def read(spark: SparkSession, path: String,
           caseCol: String = XesWriter.DefaultCaseCol): DataFrame = {
    // skip sidecars (_SUCCESS markers, empty shards) — anything
    // without a <log element is not an XES document
    val files = spark.sparkContext.wholeTextFiles(path)
      .filter { case (_, xml) => xml.contains("<log") }
    val events = files.flatMap { case (_, xml) => parseFile(xml) }
    // pass 1: schema. A key under exactly one tag gets that tag's
    // type; conflicting tags widen to string (raw text preserved).
    val keyTags: Map[String, Set[String]] = events
      .flatMap(_.attrs.map { case (k, (tag, _)) => (k, tag) })
      .distinct().collect().groupBy(_._1).map { case (k, ts) => k -> ts.map(_._2).toSet }
    val keys = keyTags.keys.toSeq.sorted
    val types: Map[String, DataType] = keyTags.map { case (k, tags) =>
      k -> (if (tags.size == 1) typeOf(tags.head) else StringType)
    }
    val schema = StructType(
      StructField(caseCol, StringType) +:
        keys.map(k => StructField(k, types(k))))
    // pass 2: rows (files re-parse, like schema-less spark.read.json)
    val rows = events.map { ev =>
      Row.fromSeq(ev.caseId +: keys.map { k =>
        ev.attrs.get(k) match {
          case None => null
          case Some((_, raw)) if types(k) == StringType => raw
          case Some((_, raw)) => parseValue(types(k), raw)
        }
      })
    }
    spark.createDataFrame(rows, schema)
  }
}
