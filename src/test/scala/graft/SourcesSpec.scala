package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.MessageSource

/** O-2/O-14 gate: the MESSAGE-side JSON-path lookup
  * (`REMARKS->>"$.agentId" WHERE REMARKS->>"$.botName" = ?`,
  * event_reader.py:113-116) — the last reference code path that had no
  * executing caller (VERDICT r2 missing #5).
  */
class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("REMARKS", StringType)))

  private def messages(rows: String*) =
    spark.createDataFrame(rows.map(Row(_)).asJava, schema)

  test("agentIdsForBot: filters on botName, projects agentId, drops null ids") {
    val df = messages(
      """{"botName":"sam","agentId":"a1"}""",
      """{"botName":"sam","agentId":"a2"}""",
      """{"botName":"other","agentId":"a3"}""", // wrong bot → excluded
      """{"botName":"sam"}""",                  // missing agentId → null → dropped (O-14)
      """{"agentId":"a4"}""",                   // missing botName → filter is null → excluded
      "not json at all",                        // unparseable → both fields null → excluded
      null)                                     // NULL REMARKS → excluded
    val ids = MessageSource.agentIdsForBot(df, "REMARKS", "sam")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("a1", "a2"))
  }

  test("agentIdsForBot: no matches yields an empty frame, not an error") {
    val df = messages("""{"botName":"sam","agentId":"a1"}""")
    assert(MessageSource.agentIdsForBot(df, "REMARKS", "nobody").isEmpty)
  }

  test("readJsonl: every line lands exactly once — parsed or quarantined with its raw text") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.sources.CorpusReader
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "second doc"}""",
      """{"doc_id": "notanumber", "text": "type drift"}""", // schema drift
      """{"doc_id": 3, "text": "trunc""""                   // truncated shard
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, quarantined) = CorpusReader.readJsonl(spark, dir, schema)
    val good = clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "hello world"), (2L, "second doc")))
    assert(clean.columns.toSeq == Seq("doc_id", "text"),
      "clean side carries exactly the declared schema")
    val bad = quarantined.collect().map(_.getString(0)).toSet
    assert(bad == Set(lines(2), lines(3)),
      s"both malformed lines quarantined verbatim, got $bad")
    assert(clean.count() + quarantined.count() == lines.size,
      "conservation: nothing dropped, nothing duplicated")
  }
}
