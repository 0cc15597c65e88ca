package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Crawl-dump ingestion: JSONL (one JSON document per line — the de
  * facto interchange format of web-corpus distribution) read against
  * a DECLARED schema with loud corrupt-record accounting. A 100 TB
  * crawl always contains broken lines (truncated shards, encoding
  * damage, schema drift); the two failure modes to design out are
  * silent row loss (DROPMALFORMED) and a job abort at line 3 billion
  * (FAILFAST). PERMISSIVE + a corrupt-record column gives the third
  * path: every line lands exactly once, either parsed or in a
  * quarantine table carrying the raw line for reprocessing — the
  * `quarantineEmbeddings` discipline applied at the ingestion edge.
  *
  * Scale shape: the JSON parse is Spark's codegen'd JacksonParser,
  * line-splittable (plain-text JSONL is block-splittable, so a shard
  * fans out across tasks); the split is one row-local filter on the
  * corrupt column — no shuffle anywhere. The `cache()` on the parsed
  * frame is REQUIRED correctness, not an optimization: Spark refuses
  * (SPARK-21610) a query whose only referenced column is the internal
  * corrupt-record column, so the quarantine side must read from the
  * materialized parse, and sharing it also guarantees clean+corrupt
  * counts reconcile to the input line count even if a re-read would
  * parse differently.
  */
object CorpusReader {

  final val CorruptCol = "__corrupt"

  /** Returns (clean, quarantined): `clean` has exactly the declared
    * schema; `quarantined` is (raw_line). Nothing is dropped: every
    * input line is in exactly one side — gated in `SourcesSpec`.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"readJsonl: '$CorruptCol' is reserved for the quarantine column")
    val parsed = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val clean = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantined)
  }
}
