package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xes.XesWriter

/** Structured Streaming surface (SURVEY.md §7.1 step 7): the streaming
  * analogue of the request-scoped batch pipeline.
  *
  * Shape: `readStream` (file/kafka/rate source — JDBC is polled
  * incrementally by a high-watermark wrapper upstream, it is not a
  * native streaming source) → event-time watermark →
  * `session_window` sessionization (the streaming realization of
  * trace assembly: a trace is a session of its case key) →
  * `foreachBatch` XES sharded sink.
  *
  * Semantics decided here (the reference is batch-only, so there is
  * nothing to copy — SURVEY §7.4.4): a late event within the
  * watermark re-opens/extends its session and the session re-emits
  * downstream; an event older than the watermark is dropped by Spark
  * and accounted in the query's event-time metrics. State size is
  * bounded by (open sessions × session payload), and Spark evicts
  * closed-session state at watermark passage — this is what lets the
  * same plan run unbounded at cluster scale.
  */
object EventStream {

  /** Gap-based streaming sessionization. Emits one row per closed
    * session in append mode (a session closes when the watermark
    * passes its end). `session_id` matches the batch Sessionize
    * convention: user + index-free start-anchored identity.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(
        concat_ws("-", col(userCol),
          unix_timestamp(col("session_window.start"))).as("session_id"),
        col(userCol),
        col("session_start"), col("session_end"), col("n_events"))

  /** Micro-batch XES sink: every micro-batch of an event-log-shaped
    * stream lands as one sharded XES directory (`batch-<id>/part-*`),
    * written fully distributed by `XesWriter.writeShards` — no driver
    * funnel, so sink throughput scales with executors. foreachBatch
    * (not a custom Sink) because the XES artifact is a whole-directory
    * atomic unit per batch, exactly what batch-scoped writes give.
    */
  def xesSink(log: DataFrame, outDir: String, checkpointDir: String,
              caseCol: String = XesWriter.DefaultCaseCol,
              tsCol: String = XesWriter.DefaultTsCol,
              tieCols: Seq[String] = Nil): StreamingQuery =
    log.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          XesWriter.writeShards(batch, s"$outDir/batch-$batchId", caseCol, tsCol, tieCols)
      }
      .start()
}
