package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

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

  /** Watermarked event-time windowed aggregation — the canonical
    * Structured Streaming op (per-key event rates over tumbling or
    * sliding windows). Append mode: a window row emits exactly once,
    * when the watermark passes its end; an event older than the
    * watermark is dropped by Spark before the aggregation (both
    * contracts pinned in StreamingSpec). State is (open windows ×
    * keys) and Spark evicts each window at watermark passage, so the
    * same plan runs unbounded — this plus partial aggregation
    * (map-side combine before the keyed shuffle) is the whole 100 TB
    * story for streaming rates.
    *
    * `slide` defaults to the window size (tumbling); pass a smaller
    * duration for overlapping sliding windows — each event then
    * contributes to window/slide windows, still one shuffle.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDuration: String,
                     slideDuration: Option[String] = None,
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), windowDuration,
          slideDuration.getOrElse(windowDuration)),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n_events"))

  /** Streaming burst alerts — the unbounded arm of the batch
    * `Cohort.burstProfile` automation screen: per user, sliding
    * event-time windows of `windowSec` seconds (slide = half the
    * window), one alert row per (window, user) whose count reaches
    * `threshold`, emitted once at watermark close. The half-window
    * slide is the detection contract: any burst spanning ≤
    * windowSec/2 seconds lies entirely inside SOME window, so it
    * cannot slip between window edges (the batch tier's trailing
    * RANGE frame stays the exact arbiter; this is the alerting
    * surface). State = open windows × active users, watermark-
    * evicted — the windowedCounts unbounded story unchanged.
    */
  def burstAlerts(events: DataFrame, userCol: String, tsCol: String,
                  windowSec: Int, threshold: Long,
                  watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowSec >= 2 && windowSec % 2 == 0,
      "burstAlerts: windowSec must be even and >= 2 (slide = half window)")
    require(threshold > 0, "burstAlerts: threshold must be positive")
    windowedCounts(events, tsCol, userCol, s"$windowSec seconds",
      Some(s"${windowSec / 2} seconds"), watermarkDelay)
      .filter(col("n_events") >= threshold)
  }

  final case class DriftDoc(source: String, text: String, ts: Timestamp)
  final case class DriftState(counts: Map[String, Long])
  final case class DriftReport(windowStart: Timestamp, source: String,
      toks: Long, shareMicro: Long, baselineMicro: Long, deltaMicro: Long,
      tvMicro: Long)

  /** Streaming source-mix drift monitor — the unbounded arm of
    * `Dedup.snapshotDrift` (L-97): per tumbling event-time window, the
    * incoming corpus's per-source token shares are compared against a
    * STATIC baseline mix (micro-unit shares, e.g. yesterday's
    * `snapshotDrift`/`weightedSourceMix` output), and the window's
    * report — share, delta, and the window's total-variation distance
    * stamped on every row — emits EXACTLY ONCE when the watermark
    * closes the window. The alert shape for "the crawl mix silently
    * shifted" during ingestion, hours before any batch snapshot diff
    * would run.
    *
    * Why custom state and not two chained windowed aggregates: the TV
    * distance needs every source's share of the SAME window in one
    * place; keyed state per open window (one tiny map: S sources →
    * token counts) gets exactly that, with an event-time timeout at
    * window end as the emit-once trigger — the `assembleTraces`
    * pattern. State is bounded by (open windows × sources); sources a
    * window never saw surface with 0 tokens (never dropped, the
    * snapshotDrift discipline). Integer arithmetic end-to-end, bit-
    * equal to the batch twin's formula — gated in `StreamingSpec`.
    */
  def driftStream(docs: Dataset[DriftDoc], baseline: Map[String, Long],
                  windowMinutes: Int,
                  watermarkDelay: String = "10 minutes"): Dataset[DriftReport] = {
    require(windowMinutes > 0, "driftStream: windowMinutes must be positive")
    require(baseline.nonEmpty, "driftStream: baseline mix must be non-empty")
    import docs.sparkSession.implicits._
    val wMs = windowMinutes * 60000L
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(d => math.floorDiv(d.ts.getTime, wMs) * wMs)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (winStart: Long, it: Iterator[DriftDoc], state: GroupState[DriftState]) => {
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            val tot = counts.values.sum
            // same integer formula as the batch twin: floor micro
            // shares, TV = halved absolute-delta sum over the UNION
            // of observed and baseline sources
            val shares = counts.map { case (s, t) => s -> t * 1000000L / tot }
            val all = (shares.keySet ++ baseline.keySet).toSeq.sorted
            val tv = all.map(s => math.abs(
              shares.getOrElse(s, 0L) - baseline.getOrElse(s, 0L))).sum / 2
            all.iterator.map { s =>
              val sh = shares.getOrElse(s, 0L)
              val bl = baseline.getOrElse(s, 0L)
              DriftReport(new Timestamp(winStart), s,
                counts.getOrElse(s, 0L), sh, bl, sh - bl, tv)
            }
          } else {
            val acc = it.foldLeft(
              state.getOption.fold(Map.empty[String, Long])(_.counts)) { (m, d) =>
              // split(" ", -1) ≡ the batch tier's size(split(text, ' '))
              val t = if (d.text == null) 0L else d.text.split(" ", -1).length.toLong
              m.updated(d.source, m.getOrElse(d.source, 0L) + t)
            }
            state.update(DriftState(acc))
            state.setTimeoutTimestamp(winStart + wMs)
            Iterator.empty
          }
        })
  }

  final case class ScoreEvent(value: Double, ts: Timestamp)
  final case class KsState(counts: Map[Long, Long])
  final case class KsReport(windowStart: Timestamp, nWindow: Long,
      nRef: Long, ksMicro: Long, atV: Long, alert: Boolean)

  /** Streaming score-distribution drift monitor — the unbounded arm of
    * `Forensics.ksTwoSample` (L-227), the numeric twin of
    * `driftStream`'s categorical TV: per tumbling event-time window,
    * the window's empirical distribution (milli-quantized values) is
    * KS-tested against a STATIC reference histogram (yesterday's score
    * distribution — a driver-bounded model artifact, the ModelStore
    * class), and the window's report emits EXACTLY ONCE at watermark
    * close with the exact cross-multiplied ks_micro, the supremum's
    * location (lowest attaining value — the batch tie-break), and the
    * alert verdict. The production shape for "the quality scorer's
    * input distribution shifted mid-crawl", hours before a batch
    * snapshot diff would run.
    *
    * Bit-equal BY CONSTRUCTION to the batch twin on the same window
    * (gated in StreamingSpec): same milli quantization, same
    * cumulative-over-merged-distinct-values walk, same
    * |cum_a·n_b − cum_b·n_a| cross-multiplication (BigInt headroom in
    * the kernel — the DECIMAL(38,0) of the JVM side), same floor
    * division. State per open window is its value histogram — bounded
    * by DISTINCT milli-values per window, the batch op's own
    * bounded-distinct contract carried over; event-time timeout is
    * the emit-once trigger (the driftStream pattern).
    */
  def ksDriftStream(scores: Dataset[ScoreEvent], reference: Seq[(Long, Long)],
                    windowMinutes: Int, alertMicro: Long,
                    watermarkDelay: String = "10 minutes"): Dataset[KsReport] = {
    require(windowMinutes > 0, "ksDriftStream: windowMinutes must be positive")
    require(reference.nonEmpty && reference.forall(_._2 > 0L),
      "ksDriftStream: reference histogram must be non-empty with positive counts")
    require(alertMicro >= 0L && alertMicro <= 1000000L,
      s"ksDriftStream: alertMicro in [0, 1e6], got $alertMicro")
    val refMap = reference.groupBy(_._1).map { case (v, g) =>
      v -> g.map(_._2).sum }
    val nRef = refMap.values.sum
    ksWindowedStream(scores, refMap, nRef, windowMinutes, watermarkDelay,
      v => math.floor(v * 1000).toLong) { (ws, _, nb, ksMicro, atV) =>
      KsReport(new Timestamp(ws), nb, nRef, ksMicro, atV,
        ksMicro >= alertMicro)
    }(Encoders.product[KsReport])
  }

  /** Shared KS-window state machine: per tumbling event-time window a
    * quantized value histogram accumulates in state; at watermark
    * close the exact cross-multiplied KS against `refMap` computes
    * once and `report` shapes the exactly-once emission. Both drift
    * monitors (`ksDriftStream`, `isotonicServeDriftStream`) ARE this
    * machine with a different quantizer and report row — the walk,
    * the BigInt headroom, the tie-break, and the timeout contract
    * live here exactly once.
    */
  private def ksWindowedStream[R](scores: Dataset[ScoreEvent],
      refMap: Map[Long, Long], nRef: Long, windowMinutes: Int,
      watermarkDelay: String, quantize: Double => Long)
      (report: (Long, Map[Long, Long], Long, Long, Long) => R)
      (enc: org.apache.spark.sql.Encoder[R]): Dataset[R] = {
    import scores.sparkSession.implicits._
    val wMs = windowMinutes * 60000L
    scores
      .withWatermark("ts", watermarkDelay)
      .groupByKey(d => math.floorDiv(d.ts.getTime, wMs) * wMs)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (winStart: Long, it: Iterator[ScoreEvent], state: GroupState[KsState]) => {
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            val nb = counts.values.sum
            val all = (counts.keySet ++ refMap.keySet).toSeq.sorted
            var cumA = 0L
            var cumB = 0L
            var bestGap = BigInt(-1)
            var atV = 0L
            all.foreach { v =>
              cumA += refMap.getOrElse(v, 0L)
              cumB += counts.getOrElse(v, 0L)
              val gap = (BigInt(cumA) * nb - BigInt(cumB) * nRef).abs
              if (gap > bestGap) { bestGap = gap; atV = v }
            }
            val ksMicro =
              ((bestGap * 1000000) / (BigInt(nRef) * nb)).toLong
            Iterator.single(report(winStart, counts, nb, ksMicro, atV))
          } else {
            val acc = it.foldLeft(
              state.getOption.fold(Map.empty[Long, Long])(_.counts)) { (m, d) =>
              val v = quantize(d.value)
              m.updated(v, m.getOrElse(v, 0L) + 1L)
            }
            state.update(KsState(acc))
            state.setTimeoutTimestamp(winStart + wMs)
            Iterator.empty
          }
        })(implicitly, enc)
  }

  final case class IsoDriftReport(windowStart: Timestamp, nWindow: Long,
      nUnseen: Long, ksMicro: Long, atS: Long, recalibrate: Boolean)

  /** Isotonic-serve drift guard — the composition that closes the
    * MEASURE → FIX → SERVE loop (L-240 × L-248): while
    * `TextOps.isotonicApply` serves a batch-trained calibration
    * mapping on the stream (stateless, gated stream≡batch in
    * StreamingSpec), THIS monitor watches the raw score distribution
    * the calibrator is seeing against the FIT-TIME distribution —
    * `isotonicFit`'s per-distinct-score (s, n) collapse, a bounded
    * ModelStore-class artifact — and emits a LOUD `recalibrate` flag
    * the moment a closed window's KS distance crosses `alertMicro`.
    * An isotonic mapping is only as good as the score distribution it
    * was fitted on; serving it silently through covariate shift is
    * exactly the failure mode calibration exists to prevent.
    *
    * Two deliberate differences from the generic `ksDriftStream`:
    * the window histogram is keyed by the SERVE-side quantization
    * (`CAST(score AS LONG)` — the same truncation `isotonicApply`
    * joins on), so the monitored distribution is bit-identical to
    * the one being calibrated; and the report carries `nUnseen` —
    * the window mass whose key has NO fit entry, i.e. exactly the
    * rows the serve side returns calibrated_micro = NULL for. A
    * drifting corpus usually announces itself there first.
    *
    * Same state/emit contract as the KS monitor: per-window bounded
    * histogram state, exactly-once report at watermark close, exact
    * cross-multiplied integer KS (BigInt headroom), deterministic
    * supremum tie-break at the lowest attaining score.
    */
  def isotonicServeDriftStream(scores: Dataset[ScoreEvent],
      fit: Seq[(Long, Long)], windowMinutes: Int, alertMicro: Long,
      watermarkDelay: String = "10 minutes"): Dataset[IsoDriftReport] = {
    require(windowMinutes > 0,
      "isotonicServeDriftStream: windowMinutes must be positive")
    require(fit.nonEmpty && fit.forall(_._2 > 0L),
      "isotonicServeDriftStream: fit histogram must be non-empty with" +
        " positive counts")
    require(alertMicro >= 0L && alertMicro <= 1000000L,
      s"isotonicServeDriftStream: alertMicro in [0, 1e6], got $alertMicro")
    val refMap = fit.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val nRef = refMap.values.sum
    // quantizer = the isotonicApply serve cast, so the monitored
    // distribution is bit-identical to the one being calibrated
    ksWindowedStream(scores, refMap, nRef, windowMinutes, watermarkDelay,
      v => v.toLong) { (ws, counts, nb, ksMicro, atS) =>
      val nUnseen = counts.collect {
        case (s, n) if !refMap.contains(s) => n }.sum
      IsoDriftReport(new Timestamp(ws), nb, nUnseen, ksMicro, atS,
        ksMicro >= alertMicro)
    }(Encoders.product[IsoDriftReport])
  }

  final case class WeightedDoc(stratum: String, id: Long, weight: Long)
  final case class GumbelState(items: List[(Long, Long)], version: Long)
  final case class StandingSample(stratum: String, id: Long,
      gumbelMicro: Long, sampleRank: Int, version: Long)

  /** Streaming standing sample — the UNBOUNDED arm of
    * `Chunking.sampleGumbelTopK` (L-250): maintain, per stratum, the
    * CURRENT "exactly k docs ∝ weight without replacement" as
    * documents arrive, emitting the post-batch top-k snapshot as a
    * versioned ledger each micro-batch (the consumer reads the max
    * version per stratum — every earlier version is the sample as it
    * stood then, free provenance).
    *
    * Why this shape is exceptionally stream-friendly: the Gumbel key
    * is a PURE row-local function of (id, weight) — same Weyl u, same
    * IEEE ln chain, same micro floor as the batch operator — and a
    * standing top-k of a set is ORDER-FREE, so there is NO ordering
    * contract at all (stronger than funnelStream's event-time-ordered
    * delivery clause): any arrival order, any batch slicing, produces
    * the same final state, executed as a law in StreamingSpec. A
    * re-delivered document maps to the identical (key, id) pair and
    * dedupes — idempotent by construction. State is k pairs per
    * stratum, bounded by construction; no watermark needed.
    *
    * Contract guards: weights are positive and IMMUTABLE per id — a
    * doc re-sent with a different weight is refused LOUD when the old
    * version is still standing (the L-113 duplicate-id convention;
    * an already-evicted id's weight change is undetectable by design
    * — the standing state is the only memory this operator keeps).
    */
  def gumbelSampleStream(docs: Dataset[WeightedDoc], k: Int)
  : Dataset[StandingSample] = {
    require(k > 0, "gumbelSampleStream: k must be positive")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (stratum: String, it: Iterator[WeightedDoc], state: GroupState[GumbelState]) => {
          val prev = state.getOption.getOrElse(GumbelState(Nil, 0L))
          val incoming = it.map { d =>
            require(d.weight > 0,
              s"gumbelSampleStream: weight must be positive (id ${d.id})")
            val b = Math.floorMod(Math.floorMod(d.id, 65536L) * 40503L, 65536L)
            val u = (b + 1).toDouble / 65537.0
            val key = math.floor(
              (math.log(d.weight.toDouble) - math.log(-math.log(u))) *
                1000000.0).toLong
            (key, d.id)
          }.toList
          val byId = (prev.items ++ incoming).groupBy(_._2)
          byId.foreach { case (id, entries) =>
            require(entries.map(_._1).distinct.size == 1,
              s"gumbelSampleStream: id $id re-sent with a different weight" +
                " — weights are immutable by contract")
          }
          val merged = byId.valuesIterator.map(_.head).toList
            .sortBy { case (key, id) => (-key, id) }.take(k)
          val version = prev.version + 1
          state.update(GumbelState(merged, version))
          merged.zipWithIndex.iterator.map { case ((key, id), i) =>
            StandingSample(stratum, id, key, i + 1, version)
          }
        })
  }

  final case class TraceEvent(caseId: String, ts: Timestamp, activity: String)
  final case class TraceState(events: Seq[TraceEvent])
  final case class CompletedTrace(caseId: String, nEvents: Int,
      startTs: Timestamp, endTs: Timestamp, activities: Seq[String])

  /** Custom-state trace assembly: the `flatMapGroupsWithState`
    * realization of "a trace closes after `gapMinutes` of silence",
    * for consumers that need the WHOLE ordered trace as one record
    * (the XES unit) rather than session aggregates.
    *
    * State per open case is its event buffer; an event-time timeout
    * fires once the watermark passes last-event + gap, emitting the
    * completed, chronologically-sorted trace exactly once and freeing
    * the state. Late events within the watermark re-open nothing —
    * they extend the still-open buffer; events older than the
    * watermark are dropped upstream by Spark. State size is bounded by
    * open traces only, which is what keeps this shape viable
    * unbounded.
    */
  def assembleTraces(events: Dataset[TraceEvent], gapMinutes: Int,
                     watermarkDelay: String = "30 minutes"): Dataset[CompletedTrace] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.caseId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (caseId: String, it: Iterator[TraceEvent], state: GroupState[TraceState]) => {
          if (state.hasTimedOut) {
            val evs = state.get.events.sortBy(e => (e.ts.getTime, e.activity))
            state.remove()
            Iterator.single(CompletedTrace(
              caseId, evs.size, evs.head.ts, evs.last.ts, evs.map(_.activity)))
          } else {
            val all = state.getOption.fold(Seq.empty[TraceEvent])(_.events) ++ it
            state.update(TraceState(all))
            state.setTimeoutTimestamp(all.iterator.map(_.ts.getTime).max +
              gapMinutes * 60000L)
            Iterator.empty
          }
        })
  }

  final case class EpisodeEvent(userId: Long, ts: Timestamp, activity: String)
  final case class EpisodeState(activity: String, startTs: Timestamp,
      endTs: Timestamp, nEvents: Long)
  final case class Episode(userId: Long, activity: String, startTs: Timestamp,
      endTs: Timestamp, nEvents: Long)

  /** Streaming run-length episode compaction — the unbounded arm of
    * `analytics.Timeline.episodes`, and the shape that turns a raw
    * change-stream into SCD2 interval upserts on the fly: per user,
    * consecutive same-activity events fold into ONE open episode;
    * an activity switch EMITS the closed episode exactly once and
    * opens the next; `closeAfterMinutes` of event-time silence (past
    * the watermark) flushes the final open episode and frees the key.
    *
    * State per user is ONE episode record — bounded by construction
    * (the funnelStream argument), with the timeout reclaiming even
    * that for idle users. Ordering contract, same as funnelStream:
    * the fold equals the batch operator under per-user event-time
    * ordered delivery ACROSS batches; WITHIN a batch the group sorts
    * by (ts, activity) first, so arrival order is irrelevant. A
    * cross-batch straggler would extend or re-open the wrong run —
    * exactly the records the watermark is sized to exclude.
    */
  def episodeStream(events: Dataset[EpisodeEvent], closeAfterMinutes: Int,
                    watermarkDelay: String = "30 minutes"): Dataset[Episode] = {
    require(closeAfterMinutes > 0, "episodeStream: positive close gap")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[EpisodeEvent], state: GroupState[EpisodeState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Episode(userId, s.activity, s.startTs, s.endTs, s.nEvents))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.activity))
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Episode]
            for (e <- sorted) open match {
              case Some(s) if s.activity == e.activity =>
                open = Some(s.copy(endTs = e.ts, nEvents = s.nEvents + 1))
              case Some(s) =>
                closed += Episode(userId, s.activity, s.startTs, s.endTs, s.nEvents)
                open = Some(EpisodeState(e.activity, e.ts, e.ts, 1L))
              case None =>
                open = Some(EpisodeState(e.activity, e.ts, e.ts, 1L))
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                s.endTs.getTime + closeAfterMinutes * 60000L)
            }
            closed.iterator
          }
        })
  }

  /** Watermarked LEFT-OUTER stream-stream join — the ad-attribution
    * shape (impressions ⟕ clicks within an attribution window) and
    * the missing outer member of the stream-join family next to the
    * inner `intervalJoinStream`: matched pairs emit as soon as both
    * sides arrive; an impression with NO click emits EXACTLY ONCE
    * with NULL click columns — but only after the click-side
    * watermark passes its attribution window, because until then a
    * matching click could still arrive (the null-emission delay is
    * the SEMANTIC price of outer streaming joins, pinned in the
    * spec, not hidden). State on both sides is bounded by the
    * watermark + window — the time-range condition is what lets
    * Spark evict, so it is REQUIRED, not optional.
    */
  def attributionJoinStream(impressions: DataFrame, clicks: DataFrame,
                            keyCol: String, impTsCol: String,
                            clickTsCol: String, windowSeconds: Long,
                            impDelay: String = "10 minutes",
                            clickDelay: String = "10 minutes"): DataFrame = {
    require(windowSeconds > 0,
      "attributionJoinStream: windowSeconds must be positive")
    val rk = "__ck"
    require(!clicks.columns.contains(rk) && !impressions.columns.contains(rk),
      s"attributionJoinStream: '$rk' is reserved — rename it")
    val l = impressions.withWatermark(impTsCol, impDelay)
    val r = clicks.withColumnRenamed(keyCol, rk)
      .withWatermark(clickTsCol, clickDelay)
    l.join(r,
        col(keyCol) === col(rk) &&
          col(clickTsCol) >= col(impTsCol) &&
          col(clickTsCol) <= col(impTsCol) +
            expr(s"INTERVAL $windowSeconds SECONDS"),
        "left_outer")
      .drop(rk)
  }

  final case class CountEvent(item: String, ts: Timestamp)
  final case class TrendState(n: Long, alerted: Boolean, lastTs: Timestamp)
  final case class TrendAlert(item: String, n: Long, ts: Timestamp)

  /** Streaming trending-item alerts — the unbounded arm of the
    * Misra-Gries heavy-hitter operator (L-188): per item, ONE alert
    * the moment its cumulative count reaches `threshold`, never a
    * second (the alerted flag latches, the funnelStream exactly-once
    * shape). The alert carries the count at crossing and the
    * latest event time that contributed.
    *
    * State is one (count, flag, ts) per LIVE item — the bound comes
    * from the `staleMinutes` event-time timeout: an item silent past
    * the watermark + staleness is evicted, so state tracks the
    * RECENT item universe, not the all-time one. The documented
    * consequence (a law, not a bug): a slow burner whose activity
    * spans eviction gaps restarts its count and can re-alert on a
    * fresh burst — this is a TRENDING detector, recency is the
    * semantics; the batch heavy-hitter operator is the all-time
    * truth.
    */
  def trendingAlerts(events: Dataset[CountEvent], threshold: Long,
                     staleMinutes: Int,
                     watermarkDelay: String = "10 minutes"): Dataset[TrendAlert] = {
    require(threshold > 0L, "trendingAlerts: threshold must be positive")
    require(staleMinutes > 0, "trendingAlerts: staleMinutes must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.item)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (item: String, it: Iterator[CountEvent], state: GroupState[TrendState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq
            val prev = state.getOption.getOrElse(
              TrendState(0L, alerted = false, batch.head.ts))
            val n = prev.n + batch.size
            val maxTs = (prev.lastTs +: batch.map(_.ts)).maxBy(_.getTime)
            val fire = !prev.alerted && n >= threshold
            state.update(TrendState(n, prev.alerted || fire, maxTs))
            state.setTimeoutTimestamp(maxTs.getTime + staleMinutes * 60000L)
            if (fire) Iterator.single(TrendAlert(item, n, maxTs))
            else Iterator.empty
          }
        })
  }

  final case class FunnelEvent(userId: Long, ts: Timestamp, eventType: String)
  final case class FunnelState(staged: Seq[Option[Timestamp]])
  final case class Conversion(userId: Long, enteredTs: Timestamp,
      convertedTs: Timestamp, durationSec: Long)

  /** Streaming conversion funnel — the unbounded arm of
    * `analytics.Funnel`: per user, staged strict-after reach times
    * folded over the event stream, one `Conversion` record emitted
    * EXACTLY ONCE when the final stage fills (once full, the state
    * never resets, so a second purchase cannot re-emit).
    *
    * State per user is k timestamps — BOUNDED BY CONSTRUCTION, the
    * reason this shape runs unbounded where a buffer-everything
    * design (assembleTraces) needs a close condition. The price is an
    * ordering contract: the greedy fold equals the batch operator's
    * staged minima only when each user's events arrive in event-time
    * order ACROSS micro-batches (the Kafka partition-by-user
    * reality); WITHIN a batch arrival order is irrelevant — the group
    * iterator is sorted by (ts, eventType) before folding. A stale
    * cross-batch straggler is simply a missed earlier witness: stage
    * times can only be later than the batch twin's, never wrong-
    * ordered — the law the spec pins.
    */
  def funnelStream(events: Dataset[FunnelEvent],
                   steps: Seq[String]): Dataset[Conversion] = {
    require(steps.nonEmpty, "funnelStream: need at least one step")
    require(steps.distinct.size == steps.size, "funnelStream: steps must be distinct")
    import events.sparkSession.implicits._
    val k = steps.size
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          var staged = state.getOption.fold(
            Seq.fill[Option[Timestamp]](k)(None))(_.staged)
          val wasDone = staged.last.isDefined
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.eventType))
          for (e <- sorted) {
            val i = steps.indexOf(e.eventType)
            if (i >= 0 && staged(i).isEmpty &&
                (i == 0 || staged(i - 1).exists(p => e.ts.after(p))))
              staged = staged.updated(i, Some(e.ts))
          }
          state.update(FunnelState(staged))
          if (!wasDone && staged.last.isDefined) {
            val t0 = staged.head.get
            val tk = staged.last.get
            Iterator.single(Conversion(userId, t0, tk,
              (tk.getTime - t0.getTime) / 1000L))
          } else Iterator.empty
        })
  }

  /** Streaming exact deduplication — the unbounded arm of the batch
    * dedup tier (graft.llm.Dedup.exactGroups): documents keyed by
    * content hash, duplicates dropped via
    * `dropDuplicatesWithinWatermark`, which is the ONLY state-bounded
    * shape for this — a plain streaming dropDuplicates keeps every key
    * forever and OOMs an unbounded corpus. Semantics are explicitly
    * within-watermark: duplicates arriving within `watermarkDelay` of
    * each other deduplicate exactly; once the watermark passes a key
    * its state is evicted, so a much-later copy re-emits (at corpus
    * scale the re-emit tail is then caught by the batch tier over the
    * landed data — the standard lambda split).
    */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
                 watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class PackDoc(shard: String, docId: Long, ts: Timestamp, nTokens: Long)
  final case class PackState(packId: Long, acc: Long, nDocs: Long,
                             firstDoc: Long, lastDoc: Long)
  final case class ClosedPack(shard: String, packId: Long, nDocs: Long,
                              packTokens: Long, firstDoc: Long, lastDoc: Long)

  /** Streaming arm of `Chunking.packGreedy`: per shard, a running
    * token accumulator packs documents as they ARRIVE; a pack emits
    * the moment the next document would overflow `budgetTokens`, and
    * the open tail pack flushes when the watermark says the shard has
    * gone quiet for `flushGapMinutes` (event-time timeout — the same
    * close-on-silence contract as `assembleTraces`).
    *
    * Semantics decided for the stream (nothing to copy from batch):
    * packing order is ARRIVAL order, (ts, docId)-sorted within each
    * micro-batch for determinism under replay of the same batch
    * boundaries — a training-data stream wants append-time locality,
    * not global id order; the batch tier over the landed corpus gives
    * the id-ordered packing when that matters. State per shard is one
    * accumulator (constant memory), so shard cardinality alone bounds
    * the state store.
    */
  def packStream(docs: Dataset[PackDoc], budgetTokens: Long,
                 flushGapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[ClosedPack] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (shard: String, it: Iterator[PackDoc], state: GroupState[PackState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            if (s.nDocs > 0)
              Iterator.single(ClosedPack(shard, s.packId, s.nDocs, s.acc,
                s.firstDoc, s.lastDoc))
            else Iterator.empty
          } else {
            val out = Seq.newBuilder[ClosedPack]
            var s = state.getOption.getOrElse(PackState(1L, 0L, 0L, Long.MaxValue, Long.MinValue))
            var maxTs = Long.MinValue
            it.toSeq.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
              maxTs = math.max(maxTs, d.ts.getTime)
              if (s.nDocs > 0 && s.acc + d.nTokens > budgetTokens) {
                out += ClosedPack(shard, s.packId, s.nDocs, s.acc, s.firstDoc, s.lastDoc)
                s = PackState(s.packId + 1, 0L, 0L, Long.MaxValue, Long.MinValue)
              }
              s = PackState(s.packId, s.acc + d.nTokens, s.nDocs + 1,
                math.min(s.firstDoc, d.docId), math.max(s.lastDoc, d.docId))
            }
            state.update(s)
            state.setTimeoutTimestamp(maxTs + flushGapMinutes * 60000L)
            out.result().iterator
          }
        })
  }

  /** Stream-static AS-OF enrichment — the streaming arm of the batch
    * `operators.AsofJoin` for the common case where the right side is
    * a slowly-changing dimension snapshot (price list, config,
    * checkpointed state): attach to each stream event the payload of
    * the latest state row with the same key and `state.ts <=
    * event.ts`.
    *
    * Realization: the static side is rewritten batch-side into
    * validity intervals [ts, next_ts) with one `lead` window, and the
    * join becomes a STATELESS stream-static left join on key +
    * interval containment — no watermark, no join state, and each
    * event matches at most one interval because the intervals
    * partition the time axis per key. Events before the first state
    * row enrich with nulls (ASOF LEFT semantics). Several state rows
    * at one (key, ts) would make the winner partition-order-dependent
    * — pre-aggregate the state to one row per (key, ts), as with the
    * batch operator.
    */
  def asofEnrich(events: DataFrame, state: DataFrame, keyCol: String,
                 tsCol: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(payloadCols.nonEmpty, "asofEnrich: need at least one payload column")
    payloadCols.foreach(c => require(!events.columns.contains(c),
      s"asofEnrich: payload column $c clashes with an event column"))
    val reserved = Seq("__ek", "__from", "__until")
    for {
      (df, side) <- Seq(events -> "events", state -> "state")
      c <- reserved if df.columns.contains(c)
    } require(false,
      s"asofEnrich: $side input already has a '$c' column — rename it; " +
        "the name is reserved for internal use")
    val w = Window.partitionBy(col("__ek")).orderBy(col("__from"))
    val intervals = state
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__ek") +: col(tsCol).as("__from") +:
        payloadCols.map(col): _*)
      .withColumn("__until", lead(col("__from"), 1).over(w))
    events.join(intervals,
        col(keyCol) === col("__ek") && col(tsCol) >= col("__from") &&
          (col("__until").isNull || col(tsCol) < col("__until")),
        "left")
      .drop("__ek", "__from", "__until")
  }

  /** Streaming interval join — the unbounded arm of the batch
    * `operators.IntervalJoin`: match each event to the still-open
    * interval windows that contain it, as a watermarked stream-stream
    * INNER join.
    *
    * Spark can only evict join state when the condition bounds each
    * side's event time against the other's, so the interval span must
    * be declared: `maxSpanSeconds` enters the join condition as
    * `ts <= start + maxSpan`, giving the planner both eviction bounds
    * (right state dies when the event watermark passes start + span;
    * left state dies when the interval watermark passes ts). Intervals
    * LONGER than the declared span cannot be matched correctly with
    * bounded state, so — mirroring the batch arm's `maxSpanBuckets`
    * contract — they are dropped up front, loudly auditable with
    * `IntervalJoin.pathologicalIntervals` over the landed data.
    *
    * Contract pinned in StreamingSpec: an event inside a window within
    * the watermark emits exactly one joined row; an event arriving
    * after the watermark has passed its timestamp is dropped (standard
    * event-time semantics), never matched against evicted state.
    */
  def intervalJoinStream(events: DataFrame, intervals: DataFrame,
                         keyCol: String, tsCol: String, startCol: String,
                         endCol: String, maxSpanSeconds: Long,
                         eventDelay: String = "10 minutes",
                         intervalDelay: String = "10 minutes"): DataFrame = {
    require(maxSpanSeconds > 0, "intervalJoinStream: maxSpanSeconds must be positive")
    val rk = "__ik"
    Seq(events -> "events", intervals -> "intervals").foreach { case (df, side) =>
      require(!df.columns.contains(rk),
        s"intervalJoinStream: $side input already has a '$rk' column — " +
          "rename it; the name is reserved for the internal join key")
    }
    val l = events.withWatermark(tsCol, eventDelay)
    val r = intervals
      .filter(col(keyCol).isNotNull &&
        col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol) &&
        col(endCol) <= col(startCol) + expr(s"INTERVAL $maxSpanSeconds SECONDS"))
      .withColumnRenamed(keyCol, rk)
      .withWatermark(startCol, intervalDelay)
    l.join(r,
        col(keyCol) === col(rk) &&
          col(tsCol) >= col(startCol) &&
          col(tsCol) <= col(endCol) &&
          col(tsCol) <= col(startCol) + expr(s"INTERVAL $maxSpanSeconds SECONDS"))
      .drop(rk)
  }

  /** Streaming benchmark decontamination — the unbounded arm of
    * `Dedup.contaminationPairs`: an incoming document stream is
    * checked against a STATIC benchmark corpus by n-gram overlap, and
    * every contaminated document emits exactly one alert row (id, ts)
    * within the watermark.
    *
    * Shape: the document's distinct n-grams explode (row-local, no
    * state), a stream-static LEFT SEMI join keeps rows whose gram
    * appears in the benchmark gram table (the static side is
    * benchmark-sized — Catalyst broadcasts it, the stream never
    * shuffles), and `dropDuplicatesWithinWatermark` collapses the
    * per-gram matches to one alert per document with bounded state.
    * minShared > 1 thresholds need a streaming count aggregation
    * (watermark-delayed emission); the alert contract here is the
    * EXISTS form — a single shared gram flags the doc, which is the
    * conservative policy a live ingest gate wants. The landed corpus
    * re-checks with the batch arm's counted threshold.
    */
  def decontaminateStream(docs: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String, tsCol: String,
                          n: Int = 5,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    for (c <- Seq("gram", "__toks") if docs.columns.contains(c))
      require(false,
        s"decontaminateStream: '$c' is reserved for internal use — rename it")
    // the same guard on the static side: withColumn would silently
    // clobber a pre-existing __toks on the bench frame
    for (c <- Seq("gram", "__toks") if bench.columns.contains(c))
      require(false,
        s"decontaminateStream: bench column '$c' is reserved — rename it")
    val benchGrams = bench
      .withColumn("__toks", graft.llm.TextOps.tokens(textCol))
      .select(explode_outer(array_distinct(
        graft.llm.TextOps.ngramsAll("__toks", n))).as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()
    docs.withWatermark(tsCol, watermarkDelay)
      .withColumn("__toks", graft.llm.TextOps.tokens(textCol))
      .withColumn("gram", explode_outer(array_distinct(
        graft.llm.TextOps.ngramsAll("__toks", n))))
      .filter(col("gram").isNotNull)
      .join(benchGrams, Seq("gram"), "left_semi")
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol))
  }

  /** Streaming semantic dedup — the unbounded arm of the SemDeDup
    * tier (`Similarity.semanticDedup`, L-43): an incoming document
    * stream with embeddings is checked against a STATIC int8-quantized
    * corpus store, and every document with a near-duplicate in the
    * store (int8 cosine ≥ `threshold`) emits exactly ONE alert row
    * within the watermark — the daily-crawl ingest gate for the
    * semantic tier.
    *
    * Shape (the decontaminateStream pattern applied to embeddings):
    * candidates come from multi-table hyperplane-LSH bucket EQUALITY —
    * both sides hash with the SAME driver-precomputed planes
    * (`Similarity.planeArray`), so the stream-static join is a plain
    * equi-join on (table, bucket), never a distance predicate; the
    * static side is (table, bucket, id, 8-bit code, norm) — the int8
    * store is the broadcast/build side and the stream never shuffles.
    * Each candidate verifies with the scale-free int8 cosine (the
    * per-vector quantization scales cancel in the ratio), and
    * `dropDuplicatesWithinWatermark` collapses multi-table/multi-
    * neighbor matches to one alert per doc with bounded state.
    *
    * Approximate by design on two counts — LSH candidate misses and
    * int8 rounding — both one-sided gates of the exact batch twin,
    * which re-checks the landed corpus (`StreamingSpec` gates planted
    * dups alert in-watermark, clean docs stay silent, and alerts agree
    * with the batch arm on the fixture). Zero-norm vectors have no
    * direction: both sides drop them here (n8 > 0), and a corpus that
    * can contain them should quarantine upstream
    * (`Similarity.quarantineEmbeddings`).
    *
    * Output: (idCol, tsCol, dup_of — ONE witness store id; which
    * witness survives the drop-duplicates is first-seen, not ranked).
    */
  def semanticDedupStream(docs: DataFrame, store: DataFrame,
                          idCol: String, embCol: String, tsCol: String,
                          storeIdCol: String, threshold: Double,
                          tables: Int = 8, nbits: Int = 0,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.llm.Similarity
    for (c <- Seq("table", "bucket", "dup_of", "__q8", "__n8", "__vd")
         if docs.columns.contains(c))
      require(false,
        s"semanticDedupStream: '$c' is reserved for internal use — rename it")
    val dims = store.select(size(expr(embCol)).as("d")).head(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    val bits =
      if (nbits > 0) nbits
      else math.max(1, math.ceil(math.log(
        math.max(store.count(), 2L) / 64.0) / math.log(2.0)).toInt)
    val planes = Similarity.planeArray(tables, bits, dims)

    def withInt8(df: DataFrame, id: String): DataFrame =
      Similarity.quantizeInt8(df, id, embCol)
        .withColumn("__n8", graft.functions.Sketches.dotQ(col("qvec"), col("qvec")))
        .filter(col("__n8") > 0)
        .select(col(id), col("qvec").as("__q8"), col("__n8"))

    val storeSide = withInt8(store, storeIdCol)
      .join(store.select(col(storeIdCol),
        expr(s"transform($embCol, x -> CAST(x AS double))").as("__vd")), storeIdCol)
      .select(col(storeIdCol).as("dup_of"), col("__q8").as("__sq8"),
        col("__n8").as("__sn8"),
        posexplode(graft.functions.Sketches.hyperplaneSigs(
          col("__vd"), planes, tables, bits)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")

    docs.withWatermark(tsCol, watermarkDelay)
      .withColumn("__vd", expr(s"transform($embCol, x -> CAST(x AS double))"))
      .transform(d => Similarity.quantizeInt8Attach(d, embCol, "__q8"))
      .withColumn("__n8", graft.functions.Sketches.dotQ(col("__q8"), col("__q8")))
      .filter(col("__n8") > 0)
      .select(col(idCol), col(tsCol), col("__q8"), col("__n8"),
        posexplode(graft.functions.Sketches.hyperplaneSigs(
          col("__vd"), planes, tables, bits)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
      .join(storeSide, Seq("table", "bucket"))
      .filter(graft.functions.Sketches.dotQ(col("__q8"), col("__sq8"))
        .cast("double") /
        sqrt((col("__n8") * col("__sn8")).cast("double")) >= threshold)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol), col("dup_of"))
  }

  /** Streaming perceptual media dedup — the `semanticDedupStream`
    * stream-static pattern applied to the media fingerprint store:
    * incoming media rows are pixel-fingerprinted WHERE THEY ARRIVE
    * (map-only — `Multimodal.withPixelHash`, the JDK codec + byte
    * fallback), candidates come from 16-bit chunk EQUALITY against
    * the static store's banded fingerprint table (a plain
    * stream-static equi-join; the store is the build side, the
    * stream's payload bytes never shuffle — only the 8-byte hash and
    * the carried columns do), the exact `bit_count` verify keeps
    * hamming ≤ `maxHamming` (banding COMPLETE at ≤ 3, the
    * `hashNearDups` pigeonhole), and `dropDuplicatesWithinWatermark`
    * emits exactly ONE alert per incoming doc — with SOME witness
    * when several store rows match, the semanticDedupStream contract.
    * This is the crawl-ingest shape: "is this incoming image a
    * re-encode of something we already have?", answered before the
    * payload is ever persisted. Undecodable payloads carry the
    * byte-kernel fallback hash (decoded = false on the alert), so a
    * byte-identical re-crawl of quarantine-tier content still
    * surfaces; NULL hashes (empty payloads) never pair.
    */
  def mediaDedupStream(docs: DataFrame, store: DataFrame, idCol: String,
                       mediaCol: String, tsCol: String, storeIdCol: String,
                       storeHashCol: String, maxHamming: Int = 3,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"mediaDedupStream: the 4-chunk banding is complete only for " +
        s"maxHamming <= 3, got $maxHamming")
    for (c <- Seq("chunk", "chunk_val", "dup_of", "hamming", "__dh",
        "__dh_decoded", "__sdh") if docs.columns.contains(c))
      require(false, s"mediaDedupStream: '$c' is reserved — rename it")
    val storeSide = store
      .select(col(storeIdCol).as("dup_of"),
        col(storeHashCol).cast("long").as("__sdh"))
      .filter(col("__sdh").isNotNull)
      .select(col("dup_of"), col("__sdh"), posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(__sdh, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    graft.llm.Multimodal.withPixelHash(docs, mediaCol, "__dh")
      .withWatermark(tsCol, watermarkDelay)
      .filter(col("__dh").isNotNull)
      .select(col(idCol), col(tsCol), col("__dh"), col("__dh_decoded"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(__dh, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
      .join(storeSide, Seq("chunk", "chunk_val"))
      .withColumn("hamming", expr("CAST(bit_count(__dh ^ __sdh) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol), col("dup_of"), col("hamming"),
        col("__dh_decoded").as("decoded"))
  }

  /** Streaming URL frontier dedup — the crawl-scheduler gate in FRONT
    * of every fetch (one tier earlier than the media/semantic ingest
    * gates, which need the payload: this one triages on the URL
    * alone, before any bytes are spent): each arrival is
    * canonicalized (`TextOps.canonicalizeUrl`, the L-264 rules) and
    * verdicted against the standing frontier store of canonical URLs:
    *   - `malformed` — no scheme://host shape (canonical NULL): junk
    *     never silently becomes a fetchable "page",
    *   - `seen`      — the canonical is already in the store, with
    *     the store id as witness,
    *   - `accepted`  — a new canonical: the fetch-queue feed.
    * Within the watermark, re-arrivals of the SAME canonical collapse
    * to the FIRST row (`dropDuplicatesWithinWatermark` on the
    * canonical key — ten raw variants of one page cost one verdict;
    * malformed rows have no canonical and keep per-id uniqueness).
    *
    * Scale shape: canonicalization is row-local Catalyst (no UDF);
    * the store check is a stream-static LEFT join on the canonical
    * key with the store as build side (witness collapsed to min id on
    * the STATIC side, so a duplicated store row can never double a
    * verdict); streaming state = one canonical key per in-flight page
    * within the watermark.
    */
  def urlDedupStream(docs: DataFrame, store: DataFrame, idCol: String,
                     urlCol: String, tsCol: String,
                     storeCanonicalCol: String, storeIdCol: String,
                     watermarkDelay: String = "10 minutes"): DataFrame = {
    for (c <- Seq("canonical_url", "status", "seen_id", "__k")
        if docs.columns.contains(c))
      require(false, s"urlDedupStream: '$c' is reserved — rename it")
    val storeSide = store
      .select(col(storeCanonicalCol).as("canonical_url"),
        col(storeIdCol).as("seen_id"))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col("seen_id")).as("seen_id"))
    graft.llm.TextOps.canonicalizeUrl(
        docs.withWatermark(tsCol, watermarkDelay), urlCol, "canonical_url")
      .withColumn("__k", coalesce(col("canonical_url"),
        concat(lit("malformed:"), col(idCol).cast("string"))))
      .dropDuplicatesWithinWatermark("__k")
      .join(storeSide, Seq("canonical_url"), "left")
      .select(col(idCol), col(tsCol), col("canonical_url"),
        when(col("canonical_url").isNull, lit("malformed"))
          .when(col("seen_id").isNotNull, lit("seen"))
          .otherwise(lit("accepted")).as("status"),
        col("seen_id"))
  }

  final case class FrontierArrival(host: String, docId: Long, ts: Timestamp)
  final case class PolitenessVerdict(host: String, winStart: Long,
                                     docId: Long, hostRank: Int,
                                     scheduled: Boolean)

  /** Streaming per-host politeness scheduler — the unbounded arm of
    * `TextOps.politenessSchedule` and the crawl tier's fourth stage:
    * accepted frontier arrivals are keyed by (host, tumbling
    * `windowSeconds` window) and ranked in arrival order; the first
    * `perHostQuota` ranks in each (host, window) are `scheduled`,
    * later ones `deferred`. Keys are independent BY CONSTRUCTION, so
    * a burst on one host consumes only its OWN window quota and can
    * never starve another host — the executed StreamingSpec law.
    *
    * State per open (host, window) is ONE counter (the quota already
    * used), freed by event-time timeout when the watermark passes the
    * window end — state is bounded by hosts × open windows, the same
    * bound as any windowed aggregate. Verdicts emit AS ARRIVALS COME
    * (append mode) — a scheduler that only answered at window close
    * would be useless to the fetcher waiting on it.
    *
    * Ordering contract (the `funnelStream`/`packStream` convention):
    * within a micro-batch the group sorts by (ts, docId); the fold
    * equals the batch twin whenever each key's arrivals are delivered
    * in event-time order ACROSS batches — and the law gates rank
    * continuity across a batch boundary (the second batch's ranks
    * continue where the first stopped, from state, not from 1).
    *
    * Per-host quotas (`hostQuotas` — the batch arm's broadcast rules
    * table, here a plain Map closed over by the fold because a quota
    * corpus is hosts-sized driver data, exactly what a task closure
    * broadcasts): effective quota = the host's entry or the global
    * default. The quota enters only the verdict; ranks are invariant,
    * the same law the batch arm pins.
    */
  def politenessStream(urls: Dataset[FrontierArrival], windowSeconds: Long,
                       perHostQuota: Int,
                       watermarkDelay: String = "10 minutes",
                       hostQuotas: Map[String, Int] = Map.empty)
  : Dataset[PolitenessVerdict] = {
    require(windowSeconds >= 1L,
      s"politenessStream: windowSeconds >= 1, got $windowSeconds")
    require(perHostQuota >= 1,
      s"politenessStream: perHostQuota >= 1, got $perHostQuota")
    require(hostQuotas.values.forall(_ >= 1),
      s"politenessStream: every per-host quota must be >= 1")
    import urls.sparkSession.implicits._
    urls
      .withWatermark("ts", watermarkDelay)
      .groupByKey(u => (u.host,
        u.ts.getTime / 1000L / windowSeconds * windowSeconds))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, Long), it: Iterator[FrontierArrival],
         state: GroupState[Long]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val quota = hostQuotas.getOrElse(key._1, perHostQuota)
            var used = state.getOption.getOrElse(0L)
            val out = it.toSeq.sortBy(u => (u.ts.getTime, u.docId)).map { u =>
              used += 1L
              PolitenessVerdict(key._1, key._2, u.docId, used.toInt,
                scheduled = used <= quota)
            }
            state.update(used)
            // free the counter once the watermark passes the window end
            state.setTimeoutTimestamp((key._2 + windowSeconds) * 1000L)
            out.iterator
          }
        })
  }

  /** One maintained host edge: null src/dst = the audit classes
    * (malformed own-URL / hostless link), kept loud like the batch arm.
    */
  final case class LinkEdgeCount(srcHost: String, dstHost: String,
                                 nLinks: Long, nPages: Long)

  /** Streaming host link-graph maintenance — the unbounded arm of
    * `TextOps.hostLinkGraph`: page arrivals run the SAME row-local
    * extract-and-canonicalize map stage (`TextOps.linkHits` — shared
    * code, not a re-derivation), then one stateful fold per
    * (src_host, dst_host) keeps the running (n_links, n_pages) totals
    * and re-emits the pair's row on every update — the incremental
    * index the daily host-rank refresh (`PageRank.pageRankWarm`)
    * reads instead of re-scanning the crawl.
    *
    * Ingest contract (documented, both load-bearing): arrivals are
    * FRONTIER-DEDUPED upstream (`urlDedupStream` — each page
    * contributes once, which is what makes n_pages a running count
    * instead of an unbounded distinct-id state), and a page's links
    * arrive ATOMICALLY in its single input row (true by construction
    * — the extractor runs on the arrival row), so the per-batch
    * distinct-id count per pair is exact, never split. The contract
    * is EXACTLY-ONCE delivery, not merely deduped content: the state
    * is additive, so an at-least-once redelivery (source replay, a
    * recrawl of an already-counted page, or any channel that can
    * re-present a row) permanently over-counts n_links AND n_pages,
    * and nothing downstream detects it — guarding would mean a per-
    * pair seen-id set, i.e. the unbounded distinct-id state this
    * design exists to avoid. Run it behind a checkpointed exactly-
    * once source (file/Kafka with the query's own checkpoint), or
    * accept the counts as upper bounds. State per pair
    * is two BIGINTs — bounded by hosts², the same small table the
    * batch aggregate ends in; no timeout, a link graph has no window.
    * Equality law: after any arrival split into micro-batches, the
    * latest row per pair equals `hostLinkGraph` on the union
    * (StreamingSpec).
    */
  def linkGraphStream(pages: DataFrame, idCol: String, urlCol: String,
                      textCol: String): Dataset[LinkEdgeCount] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // "" is impossible as a real host (an empty host canonicalizes to
    // NULL upstream), so it is a safe null sentinel for the group key
    val hits = graft.llm.TextOps.linkHits(pages, idCol, urlCol, textCol)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col("src_host"), lit("")).as("s"),
        coalesce(col("dst_host"), lit("")).as("d"))
      .as[(Long, String, String)]
    hits.groupByKey { case (_, s, d) => (s, d) }
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[(Long, String, String)],
         state: GroupState[(Long, Long)]) => {
          val rows = it.toSeq
          val (links0, pages0) = state.getOption.getOrElse((0L, 0L))
          val totals = (links0 + rows.size,
            pages0 + rows.map(_._1).distinct.size)
          state.update(totals)
          LinkEdgeCount(if (key._1.isEmpty) null else key._1,
            if (key._2.isEmpty) null else key._2, totals._1, totals._2)
        })
  }

  /** One page-visit arrival for the freshness estimator: `changed` =
    * content differed from the previous fetch (the fetcher's diff bit).
    */
  final case class VisitArrival(pageId: Long, ts: Timestamp,
                                changed: Boolean)

  /** One maintained freshness estimate; lambdaDayMicro is None until
    * the page has two visits spanning more than a second — the batch
    * arm's quarantine contract, never a fake 0.
    */
  final case class RevisitEstimate(pageId: Long, nVisits: Long,
                                   nChanges: Long, spanSeconds: Long,
                                   lambdaDayMicro: Option[Long])

  /** Streaming revisit-frequency maintenance — the unbounded arm of
    * `TextOps.revisitSchedule`: each page's (n, X, min ts, max ts)
    * live in keyed state and the Cho & Garcia-Molina λ̂ is recomputed
    * row-locally on every update, so the re-crawl scheduler always
    * reads the current per-day change rate instead of waiting for a
    * batch collapse. The SAME pinned float tail as the batch arm —
    * one IEEE divide of exact integers, one `StrictMath.log` (the
    * function Spark's `Log` expression calls in BOTH interpreted and
    * codegen paths; `Math.log` is HotSpot-intrinsified and may differ
    * by 1 ulp, which a floor boundary would amplify to an off-by-one
    * micro — the same reason `Unigram` pins StrictMath), three pinned
    * left-to-right mul/divs through the micro floor — so stream and
    * batch agree BIT-FOR-BIT, not approximately.
    *
    * The fold is ORDER-INVARIANT (counts and min/max absorb any
    * arrival order, unlike the politeness rank), so the stream ≡
    * batch law holds under ARBITRARY batch splits and shuffles — no
    * event-time-ordered-delivery caveat. State is four integers per
    * page — the same |pages| cardinality the frontier store already
    * holds; no timeout, a freshness estimate never expires (a page
    * unseen for a year is exactly the page whose estimate the
    * scheduler needs).
    */
  def revisitStream(visits: Dataset[VisitArrival])
  : Dataset[RevisitEstimate] = {
    import visits.sparkSession.implicits._
    visits.groupByKey(_.pageId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (page: Long, it: Iterator[VisitArrival],
         state: GroupState[(Long, Long, Long, Long)]) => {
          var (n, x, lo, hi) =
            state.getOption.getOrElse((0L, 0L, Long.MaxValue, Long.MinValue))
          it.foreach { v =>
            val t = Math.floorDiv(v.ts.getTime, 1000L)
            n += 1L; if (v.changed) x += 1L
            if (t < lo) lo = t
            if (t > hi) hi = t
          }
          state.update((n, x, lo, hi))
          val span = hi - lo
          val lambda = if (n >= 2L && span > 0L)
            Some(math.floor((-StrictMath.log(
                (2.0 * (n - x) + 1.0) / (2.0 * n + 1.0)))
              * 1000000.0 * 86400.0 * (n - 1.0) / span.toDouble).toLong)
          else None
          RevisitEstimate(page, n, x, span, lambda)
        })
  }

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
