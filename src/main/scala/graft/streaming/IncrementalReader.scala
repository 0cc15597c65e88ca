package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** High-watermark incremental poller: the bridge between a batch-only
  * source and the streaming surface. JDBC is not a native streaming
  * source (SURVEY §7.1 step 7); the standard pattern is to poll the
  * batch source with a monotone watermark column and feed each delta
  * into `foreachBatch`-style processing.
  *
  * Each `poll()` reads rows with `lastWatermark < ts <= max(ts) - lag`
  * and advances the watermark to that upper bound. Both bounds are
  * plain filters/aggregates, so on a JDBC source they push down into
  * the remote WHERE clause / MAX query — each poll transfers only the
  * delta, never a rescan.
  *
  * Delivery contract: exactly-once per row for sources that are
  * append-only in `tsCol` up to a bounded write lag — `lag` holds back
  * the newest interval so stragglers landing out of order inside that
  * bound are picked up by the next poll instead of being skipped.
  */
final class IncrementalReader(load: () => DataFrame, tsCol: String,
                              lagSeconds: Long = 0L) {

  @volatile private var watermark: Option[Timestamp] = None

  def currentWatermark: Option[Timestamp] = watermark

  /** The next delta batch (possibly empty). */
  def poll(): DataFrame = {
    val df = load()
    val upperRow = df.agg(max(col(tsCol))).head()
    val upper =
      if (upperRow.isNullAt(0)) None
      else {
        val m = upperRow.getTimestamp(0)
        Some(if (lagSeconds > 0) new Timestamp(m.getTime - lagSeconds * 1000) else m)
      }
    val lower = watermark
    (lower, upper) match {
      case (_, None) => df.filter(lit(false)) // empty source
      case (Some(lo), Some(hi)) if !hi.after(lo) => df.filter(lit(false)) // no progress
      case (lo, Some(hi)) =>
        watermark = Some(hi)
        val upTo = df.filter(col(tsCol) <= lit(hi))
        lo.fold(upTo)(l => upTo.filter(col(tsCol) > lit(l)))
    }
  }
}
