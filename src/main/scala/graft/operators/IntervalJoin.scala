package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (point-in-range) join: match every left event to the
  * right intervals that contain it — same key, `start <= ts <= end`.
  *
  * Spark plans a raw range predicate as BroadcastNestedLoopJoin
  * (O(|L|·|R|) per key): the scale-safe form is time bucketing. Each
  * interval is exploded into the fixed-width buckets it overlaps, the
  * event carries its single bucket, and the join becomes plain
  * (key, bucket) EQUALITY followed by the exact range check. An event
  * has exactly one bucket, so each (event, interval) pair meets at
  * most once — no post-join dedup. Cost: |R| grows by the average
  * interval-span/bucketWidth ratio, and the join shuffles on
  * high-cardinality (key, bucket) instead of nested-looping.
  *
  * `bucketSeconds` omitted ⇒ auto-sized to the MEDIAN interval span
  * (clamped to ≥ 1 s): a bucket near the typical interval length keeps
  * the explode factor ~O(1) per interval while the bucket key stays
  * selective — the same measure-then-pick pattern as the LSH auto-nbits
  * (Similarity.autoNbits). The one-pass percentile probe runs a small
  * Spark job at CONSTRUCTION time (same contract as IVF training).
  *
  * Intervals with null bounds or end < start can never contain a
  * point (SQL comparison semantics; Spark's sequence() would also
  * count DOWNWARD for a reversed range) and are filtered up front.
  *
  * `maxSpanBuckets`: one dirty far-future `end` explodes into millions
  * of bucket rows (and sequence() hard-errors past 2^31 elements),
  * stalling the whole job at corpus scale. With the cap set, intervals
  * spanning more buckets are DROPPED from the join — audit exactly
  * which with `pathologicalIntervals` (same loud-never-silent contract
  * as Dedup.ngramJaccardPairs' maxPostingLen / hotPostings).
  */
object IntervalJoin {

  /** Working column this operator appends internally; real inputs must
    * not use it (silently overwriting a payload column would corrupt
    * results — fail loudly instead).
    */
  private val Reserved = "__b"

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, startCol: String, endCol: String,
                   bucketSeconds: Option[Long] = None,
                   maxSpanBuckets: Option[Long] = None): DataFrame = {
    bucketSeconds.foreach(w =>
      require(w > 0, "intervalJoin: bucketSeconds must be positive"))
    maxSpanBuckets.foreach(c =>
      require(c > 0, "intervalJoin: maxSpanBuckets must be positive"))
    Seq(left -> "left", right -> "right").foreach { case (df, side) =>
      require(!df.columns.contains(Reserved),
        s"intervalJoin: $side input already has a '$Reserved' column — " +
          "rename it; the name is reserved for the internal bucket key")
    }
    val rValid = validIntervals(right, keyCol, startCol, endCol)
    val width = bucketSeconds.getOrElse(medianSpanSeconds(rValid, startCol, endCol))
    val l = left.withColumn(Reserved, floor(col(tsCol).cast("long") / width))
    val spanOk = maxSpanBuckets match {
      case None => lit(true)
      case Some(cap) =>
        floor(col(endCol).cast("long") / width) -
          floor(col(startCol).cast("long") / width) < cap
    }
    val r = rValid.filter(spanOk)
      .withColumn(Reserved, explode(sequence(
        floor(col(startCol).cast("long") / width),
        floor(col(endCol).cast("long") / width))))
    l.join(r, Seq(keyCol, Reserved))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(Reserved)
  }

  /** The intervals a capped `intervalJoin` run drops, with their bucket
    * span — derived from the same validity filter and bucket
    * arithmetic, so the audit can never drift from the join. Empty ⟺
    * the capped result equals the uncapped one.
    */
  def pathologicalIntervals(right: DataFrame, keyCol: String,
                            startCol: String, endCol: String,
                            bucketSeconds: Long,
                            maxSpanBuckets: Long): DataFrame =
    validIntervals(right, keyCol, startCol, endCol)
      .withColumn("span_buckets",
        floor(col(endCol).cast("long") / bucketSeconds) -
          floor(col(startCol).cast("long") / bucketSeconds) + 1)
      .filter(col("span_buckets") > maxSpanBuckets)

  private def validIntervals(right: DataFrame, keyCol: String,
                             startCol: String, endCol: String): DataFrame =
    right.filter(col(keyCol).isNotNull &&
      col(startCol).isNotNull && col(endCol).isNotNull &&
      col(endCol) >= col(startCol))

  /** Median interval span in whole seconds (≥ 1), via one
    * percentile_approx pass over the valid intervals; 3600 when the
    * right side is empty (any width joins nothing against nothing).
    */
  private def medianSpanSeconds(rValid: DataFrame, startCol: String,
                                endCol: String): Long = {
    val row = rValid.select(percentile_approx(
      col(endCol).cast("long") - col(startCol).cast("long"),
      lit(0.5), lit(10000)).as("m")).head()
    if (row.isNullAt(0)) 3600L else math.max(1L, row.getLong(0))
  }
}
