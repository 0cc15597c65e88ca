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
  * interval-span/bucketWidth ratio (pick `bucketSeconds` near the
  * typical interval length), and the join shuffles on high-cardinality
  * (key, bucket) instead of nested-looping.
  *
  * Intervals with null bounds or end < start can never contain a
  * point (SQL comparison semantics; Spark's sequence() would also
  * count DOWNWARD for a reversed range) and are filtered up front.
  */
object IntervalJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, startCol: String, endCol: String,
                   bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "intervalJoin: bucketSeconds must be positive")
    val l = left.withColumn("__b",
      floor(col(tsCol).cast("long") / bucketSeconds))
    val r = right
      .filter(col(keyCol).isNotNull &&
        col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__b", explode(sequence(
        floor(col(startCol).cast("long") / bucketSeconds),
        floor(col(endCol).cast("long") / bucketSeconds))))
    l.join(r, Seq(keyCol, "__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
