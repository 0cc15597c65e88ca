package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") via the classic two-pass
  * Misra-Gries scheme (Misra & Gries 1982; the candidate+verify form
  * is the textbook distributed adaptation): items whose frequency
  * exceeds N/k, with EXACT counts. The naive plan shuffles the whole
  * item universe to count it; this one shuffles only the occurrences
  * of ≤ (k−1)·partitions candidate items — at 100 TB the difference
  * between shuffling a trillion-term vocabulary and a few thousand
  * rows.
  */
object HeavyHitters {

  /** Pass 1 streams each partition once through a (k−1)-counter
    * Misra-Gries summary. The MG guarantee transfers to partitions by
    * pigeonhole: if f(x) > N/k globally then f_p(x) > N_p/k on at
    * least one partition, so the UNION of partition summaries is a
    * SUPERSET of every true heavy hitter (an executed law — the
    * adversarial split test). Pass 2 broadcast-semi-joins the corpus
    * to the candidate set and counts EXACTLY, so the sketch never
    * touches the output: results are deterministic, oracle-checkable,
    * and the strict `n·k > N` threshold is exact (frequency exactly
    * N/k is OUT, also a law). The partition count row rides the same
    * pass-1 summary, so the corpus is scanned exactly twice — once
    * streaming, once filtered.
    */
  def topFrequency(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"topFrequency: k >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
    val summary = items.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      while (it.hasNext) {
        val x = it.next(); n += 1
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None =>
            if (counters.size < k - 1) counters.update(x, 1L)
            else {
              // decrement-all step over a snapshot (mutating a map
              // mid-iteration is undefined behavior)
              for (key <- counters.keys.toArray) {
                val c = counters(key)
                if (c == 1L) counters.remove(key) else counters.update(key, c - 1)
              }
            }
        }
      }
      Iterator((null: String, n)) ++ counters.keysIterator.map(x => (x, 0L))
    }.toDF("item", "np")
      // tiny (≤ k·partitions rows); checkpoint so the N action and the
      // candidate join don't each re-stream the corpus
      .localCheckpoint(true)
    val total = summary.filter(col("item").isNull)
      .agg(coalesce(sum(col("np")), lit(0L))).head().getLong(0)
    val cands = summary.filter(col("item").isNotNull).select("item").distinct()
    items
      .join(broadcast(cands), Seq("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * k > total)
      .withColumn("share_micro",
        expr(s"(n * 1000000L) div nullif(${total}L, 0L)"))
  }
}
