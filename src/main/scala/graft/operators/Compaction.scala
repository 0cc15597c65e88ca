package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the OPTIMIZE half of the
  * layout family (Z-order/Hilbert answer "in what order"; this
  * answers "into how many files"): a lake that ingests streaming
  * micro-batches accumulates thousands of KB-sized files per
  * partition, and every reader pays per-file open cost until someone
  * compacts. The planner is the Delta/Iceberg binning heuristic:
  * within each table partition, walk files in a deterministic order
  * accumulating bytes, and cut a new output bin whenever the RUNNING
  * total BEFORE a file reaches the target size.
  */
object Compaction {

  /** Assign each file to a compaction bin: per `partCol`, files walk
    * in (size desc, file tie) order — biggest first, so full-size
    * files claim their own bin immediately instead of straggling a
    * small-file bin past 2× target — and `bin = cumBytesBefore div
    * target` (exact integer division). Guarantees, both executed as
    * laws: a file at least `targetBytes` big shares its bin with
    * nothing smaller-than-target-remainder (bins tile the cumulative
    * axis), and every bin's total is under `targetBytes` + its
    * largest member (the classic overshoot-by-one bound — binning
    * can't split a file). Files already ≥ target are flagged
    * `already_compact` so the executor can skip rewriting them — a
    * planner that silently re-wrote compact files would double write
    * amplification.
    *
    * Scale shape: one window chain per table partition (the cumsum
    * runs inside the partition key — no global sort), output one row
    * per file. The plan is DETERMINISTIC, so it hash-verifies
    * cross-engine and re-running it on an unchanged manifest is a
    * no-op diff.
    */
  def plan(files: DataFrame, partCol: String, fileCol: String,
           sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0L, s"plan: targetBytes > 0, got $targetBytes")
    val wo = Window.partitionBy(col(partCol))
      .orderBy(col(sizeCol).desc, col(fileCol))
    files
      .select(col(partCol).as("part"), col(fileCol).as("file"),
        col(sizeCol).as("bytes"))
      .withColumn("__before", coalesce(sum(col("bytes")).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
      .withColumn("already_compact", col("bytes") >= targetBytes)
      .select(col("part"), col("file"), col("bytes"), col("bin"),
        col("already_compact"))
  }
}
