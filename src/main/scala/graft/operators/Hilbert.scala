package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the locality upgrade over Z-order for
  * multi-dimensional data skipping. The Morton curve takes long
  * diagonal jumps at power-of-two boundaries, so a Z-range file's 2-d
  * bounding box can be up to 2× looser than its row count warrants;
  * the Hilbert curve is CONTINUOUS (consecutive codes are always
  * 4-adjacent cells — the defining property, spec-gated), so every
  * contiguous code range is a compact blob and the per-file min/max
  * boxes are as tight as a space-filling layout gets. This is why
  * Delta/Iceberg added Hilbert next to Z-order for OPTIMIZE.
  *
  * The xy→d transform is the classic bit-level algorithm (quadrant
  * digit + Gray-style reflect/swap per level, 16 levels for 16-bit
  * dimensions). A pure-Column formulation would double the expression
  * tree per level (the reflected x feeds the next level twice —
  * 2^16 nodes), so the kernel is a compiled Catalyst expression
  * (`hilbert_index`) delegating to the canonical loop below; the SAME
  * loop replays in the oracle as an unrolled/recursive SQL iteration,
  * because every step is integer CASE arithmetic.
  */
object Hilbert {

  val Order = 16 // bits per dimension; d fits 32 bits

  /** Canonical xy→d loop (16-bit dims masked like Zorder.spreadBits16).
    * Deterministic integer arithmetic only.
    */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Compiled Hilbert index column of two 16-bit dimensions. */
  def hilbertIndex(x: Column, y: Column): Column =
    graft.functions.HilbertFunctions.hilbertIndex(x, y)

  /** Cluster `df` for a Hilbert-ordered write — same contract as
    * `Zorder.clusterByZ`: one range shuffle on the code, sort within
    * splits, every output file covers a contiguous (and, for Hilbert,
    * CONNECTED) curve range. The `h` column is kept for audits.
    */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
                       numFiles: Int): DataFrame = {
    require(numFiles > 0, "clusterByHilbert: numFiles must be positive")
    require(!df.columns.contains("h"),
      "clusterByHilbert: input already has an 'h' column — rename it; " +
        "the name carries the Hilbert code in the output layout")
    df.withColumn("h", hilbertIndex(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("h"))
      .sortWithinPartitions("h")
  }
}
