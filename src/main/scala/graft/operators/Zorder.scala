package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A 100 TB table is usually filtered on more than one column
  * (e.g. date AND tenant, x AND y); sorting the layout by either
  * column alone leaves the other's min/max stats useless. Interleaving
  * the bits of both keys (the Morton curve) and range-partitioning +
  * sorting files by that code gives every file a TIGHT bounding box in
  * BOTH dimensions, so parquet footer min/max stats prune files for
  * any 2-d box predicate — the same trick Delta's OPTIMIZE ZORDER BY
  * runs. Everything here is plain integer bit arithmetic in Column
  * expressions: codegen'd, no UDF, and exactly reproducible in any
  * engine (the oracle replays it with a shift-and-sum formulation).
  */
object Zorder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2·i —
    * the classic magic-number chain (5 mask/shift ops, all codegen'd).
    * Inputs are masked to 16 bits first: callers quantize their
    * dimension to [0, 65535] (rank- or range-bucketed) before calling.
    */
  def spreadBits16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: x takes the even
    * bits, y the odd bits.
    */
  def mortonCode(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Cluster `df` for a Z-ordered write: range-partition into
    * `numFiles` splits of the Morton code of (`xCol`, `yCol`) and sort
    * within each split. One range shuffle (with Spark's sampled range
    * boundaries), then each output file covers a contiguous Z-range —
    * a tight 2-d bounding box. Write the result with
    * `.write.parquet(...)`; the `z` column is kept so consumers (and
    * tests) can audit the layout.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 numFiles: Int): DataFrame = {
    require(numFiles > 0, "clusterByZ: numFiles must be positive")
    require(!df.columns.contains("z"),
      "clusterByZ: input already has a 'z' column — rename it; " +
        "the name carries the Morton code in the output layout")
    df.withColumn("z", mortonCode(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
  }
}
