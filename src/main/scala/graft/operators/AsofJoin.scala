package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to every left row the payload of the LATEST
  * right row with the same key and `right.ts <= left.ts` (the
  * training-pipeline shape: join events to their nearest-preceding
  * state/price/checkpoint).
  *
  * Spark has no native as-of join; the naive encodings are scale
  * traps — a range/theta join is O(|L|·|R|) per key, and a windowed
  * subquery per left row re-scans. This is the scalable union-window
  * form: tag both sides, union, ONE shuffle on the key, one ordered
  * window pass where `last(marker-struct, ignoreNulls)` carries the
  * most recent right payload forward into the left rows. The payload
  * travels inside a struct that is non-null exactly on right rows, so
  * a matched state whose payload value IS null attaches as null
  * (matching SQL ASOF LEFT JOIN) instead of falling through to an
  * older state. Cost is a single sort per key group — the same
  * asymptotics as the sort-merge as-of joins native engines run.
  *
  * Semantics pins:
  *  - inclusive: right rows sort BEFORE left rows at equal timestamps;
  *  - right rows with a null key or null ts can never match any left
  *    row (SQL comparison semantics) and are filtered out up front;
  *  - several right rows at one (key, ts) are mutually tied — the
  *    winner is partition-order-dependent, so PRE-AGGREGATE the right
  *    side to one row per (key, ts) when that can occur (tieCols only
  *    orders LEFT rows; left-only columns are null on right rows, so
  *    they cannot break right-side ties).
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "asof: need at least one payload column")
    payloadCols.foreach(c => require(!left.columns.contains(c),
      s"asof: payload column $c clashes with a left column"))
    // the internal working columns would silently overwrite (and then
    // drop) a real input column of the same name — fail loudly instead
    for {
      (df, side) <- Seq(left -> "left", right -> "right")
      c <- Seq("__r", "__side") if df.columns.contains(c)
    } require(false,
      s"asof: $side input already has a '$c' column — rename it; " +
        "the name is reserved for internal use")

    val rightUp = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct(payloadCols.map(col): _*).as("__r"))
    val rightTagged = left.columns
      .filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(rightUp)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("__side", lit(0))
    val payloadStructType = rightUp.schema("__r").dataType
    val leftTagged = left
      .withColumn("__r", lit(null).cast(payloadStructType))
      .withColumn("__side", lit(1))

    val order = (col(tsCol).asc +: col("__side").asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = leftTagged.unionByName(rightTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))

    payloadCols.foldLeft(
      attached.filter(col("__side") === 1).drop("__side"))(
      (d, c) => d.withColumn(c, col(s"__r.$c")))
      .drop("__r")
  }
}
