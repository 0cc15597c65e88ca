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
  * window pass where `last(payload, ignoreNulls)` carries the most
  * recent right payload forward into the left rows. Cost is a single
  * sort per key group, identical asymptotics to the sort-merge
  * as-of joins native engines implement.
  *
  * Ordering contract: right rows sort BEFORE left rows at equal
  * timestamps (the join is inclusive, `right.ts <= left.ts`); if the
  * right side can hold several rows per (key, ts), pre-aggregate or
  * pass `tieCols` to make the winner deterministic.
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "asof: need at least one payload column")
    payloadCols.foreach(c => require(!left.columns.contains(c),
      s"asof: payload column $c clashes with a left column"))

    val rightUp = right.select(
      (Seq(col(keyCol), col(tsCol)) ++ payloadCols.map(c => col(c).as(s"__r_$c"))): _*)
    val rightTagged = left.columns
      .filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(rightUp)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("__side", lit(0))
    val leftTagged = payloadCols
      .foldLeft(left)((d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
      .withColumn("__side", lit(1))

    val order = (col(tsCol).asc +: col("__side").asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = payloadCols.foldLeft(leftTagged.unionByName(rightTagged))(
      (d, c) => d.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))

    payloadCols.foldLeft(
      attached.filter(col("__side") === 1).drop("__side"))(
      (d, c) => d.withColumnRenamed(s"__r_$c", c))
  }
}
