package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right row
  * with `right.ts <= left.ts` within the same key — the standard
  * time-series/CDC enrichment join (attach the dimension version in effect
  * at event time).
  *
  * Spark lacks a native as-of join; rather than a custom SparkPlan, this
  * composes built-ins the way a distributed merge as-of wants to run:
  * union both sides, one hash shuffle by key, one in-partition sort by
  * (ts, side), then `last_value(..., ignoreNulls)` carries the right side's
  * values forward onto left rows. Cost: single Exchange + Sort over
  * |L|+|R| — the same shape as a sort-merge join, with no per-row probing,
  * no range explosion, and AQE-managed skew handling. Scales to arbitrary
  * key cardinality; time-ordered data arrives nearly sorted, so the sort is
  * cheap.
  */
object AsofJoin {

  /** @param left      event side
    * @param right     versioned side; must be unique per (key, ts) —
    *                  pre-dedup ties or results are tie-ambiguous
    * @param key       join key column name (same name both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightVals right value columns to attach (null when no version
    *                  is in effect yet)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right at equal ts (<= semantics)
      .select((col("__ts") +: col("__side") +: col(key).as("__key") +:
        leftCols.map(col)) ++ rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((col("__ts") +: col("__side") +: col(key).as("__key") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("__side")) ++
        rightVals.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("__side") === 1)
      .drop("__side")
  }
}
