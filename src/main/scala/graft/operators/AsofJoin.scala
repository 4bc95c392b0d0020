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
    // Right values travel as ONE struct so the attached fields always come
    // from the SAME matched right row: per-column last(..., ignoreNulls)
    // would substitute an older version's value wherever the matched row
    // holds a genuine NULL (and could stitch fields from different rows).
    // struct(...) over a right row is non-null even when every field is
    // null, so ignoreNulls only skips left-row placeholders.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right at equal ts (<= semantics)
      .select(col("__ts") +: col("__side") +: col(key).as("__key") +:
        lit(null).cast(rStructType).as("__r") +: leftCols.map(col): _*)
    // null join keys never match in any join; without this filter the NULL
    // window partition would enrich null-keyed left rows from null-keyed
    // right rows (left null-key rows still flow through, with null rightVals)
    val r = right.where(col(key).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(col("__ts") +: col("__side") +: col(key).as("__key") +:
        struct(rightVals.map(c => col(c).as(c)): _*).as("__r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rlast.$c").as(c)): _*)
  }
}
