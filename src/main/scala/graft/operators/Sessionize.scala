package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group a user's events into
  * sessions split at inactivity gaps > `gap`. The batch twin of Structured
  * Streaming's `session_window` — one shuffle by key, one in-partition
  * sort, a lag + running-sum window; no state store needed offline.
  */
object Sessionize {

  /** @param events  input rows
    * @param key     partition key column
    * @param ts      event-time column
    * @param tiebreak unique column ordering ties at equal ts
    * @param gapExpr SQL interval literal, e.g. "INTERVAL 30 MINUTE"
    * @return per-session rows: key, session_id (0-based per key),
    *         session_start, session_end, n_events
    */
  def sessions(events: DataFrame, key: Column, ts: Column, tiebreak: Column,
      gapExpr: String = "INTERVAL 30 MINUTE"): DataFrame = {
    val order = Window.partitionBy(key).orderBy(ts, tiebreak)
    val withGap = events
      .withColumn("__prev_ts", lag(ts, 1).over(order))
      // >= matches Structured Streaming's session_window: windows are
      // end-exclusive [t, t+gap), so an event at exactly prev+gap starts a
      // NEW session in both engines
      .withColumn("__new_session",
        when(col("__prev_ts").isNull || ts >= expr(s"__prev_ts + $gapExpr"), 1L)
          .otherwise(0L))
    val withId = withGap.withColumn("session_id",
      sum(col("__new_session")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    withId.groupBy(key.as("key"), col("session_id"))
      .agg(min(ts).as("session_start"), max(ts).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
