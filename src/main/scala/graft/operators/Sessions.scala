package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream, batch formulation — the
  * declarative twin of the Structured Streaming `session_window` path in
  * `graft.streaming` (extension tier; the reference has no streaming or
  * session semantics, SURVEY.md §2.5).
  *
  * Plan shape: one shuffle on the user key; both window passes reuse the
  * same (user) partitioning, so Catalyst plans a single exchange. Gap
  * comparison is on microsecond longs — exact integers, no float or
  * timezone drift between engines.
  */
object Sessions {

  /** Assign session ids per user: a new session starts when the gap since
    * the previous event exceeds `gapSeconds`. Adds `session_id` (1-based,
    * per user, in time order).
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieBreakCol: String,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreakCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(col("__us") - lag("__us", 1).over(order) > gapSeconds * 1000000L, 1L)
          .otherwise(when(lag("__us", 1).over(order).isNull, 1L).otherwise(0L)))
      .withColumn("session_id", sum("__new").over(run))
      .drop("__us", "__new")
  }

  /** Per-session rollup: bounds, size, value sum. */
  def sessionStats(
      sessionized: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame =
    sessionized
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        round(sum(col(valueCol)), 2).as("sum_value"))
}
