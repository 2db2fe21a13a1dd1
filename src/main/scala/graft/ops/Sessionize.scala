package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based sessionization over an event stream (batch form; the streaming
  * counterpart is a `session_window` agg in [[graft.streaming]]).
  *
  * A new session starts when the gap to the user's previous event exceeds
  * `gap`. Distributed shape: ONE shuffle on the user key; both windows (lag
  * and the session-index running sum) share the same partitioning, so
  * Catalyst plans a single exchange and two in-partition sorts — per-task
  * state is O(1) per row. At 100 TB the only scale knob is key cardinality,
  * and user keys are high-cardinality by construction.
  */
object Sessionize {

  /** Annotate each event with `session_seq` (1-based per-user session index).
    * `tsCol` must be a monotonically comparable numeric or timestamp column;
    * `gap` is in the same unit as `tsCol` differences. Ties within a user are
    * ordered by `tieCol` so the result is deterministic. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gap: Long, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val newSession =
      when(col(tsCol) - lag(col(tsCol), 1).over(byUser) > gap, 1L)
        .otherwise(0L)
    events
      .withColumn("is_new", newSession)
      .withColumn("session_seq",
        (sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) + 1L)
          .cast(LongType))
      .drop("is_new")
  }

  /** Per-session rollup: event count, span, and bounds. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      gap: Long, tieCol: String): DataFrame =
    sessionize(events, userCol, tsCol, gap, tieCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("span"))
}
