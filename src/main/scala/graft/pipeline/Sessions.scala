package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the standard
  * clickstream/behavior-modeling primitive (and a training-data shaper:
  * session windows become documents for sequence models).
  *
  * Scale shape: ONE shuffle on the entity column; both windows (the
  * session-break flag and the running session counter) sort by the same
  * (entity, time) key, so Catalyst evaluates them in a single sort +
  * window pass. No driver-side state, no iteration — a 100 TB event log
  * sessionizes in one exchange. Per-entity data is processed sequentially
  * within a task (inherent to ordered sessionization); entities are the
  * parallelism unit, so skew is bounded by the hottest single entity.
  */
object Sessions {

  /** Annotate each event with a 1-based `session_seq` per entity: a new
    * session starts when the gap since the entity's previous event
    * exceeds `maxGapSeconds`. `tieBreak` makes ordering total when
    * timestamps can collide (pass the event id).
    */
  def sessionize(df: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      maxGapSeconds: Long = 1800, tieBreak: Option[String] = Some("event_id")): DataFrame = {
    val ord: Seq[Column] = col(tsCol) +: tieBreak.map(col).toSeq
    val w = Window.partitionBy(col(userCol)).orderBy(ord: _*)
    val gapUs = maxGapSeconds * 1000000L
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isBreak = when(prev.isNull || unix_micros(col(tsCol)) - prev > gapUs, 1L)
      .otherwise(0L)
    df.withColumn("session_seq",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count, bounds, value total. One additional
    * aggregation exchange on (entity, session_seq) — partial aggregation
    * runs map-side, so the shuffle carries one row per session.
    */
  def sessionStats(df: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", maxGapSeconds: Long = 1800,
      tieBreak: Option[String] = Some("event_id")): DataFrame =
    sessionize(df, userCol, tsCol, maxGapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total_value"))
      .withColumn("duration_s",
        ((unix_micros(col("end_ts")) - unix_micros(col("start_ts"))) / 1000000L).cast("long"))
}
