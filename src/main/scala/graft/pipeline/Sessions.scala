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

  /** Top event PATHS (sequential pattern mining's workhorse n-gram form):
    * per entity, the totally-ordered event-type sequence; every length-n
    * contiguous subsequence becomes a `a>b>c` path; global top-k paths by
    * count with a lexicographic tie-break. One shuffle to assemble the
    * per-entity sequences (state bounded by the hottest entity, like
    * sessionize), row-local n-gram explosion, one count aggregation, and
    * a TakeOrdered top-k — no global sort.
    */
  def topPaths(df: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      tieBreak: String = "event_id", n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2 && k >= 1, s"need n >= 2 and k >= 1, got n=$n k=$k")
    val seqs = df.groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieBreak), col(typeCol).as("_tp_t")))).as("_tp_evs"))
      .select(expr("transform(_tp_evs, e -> e._tp_t)").as("_tp_types"))
    val gram = (1 to n).map(j => s"element_at(_tp_types, i + ${j - 1})")
      .mkString("concat_ws('>', ", ", ", ")")
    seqs.filter(size(col("_tp_types")) >= n)
      .select(explode(expr(
        s"transform(sequence(1, size(_tp_types) - ${n - 1}), i -> $gram)"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }
}
