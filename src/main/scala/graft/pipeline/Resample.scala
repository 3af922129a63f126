package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series gap-fill / resampling — the dense-axis operator temporal
  * training pipelines need and Spark lacks natively: per-entity periodic
  * aggregates with EXPLICIT zero rows for periods with no events (a
  * groupBy emits only observed periods; models consuming regular series
  * need the silence too).
  *
  * Scale shape: one aggregation to the sparse (key, period) grid (map-side
  * partials), one per-key span aggregate, a ROW-LOCAL `sequence()` explode
  * generating each key's dense axis distributed (no driver calendar, no
  * cross join against a global axis — work is O(Σ per-key span), the
  * output's own size), and one (key, period) equi-join back. Keys with
  * century-long spans would explode large arrays; spans here are bounded
  * by the data's own [first, last] activity per key.
  */
object Resample {

  /** One row per (key, day) for EVERY day in the key's [first, last]
    * activity span: `n_events` (0 on silent days) and `sum_value`
    * (exact decimal sum, 0.0 on silent days).
    */
  def gapFillDaily(df: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id", valueCol: String = "value"): DataFrame = {
    val sparse = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
    val dense = sparse.groupBy(col(keyCol))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col(keyCol),
        explode(expr("sequence(_d0, _d1, interval 1 day)")).as("day"))
    dense.join(sparse, Seq(keyCol, "day"), "left_outer")
      .select(col(keyCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }
}
