package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range (interval) join: match point rows to interval rows that
  * share equi-keys with the point's timestamp inside `[lo, hi]`.
  *
  * The naive formulation is an equi-join on the keys with a range
  * residual — Spark plans it as a shuffled join whose per-key work is
  * |points_k| × |intervals_k|: quadratic on hot keys and catastrophic
  * when the key set is small. The scale shape here is the standard
  * interval-binning decomposition: both sides map onto fixed-width time
  * bins (intervals explode onto every bin they overlap), the join becomes
  * a plain equi-join on (keys…, bin), and the exact `[lo, hi]` predicate
  * remains only as a residual filter on bin-local candidates. Shuffle
  * volume is O(points + intervals × (span/bin + 1)) and per-task work is
  * bounded by bin population, not key population — AQE's skew splitting
  * applies because it is an equi-join. Choose `binSeconds` on the order
  * of the typical interval span: wider bins explode less but admit more
  * false candidates; at span ≈ bin each interval lands in ≤ 2 bins.
  *
  * A matching pair shares exactly one bin (the point's), so no
  * post-join dedup is needed.
  */
object RangeJoin {

  /** Inner-join points to intervals: same `keys`, and
    * `points.pointTs ∈ [intervals.loCol, intervals.hiCol]` (inclusive).
    * Returns point columns + interval columns (callers aggregate or
    * re-join as needed). Interval rows with `lo > hi` match nothing.
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, loCol: String, hiCol: String,
      binSeconds: Long = 1800L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!points.columns.contains("_rj_bin") && !intervals.columns.contains("_rj_bin"),
      "_rj_bin is reserved by RangeJoin")
    val p = points.withColumn("_rj_bin",
      floor(unix_micros(col(pointTs)) / (binSeconds * 1000000L)))
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("_rj_bin", explode(sequence(
        floor(unix_micros(col(loCol)) / (binSeconds * 1000000L)),
        floor(unix_micros(col(hiCol)) / (binSeconds * 1000000L)))))
    p.join(i, keys :+ "_rj_bin")
      .where(col(pointTs) >= col(loCol) && col(pointTs) <= col(hiCol))
      .drop("_rj_bin")
  }
}
