package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two dataset slices (the monitor
  * a training pipeline runs between corpus snapshots / time windows):
  * Population Stability Index per feature, numeric (fixed-width bins
  * over the BASE slice's exact min/max) and categorical (union of
  * observed categories).
  *
  * Scale shape: per feature, one exact min/max aggregation on the base
  * slice (numeric only) and one count-by-bin aggregation per slice —
  * bins/categories are human-scale, so everything after the counts is
  * driver arithmetic on a bounded table. Exactness: additive 0.5
  * smoothing avoids ln(0); per-bin terms quantize to 10 decimals before
  * the sum, so the PSI is independent of bin iteration order and
  * replayable by the DuckDB oracle (IEEE double ops are deterministic;
  * only sum order is not, and the quantized decimal sum fixes that).
  */
object Drift {

  val DefaultThreshold = 0.2

  private def psiFromCounts(baseCounts: Map[Any, Long], curCounts: Map[Any, Long],
      keys: Seq[Any], smoothK: Int): Double = {
    val tb = baseCounts.values.sum
    val tc = curCounts.values.sum
    val terms = keys.map { k =>
      val p = (baseCounts.getOrElse(k, 0L) + 0.5) / (tb + 0.5 * smoothK)
      val q = (curCounts.getOrElse(k, 0L) + 0.5) / (tc + 0.5 * smoothK)
      BigDecimal((p - q) * math.log(p / q))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }
    terms.sum.toDouble
  }

  /** PSI of a numeric column: `bins` fixed-width buckets over the base
    * slice's [min, max]; current values clamp into the edge bins.
    */
  def psiNumeric(base: DataFrame, cur: DataFrame, column: String,
      bins: Int = 10): Double = {
    val st = base.filter(col(column).isNotNull)
      .agg(min(col(column)).cast("double"), max(col(column)).cast("double"))
      .first()
    val (mn, mx) = (st.getDouble(0), st.getDouble(1))
    require(mx > mn, s"degenerate base range for $column: [$mn, $mx]")
    val width = (mx - mn) / bins
    def hist(df: DataFrame): Map[Any, Long] = df.filter(col(column).isNotNull)
      .withColumn("_dr_bin",
        least(greatest(floor((col(column).cast("double") - mn) / width), lit(0)),
          lit(bins - 1)).cast("long"))
      .groupBy("_dr_bin").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0): Any) -> r.getLong(1)).toMap
    psiFromCounts(hist(base), hist(cur), (0L until bins.toLong).map(x => x: Any), bins)
  }

  /** PSI of a categorical column over the union of observed categories
    * (nulls ride as their own category).
    */
  def psiCategorical(base: DataFrame, cur: DataFrame, column: String): Double = {
    def counts(df: DataFrame): Map[Any, Long] = df
      .groupBy(col(column).cast("string").as("_dr_k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0): Any) -> r.getLong(1)).toMap
    val (b, c) = (counts(base), counts(cur))
    val keys = (b.keySet ++ c.keySet).toSeq.sortBy(k => Option(k).map(_.toString))
    psiFromCounts(b, c, keys, keys.size)
  }

  /** Drift report over named features. Returns one row per feature:
    * (feature, kind, psi, drifted).
    */
  def report(base: DataFrame, cur: DataFrame, numeric: Seq[String],
      categorical: Seq[String], bins: Int = 10,
      threshold: Double = DefaultThreshold): DataFrame = {
    val spark = base.sparkSession
    val rows =
      numeric.map(c => Row(c, "numeric", psiNumeric(base, cur, c, bins))) ++
        categorical.map(c => Row(c, "categorical", psiCategorical(base, cur, c)))
    import org.apache.spark.sql.types._
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("feature", StringType, nullable = false),
          StructField("kind", StringType, nullable = false),
          StructField("psi", DoubleType, nullable = false))))
      .withColumn("drifted", col("psi") > threshold)
  }
}
