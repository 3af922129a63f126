package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass corpus profiling: per-column cardinality / null / range /
  * sum statistics for dataset health checks before a training run.
  * Beyond the reference (no profiling surface); the shape is the
  * dataset-summary step every large-pipeline framework front-loads.
  *
  * 100-TB shape: ONE aggregation over the input — every column's stats
  * are partial-aggregable expressions in a single wide agg row (map-side
  * combine, one exchange of one row per partition), then the row pivots
  * to one output row per column driver-side-free via `explode`. With
  * `exactDistinct=false` (the default) cardinalities come from
  * `approx_count_distinct` (HLL, mergeable, still one pass); exact mode
  * plans Spark's multi-distinct Expand — input replicated once per
  * distinct column — and is meant for small/verification scales.
  */
object Profile {

  /** One row per profiled column:
    * `col_name, non_null, nulls, ndv, min_num, max_num, sum_num,
    * min_str, max_str` — numeric stats null for non-numeric columns and
    * vice versa. Sums fold in DECIMAL(28,8) for order-independence.
    */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def isNum(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    val aggCols: Seq[Column] = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      val ndv =
        if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"_nn_$c"),
        ndv.as(s"_ndv_$c"),
        (if (isNum(c)) min(col(c)).cast("double") else nullD).as(s"_minn_$c"),
        (if (isNum(c)) max(col(c)).cast("double") else nullD).as(s"_maxn_$c"),
        (if (isNum(c)) sum(col(c).cast("decimal(28,8)")).cast("double") else nullD)
          .as(s"_sum_$c"),
        (if (isNum(c)) nullS else min(col(c).cast("string"))).as(s"_mins_$c"),
        (if (isNum(c)) nullS else max(col(c).cast("string"))).as(s"_maxs_$c"))
    }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"_nn_$c").as("non_null"),
        (col("_rows") - col(s"_nn_$c")).as("nulls"),
        col(s"_ndv_$c").as("ndv"),
        col(s"_minn_$c").as("min_num"),
        col(s"_maxn_$c").as("max_num"),
        col(s"_sum_$c").as("sum_num"),
        col(s"_mins_$c").as("min_str"),
        col(s"_maxs_$c").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
