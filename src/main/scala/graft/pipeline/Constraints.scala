package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ/Great-Expectations
  * capability a training pipeline runs before a corpus snapshot ships):
  * evaluate a rule set over a frame and report violation counts per
  * rule.
  *
  * Scale shape: ALL row-local rules (not-null, range, set, regex) and
  * all uniqueness rules fold into ONE aggregation pass over the data —
  * a single job whose map side emits one long per rule
  * (`sum(violates)`), plus `count distinct` buffers for uniqueness; no
  * per-rule scans. Referential rules are one broadcast anti-join count
  * each against their (dimension-sized) reference. Null semantics:
  * range/set/regex rules ignore nulls — nullability is `NotNull`'s job,
  * so rules compose without double-counting.
  */
object Constraints {

  sealed trait Constraint { def rule: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Constraint {
    def rule = s"not_null($col)"
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def rule = s"in_range($col,$lo,$hi)"
  }
  /** Non-null values of `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Constraint {
    def rule = s"in_set($col)"
  }
  /** Non-null values of `col` must match `regex` (full-match not
    * required — anchor explicitly).
    */
  final case class MatchesRegex(col: String, regex: String) extends Constraint {
    def rule = s"matches_regex($col)"
  }
  /** `cols` must be unique across the frame; every row beyond the first
    * of a key counts as one violation (n - distinct).
    */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def rule = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null `col` value must exist in `refCol` of `ref` —
    * referential integrity against a dimension.
    */
  final case class ForeignKey(col: String, ref: DataFrame, refCol: String)
      extends Constraint {
    def rule = s"foreign_key($col)"
  }

  /** Evaluate all rules; returns (rule, violations, checked, pass) with
    * `checked` the frame's row count, in the rule-list order.
    */
  def check(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "no constraints given")
    val spark = df.sparkSession
    val rowViol: Seq[(String, Column)] = cs.collect {
      case c: NotNull => (c.rule, col(c.col).isNull)
      case c: InRange => (c.rule,
        col(c.col).isNotNull && (col(c.col) < c.lo || col(c.col) > c.hi))
      case c: InSet => (c.rule,
        col(c.col).isNotNull && !col(c.col).isin(c.values: _*))
      case c: MatchesRegex => (c.rule,
        col(c.col).isNotNull && !col(c.col).rlike(c.regex))
    }
    val uniques = cs.collect { case u: Unique => u }
    val aggs: Seq[Column] =
      rowViol.map { case (n, p) => sum(when(p, 1L).otherwise(0L)).as(n) } ++
        uniques.map(u => (count(lit(1)) -
          countDistinct(struct(u.cols.map(col): _*))).as(u.rule)) :+
        count(lit(1)).as("_dq_total")
    val one = df.agg(aggs.head, aggs.tail: _*).first()
    val total = one.getLong(one.fieldIndex("_dq_total"))
    val fkCounts: Map[String, Long] = cs.collect { case f: ForeignKey =>
      f.rule -> df.filter(col(f.col).isNotNull)
        .join(broadcast(f.ref.select(col(f.refCol).as(f.col)).distinct()),
          Seq(f.col), "left_anti")
        .count()
    }.toMap
    val rows = cs.map { c =>
      val v = c match {
        case f: ForeignKey => fkCounts(f.rule)
        case other => one.getLong(one.fieldIndex(other.rule))
      }
      Row(c.rule, v, total, v == 0L)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rule",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("violations",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("checked",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("pass",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }
}
