package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Profile

/** Single-pass corpus profiler: exact stats, approx-HLL cardinality
  * tolerance, and the one-aggregation plan shape that makes it a
  * 100-TB-safe default.
  */
class ProfileSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private lazy val df = (1 to 1000).map { i =>
    (i.toLong, if (i % 10 == 0) null else s"s${i % 7}", i * 1.5)
  }.toDF("id", "tag", "v")

  test("exact profile: counts, nulls, ndv, range, decimal-folded sum") {
    val p = Profile.profile(df, Seq("id", "tag", "v"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) === 1000L && id.getLong(2) === 0L && id.getLong(3) === 1000L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 1000.0)
    assert(id.getDouble(6) === 500500.0)
    val tag = p("tag")
    assert(tag.getLong(1) === 900L && tag.getLong(2) === 100L && tag.getLong(3) === 7L)
    assert(tag.isNullAt(4) && tag.getString(7) === "s0" && tag.getString(8) === "s6")
    val v = p("v")
    assert(v.getDouble(6) === 750750.0)
  }

  test("approx mode: HLL ndv within 5% of exact") {
    val p = Profile.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(p("id") - 1000L) <= 50, s"ndv(id)=${p("id")}")
    assert(p("tag") === 7L)
  }

  test("approx mode plans a single aggregation (no Expand)") {
    val plan = Profile.profile(df, Seq("id", "tag", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx profile must not expand input")
    // exact multi-distinct DOES expand — the documented trade-off
    val exact = Profile.profile(df, Seq("id", "tag", "v"), exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"))
  }
}
