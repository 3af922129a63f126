package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Drift

/** PSI drift: identical slices score ~0, a shifted slice scores high,
  * the report flags only past-threshold features.
  */
class DriftSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def events = spark.read.parquet(s"$sf001/events.parquet")

  test("identical distributions have near-zero PSI; shifts are caught") {
    val base = events.filter($"event_id" % 2 === 0)
    val same = events.filter($"event_id" % 2 === 1)
    assert(Drift.psiNumeric(base, same, "value") < 0.05)
    assert(Drift.psiCategorical(base, same, "event_type") < 0.05)
    val shifted = same.withColumn("value", $"value" * 2 + 50)
    assert(Drift.psiNumeric(base, shifted, "value") > 0.5)
  }

  test("report flags exactly the drifted features") {
    val base = events.filter($"event_id" % 2 === 0)
    val cur = events.filter($"event_id" % 2 === 1)
      .withColumn("value", $"value" * 2 + 50)
    val rows = Drift.report(base, cur, Seq("value"), Seq("event_type"))
      .as[(String, String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows.keySet === Set("value", "event_type"))
    assert(rows("value")._1 === "numeric" && rows("value")._3,
      "the shifted numeric feature must be flagged")
    assert(rows("event_type")._1 === "categorical" && !rows("event_type")._3,
      "the untouched categorical feature must not be flagged")
  }
}
