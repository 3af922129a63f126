package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Constraints
import graft.pipeline.Constraints._

/** Data-quality rules: per-rule violation counts on a hand-built frame,
  * null composition (range/set/regex ignore nulls — NotNull owns them),
  * multi-column uniqueness, and FK against a reference dim.
  */
class ConstraintsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def frame = Seq(
    (1L, Some(5.0), Some("O"), Some("1-URGENT"), 10L),
    (2L, Some(-3.0), Some("X"), Some("bogus"), 10L),
    (2L, None, None, None, 11L),
    (3L, Some(99.0), Some("F"), Some("5-LOW"), 99L)
  ).toDF("k", "price", "status", "prio", "fk")

  private def dim = Seq(10L, 11L).toDF("id")

  test("every rule counts exactly; nulls only violate NotNull") {
    val got = Constraints.check(frame, Seq(
        NotNull("price"),
        InRange("price", 0, 50),
        InSet("status", Seq("O", "F")),
        MatchesRegex("prio", "^[1-5]-"),
        Unique(Seq("k")),
        ForeignKey("fk", dim, "id")))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("not_null(price)", 1L, 4L, false),
      ("in_range(price,0.0,50.0)", 2L, 4L, false), // -3 and 99; null ignored
      ("in_set(status)", 1L, 4L, false),            // X; null ignored
      ("matches_regex(prio)", 1L, 4L, false),       // bogus; null ignored
      ("unique(k)", 1L, 4L, false),                 // k=2 twice -> 1 extra
      ("foreign_key(fk)", 1L, 4L, false)))          // 99 dangles
  }

  test("clean data passes every rule; multi-column uniqueness") {
    val got = Constraints.check(frame.limit(1), Seq(
        NotNull("price"), Unique(Seq("k", "fk"))))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got.forall(_._4))
    val dup = Constraints.check(frame, Seq(Unique(Seq("k", "fk"))))
      .as[(String, Long, Long, Boolean)].head()
    assert(dup._2 === 0L) // (2,10) and (2,11) differ on the pair
  }
}
