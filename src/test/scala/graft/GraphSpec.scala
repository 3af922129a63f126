package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Graph

/** PageRank: hand-worked single iteration with a dangling node, mass
  * conservation, and determinism across runs.
  */
class GraphSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")

  test("one iteration matches the hand computation (dangling mass spread)") {
    val r = Graph.pageRank(edges, iters = 1)
      .as[(String, BigDecimal)].collect().toMap
    // r0 = 1/3 each; c is dangling; contribs a->{b,c}: 1/6, b->a: 1/3
    // r1(a) = .15/3 + .85*(1/3 + (1/3)/3)  = 0.427777777777…
    // r1(b) = r1(c) = .15/3 + .85*(1/6 + (1/3)/3) = 0.286111111111…
    assert(math.abs(r("a").toDouble - 0.427777777777) < 1e-9)
    assert(math.abs(r("b").toDouble - 0.286111111111) < 1e-9)
    assert(math.abs(r("c").toDouble - 0.286111111111) < 1e-9)
  }

  test("rank mass stays ~1 over iterations; runs are bit-identical") {
    val r5 = Graph.pageRank(edges, iters = 5)
      .as[(String, BigDecimal)].collect().sortBy(_._1).toSeq
    assert(math.abs(r5.map(_._2.toDouble).sum - 1.0) < 1e-6)
    val again = Graph.pageRank(edges, iters = 5)
      .as[(String, BigDecimal)].collect().sortBy(_._1).toSeq
    assert(r5 === again)
    // the hub (a) outranks the leaves
    assert(r5.head._1 === "a")
    assert(r5.head._2 > r5(1)._2)
  }
}
