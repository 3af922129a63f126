package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.BpeTrain

/** BPE merge-rule training against the classic hand-worked example
  * (low/lower/newest), including the tie-break order and the canonical
  * greedy fold, plus the encode side applying learned rules in order.
  */
class BpeTrainSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low"),
    (2L, "lower lower"),
    (3L, "newest")).toDF("id", "text")

  test("learned merges match the hand computation, ties break (count, lhs, rhs)") {
    val got = BpeTrain.trainMerges(corpus, "text", 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // iter1: (l,o)=5 ties (o,w)=5 -> lhs 'l' wins; iter2: (lo,w)=5;
    // iter3: (low,e)=2 ties (e,r)=2 -> lhs 'e' wins
    assert(got === Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "e", "r", "er", 2L)))
  }

  test("greedy fold is left-to-right non-overlapping on runs") {
    val runs = Seq((1L, "aaaa aaa")).toDF("id", "text")
    val m = BpeTrain.trainMerges(runs, "text", 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // 'aaaa' pairs (a,a)x3 + 'aaa' x2 = 5; after merge: [aa,aa] + [aa,a]
    assert(m.head === ((1, "a", "a", "aa", 5L)))
    // round 2 pairs: (aa,aa)=1 from 'aaaa', (aa,a)=1 from 'aaa' -> lhs/rhs
    // tie-break: ("aa","a") < ("aa","aa")
    assert(m(1) === ((2, "aa", "a", "aaa", 1L)))
  }

  test("encode applies rules in order, row-local") {
    val rules = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val enc = BpeTrain.encode(Seq((1L, "low lower")).toDF("id", "text"),
      "text", rules)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc === Seq("low", "low", "er"))
  }

  test("no pairs left: training stops emitting rules") {
    val tiny = Seq((1L, "a b c")).toDF("id", "text")
    val m = BpeTrain.trainMerges(tiny, "text", 4).collect()
    assert(m.isEmpty) // all words are single symbols; no adjacent pairs
  }
}
