package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.NbClassify

/** Naive Bayes classifier: hand-worked Laplace arithmetic, one
  * prediction per doc, prior-only scoring for token-free docs, and
  * deterministic tie-breaks.
  */
class NbClassifySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("hand-worked example: smoothed likelihoods pick the right class") {
    val train = Seq(("A", "x x y"), ("B", "z z")).toDF("cls", "text")
    val test = Seq((1L, "x y"), (2L, "z"), (3L, "")).toDF("id", "text")
    val got = NbClassify.trainPredict(train, test, "cls", "text", "id")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    // V=3; A: P(x)=3/6, P(y)=2/6; B: P(z)=3/5, P(x)=P(y)=1/5
    assert(got.map(r => r._1 -> r._2).toSeq === Seq(1L -> "A", 2L -> "B", 3L -> "A"))
    // doc 1 score = ln(1/2) + ln(1/2) + ln(1/3), decimal-quantized per term
    val want = BigDecimal(math.log(0.5).toString.take(11)).toDouble
    assert(math.abs(got(0)._3 - (-0.69314718 - 0.69314718 - 1.09861229)) < 1e-6)
    // doc 3 has no tokens: prior-only (tie ln(1/2) both -> class A by name)
    assert(math.abs(got(2)._3 - -0.69314718) < 1e-9)
  }

  test("corpus langID: every test doc gets exactly one prediction") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val test = docs.filter($"doc_id" % 5 === 0)
    val pred = NbClassify.trainPredict(
      docs.filter($"doc_id" % 5 =!= 0), test, "lang", "text", "doc_id")
    assert(pred.count() === test.count())
    assert(pred.groupBy("doc_id").count().filter($"count" > 1).count() === 0)
    // the synthetic langs share one vocabulary, so accuracy is
    // near-chance by construction — the contract here is exactness and
    // determinism (the oracle gate pins the arithmetic): a second run
    // must reproduce every (doc, predicted, score) bit for bit
    val again = NbClassify.trainPredict(
      docs.filter($"doc_id" % 5 =!= 0), test, "lang", "text", "doc_id")
    assert(pred.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ===
      again.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }
}
