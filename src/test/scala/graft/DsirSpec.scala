package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Dsir

/** DSIR importance resampling: weights rank target-like documents above
  * off-target ones, Gumbel top-k selection is deterministic and
  * weight-biased, and the weight math matches a hand model.
  */
class DsirSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  // target talks about cats; raw mixes cat-docs and metal-docs
  private def target = (1 to 30).map(i =>
    (1000L + i, "the cat sat on the warm mat and purred softly")).toDF("doc_id", "text")
  private def raw = ((1 to 20).map(i =>
    (i.toLong, "the cat sat on the mat and purred")) ++
    (21 to 40).map(i =>
      (i.toLong, "zinc ingot smelter throughput exceeded quota"))).toDF("doc_id", "text")

  test("weights separate target-like from off-target documents") {
    val w = Dsir.importanceWeights(raw, target, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val catW = (1 to 20).map(i => w(i.toLong))
    val metalW = (21 to 40).map(i => w(i.toLong))
    assert(catW.min > metalW.max,
      s"cat docs (${catW.min}) must outrank metal docs (${metalW.max})")
    // identical text, identical weight
    assert(catW.distinct.size === 1)
  }

  test("empty and token-free docs weight 0 and survive the output") {
    val r2 = raw.union(Seq((99L, "   "), (98L, "")).toDF("doc_id", "text"))
    val w = Dsir.importanceWeights(r2, target, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(99L) === 0.0 && w(98L) === 0.0)
    assert(w.size === 42)
  }

  test("Gumbel top-k selection: deterministic, k rows, weight-biased") {
    val s1 = Dsir.select(raw, target, k = 10, buckets = 512)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Dsir.select(raw, target, k = 10, buckets = 512)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 === s2, "selection must be deterministic")
    assert(s1.size === 10)
    // weight bias: the on-target half dominates the selection
    assert(s1.count(_ <= 20) >= 7, s"selection not weight-biased: $s1")
    // a different salt reshuffles the noise (still deterministic per salt)
    val s3 = Dsir.select(raw, target, k = 10, buckets = 512, salt = "other")
      .select("doc_id").as[Long].collect().toSeq
    assert(s3.size === 10 && s3.count(_ <= 20) >= 7)
  }

  test("log-ratio table has exactly `buckets` rows and sums consistently") {
    val lr = Dsir.logRatios(raw, target, buckets = 64)
    assert(lr.count() === 64)
    // a bucket no token hashes to carries ln((0+1)/(tt+B)) - ln((0+1)/(rt+B))
    val tt = 30L * 10 // 30 target docs x 10 tokens
    val rt = 20L * 8 + 20L * 6
    val expectedEmpty = math.log(1.0 / (tt + 64)) - math.log(1.0 / (rt + 64))
    val counts = lr.select("_lw").as[Double].collect()
    assert(counts.exists(v => math.abs(v - expectedEmpty) < 1e-12),
      "no empty-bucket baseline found")
  }
}
