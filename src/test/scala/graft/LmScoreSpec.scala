package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.LmScore

class LmScoreSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("bigram model: hand-computed Laplace-smoothed scores") {
    val trusted = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val (bi, uni, v) = LmScore.train(trusted)
    // bigrams: (a,b) x2, (b,a) x1, (a,c) x1; unigram contexts a:3 b:1; V=3
    assert(v === 3)
    assert(bi.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      === Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))

    val docs = Seq((10L, "a b"), (11L, "c a"), (12L, "z")).toDF("doc_id", "text")
    val got = LmScore.score(docs, bi, uni, v).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(10L) - math.log((2.0 + 1) / (3 + 3))) < 1e-12) // seen bigram
    assert(math.abs(got(11L) - math.log(1.0 / 3)) < 1e-12) // unseen context c
    assert(math.abs(got(12L) - math.log(1.0 / 3)) < 1e-12) // single token floor
  }

  test("perplexity filter keeps the natural-language head") {
    val trusted = (1 to 40).map(i => (i.toLong,
      "the cat sat on the mat and the dog ran")).toDF("doc_id", "text")
    val natural = (100 to 139).map(i => (i.toLong, "the cat sat on the mat"))
    val gibberish = (200 to 209).map(i => (i.toLong, s"zq$i xv wk jj qq pp"))
    val docs = (natural ++ gibberish).toDF("doc_id", "text")
    // the cut keeps score ties (approximate-fraction semantics), so put
    // the quantile inside the natural-score plateau: everything scoring
    // below it — the gibberish — falls away
    val kept = LmScore.filterByPerplexity(docs, trusted, keepFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(natural.map(_._1).toSet.subsetOf(kept), "all natural docs survive")
    assert(gibberish.map(_._1).forall(id => !kept.contains(id)), "gibberish cut")
    // keepFraction = 1.0 keeps everything
    assert(LmScore.filterByPerplexity(docs, trusted, 1.0).count() === docs.count())
  }
}
