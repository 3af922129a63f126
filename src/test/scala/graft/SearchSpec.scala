package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Search, SearchIndex}

/** BM25 retrieval: brute force against a hand-computed score, the
  * persisted inverted index bit-equal to brute force (through builds AND
  * incremental appends), and the index scan partition-pruned to the
  * query terms' buckets.
  */
class SearchSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def corpus(n: Int): DataFrame = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (1 to n).map { i =>
      val body = (0 until 20).map(j => words((i * 7 + j * 3) % words.size))
      val boost = if (i % 5 == 0) " alpha alpha" else ""
      (i.toLong, body.mkString(" ") + boost)
    }.toDF("doc_id", "text")
  }

  test("bm25 matches a hand-rolled reference implementation") {
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog bird"), (3L, "cat fish fish"),
      (4L, "bird bird bird"), (5L, "")).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "cat bird", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    // N=5, avgdl=11/5; df(cat)=2, df(bird)=2
    val n = 5.0; val avgdl = 11.0 / 5.0; val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def c(df: Double, tf: Double, dl: Double) =
      BigDecimal(idf(df) * w(tf, dl)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = List(
      (4L, c(2, 3, 3).toDouble, 1L), // bird^3, dl=3
      (1L, c(2, 2, 3).toDouble, 1L), // cat^2, dl=3
      (2L, c(2, 1, 2).toDouble, 1L), // bird^1, dl=2
      (3L, c(2, 1, 3).toDouble, 1L)  // cat^1, dl=3
    ).sortBy(x => (-x._2, x._1))
    assert(got === want)
    assert(!got.exists(_._1 == 5L)) // empty doc never scores
  }

  test("index search equals brute force, including through appends") {
    val docs = corpus(120)
    val d = tmpDir("search_eq")
    val idx = SearchIndex.build(spark, s"$d/idx",
      docs.filter($"doc_id" <= 80), nBuckets = 8)
    SearchIndex.append(idx, docs.filter($"doc_id" > 80))
    for (q <- Seq("alpha", "beta gamma", "theta kappa alpha", "nosuchterm alpha")) {
      val brute = Search.bm25TopK(docs, q, k = 25)
        .collect().map(_.toSeq).toSeq
      val viaIdx = SearchIndex.search(idx, q, k = 25)
        .collect().map(_.toSeq).toSeq
      assert(viaIdx === brute, s"query '$q'")
    }
    // accumulated stats equal the full corpus
    assert(SearchIndex.stats(idx) === ((120L, docs.select(
      sum(size(Search.tokens($"text")))).head().getLong(0))))
  }

  test("query terms prune the index scan to their buckets") {
    val docs = corpus(200)
    val d = tmpDir("search_prune")
    val idx = SearchIndex.build(spark, s"$d/idx", docs, nBuckets = 10)
    // 10 distinct terms spread over 10 buckets; a 2-term query must list
    // at most 2 partitions
    val q = SearchIndex.search(idx, "alpha kappa", k = 5)
    // sparkPlan, not executedPlan: the agg's exchange wraps the executed
    // plan in AQE, hiding the scan node from collectFirst
    val scan = q.queryExecution.sparkPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    val listed = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(listed.size <= 2, s"expected <=2 pruned partitions, listed ${listed.size}")
    assert(q.collect().nonEmpty)
  }

  test("unknown-only query returns no rows; empty query refused") {
    val docs = corpus(30)
    val d = tmpDir("search_misc")
    val idx = SearchIndex.build(spark, s"$d/idx", docs, nBuckets = 4)
    assert(SearchIndex.search(idx, "nosuchterm", k = 5).collect().isEmpty)
    assertThrows[IllegalArgumentException](Search.bm25TopK(docs, "!!!", 5))
    assertThrows[IllegalArgumentException](SearchIndex.search(idx, "...", 5))
  }
}
