package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Product quantization + ANN recall metric.
  *
  * The PQ pipeline (pqTrain/pqEncode/pqTopK) is checked end-to-end
  * against an INDEPENDENT plain-Scala reimplementation over the real
  * sf0.001 embedding corpus — same seeding rule (md5-ordered sample),
  * same fold-order L2, same 9-decimal quantization — so any drift in
  * the distributed version (wrong slice bounds, lost tie-break,
  * order-dependent sums) surfaces as a row diff, not a tolerance blur.
  */
class PqSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val M = 4
  private val KSUB = 8
  private val K = 5

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Ascending-index fold L2 — bit-identical to VecMath.l2Native. */
  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  private lazy val corpus: Map[Long, Array[Double]] =
    spark.read.parquet(s"$sf001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap

  /** Plain-Scala PQ reference: (codebooks, codes, adcTopK). */
  private lazy val reference: (Map[(Int, Int), Array[Double]], Map[Long, Seq[Int]]) = {
    val seeds = corpus.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(KSUB)
    val dsub = 64 / M
    val books = (for {
      (id, code) <- seeds.zipWithIndex
      j <- 0 until M
    } yield (j, code) -> corpus(id).slice(j * dsub, (j + 1) * dsub)).toMap
    val codes = corpus.map { case (id, v) =>
      id -> (0 until M).map { j =>
        val sv = v.slice(j * dsub, (j + 1) * dsub)
        (0 until KSUB).minBy(c => (l2(sv, books((j, c))), c))
      }
    }
    (books, codes)
  }

  private def refTopK(queryIds: Seq[Long]): Seq[(Long, Long, Double, Int)] = {
    val (books, codes) = reference
    val dsub = 64 / M
    queryIds.flatMap { q =>
      val qsubs = (0 until M).map(j => corpus(q).slice(j * dsub, (j + 1) * dsub))
      val scored = corpus.keys.filter(_ != q).toSeq.map { id =>
        val adist = (0 until M).map { j =>
          val d = l2(qsubs(j), books((j, codes(id)(j))))
          BigDecimal(d * d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (id, adist.toDouble)
      }
      scored.sortBy { case (id, d) => (d, id) }.take(K).zipWithIndex
        .map { case ((id, d), i) => (q, id, d, i + 1) }
    }
  }

  private lazy val all = spark.read.parquet(s"$sf001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("pqTrain: codebooks are the md5-ordered seeds' subvector slices") {
    val books = Similarity.pqTrain(all, m = M, ksub = KSUB)
      .as[(Int, Int, Array[Double])].collect()
      .map { case (j, c, cw) => (j, c) -> cw }.toMap
    val (refBooks, _) = reference
    assert(books.keySet === refBooks.keySet)
    books.foreach { case (k, cw) => assert(cw.toSeq === refBooks(k).toSeq, s"codeword $k") }
  }

  test("pqEncode: every vector gets the nearest codeword per subspace") {
    val books = Similarity.pqTrain(all, m = M, ksub = KSUB)
    val codes = Similarity.pqEncode(all, books, m = M)
      .as[(Long, Seq[Int])].collect().toMap
    val (_, refCodes) = reference
    assert(codes.size === corpus.size)
    codes.foreach { case (id, cs) => assert(cs === refCodes(id), s"codes of $id") }
  }

  test("pqTopK: ADC ranking matches the reference reconstruction distances") {
    val books = Similarity.pqTrain(all, m = M, ksub = KSUB)
    val codes = Similarity.pqEncode(all, books, m = M)
    val got = Similarity.pqTopK(codes, books, all.filter($"vec_id" < 2), k = K, m = M)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === refTopK(Seq(0L, 1L)).toSet)
  }

  test("recallAtK: identity, disjoint and partial overlap") {
    def frame(rows: (Long, Long, Int)*) =
      rows.toDF("query_id", "neighbor_id", "rank")
    val exact = frame((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
    // identity → recall 1.0 per query
    assert(Similarity.recallAtK(exact, exact, 2)
      .as[(Long, Long, Double)].collect().toSet ===
      Set((1L, 2L, 1.0), (2L, 2L, 1.0)))
    // partial: query 1 finds one of two; query 2 missing entirely → 0
    val approx = frame((1L, 11L, 1), (1L, 99L, 2))
    assert(Similarity.recallAtK(approx, exact, 2)
      .as[(Long, Long, Double)].collect().toSet ===
      Set((1L, 1L, 0.5), (2L, 0L, 0.0)))
    // rank filter: approx rows past k are ignored
    val deep = frame((1L, 10L, 3), (2L, 20L, 1))
    assert(Similarity.recallAtK(deep, exact, 2)
      .as[(Long, Long, Double)].collect().toSet ===
      Set((1L, 0L, 0.0), (2L, 1L, 0.5)))
  }

  test("ivfPqTopK with full probing equals plain ADC; pruning keeps cluster members only") {
    val books = Similarity.pqTrain(all, m = M, ksub = KSUB)
    val codes = Similarity.pqEncode(all, books, m = M)
    val (assignments, centroids) = Similarity.ivfBuild(all, nlist = 8)
    val queries = all.filter($"vec_id" < 2)
    // nprobe = nlist -> no pruning -> identical to the flat ADC scan
    val full = Similarity.ivfPqTopK(assignments, centroids, codes, books,
      queries, k = K, m = M, nprobe = 8).as[(Long, Long, Double, Int)].collect().toSet
    val flat = Similarity.pqTopK(codes, books, queries, k = K, m = M)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full === flat)
    // pruned: every neighbor belongs to one of the query's probed clusters
    val pruned = Similarity.ivfPqTopK(assignments, centroids, codes, books,
      queries, k = K, m = M, nprobe = 2).as[(Long, Long, Double, Int)].collect()
    assert(pruned.nonEmpty)
    val clusterOf = assignments.select($"vec_id", $"centroid_id")
      .as[(Long, Int)].collect().toMap
    val probes = Similarity.ivfTopK(assignments, centroids, queries,
      k = Int.MaxValue, nprobe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(p => clusterOf(p._2)).toSet).toMap
    pruned.foreach { case (q, n, _, _) =>
      assert(probes(q).contains(clusterOf(n)), s"neighbor $n outside probed clusters of $q")
    }
  }

  test("pq pipeline is deterministic across runs") {
    val b1 = Similarity.pqTrain(all, m = M, ksub = KSUB)
    val b2 = Similarity.pqTrain(all, m = M, ksub = KSUB)
    val c1 = Similarity.pqEncode(all, b1, m = M).as[(Long, Seq[Int])].collect().toMap
    val c2 = Similarity.pqEncode(all, b2, m = M).as[(Long, Seq[Int])].collect().toMap
    assert(c1 === c2)
  }
}
