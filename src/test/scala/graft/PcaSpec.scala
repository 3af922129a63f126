package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Pca

/** PCA: fast-vs-exact covariance parity, the Jacobi eigensolver against
  * hand-computed decompositions, and subspace recovery on synthetic
  * low-rank data.
  */
class PcaSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def embeddings = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("fast covariance matches the decimal-exact declarative form") {
    val exact = Pca.covarianceExact(embeddings).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val fast = Pca.covarianceFast(embeddings, dim = 64)
    assert(exact.size === 64 * 65 / 2)
    exact.foreach { case ((i, j), v) =>
      assert(math.abs(fast(i)(j) - v) < 1e-6, s"cov($i,$j): fast ${fast(i)(j)} vs exact $v")
    }
  }

  test("jacobi eigensolver: hand-computed 2x2 and equal-diagonal case") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1 (theta == 0 path)
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvectors orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot01) < 1e-12)
    // diagonal matrix: identity rotation
    val (dv, _) = Pca.jacobiEigen(Array(Array(5.0, 0.0), Array(0.0, 2.0)))
    assert(dv.toSeq === Seq(5.0, 2.0))
  }

  test("fit recovers a planted 2D subspace; projection compacts it") {
    val d = 16
    // two orthogonal directions with very different variance + tiny noise
    val u = Array.tabulate(d)(i => if (i < 8) 0.35355339059327373 else 0.0)
    val w = Array.tabulate(d)(i => if (i >= 8) 0.35355339059327373 else 0.0)
    val rows = (0 until 400).map { r =>
      val a = math.sin(r * 0.7) * 10.0
      val b = math.cos(r * 1.3) * 3.0
      val noise = Array.tabulate(d)(i => math.sin(r * 13.7 + i * 2.1) * 0.01)
      (r.toLong, Array.tabulate(d)(i => (a * u(i) + b * w(i) + noise(i)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val model = Pca.fit(rows, dim = d, k = 2)
    assert(model.varianceExplained.take(2).sum > 0.999,
      s"top-2 must carry the variance: ${model.varianceExplained.toSeq.take(3)}")
    assert(model.eigenvalues(0) > model.eigenvalues(1), "eigenvalues must be ordered")
    // components orthonormal
    def dotv(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dotv(model.components(0), model.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dotv(model.components(0), model.components(1))) < 1e-9)
    // each planted direction lives in the recovered span
    def spanCoverage(dir: Array[Double]) =
      model.components.map(c => math.pow(dotv(c, dir), 2)).sum
    assert(spanCoverage(u) > 0.999 && spanCoverage(w) > 0.999,
      "planted directions not in the recovered span")
    // projection emits k coordinates and preserves the dominant variance
    val proj = Pca.project(rows, model)
    val first = proj.select("pca").first().getSeq[Double](0)
    assert(first.size === 2)
    val vars = proj.select(
      variance(element_at(col("pca"), 1)).as("v1"),
      variance(element_at(col("pca"), 2)).as("v2")).first()
    assert(vars.getDouble(0) > vars.getDouble(1), "projection lost the variance order")
  }

  test("fit is deterministic across runs") {
    val m1 = Pca.fit(embeddings, dim = 64, k = 4)
    val m2 = Pca.fit(embeddings, dim = 64, k = 4)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
  }
}
