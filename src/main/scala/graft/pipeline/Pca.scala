package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality
  * reducer an embedding pipeline wants before clustering/ANN (whitening,
  * compaction, SemDeDup-style preprocessing).
  *
  * Scale shape: the ONLY corpus-sized pass is the covariance
  * accumulation; everything after operates on the d×d Gram matrix, which
  * is dimension-bounded (d ≤ a few thousand), never corpus-bounded.
  * Two covariance forms:
  *  - [[covarianceFast]]: one `mapPartitions` accumulating a local d×d
  *    sum matrix per partition, reduced driver-side — O(partitions·d²)
  *    shuffle bytes, the 100-TB path (a declarative elementwise form
  *    would explode n·d² rows). This is the genuinely-imperative
  *    per-partition case the DataFrame API can't express efficiently.
  *  - [[covarianceExact]]: decimal-quantized declarative sums —
  *    aggregation-order independent, replayed exactly by the DuckDB
  *    oracle; the correctness pin for the fast path.
  * The eigensolve is a cyclic Jacobi on the driver's d×d matrix —
  * deterministic, no external linear-algebra dependency.
  */
object Pca {

  /** Upper-triangle covariance entries `(i, j, cov)` (i ≤ j), exactly
    * replayable: per-row products quantize to DECIMAL(18,8) before the
    * sum, so the result is independent of partitioning; `cov` is the
    * biased (1/n) covariance rounded to 8 dp.
    */
  def covarianceExact(df: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val x = df.select(col(idCol).as("_r"),
        posexplode(transform(col(vecCol), v => v.cast("double"))))
      .select(col("_r"), col("pos").as("i"), col("col").as("v"))
    // n from the source frame (one count), sums per dimension and pair
    val n = df.count()
    val si = x.groupBy("i")
      .agg(sum(round(col("v"), 8).cast("decimal(18,8)")).cast("double").as("s"))
    val pairs = x.as("a").join(x.as("b"),
        col("a._r") === col("b._r") && col("a.i") <= col("b.i"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        round(col("a.v") * col("b.v"), 8).cast("decimal(18,8)").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).cast("double").as("sp"))
    pairs
      .join(si.select(col("i"), col("s").as("si")), Seq("i"))
      .join(si.select(col("i").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i"), col("j"),
        round((col("sp") - col("si") * col("sj") / n) / n, 8).as("cov"))
  }

  /** The scale-path covariance: per-partition local accumulation of
    * (n, Σx, Σxxᵀ), one row of d²+d+1 doubles per partition, driver
    * reduce. Returns the dense biased covariance matrix.
    */
  def covarianceFast(df: DataFrame, dim: Int,
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val d = dim
    val parts = df.select(transform(col(vecCol), v => v.cast("double")).as("v"))
      .rdd.mapPartitions { it =>
        val s = new Array[Double](d)
        val ss = new Array[Double](d * d)
        var n = 0L
        it.foreach { r =>
          val v = r.getSeq[Double](0)
          var i = 0
          while (i < d) {
            val vi = v(i)
            s(i) += vi
            var j = i
            while (j < d) { ss(i * d + j) += vi * v(j); j += 1 }
            i += 1
          }
          n += 1
        }
        Iterator.single((n, s, ss))
      }.collect()
    val n = parts.map(_._1).sum.toDouble
    require(n > 0, "covariance of an empty frame")
    val s = new Array[Double](d)
    val ss = new Array[Double](d * d)
    parts.foreach { case (_, ps, pss) =>
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      var k = 0
      while (k < d * d) { ss(k) += pss(k); k += 1 }
    }
    Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      (ss(a * d + b) - s(a) * s(b) / n) / n
    }
  }

  /** Fitted model: `components(k)(d)` rows are unit eigenvectors in
    * decreasing eigenvalue order; `varianceExplained` the matching
    * eigenvalue shares.
    */
  final case class PcaModel(components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def varianceExplained: Array[Double] = {
      val tot = eigenvalues.sum
      if (tot <= 0) eigenvalues.map(_ => 0.0) else eigenvalues.map(_ / tot)
    }
  }

  /** Fit top-`k` principal components: distributed covariance
    * ([[covarianceFast]]) + driver Jacobi eigensolve of the d×d matrix.
    */
  def fit(df: DataFrame, dim: Int, k: Int,
      vecCol: String = "embedding"): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val cov = covarianceFast(df, dim, vecCol)
    val (values, vectors) = jacobiEigen(cov)
    // sort by eigenvalue desc; fix sign (largest-|component| positive)
    // so the decomposition is deterministic
    val order = values.zipWithIndex.sortBy(-_._1).take(k).map(_._2)
    val comps = order.map { c =>
      val v = vectors.map(_(c))
      val lead = v.maxBy(math.abs)
      if (lead < 0) v.map(-_) else v
    }
    PcaModel(comps, order.map(values))
  }

  /** Project the embedding column onto the model's components — a
    * row-local map, `out[j] = Σ_i v[i] * comp_j[i]`.
    */
  def project(df: DataFrame, model: PcaModel,
      vecCol: String = "embedding", outCol: String = "pca"): DataFrame = {
    val comps: Column = typedlit(model.components.map(_.toSeq).toSeq)
    df.withColumn(outCol,
      transform(comps, c => aggregate(
        zip_with(col(vecCol), c, (v, w) => v.cast("double") * w),
        lit(0.0d), (acc, v) => acc + v)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS). O(d³)
    * per sweep, a handful of sweeps to 1e-12 off-diagonal mass —
    * milliseconds at embedding dimensions.
    */
  private[graft] def jacobiEigen(m0: Array[Array[Double]],
      maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta == 0 (equal diagonal) needs the full 45° rotation
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
