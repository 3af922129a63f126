package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines:
  * stratified downsampling (domain/source mixing) and train/test
  * splitting. Everything keys off a PORTABLE content hash of the row id
  * (md5 → 60-bit int, the same family the dedup/simhash operators use),
  * so samples are:
  *
  *  - reproducible across runs, engines and cluster sizes (no RNG, no
  *    partition-dependent seed — unlike `DataFrame.sample`, adding an
  *    executor never changes membership);
  *  - stable under data growth — a row's bucket never changes, so
  *    yesterday's sample is a subset of today's at the same rate;
  *  - verifiable row-for-row by the DuckDB oracle.
  *
  * Scale shape: the membership test is a pure per-row expression inside
  * whole-stage codegen (no shuffle at all); per-stratum rates arrive via
  * a broadcast join against a tiny (stratum, rate) table.
  */
object Sampling {

  /** Stable bucket in [0, 10000): md5 of the id, top 15 hex chars as a
    * 60-bit int, mod 10⁴ — two decimal places of sampling resolution.
    */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(10000L))

  /** Uniform deterministic sample: keep ~`rate` of rows by id bucket. */
  def sample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit((rate * 10000).round))

  /** Stratified sample: per-stratum keep rates (e.g. downweight a crawl
    * source, upweight curated text). Strata absent from `rates` keep
    * `defaultRate`. The rate table is broadcast — strata counts are
    * human-scale (sources, languages, quality tiers), never row-scale.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("_smp_stratum", "_smp_rate")
    df.join(broadcast(rateDf), col(strataCol) === col("_smp_stratum"), "left_outer")
      .filter(hashBucket(col(idCol)) <
        (coalesce(col("_smp_rate"), lit(defaultRate)) * 10000).cast("long"))
      .drop("_smp_stratum", "_smp_rate")
  }

  /** Deterministic weighted sample WITHOUT replacement
    * (Efraimidis-Spirakis A-Res): each row draws its uniform from the id
    * hash (content-stable, like [[sample]]) and competes by `u^(1/w)`;
    * the global top-k by key IS a weighted sample without replacement.
    * One top-k sort (Spark's TakeOrdered — no full global sort
    * materializes). Keys quantize to 9 decimals with an id tie-break so
    * the kept set is exactly reproducible across engines (`pow` is not
    * correctly-rounded IEEE; the quantization absorbs last-ulp drift).
    * Weights must be strictly positive.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = (hashBucket(col(idCol)).cast("double") + lit(0.5)) / lit(10000.0)
    df.withColumn("_ws_key",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9)
          .cast("decimal(12,9)"))
      .orderBy(col("_ws_key").desc, col(idCol))
      .limit(k)
      .drop("_ws_key")
  }

  /** Per-group document CAP (RefinedWeb's per-domain limit: no single
    * domain may contribute more than N documents, keeping the BEST N by
    * an explicit deterministic ranking). One hash shuffle on the group
    * column + a per-group streamed row_number — work is O(rows), state is
    * O(1) per group. A pathologically hot group (one domain = half the
    * crawl) concentrates its rows in one task; mitigate upstream with a
    * pre-filter sample on that group, not by salting (a cap needs the
    * whole group ordered). Ties must be broken by a unique column (pass
    * id last) or the kept set is nondeterministic.
    */
  def capPerGroup(df: DataFrame, groupCol: String, n: Int,
      order: Seq[Column]): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_cap_rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(order: _*)))
      .filter(col("_cap_rk") <= n)
      .drop("_cap_rk")
  }

  /** Mix strata toward target WEIGHTS (proportions of the output): one
    * small count aggregation derives the per-stratum keep rate that hits
    * the largest achievable sample honoring the weights, then delegates
    * to [[stratifiedSample]]. Weights are normalized; a stratum with no
    * weight is dropped.
    */
  def mixToWeights(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    val total = weights.values.sum
    require(total > 0, "weights must have a positive sum")
    val norm = weights.view.mapValues(_ / total).toMap
    val counts = df.groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding stratum determines the output size: output N maximal
    // s.t. for every stratum, N * w_s <= count_s
    val n = norm.collect { case (s, w) if w > 0 && counts.contains(s) =>
      counts(s) / w
    }.minOption.getOrElse(0.0)
    val rates = norm.collect { case (s, w) if counts.contains(s) =>
      s -> math.min(1.0, n * w / counts(s))
    }
    stratifiedSample(df, strataCol, idCol, rates, defaultRate = 0.0)
  }

  /** Temperature-scaled source mixing (the multilingual-corpus alpha rule
    * of mC4 / XLM-R: sample stratum `s` with probability ∝ count_s^alpha).
    * `alpha = 1` keeps natural proportions; `alpha → 0` flattens toward
    * uniform, boosting low-resource strata at the expense of the head.
    * Upsampling is capped at rate 1.0 (no row duplication): with
    * `budget <= 0` the output is the LARGEST duplicate-free corpus that
    * honors the temperature proportions (the binding stratum is the one
    * the proportions exhaust first); a positive `budget` targets ~that
    * many output rows instead. Rates quantize to 9 decimals so membership
    * replays across engines (`pow` is not correctly-rounded IEEE; the
    * quantization absorbs last-ulp drift — same rule as
    * [[weightedSample]]). One tiny count aggregation (state = #strata,
    * human-scale) + the [[stratifiedSample]] broadcast membership test —
    * no extra shuffle at any corpus size.
    */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      alpha: Double, budget: Long = 0L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1], got $alpha")
    val counts = df.groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val powed = counts.view.mapValues(n => math.pow(n.toDouble, alpha)).toMap
    val z = powed.values.sum
    // maximal N with every rate <= 1: N * (p_s/z) <= c_s for all s
    val n =
      if (budget > 0) budget.toDouble
      else powed.collect { case (s, p) if p > 0 => counts(s) * z / p }
        .minOption.getOrElse(0.0)
    val rates = powed.map { case (s, p) =>
      s -> BigDecimal(math.min(1.0, n * (p / z) / counts(s)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    stratifiedSample(df, strataCol, idCol, rates.toMap, defaultRate = 0.0)
  }

  /** Deterministic train/validation/test split tag: `split` column from
    * disjoint id-hash bucket ranges (test gets [0, testFrac), validation
    * the next band, train the rest). Membership is content-stable, so
    * re-running on grown data never leaks test rows into train.
    */
  def trainTestSplit(df: DataFrame, idCol: String, testFrac: Double = 0.1,
      validFrac: Double = 0.0): DataFrame = {
    val b = hashBucket(col(idCol))
    val testHi = (testFrac * 10000).round
    val validHi = testHi + (validFrac * 10000).round
    df.withColumn("split",
      when(b < testHi, "test").when(b < validHi, "valid").otherwise("train"))
  }

  /** Deterministic GLOBAL shuffle with a dense position column — the
    * "shuffle the corpus before sharding epochs" step of a training-data
    * pipeline. Order is md5(id, seed): reproducible across runs/cluster
    * sizes, and re-seedable per epoch.
    *
    * Scale shape: a naive `row_number() OVER (ORDER BY hash)` funnels
    * 100 TB through ONE window partition. Instead the hash's leading hex
    * chars form `buckets` ordered slices (a prefix of the sort key, so
    * bucket order == key order): per-bucket counts (tiny agg) give each
    * bucket's global offset via a driver-side running sum, and the dense
    * rank is offset + row_number within the bucket — every window
    * partition is ~N/buckets rows, fully parallel.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: String = "0",
      buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0 && buckets <= 65536, "buckets in (0, 65536]")
    // hex-prefix bucket: buckets must divide 16^4 so the bucket is a pure
    // prefix range of the key ordering
    require(65536 % buckets == 0, "buckets must divide 65536")
    val key = md5(concat(col(idCol).cast("string"), lit(" "), lit(seed)))
    val keyed = df.withColumn("_gs_key", key)
      .withColumn("_gs_bucket",
        (conv(substring(col("_gs_key"), 1, 4), 16, 10).cast("long") /
          lit(65536L / buckets)).cast("int"))
    val offsets: Map[Int, Long] = {
      val counts = keyed.groupBy("_gs_bucket").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      counts.map { case (b, n) => val off = acc; acc += n; b -> off }.toMap
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_gs_ob", "_gs_off")
    val w = Window.partitionBy(col("_gs_bucket"))
      .orderBy(col("_gs_key"), col(idCol))
    keyed.join(broadcast(offDf), col("_gs_bucket") === col("_gs_ob"))
      .withColumn("pos", col("_gs_off") + row_number().over(w) - 1)
      .drop("_gs_key", "_gs_bucket", "_gs_ob", "_gs_off")
  }
}
