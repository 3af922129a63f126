package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (public method:
  * Xie et al., "Data Selection for Language Models via Importance
  * Resampling", 2023): score every raw document by how much more likely
  * its hashed bag-of-words is under a TARGET corpus' unigram model than
  * under the raw corpus' own, then sample proportionally to the weights
  * with the Gumbel top-k trick. The pretraining-mix builder's tool for
  * "give me the 1% of the crawl that looks most like my target domain".
  *
  * Everything is exactly replayable by the DuckDB oracle: tokens are the
  * same whitespace split the LM scorer uses, the feature hash is the
  * portable md5 top-15-hex bucket (same family as [[Sampling]]), the
  * models are Laplace-smoothed bucket counts, and the Gumbel noise is a
  * deterministic md5-derived uniform — no RNG state anywhere.
  *
  * Scale shape: two hash aggregations over exploded tokens (bucket
  * counts, the word-count plan), ONE broadcast join of per-token buckets
  * against the `buckets`-row log-ratio table (tiny by construction), one
  * per-doc sum. Selection is a global top-k (TakeOrdered — no full
  * sort). Work is O(total tokens); driver state is O(buckets).
  */
object Dsir {

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Portable feature bucket: md5 top-15 hex chars mod `buckets` —
    * bit-identical in DuckDB as `('0x'||substr(md5(w),1,15))::BIGINT % n`.
    */
  private def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))

  private def tokenBuckets(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), explode(toks(col(textCol))).as("_w"))
      .select(col(idCol), bucketOf(col("_w"), buckets).as("_b"))

  /** Per-bucket log importance ratio between the two corpora's hashed
    * unigram distributions, Laplace-smoothed over the bucket space:
    * `ln((tc_b+1)/(tt+B)) - ln((rc_b+1)/(rt+B))`. `buckets` rows.
    */
  def logRatios(raw: DataFrame, target: DataFrame, buckets: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val tc = tokenBuckets(target, textCol, idCol, buckets)
      .groupBy("_b").agg(count(lit(1)).as("_tc"))
    val rc = tokenBuckets(raw, textCol, idCol, buckets)
      .groupBy("_b").agg(count(lit(1)).as("_rc"))
    val all = (0 until buckets).map(_.toLong).toDF("_b")
    // the totals are single-row aggregates — a driver-free cross join
    val totals = tc.agg(coalesce(sum("_tc"), lit(0L)).as("_tt"))
      .crossJoin(rc.agg(coalesce(sum("_rc"), lit(0L)).as("_rt")))
    all.join(tc, Seq("_b"), "left_outer")
      .join(rc, Seq("_b"), "left_outer")
      .crossJoin(totals)
      .select(col("_b"),
        (log((coalesce(col("_tc"), lit(0L)) + 1).cast("double") /
            (col("_tt") + buckets).cast("double")) -
          log((coalesce(col("_rc"), lit(0L)) + 1).cast("double") /
            (col("_rt") + buckets).cast("double"))).as("_lw"))
  }

  /** Per-document log importance weight: the sum of its token buckets'
    * log ratios (token-poor docs score 0). Output: (idCol, dsir_logw).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, buckets: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lr = logRatios(raw, target, buckets, textCol, idCol)
    val perDoc = tokenBuckets(raw, textCol, idCol, buckets)
      .join(broadcast(lr), Seq("_b"))
      .groupBy(idCol).agg(sum(col("_lw")).as("_w"))
    raw.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("_w"), lit(0.0)).as("dsir_logw"))
  }

  /** Gumbel top-k selection: `k` raw documents sampled WITHOUT
    * replacement, proportionally to their importance weights —
    * `argtop_k(logw + Gumbel(0,1))` (public trick: sampling by perturbed
    * maxima). The noise is a deterministic md5-uniform of (id, salt), so
    * reruns select the same set. Returns (idCol, dsir_logw, gumbel_key),
    * highest keys first.
    */
  def select(raw: DataFrame, target: DataFrame, k: Int, buckets: Int = 1024,
      salt: String = "dsir", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = importanceWeights(raw, target, buckets, textCol, idCol)
    // uniform in (0,1): md5 bucket in [0, 1e6) shifted off the endpoints
    val u = (pmod(conv(substring(
      md5(concat(col(idCol).cast("string"), lit("_" + salt))), 1, 15),
      16, 10).cast("long"), lit(1000000L)).cast("double") + 0.5) / 1000000.0
    w.withColumn("gumbel_key", col("dsir_logw") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
