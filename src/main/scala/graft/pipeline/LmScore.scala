package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style perplexity
  * filter (public method: Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", 2019 — score each document
  * with a small LM trained on trusted text, keep the low-perplexity
  * tail). The model here is a Laplace-smoothed bigram LM over
  * whitespace tokens: big corpora rank the same under a bigram LM as
  * under heavier models for FILTERING purposes, and every step stays
  * exactly replayable by the DuckDB oracle (counts, joins, `ln`).
  *
  * Scale shape: training is one corpus-wide bigram aggregation (the
  * classic word-count plan) plus the vocabulary distinct-count pass; the
  * unigram context counts fold from the aggregated model table itself
  * (c1 = Σ c2), never re-reading the corpus.
  * Scoring explodes each doc into bigrams and joins against the model on
  * (w1, w2) then w1; both sides hash-partition on the join key, and a
  * trusted-corpus model is typically small enough that Spark broadcasts
  * it (AQE decides from actual size). Per-doc aggregation reuses the
  * doc_id partitioning. No driver materialization anywhere.
  */
object LmScore {

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Consecutive token pairs of one document as (w1, w2) structs. */
  private def bigrams(text: Column): Column = {
    val tk = toks(text)
    val len = greatest(size(tk) - 1, lit(0))
    zip_with(slice(tk, lit(1), len), slice(tk, lit(2), len),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Train the bigram model on a trusted corpus: one row per observed
    * bigram with its count, plus the unigram counts and vocabulary size
    * needed for Laplace smoothing at score time. Returns
    * (bigramCounts(w1, w2, c2), unigramCounts(w1, c1), vocabSize).
    */
  def train(trusted: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, Long) = {
    val pairs = trusted.select(explode(bigrams(col(textCol))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // context counts DERIVE from the bigram counts: c1(w1) = Σ_w2 c2 —
    // exact LONG sums, bit-identical to re-counting pairs, and one whole
    // tokenize+explode+shuffle pass over the corpus cheaper (the uni
    // aggregation now folds the already-aggregated model table)
    val uni = bi.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = trusted.select(explode(toks(col(textCol))).as("w"))
      .agg(countDistinct(col("w"))).first().getLong(0)
    (bi, uni, vocab)
  }

  /** Score documents against a trained model: per-doc mean token
    * log-probability (higher = more natural under the model; -avg is the
    * log-perplexity). Laplace smoothing:
    * `ln((c2 + 1) / (c1 + V))`, with `c2 = 0` for unseen bigrams and
    * `c1 = 0` for unseen context words. Docs with fewer than 2 tokens
    * score the unseen-context floor `ln(1 / V)`.
    */
  def score(docs: DataFrame, bi: DataFrame, uni: DataFrame, vocab: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val pairs = docs.select(col(idCol), explode(bigrams(col(textCol))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = pairs
      .join(bi, Seq("w1", "w2"), "left_outer")
      .join(uni, Seq("w1"), "left_outer")
      .withColumn("_lp", log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + vocab).cast("double")))
      .groupBy(idCol).agg(avg(col("_lp")).as("avg_logp"))
    // left join back so token-poor docs keep a defined score
    docs.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .withColumn("avg_logp",
        coalesce(col("avg_logp"), lit(math.log(1.0 / vocab))))
  }

  /** The filter itself: keep the most-natural ~`keepFraction` of docs by
    * model score (CCNet keeps the low-perplexity "head"). The cut point
    * is a distributed approximate quantile of the score column — an
    * exact global rank would funnel every (id, score) pair through one
    * ordered partition, which is exactly the kind of bottleneck a
    * 10^10-doc corpus cannot pay. The returned fraction is therefore
    * approximate to the sketch's resolution, like CCNet's own bucketing.
    */
  def filterByPerplexity(docs: DataFrame, trusted: DataFrame,
      keepFraction: Double, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    val (bi, uni, v) = train(trusted, textCol)
    val scored = score(docs, bi, uni, v, textCol, idCol)
    if (keepFraction == 1.0) return docs
    val cut = scored.stat.approxQuantile("avg_logp",
      Array(1.0 - keepFraction), 0.001).head
    docs.join(scored.filter(col("avg_logp") >= cut).select(idCol),
      Seq(idCol), "left_semi")
  }
}
