package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index text retrieval over a document corpus: BM25 ranked
  * search and TF-IDF keyword extraction.
  *
  * The corpus side is classic posting-list shape — `(term, doc_id, tf)`
  * built by one explode + one hash aggregate (map-side partial combine
  * carries most of the weight; only distinct `(doc_id, term)` pairs
  * shuffle). Document length rides along from before the explode, so no
  * second shuffle is needed to recover it. At search time the query-term
  * set is tiny and broadcast: postings prune to query terms BEFORE any
  * shuffle, so cost is ∝ matched postings, not corpus size — the property
  * that keeps interactive search viable over a 100 TB corpus.
  *
  * Float discipline (same rule as [[LmScore]] / the commonness score):
  * per-(term, doc) partial scores are rounded to 8 dp and summed as
  * DECIMAL so the final score is independent of aggregation order across
  * partitions; one double division/log per row, rounded to 4 dp at the
  * end. Tokenization is [[Repetition.tokens]] (lower + `\s+` split), the
  * corpus-wide convention shared with the dedup/quality operators.
  */
object TextSearch {

  /** Posting lists `(term, doc_id, tf, dl)` — `dl` is the document's
    * token count, carried from before the explode (no extra shuffle).
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"),
        Repetition.tokens(col(textCol)).as("_tk"))
      .withColumn("dl", size(col("_tk")).cast("long"))
    tk.select(col("doc_id"), col("dl"), explode(col("_tk")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** BM25 top-k search: for each query row, the `k` best-scoring docs.
    *
    * Output: `(query_id, doc_id, score, rank)` — `score` rounded to 4 dp,
    * `rank` dense from 1 ordered by `(score DESC, doc_id)` so ties are
    * deterministic. Docs sharing no term with a query are absent (BM25 of
    * an empty intersection is 0, not a hit).
    *
    * Plan shape: postings ⋈ broadcast(query terms) prunes to matched
    * postings first; document frequencies are then computed from the
    * matched slice only (bounded by |query terms|) and broadcast back —
    * the full corpus vocabulary is never aggregated. One shuffle total,
    * the `(query_id, doc_id)` score aggregate.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "text"): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"),
        Repetition.tokens(col(textCol)).as("_tk"))
      .withColumn("dl", size(col("_tk")).cast("long"))
    // exact-integer corpus stats: one double division later, so avgdl is
    // identical regardless of partitioning
    val stats = tk.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = tk.select(col("doc_id"), col("dl"), explode(col("_tk")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(Repetition.tokens(col(queryTextCol)))).as("term"))
    // prune postings to query terms BEFORE anything corpus-wide
    val matched = tf.join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfreq = matched.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val scored = matched
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("_idf",
        log((col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0))
      .withColumn("_ts",
        round(col("_idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + (col("dl") / col("_avgdl") * b + (1 - b)) * k1), 8)
          .cast("decimal(18,8)"))
    val scores = scored.groupBy("query_id", "doc_id")
      .agg(sum(col("_ts")).cast("double").as("_s"))
      .select(col("query_id"), col("doc_id"), round(col("_s"), 4).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scores.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of retrieval rankings (public method:
    * Cormack et al., "Reciprocal Rank Fusion outperforms Condorcet and
    * individual Rank Learning Methods", 2009) — the standard hybrid-
    * retrieval combiner: each input ranking contributes `1/(c + rank)`
    * per (query, doc) and the fused list ranks by the sum. Inputs are
    * `(query_id, doc_id, rank)` frames from ANY retriever (BM25, ANN,
    * a recency ranking); docs missing from a list just contribute 0.
    *
    * Per-list contributions quantize to DECIMAL(18,8) before summing so
    * the fused score is independent of aggregation order (same
    * discipline as [[bm25TopK]]'s per-term parts). One shuffle: the
    * (query_id, doc_id) sum; rankings are top-k sized, never corpus-
    * sized, so the fusion input is |queries| × k × lists rows.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val parts = rankings.map(_.select(col("query_id"), col("doc_id"),
      round(lit(1.0) / (col("rank") + c), 8).cast("decimal(18,8)").as("_rr")))
    val fused = parts.reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("_rr")).cast("double"), 6).as("rrf_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** TF-IDF keyword extraction: the `topK` most characteristic terms per
    * document, `score = tf * ln(N / df)` rounded to 4 dp, ranked by
    * `(score DESC, term)` for deterministic ties.
    *
    * The vocabulary document-frequency aggregate is one shuffle with full
    * map-side combine (distinct `(doc_id, term)` pairs in, distinct terms
    * out); the tf ⋈ df join shuffles on `term` — both corpus-wide but
    * linear, and Catalyst/AQE broadcast the df side when it fits.
    */
  def tfidfKeywords(docs: DataFrame, topK: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = postings(docs, idCol, textCol)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("dfreq")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("doc_id", "term", "score", "rank")
  }
}
