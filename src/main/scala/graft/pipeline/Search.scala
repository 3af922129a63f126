package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CommitMetadata, MetaCols, TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** BM25 full-text retrieval over a document corpus — the keyword-search
  * counterpart to the ANN family (hybrid retrieval pipelines run both).
  * Beyond the reference (no text-search surface); the formula is the
  * standard Robertson/Sparck-Jones BM25 with k1/b defaults.
  *
  * Scale shape (brute force): one tokenize+explode pass FILTERED to the
  * query's terms before any shuffle — shuffle volume is O(matching
  * postings), never O(corpus tokens); corpus stats are one count/sum agg
  * row broadcast into the scorer. Per-term contributions round to 9 dp
  * and fold in DECIMAL so the per-doc sum is order-independent (the
  * engine-wide determinism recipe).
  *
  * [[SearchIndex]] is the index-once/query-many form: postings persisted
  * as a graft table partitioned by term-hash bucket, so a query's terms
  * turn into plan-time partition pruning — at 100 TB a search reads only
  * the handful of buckets its terms hash to, and document-frequency is
  * exact from the pruned scan alone (a term's postings live entirely in
  * its bucket). Corpus stats (N, total token count) ride the index
  * table's commit metadata: O(1) to read, transactionally consistent
  * with the postings they describe.
  */
object Search {

  /** Lowercase alphanumeric-run tokenizer — deliberately trivial so the
    * DuckDB oracle replays it verbatim
    * (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Driver-side tokenizer for query strings: same rule, distinct terms. */
  def tokenize(q: String): Seq[String] =
    q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq

  /** Brute-force BM25 top-k: `(doc_id, score, n_terms)` for the `k`
    * best-matching documents (score desc, doc_id tiebreak).
    */
  def bm25TopK(docs: DataFrame, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val qTerms = tokenize(query)
    require(qTerms.nonEmpty, s"query '$query' has no terms")
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
    // N and avgdl over the WHOLE corpus (token-less docs count too);
    // integral token counts sum exactly in long
    val stats = base.agg(
      count(lit(1)).cast("double").as("_n"),
      (sum(size(col("_toks")).cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("_avgdl"))
    val tf = base
      .select(col("doc_id"), size(col("_toks")).cast("double").as("_dl"),
        explode(col("_toks")).as("_term"))
      .filter(col("_term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("_term"), col("_dl"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    scoreAndTopK(tf, stats, k, k1, b)
  }

  /** BM25 scorer over a postings frame `(doc_id, _term, _dl, _tf)` plus a
    * one-row stats frame `(_n, _avgdl)`. Document frequency comes from
    * the postings themselves (one row per (doc, term)).
    */
  private[pipeline] def scoreAndTopK(tf: DataFrame, stats: DataFrame, k: Int,
      k1: Double, b: Double): DataFrame = {
    val dft = tf.groupBy(col("_term")).agg(count(lit(1)).cast("double").as("_df"))
    val scored = tf.join(broadcast(dft), "_term").crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))))
      .withColumn("_w",
        col("_tf") * (lit(k1) + lit(1.0)) /
          (col("_tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl") / col("_avgdl"))))
      // 9-dp round + decimal fold: per-doc sums are order-independent
      .withColumn("_c", round(col("_idf") * col("_w"), 9).cast("decimal(28,9)"))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("_c")).cast("decimal(28,9)").as("_sd"),
        count(lit(1)).as("n_terms"))
      .select(col("doc_id"), col("_sd").cast("double").as("score"), col("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}

/** Persisted inverted index for [[Search]]: one graft table of postings
  * `(term, doc_id, tf, dl)` keyed by (term, doc_id) and PARTITIONED by
  * `tb<xxhash64(term) mod buckets>`. Searching computes the query terms'
  * buckets driver-side (same xxhash64, evaluated via the catalyst
  * expression — zero jobs) and filters on the partition column, so the
  * scan plans down to at most |query terms| buckets. Corpus stats live
  * in each commit's extra metadata and accumulate across [[append]]s.
  *
  * The index is append-oriented: [[append]] upserts postings for NEW
  * documents (idempotent per (term, doc_id) — re-ingesting the same doc
  * is a no-op for counts only if stats aren't re-added, so feed each doc
  * once). Replacing a changed document requires deleting its old
  * postings first — out of scope here, like every batch-built IR index.
  */
object SearchIndex {

  val NDocsKey = "graft.search.n.docs"
  val SumDlKey = "graft.search.sum.dl"
  val BucketsKey = "graft.search.buckets"

  private def postingsOf(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), Search.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** `(docCount, totalTokens)` of a batch — the stats a commit adds. */
  private def batchStats(docs: DataFrame, textCol: String, idCol: String): (Long, Long) = {
    val r = docs.agg(count(lit(1)),
      coalesce(sum(size(Search.tokens(col(textCol))).cast("long")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Accumulated `(N, sumDl)` from the newest commit carrying stats. */
  def stats(t: GraftTable): (Long, Long) =
    t.timeline.completedDataInstants().reverse.iterator
      .map(i => CommitMetadata.fromJson(t.timeline.readContent(i)).extraMetadata)
      .collectFirst { case m if m.contains(NDocsKey) =>
        (m(NDocsKey).toLong, m(SumDlKey).toLong) }
      .getOrElse((0L, 0L))

  def build(spark: SparkSession, path: String, docs: DataFrame, nBuckets: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): GraftTable = {
    val t = GraftTable.create(spark, path, TableConfig(
      "search_index", TableType.CopyOnWrite, Seq("term", "doc_id"),
      s"concat('tb', pmod(xxhash64(term), $nBuckets))", "",
      props = Map(BucketsKey -> nBuckets.toString)))
    val (n, dl) = batchStats(docs, textCol, idCol)
    t.upsert(postingsOf(docs, textCol, idCol),
      extraMetadata = Map(NDocsKey -> n.toString, SumDlKey -> dl.toString))
    t
  }

  /** Add NEW documents' postings; stats accumulate in the same commit. */
  def append(t: GraftTable, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): String = {
    val (n0, dl0) = stats(t)
    val (n, dl) = batchStats(docs, textCol, idCol)
    t.upsert(postingsOf(docs, textCol, idCol),
      extraMetadata = Map(NDocsKey -> (n0 + n).toString,
        SumDlKey -> (dl0 + dl).toString))
  }

  /** The query terms' partition values, via the same xxhash64 the table's
    * partition expression uses — evaluated driver-side, zero Spark jobs.
    */
  private def bucketsOf(terms: Seq[String], nBuckets: Int): Seq[String] =
    terms.map { term =>
      // seed 42 = the SQL xxhash64 function's seed (must match the
      // table's partition expression exactly)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(term),
          org.apache.spark.sql.types.StringType)), 42L).eval(null).asInstanceOf[Long]
      s"tb${((h % nBuckets) + nBuckets) % nBuckets}"
    }.distinct

  /** BM25 top-k through the index: partition-pruned postings scan, df
    * from the pruned postings, stats from commit metadata. Result is
    * bit-identical to [[Search.bm25TopK]] over the same corpus.
    */
  def search(t: GraftTable, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = Search.tokenize(query)
    require(qTerms.nonEmpty, s"query '$query' has no terms")
    val nBuckets = t.cfg.prop(BucketsKey, "64").toInt
    val (n, sumDl) = stats(t)
    require(n > 0, "empty search index")
    val spark = t.spark
    val statsDf = spark.range(1).select(
      lit(n).cast("double").as("_n"),
      lit(sumDl.toDouble / n.toDouble).as("_avgdl"))
    val tf = Readers.snapshot(t)
      // partition filter first: the scan lists only the terms' buckets
      .filter(col(MetaCols.PartitionPath).isin(bucketsOf(qTerms, nBuckets): _*))
      .filter(col("term").isin(qTerms: _*))
      .select(col("doc_id"), col("term").as("_term"),
        col("dl").cast("double").as("_dl"), col("tf").cast("double").as("_tf"))
    Search.scoreAndTopK(tf, statsDf, k, k1, b)
  }
}
