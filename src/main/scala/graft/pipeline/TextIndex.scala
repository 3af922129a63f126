package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** BM25 inverted index persisted as a graft table — the index-once /
  * query-many shape for text retrieval at corpus scale, the text twin of
  * [[VectorIndex]]. [[TextSearch.bm25TopK]] rebuilds posting lists per
  * query run; here the build is a one-time table-service job and every
  * search afterward is a pruned scan:
  *
  *  - `postings` is a graft table keyed by `(term, doc_id)` and
  *    PARTITIONED BY a hash bucket of the term, so a search's query-term
  *    set turns into plan-time partition pruning — only the buckets
  *    holding query terms are listed or read. With 64 buckets a 3-term
  *    query scans ≤3/64 of the index bytes regardless of corpus size.
  *  - corpus statistics (doc count, total token count — the BM25
  *    normalizer inputs) are exact integers carried in the manifest, not
  *    a table scan at query time.
  *
  * The index version is a single atomic marker: after the postings commit
  * publishes, `text_manifest.json` is renamed into place recording the
  * postings instant + stats that belong together, and searches pin the
  * table to the manifest's instant via time travel — a reader never
  * observes half-built postings or stats that disagree with them.
  *
  * [[append]] ingests NEW documents incrementally (postings upsert +
  * stats roll-forward, no rebuild). Re-indexing a CHANGED document needs
  * [[build]] — removing a doc's stale terms is a doc→terms reverse lookup
  * the posting layout doesn't serve, the same rebuild-to-re-center
  * contract as IVF.
  */
object TextIndex {

  final case class Index(postings: GraftTable, instant: Option[String],
      nDocs: Long, sumDl: Long, buckets: Int)

  private def manifestPath(path: String) =
    Paths.get(GraftTable.normalize(path)).resolve("text_manifest.json")

  private def postingsOf(corpus: DataFrame, idCol: String, textCol: String) =
    TextSearch.postings(corpus, idCol, textCol)

  private def statsOf(corpus: DataFrame, idCol: String, textCol: String): (Long, Long) = {
    val r = corpus.select(Repetition.tokens(col(textCol)).as("_tk"))
      .agg(count(lit(1)), coalesce(sum(size(col("_tk")).cast("long")), lit(0L)))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  private def publish(path: String, instant: String, nDocs: Long, sumDl: Long,
      buckets: Int): Unit = {
    val mf = manifestPath(path)
    val tmp = mf.resolveSibling(s".text_manifest.$instant.tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"postings_instant":"$instant","n_docs":"$nDocs","sum_dl":"$sumDl","buckets":"$buckets"}""")
    java.nio.file.Files.move(tmp, mf,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Build (or transactionally rebuild) the index under `path`. */
  def build(spark: SparkSession, path: String, corpus: DataFrame,
      buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): Index = {
    val tPath = s"$path/text_postings"
    val t =
      if (graft.core.TableConfig.exists(
          new org.apache.hadoop.fs.Path(GraftTable.normalize(tPath))))
        GraftTable.load(spark, tPath)
      else GraftTable.create(spark, tPath, TableConfig(
        "text_postings", TableType.CopyOnWrite, Seq("term", "doc_id"),
        s"concat('b=', pmod(xxhash64(term), $buckets))", ""))
    val p = postingsOf(corpus, idCol, textCol)
    val inst =
      if (t.timeline.completedDataInstants().isEmpty) t.bulkInsert(p)
      else t.insertOverwriteTable(p)
    val (n, dl) = statsOf(corpus, idCol, textCol)
    publish(path, inst, n, dl, buckets)
    Index(t, Some(inst), n, dl, buckets)
  }

  /** Incremental maintenance: index a batch of NEW documents — their
    * postings upsert into the term-bucket partitions the batch actually
    * touches, and the manifest's exact-integer stats roll forward. Cost
    * ∝ batch postings, not corpus.
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Index = {
    val idx = load(spark, path)
    val inst = idx.postings.upsert(postingsOf(newDocs, idCol, textCol))
    val (n, dl) = statsOf(newDocs, idCol, textCol)
    publish(path, inst, idx.nDocs + n, idx.sumDl + dl, idx.buckets)
    Index(idx.postings, Some(inst), idx.nDocs + n, idx.sumDl + dl, idx.buckets)
  }

  /** Load the index pinned to the manifest's consistent version. */
  def load(spark: SparkSession, path: String): Index = {
    val m = graft.core.Json.read[Map[String, String]](
      java.nio.file.Files.readString(manifestPath(path)))
    Index(GraftTable.load(spark, s"$path/text_postings"),
      m.get("postings_instant"),
      m("n_docs").toLong, m("sum_dl").toLong, m("buckets").toInt)
  }

  /** BM25 top-k against the persisted index: identical scoring (and
    * bit-identical results) to [[TextSearch.bm25TopK]], but the postings
    * scan prunes to the partitions holding query terms — the driver
    * collect is bounded by the query-term count, never the corpus.
    */
  def search(index: Index, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75, queryIdCol: String = "query_id",
      queryTextCol: String = "text"): DataFrame = {
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(Repetition.tokens(col(queryTextCol)))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val parts = qterms.select(
          concat(lit("b="), pmod(xxhash64(col("term")), lit(index.buckets))))
        .distinct().collect().map(_.getString(0)).toSeq
      val tf = Readers.snapshot(index.postings, asOf = index.instant,
          partitions = Some(parts))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      val matched = tf.join(broadcast(qterms.select("term").distinct()), Seq("term"))
      val dfreq = matched.groupBy("term").agg(count(lit(1)).as("dfreq"))
      val avgdl = index.sumDl.toDouble / index.nDocs
      val scored = matched
        .join(broadcast(qterms), Seq("term"))
        .join(broadcast(dfreq), Seq("term"))
        .withColumn("_idf",
          log((lit(index.nDocs) - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0))
        .withColumn("_ts",
          round(col("_idf") * (col("tf") * (k1 + 1)) /
            (col("tf") + (col("dl") / avgdl * b + (1 - b)) * k1), 8)
            .cast("decimal(18,8)"))
      val scores = scored.groupBy("query_id", "doc_id")
        .agg(sum(col("_ts")).cast("double").as("_s"))
        .select(col("query_id"), col("doc_id"), round(col("_s"), 4).as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id"))
      scores.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .localCheckpoint(eager = true)
    } finally qterms.unpersist()
  }
}
