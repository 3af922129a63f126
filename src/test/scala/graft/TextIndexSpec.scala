package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.{Repetition, TextIndex, TextSearch}
import graft.table.WritePipeline

class TextIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet").cache()

  private def freshPath(name: String): String = {
    val p = s"/tmp/graft_tidx/$name"
    WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(p))
    p
  }

  private def queriesDf = docs.filter(col("doc_id") < 3)
    .select(col("doc_id").as("query_id"),
      array_join(slice(Repetition.tokens(col("text")), 1, 8), " ").as("text"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "doc_id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("persisted BM25 search == in-memory bm25TopK, bit-identical scores") {
    val p = freshPath("parity")
    val idx = TextIndex.build(spark, p, docs, buckets = 16)
    val viaTable = rows(TextIndex.search(idx, queriesDf, k = 10))
    val direct = rows(TextSearch.bm25TopK(docs, queriesDf, k = 10))
    assert(viaTable === direct)
    assert(viaTable.nonEmpty)
  }

  test("postings table is term-bucket partitioned; search prunes to query buckets") {
    val p = freshPath("prune")
    val idx = TextIndex.build(spark, p, docs, buckets = 16)
    val parts = idx.postings.view.partitions()
    assert(parts.forall(_.startsWith("b=")))
    assert(parts.size > 1)
    // a pruned snapshot of one bucket reads a strict subset of the index
    val one = graft.read.Readers.snapshot(idx.postings,
      partitions = Some(Seq(parts.head)))
    val all = graft.read.Readers.snapshot(idx.postings)
    assert(one.count() < all.count())
  }

  test("incremental append converges to the from-scratch index") {
    val p = freshPath("append")
    TextIndex.build(spark, p, docs.filter(col("doc_id") < 250), buckets = 16)
    val idx = TextIndex.append(spark, p, docs.filter(col("doc_id") >= 250))
    val full = freshPath("append_full")
    val fullIdx = TextIndex.build(spark, full, docs, buckets = 16)
    assert(idx.nDocs === fullIdx.nDocs)
    assert(idx.sumDl === fullIdx.sumDl)
    assert(rows(TextIndex.search(idx, queriesDf, k = 10)) ===
      rows(TextIndex.search(fullIdx, queriesDf, k = 10)))
  }

  test("manifest pins a consistent version: readers ignore unpublished postings") {
    val p = freshPath("pin")
    val idx1 = TextIndex.build(spark, p, docs.filter(col("doc_id") < 250), buckets = 8)
    val before = rows(TextIndex.search(idx1, queriesDf, k = 10))
    // a second writer appends; the FIRST loaded index keeps its pinned
    // instant and stats — results must not shift under the reader
    TextIndex.append(spark, p, docs.filter(col("doc_id") >= 250))
    assert(rows(TextIndex.search(idx1, queriesDf, k = 10)) === before)
    // a fresh load sees the appended version
    val idx2 = TextIndex.load(spark, p)
    assert(idx2.nDocs > idx1.nDocs)
    assert(rows(TextIndex.search(idx2, queriesDf, k = 10)) !== before)
  }
}
