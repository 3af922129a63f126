package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.{Similarity, VectorIndex}
import graft.table.WritePipeline

class VectorIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val embs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
    .cache()

  private def freshPath(name: String): String = {
    val p = s"/tmp/graft_vidx/$name"
    WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(p))
    p
  }

  test("persisted IVF search == in-memory ivfTopK") {
    val p = freshPath("parity")
    val idx = VectorIndex.buildIvf(spark, p, embs, nlist = 8)
    val queries = embs.filter(col("vec_id") < 5)
    val viaTable = VectorIndex.ivfSearch(idx, queries, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (a, c) = Similarity.ivfBuild(embs, nlist = 8)
    val direct = Similarity.ivfTopK(a, c, queries, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaTable === direct)
    assert(viaTable.nonEmpty)
  }

  test("assignments table is partitioned by centroid; search prunes to probes") {
    val p = freshPath("prune")
    val idx = VectorIndex.buildIvf(spark, p, embs, nlist = 8)
    val parts = idx.assignments.view.partitions()
    assert(parts.size === 8)
    assert(parts.forall(_.startsWith("c=")))
    // a 1-probe search must touch exactly one partition's files
    val q = embs.filter(col("vec_id") === 0)
    val out = VectorIndex.ivfSearch(idx, q, k = 3, nprobe = 1)
    assert(out.count() === 3)
    // pruned snapshot of a single partition reads a strict subset of files
    val one = graft.read.Readers.snapshot(idx.assignments,
      partitions = Some(Seq(parts.head)))
    val all = graft.read.Readers.snapshot(idx.assignments)
    assert(one.count() < all.count())
  }

  test("rebuild is transactional insert_overwrite_table") {
    val p = freshPath("rebuild")
    VectorIndex.buildIvf(spark, p, embs.filter(col("vec_id") < 100), nlist = 4)
    val idx2 = VectorIndex.buildIvf(spark, p, embs, nlist = 8)
    // second build replaced the first: full corpus indexed, 8 partitions
    val n = graft.read.Readers.snapshot(idx2.assignments).count()
    assert(n === embs.count())
    assert(idx2.assignments.view.partitions().size === 8)
    // reload from disk sees the same state
    val reloaded = VectorIndex.load(spark, p)
    assert(graft.read.Readers.snapshot(reloaded.assignments).count() === n)
  }

  test("manifest pins a consistent (assignments, centroids) version") {
    val p = freshPath("manifest")
    VectorIndex.buildIvf(spark, p, embs.filter(col("vec_id") < 100), nlist = 4)
    // a loader from BEFORE the rebuild keeps reading the old pair even
    // after new table heads publish — the two-commit window is invisible
    val oldIdx = VectorIndex.load(spark, p)
    val oldCentroids = graft.read.Readers
      .snapshot(oldIdx.centroids, asOf = oldIdx.centInstant).count()
    VectorIndex.buildIvf(spark, p, embs, nlist = 8)
    assert(graft.read.Readers
      .snapshot(oldIdx.centroids, asOf = oldIdx.centInstant).count() === oldCentroids)
    val out = VectorIndex.ivfSearch(oldIdx, embs.filter(col("vec_id") === 1), k = 3)
    assert(out.count() === 3)
    // a fresh load is pinned to the new pair
    val newIdx = VectorIndex.load(spark, p)
    assert(newIdx.assignInstant.isDefined && newIdx.centInstant.isDefined)
    assert(newIdx.assignInstant !== oldIdx.assignInstant)
    assert(graft.read.Readers
      .snapshot(newIdx.centroids, asOf = newIdx.centInstant).count() === 8)
  }

  test("incremental append: new vectors join existing centroids, no rebuild") {
    val p = freshPath("append")
    val half = embs.filter(col("vec_id") % 2 === 0)
    val rest = embs.filter(col("vec_id") % 2 =!= 0)
    VectorIndex.buildIvf(spark, p, half, nlist = 8)
    val before = VectorIndex.load(spark, p)
    val centroidsBefore = graft.read.Readers
      .snapshot(before.centroids, asOf = before.centInstant)
      .select("centroid_id").collect().map(_.get(0)).toSet

    val idx = VectorIndex.appendToIvf(spark, p, rest)
    // all vectors indexed; centroids untouched (same instant, same set)
    assert(graft.read.Readers
      .snapshot(idx.assignments, asOf = idx.assignInstant).count() === embs.count())
    assert(idx.centInstant === before.centInstant)
    assert(graft.read.Readers
      .snapshot(idx.centroids, asOf = idx.centInstant)
      .select("centroid_id").collect().map(_.get(0)).toSet === centroidsBefore)
    // appended rows sit in the partition of their nearest FROZEN centroid:
    // the index search must equal in-memory ivfTopK with (frozen centroids,
    // full re-assignment) — the definitional answer for append semantics
    val queries = embs.filter(col("vec_id") < 5)
    val viaIndex = VectorIndex.ivfSearch(idx, queries, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val cents = graft.read.Readers.snapshot(idx.centroids, asOf = idx.centInstant)
      .select(col("centroid_id"), col("embedding").as("_ct_v"))
    val (aFull, _) = {
      import org.apache.spark.sql.expressions.Window
      val assigned = embs.crossJoin(broadcast(cents))
        .withColumn("_d", graft.functions.VecMath.l2Native(col("embedding"), col("_ct_v")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("_d"), col("centroid_id"))
      (assigned.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("vec_id"), col("embedding"), col("centroid_id")), cents)
    }
    val direct = Similarity.ivfTopK(aFull, cents.select(col("centroid_id"), col("_ct_v")),
        queries, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaIndex === direct)
    // a re-appended id must not duplicate
    VectorIndex.appendToIvf(spark, p, rest.limit(10))
    val again = VectorIndex.load(spark, p)
    assert(graft.read.Readers
      .snapshot(again.assignments, asOf = again.assignInstant).count() === embs.count())
  }
}
