package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

/** IVF vector index persisted as graft tables — the index-once /
  * query-many shape for similarity search at table scale.
  * [[Similarity.ivfTopK]] rebuilds assignments per query run; here the
  * build is a one-time table-service job and every search afterward is a
  * pruned scan:
  *
  *  - `assignments` is a graft table PARTITIONED BY centroid id, so a
  *    search's probe set turns into plan-time partition pruning — only
  *    `nprobe`/`nlist` of the index's bytes are ever listed or read. At
  *    100 TB of embeddings with nlist=1024, nprobe=8, a search scans
  *    <1% of the index.
  *  - `centroids` is a tiny unpartitioned graft table (nlist rows),
  *    broadcast into the probe computation.
  *
  * Both tables are transactional (a rebuild is an insert_overwrite_table
  * replacecommit), and the PAIR is versioned by a manifest: after both
  * commits publish, `ivf_manifest.json` is atomically renamed into place
  * recording the (assignments, centroids) instants that belong together.
  * Searches pin both tables to the manifest's instants via time travel,
  * so a reader never observes new assignments with old centroids (or
  * vice versa) during a rebuild — the index version is a single atomic
  * marker, not two independent table heads. Seeding/assignment math is
  * [[Similarity.ivfBuild]] — deterministic and replayed exactly by the
  * DuckDB oracle.
  */
object VectorIndex {

  /** A consistent index snapshot: both tables pinned to the instants the
    * manifest published together (None = pre-manifest table head, only
    * seen for indexes written by older builds).
    */
  final case class IvfIndex(assignments: GraftTable, centroids: GraftTable,
      assignInstant: Option[String] = None, centInstant: Option[String] = None)

  private def partitionOf(cid: Any): String = s"c=$cid"

  private def manifestPath(path: String) =
    Paths.get(GraftTable.normalize(path)).resolve("ivf_manifest.json")

  /** Build (or transactionally rebuild) the IVF index under `path`. The
    * new version becomes visible to [[load]]ers atomically when the
    * manifest rename lands; concurrent searches loaded from the previous
    * manifest keep reading the previous snapshot of BOTH tables.
    */
  def buildIvf(spark: SparkSession, path: String, corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val (assignments, centroids) = Similarity.ivfBuild(corpus, nlist, idCol, vecCol)
    val aDf = assignments.select(col(idCol), col(vecCol), col("centroid_id"))
    val cDf = centroids.select(col("centroid_id"), col("_ct_v").as(vecCol))
    val aT = loadOrCreate(spark, s"$path/ivf_assignments", TableConfig(
      "ivf_assignments", TableType.CopyOnWrite,
      Seq(idCol), "concat('c=', centroid_id)", ""))
    val cT = loadOrCreate(spark, s"$path/ivf_centroids", TableConfig(
      "ivf_centroids", TableType.CopyOnWrite, Seq("centroid_id"), "", ""))
    val aInst =
      if (aT.timeline.completedDataInstants().isEmpty) aT.bulkInsert(aDf)
      else aT.insertOverwriteTable(aDf)
    val cInst =
      if (cT.timeline.completedDataInstants().isEmpty) cT.bulkInsert(cDf)
      else cT.insertOverwriteTable(cDf)
    // atomic version marker: temp write + rename (same publish protocol as
    // timeline instants) — readers see either the old pair or the new pair
    val mf = manifestPath(path)
    val tmp = mf.resolveSibling(s".ivf_manifest.${aInst}.tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"assignments_instant":"$aInst","centroids_instant":"$cInst"}""")
    java.nio.file.Files.move(tmp, mf,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    IvfIndex(aT, cT, Some(aInst), Some(cInst))
  }

  /** Incremental maintenance: assign NEW vectors to the EXISTING
    * centroids (same l2-argmin + centroid-id tiebreak as the build) and
    * upsert them into the assignments table — no rebuild, no touching
    * partitions the batch doesn't hit. This is standard IVF upkeep: at
    * corpus scale a per-tick rebuild is infeasible, so ticks append
    * against frozen centroids and a periodic [[buildIvf]] re-centers when
    * drift accumulates. Re-appearing ids re-assign via the GLOBAL upsert:
    * if the vector's nearest centroid changed, the old partition's row is
    * tombstoned and the new partition gets the insert, atomically in one
    * commit — no duplicate ids across centroid partitions.
    *
    * Publishes a new manifest pinning the appended assignments instant
    * with the UNCHANGED centroid instant; concurrent readers keep their
    * pinned snapshot.
    */
  def appendToIvf(spark: SparkSession, path: String, newVectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val idx = load(spark, path)
    val cents = Readers.snapshot(idx.centroids, asOf = idx.centInstant)
      .select(col("centroid_id"), col(vecCol).as("_ct_v"))
    val assigned = newVectors.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .withColumn("_d", graft.functions.VecMath.l2Native(col(vecCol), col("_ct_v")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_d"), col("centroid_id"))
    val aDf = assigned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
    // GLOBAL upsert: a re-appearing id whose nearest centroid changed must
    // MOVE partitions (tombstone old, insert new), not duplicate
    val aInst = idx.assignments.upsertGlobal(aDf)
    val cInst = idx.centInstant.getOrElse(
      idx.centroids.timeline.lastCompleted().map(_.ts).getOrElse(""))
    val mf = manifestPath(path)
    val tmp = mf.resolveSibling(s".ivf_manifest.${aInst}.tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"assignments_instant":"$aInst","centroids_instant":"$cInst"}""")
    java.nio.file.Files.move(tmp, mf,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    IvfIndex(idx.assignments, idx.centroids, Some(aInst), Some(cInst).filter(_.nonEmpty))
  }

  /** Load the index pinned to the manifest's consistent version (falls
    * back to the table heads when no manifest exists).
    */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val (ai, ci) = {
      val mf = manifestPath(path)
      if (java.nio.file.Files.exists(mf)) {
        val m = graft.core.Json.read[Map[String, String]](
          java.nio.file.Files.readString(mf))
        (m.get("assignments_instant"), m.get("centroids_instant"))
      } else (None, None)
    }
    IvfIndex(
      GraftTable.load(spark, s"$path/ivf_assignments"),
      GraftTable.load(spark, s"$path/ivf_centroids"), ai, ci)
  }

  /** Top-k cosine search against a persisted index. Probes the `nprobe`
    * nearest centroids per query, then snapshot-reads ONLY the probed
    * centroid partitions of the assignments table.
    */
  def ivfSearch(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int = 4,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val idxCols = index.assignments.cfg.recordKeyFields
    val idCol = idxCols.head
    val vecCol = queryVec
    val cents = Readers.snapshot(index.centroids, asOf = index.centInstant)
      .select(col("centroid_id"), col(vecCol).as("_ct_v"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_q_v"))
    val qProbes = q.crossJoin(broadcast(cents))
      .withColumn("_d", graft.functions.VecMath.l2Native(col("_q_v"), col("_ct_v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_d"), col("centroid_id"))
    val probes = qProbes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .select(col("query_id"), col("_q_v"), col("centroid_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // probed centroid set is bounded by nlist — a tiny driver collect
      // that becomes plan-time partition pruning on the index scan
      val probed = probes.select("centroid_id").distinct()
        .collect().map(r => partitionOf(r.get(0))).toSeq
      val cand = Readers.snapshot(index.assignments, asOf = index.assignInstant,
          partitions = Some(probed))
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("_c_v"), col("centroid_id"))
        .join(broadcast(probes), Seq("centroid_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
      val scored = cand.withColumn("score",
        graft.functions.VecMath.cosineNative(col("_q_v"), col("_c_v")))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
        .localCheckpoint(eager = true)
    } finally probes.unpersist()
  }

  private def loadOrCreate(spark: SparkSession, path: String, cfg: TableConfig): GraftTable =
    if (graft.core.TableConfig.exists(new org.apache.hadoop.fs.Path(GraftTable.normalize(path))))
      GraftTable.load(spark, path)
    else GraftTable.create(spark, path, cfg)
}
