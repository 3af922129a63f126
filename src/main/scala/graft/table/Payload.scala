package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{ConfigKeys, MetaCols, TableConfig}

/** Record-merge payload strategies — the analog of the reference's
  * `HoodieRecordPayload` implementations (reference
  * hudi-common/.../model/HoodieRecordPayload.java:38-104), resolved to
  * pure Catalyst plans instead of per-record Avro callbacks:
  *
  *  - OVERWRITE_LATEST (default) — processing order wins: latest commit,
  *    ties broken by the precombine field then write sequence number
  *    (reference OverwriteWithLatestAvroPayload).
  *  - EVENT_TIME — the precombine field is an event time and OUTRANKS
  *    commit order: a late-arriving row whose ordering value is lower
  *    than the stored row's never overwrites it, deletes included
  *    (reference DefaultHoodieRecordPayload.needUpdatingPersistedRecord).
  *  - PARTIAL_UPDATE — per-column merge: a version's null columns take
  *    the newest non-null value from older versions of the record, so
  *    writers can send only the columns that changed (reference
  *    OverwriteNonDefaultsWithLatestAvroPayload.combineAndGetUpdateValue,
  *    where incoming default/null fields keep the persisted value). A
  *    tombstone fences the stack: versions at or below the newest delete
  *    never bleed into a record re-inserted afterwards.
  *
  * Every strategy stays shuffle-bounded: OVERWRITE_LATEST / EVENT_TIME
  * collapse with one clustered window (COW fuses it with the write
  * exchange), PARTIAL_UPDATE pays one (partition, key) exchange for its
  * per-column window frames — the same cost class as the reference's
  * reduceByKey + per-record combine.
  *
  * Within-batch precombine still picks ONE winning row (no column
  * merging), exactly like the reference's `preCombine` in 0.9 — column
  * merging applies between the batch winner and STORED versions.
  */
object Payload {
  val OverwriteLatest = "OVERWRITE_LATEST"
  val EventTime = "EVENT_TIME"
  val PartialUpdate = "PARTIAL_UPDATE"

  def of(cfg: TableConfig): String = {
    val p = cfg.prop(ConfigKeys.Payload, OverwriteLatest)
    require(Seq(OverwriteLatest, EventTime, PartialUpdate).contains(p),
      s"unknown payload '$p' (expected OVERWRITE_LATEST | EVENT_TIME | PARTIAL_UPDATE)")
    require(p != EventTime || cfg.precombineField.nonEmpty,
      "EVENT_TIME payload requires a precombine (event-time) field")
    p
  }

  /** Version ordering for a record's stack, winner first. */
  def ordering(cfg: TableConfig): Seq[Column] = of(cfg) match {
    case EventTime =>
      Seq(col(cfg.precombineField).desc, col(MetaCols.CommitTime).desc,
        col(MetaCols.CommitSeqno).desc)
    case _ =>
      Seq(col(MetaCols.CommitTime).desc) ++
        (if (cfg.precombineField.isEmpty) Nil else Seq(col(cfg.precombineField).desc)) :+
        col(MetaCols.CommitSeqno).desc
  }

  /** Winner-row collapse FUSED with the write layout: one exchange by
    * (partition, fileId) — which co-locates keys, since a key maps to
    * exactly one file group — sorted so each key's winner leads its run,
    * then a linear first-row-per-key scan dropping tombstone winners.
    * The shared shape behind the COW merged write and MOR compaction
    * (simple payloads only; PARTIAL_UPDATE needs [[mergeVersions]]).
    */
  def mergeFusedWithWriteLayout(cfg: TableConfig, unioned: DataFrame,
      del: String): DataFrame = {
    require(of(cfg) != PartialUpdate,
      "PARTIAL_UPDATE needs per-key frames — use mergeVersions")
    val ord = col(MetaCols.RecordKey).asc +: ordering(cfg)
    val w = Window.partitionBy(col(MetaCols.PartitionPath), col(WritePipeline.FileIdCol))
      .orderBy(ord: _*)
    unioned
      .repartition(col(MetaCols.PartitionPath), col(WritePipeline.FileIdCol))
      .withColumn("_graft_prev", lag(col(MetaCols.RecordKey), 1).over(w))
      .filter((col("_graft_prev").isNull ||
        col("_graft_prev") =!= col(MetaCols.RecordKey)) && !col(del))
      .drop("_graft_prev", del)
  }

  /** Collapse a multi-version frame (meta columns + a boolean `del`
    * tombstone flag, several rows per record) to the record's latest
    * state under the table's payload; deleted records are dropped and
    * `del` is removed. Used by the MOR snapshot merge, incremental
    * reads and compaction (COW writes fuse the two simple payloads into
    * the write exchange instead — see GraftTable.dedupLatestWins).
    *
    * Winner-identity columns (meta columns and, when present, the write
    * routing column) always come from the winning version; data columns
    * come from the winner too, except under PARTIAL_UPDATE where each
    * resolves to the newest non-null value above the tombstone fence.
    */
  def mergeVersions(cfg: TableConfig, unioned: DataFrame, del: String): DataFrame = {
    val w = Window.partitionBy(col(MetaCols.PartitionPath), col(MetaCols.RecordKey))
      .orderBy(ordering(cfg): _*)
    of(cfg) match {
      case PartialUpdate =>
        val winnerCols = unioned.columns.filter(c =>
          MetaCols.All.contains(c) || c == WritePipeline.FileIdCol)
        val dataCols = unioned.columns.filterNot(c => winnerCols.contains(c) || c == del)
        // newest tombstone fences the stack: only strictly-newer versions
        // participate in the record's current state
        val keyW = Window.partitionBy(col(MetaCols.PartitionPath), col(MetaCols.RecordKey))
        val fenced = unioned
          .withColumn("_graft_vrn", row_number().over(w))
          .withColumn("_graft_fence",
            min(when(col(del), col("_graft_vrn"))).over(keyW))
          .filter(col("_graft_fence").isNull || col("_graft_vrn") < col("_graft_fence"))
        // per-column latest non-null over the alive stack (frame scans from
        // the current version toward older ones); evaluated at the winner
        val fr = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fenced
          .select((winnerCols.map(col) ++
            dataCols.map(c => first(col(c), ignoreNulls = true).over(fr).as(c)) :+
            row_number().over(w).as("_graft_rn")).toIndexedSeq: _*)
          .filter(col("_graft_rn") === 1)
          .drop("_graft_rn")
      case _ =>
        unioned
          .withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1 && !col(del))
          .drop("_graft_rn", del)
    }
  }
}
