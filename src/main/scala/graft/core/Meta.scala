package graft.core

/** Names of the five meta columns injected into every base/delta file
  * (reference hudi-common/.../model/HoodieRecord.java:37-45).
  */
object MetaCols {
  val CommitTime = "_hoodie_commit_time"
  val CommitSeqno = "_hoodie_commit_seqno"
  val RecordKey = "_hoodie_record_key"
  val PartitionPath = "_hoodie_partition_path"
  val FileName = "_hoodie_file_name"
  val All: Seq[String] = Seq(CommitTime, CommitSeqno, RecordKey, PartitionPath, FileName)

  /** Internal-only columns used during merge reads; never persisted. */
  val DeleteFlag = "_graft_is_deleted"
  val FileId = "_graft_file_id"
}

/** Per-file write statistics recorded in commit metadata. min/max record
  * key power key-range file skipping in the index (reference stores these
  * in parquet footers + reads them back, SparkHoodieBloomIndex.java:165-191;
  * we record them at write time which avoids the footer read entirely).
  *
  * @param path     file path relative to the table base
  * @param isDelta  true for MOR delta (log-analog) files
  */
final case class WriteStat(
    fileId: String,
    path: String,
    partitionPath: String,
    numWrites: Long,
    numDeletes: Long,
    fileSizeInBytes: Long,
    minRecordKey: String,
    maxRecordKey: String,
    isDelta: Boolean = false,
    baseInstant: String = "", // for delta files: instant of the base file they attach to
    // per-column min/max captured from the parquet footer at write time —
    // powers data skipping on arbitrary columns (a capability the
    // reference lacks; values stringified, parsed by the filter literal's
    // type at prune time)
    colMin: Map[String, String] = Map.empty,
    colMax: Map[String, String] = Map.empty,
    // per-column null counts (footer-exact) — power IS NULL / IS NOT NULL
    // file skipping; absent for columns whose footers lack the figure
    colNulls: Map[String, Long] = Map.empty,
    // EXHAUSTIVE distinct-value sets for low-cardinality columns, decoded
    // from the parquet dictionary pages (recorded only when every data
    // page of every row group is dictionary-encoded and the dictionary is
    // small) — equality/IN pruning where min/max is useless because the
    // range spans every file (e.g. a categorical status column)
    colValues: Map[String, Seq[String]] = Map.empty,
    // columns whose dictionary collection cost IO in this file and failed
    // for a STICKY reason (high cardinality / plain-page fallback); the
    // commit carries them into `graft.stats.dictionary.poisoned` so later
    // commits skip the dictionary read entirely
    colDictPoisoned: Seq[String] = Seq.empty)

/** Commit metadata JSON stored as the content of a completed instant file.
  * Mirrors the reference's HoodieCommitMetadata / HoodieReplaceCommitMetadata:
  * per-partition write stats, replaced file groups (for replacecommit),
  * writer schema, and free-form extra metadata (streaming checkpoints live
  * here, like the reference's CHECKPOINT_KEY — DeltaSync.java:311-355).
  */
final case class CommitMetadata(
    operationType: String,
    writeStats: Seq[WriteStat],
    replacedFileIds: Map[String, Seq[String]] = Map.empty, // partition -> fileIds no longer live
    schemaJson: String = "",
    extraMetadata: Map[String, String] = Map.empty) {

  def totalWrites: Long = writeStats.map(_.numWrites).sum
  def partitions: Seq[String] = writeStats.map(_.partitionPath).distinct
}

object CommitMetadata {
  def fromJson(s: String): CommitMetadata = Json.read[CommitMetadata](s)
}

/** Metadata for a clean action: which files were physically deleted. */
final case class CleanMetadata(
    earliestRetainedInstant: String,
    deletedPaths: Seq[String])

/** Metadata for rollback/restore: which instants were undone. */
final case class RollbackMetadata(
    rolledBackInstants: Seq[String],
    deletedPaths: Seq[String])

final case class SavepointMetadata(savepointedInstant: String)

/** Compaction plan persisted in the compaction.requested instant
  * (analog of the reference's HoodieCompactionPlan).
  */
final case class CompactionPlan(
    operations: Seq[CompactionOp])

final case class CompactionOp(
    partitionPath: String,
    fileId: String,
    baseFilePath: String, // may be empty (log-only file group)
    deltaFilePaths: Seq[String])

/** Clustering plan persisted in the replacecommit.requested instant. */
final case class ClusteringPlan(
    groups: Seq[ClusteringGroup],
    sortColumns: Seq[String])

final case class ClusteringGroup(
    partitionPath: String,
    fileIds: Seq[String],
    filePaths: Seq[String])
