package graft.table

import org.apache.spark.sql.DataFrame

import graft.core._

/** Admin / inspection surface — the programmatic analog of the reference's
  * CLI commands (reference hudi-cli/.../commands: CommitsCommand,
  * StatsCommand, FileSystemViewCommand, TimelineCommand, CompactionCommand).
  * Every view is a small DataFrame derived from commit metadata, so admin
  * queries never list or scan data files.
  */
object TableAdmin {

  /** One row per completed data commit: `commits show` analog. */
  def commits(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.completedDataInstants().map { i =>
      val md = CommitMetadata.fromJson(t.timeline.readContent(i))
      (i.ts, i.action, md.operationType,
        md.writeStats.size.toLong,
        md.writeStats.map(_.numWrites).sum,
        md.writeStats.map(_.numDeletes).sum,
        md.writeStats.map(_.fileSizeInBytes).sum,
        md.replacedFileIds.values.map(_.size).sum.toLong)
    }.toDF("instant", "action", "operation", "num_files", "total_records",
      "total_deletes", "total_bytes", "replaced_groups")
  }

  /** Every instant on the active timeline, any state: `timeline` analog. */
  def timeline(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.listInstants().map(i => (i.ts, i.action, i.state))
      .toDF("instant", "action", "state")
  }

  /** Live file groups with slice composition: `show fsview all` analog. */
  def fileGroups(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.view.fileSlices(None).map { s =>
      (s.partitionPath, s.fileId,
        s.baseFile.map(_.instant).getOrElse(""),
        s.baseFile.map(_.sizeBytes).getOrElse(0L),
        s.baseFile.map(_.numRecords).getOrElse(0L),
        s.deltaFiles.size.toLong, s.totalDeltaBytes)
    }.toDF("partition", "file_id", "base_instant", "base_bytes",
      "base_records", "num_deltas", "delta_bytes")
  }

  /** Per-partition rollup: `stats` analog. */
  def partitionStats(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.view.fileSlices(None)
      .groupBy(_.partitionPath)
      .map { case (p, ss) =>
        (p, ss.size.toLong,
          ss.flatMap(_.baseFile).map(_.sizeBytes).sum + ss.map(_.totalDeltaBytes).sum,
          ss.flatMap(_.baseFile).map(_.numRecords).sum)
      }.toSeq.toDF("partition", "num_file_groups", "total_bytes", "base_records")
  }

  /** Pending (requested/inflight) instants — stuck-write triage. */
  def pending(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.pendingInstants().map(i => (i.ts, i.action, i.state))
      .toDF("instant", "action", "state")
  }

  /** Live base-file size distribution quantiles: `stats filesizes`
    * analog — the small-file-health check behind compaction/clustering
    * decisions.
    */
  def fileSizes(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    val sizes = t.view.fileSlices(None).flatMap(_.baseFile).map(_.sizeBytes).sorted
    def q(p: Double): Long =
      if (sizes.isEmpty) 0L
      else sizes(math.min(sizes.size - 1, (p * sizes.size).toInt))
    Seq((sizes.size.toLong, sizes.headOption.getOrElse(0L), q(0.5), q(0.9),
      sizes.lastOption.getOrElse(0L), if (sizes.isEmpty) 0L else sizes.sum / sizes.size))
      .toDF("num_files", "min_bytes", "p50_bytes", "p90_bytes", "max_bytes", "avg_bytes")
  }

}
