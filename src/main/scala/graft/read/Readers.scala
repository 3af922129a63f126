package graft.read

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.Storage.PathOps
import graft.table.GraftTable

/** The three query types over a table (reference README.md:40-43,
  * DefaultSource.scala:66-138 dispatch):
  *
  * - snapshot: latest committed state (COW: plain columnar scan; MOR:
  *   base ∪ delta merge) — optionally `asOf` an older instant (time travel)
  * - read-optimized: base files only (skips delta merge)
  * - incremental: records changed in a commit-time range
  *   (begin-exclusive, end-inclusive — reference DataSourceOptions.scala:87-112)
  *
  * Scale note: only file groups that actually have pending delta files pay
  * the merge window; fully-compacted groups stream straight from parquet
  * with filters/pruning pushed by Catalyst. With inline compaction every 5
  * delta commits, read amplification is bounded like the reference's.
  */
object Readers {

  /** Snapshot view. `partitions` prunes file listing before any IO —
    * partition pruning happens at plan time against the metadata view, not
    * by scanning (reference HoodieFileIndex.scala:126-137).
    */
  def snapshot(
      t: GraftTable,
      asOf: Option[String] = None,
      partitions: Option[Seq[String]] = None): DataFrame = {
    // partition-scoped reads plan through the PRUNED view path: with a
    // parquet files-index snapshot the partition predicate pushes into a
    // distributed scan of the index, so driver state is bounded by the
    // queried partitions' file count, not the table's
    val slices = partitions match {
      case Some(ps) => t.view.fileSlicesPruned(ps.toSet, asOf)
      case None => t.view.fileSlices(asOf)
    }
    readSliceSet(t, slices, asOf)
  }

  /** Snapshot semantics over an explicit (partitionPath, fileId) group
    * set — the point-read primitive: a caller that already knows which
    * file groups hold its rows (record-index probe, files-index hit)
    * reads exactly those groups' latest slices and nothing else.
    */
  def snapshotGroups(t: GraftTable, groups: Set[(String, String)],
      asOf: Option[String] = None): DataFrame =
    readSliceSet(t,
      t.view.fileSlices(asOf).filter(s => groups((s.partitionPath, s.fileId))),
      asOf)

  /** Snapshot semantics over an explicit slice set (the shared core of
    * [[snapshot]] and the per-group reads of [[incrementalChanges]]).
    */
  private def readSliceSet(t: GraftTable, slices: Seq[FileSlice],
      asOf: Option[String]): DataFrame = {
    val (withDeltas, plainSlices) = slices.partition(_.deltaFiles.nonEmpty)
    val plain = readBases(t, plainSlices.flatMap(_.baseFile), asOf)
    if (withDeltas.isEmpty) plain
    else plain.unionByName(mergeSlices(t, withDeltas, asOf), allowMissingColumns = true)
  }

  /** Read-optimized view: latest base files only, no delta merge
    * (reference's `_ro` view).
    */
  def readOptimized(t: GraftTable, asOf: Option[String] = None): DataFrame =
    readBases(t, t.view.fileSlices(asOf).flatMap(_.baseFile), asOf)

  /** Base-file scan through [[GraftFileIndex]]: Catalyst prunes partitions
    * from WHERE clauses at plan time and pushes predicates/projections to
    * parquet — no pre-listed path set. Bootstrap-adopted (external) files
    * go through the meta-synthesis reader instead. Time-travel reads
    * resolve the schema AS OF the pinned instant.
    */
  private def readBases(t: GraftTable, bases: Seq[FileEntry],
      asOf: Option[String] = None): DataFrame = {
    val (ext, internal) = bases.partition(e =>
      new org.apache.hadoop.fs.Path(e.relPath).isAbsolute)
    val frames = Seq(
      if (internal.isEmpty) None else Some(fileIndexScan(t, internal, asOf)),
      if (ext.isEmpty) None else Some(t.readEntriesRaw(ext, asOf))
    ).flatten
    if (frames.isEmpty) t.readEntriesRaw(Seq.empty, asOf)
    else frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def fileIndexScan(t: GraftTable, entries: Seq[FileEntry],
      asOf: Option[String] = None): DataFrame = {
    t.schemaAsOf(asOf) match {
      case None => t.readEntriesRaw(entries, asOf) // pre-first-commit fallback
      case Some(schema) =>
        // the partition column comes from the index, not the file bytes
        val dataSchema = org.apache.spark.sql.types.StructType(
          schema.fields.filterNot(_.name == MetaCols.PartitionPath))
        // one native scan per base format (mixed only for tables whose
        // format changed mid-history) — both push filters and vectorize
        // secondary-indexed columns participate in plan-time file pruning
        // (read-only probe; only when the index is exactly current).
        // NEVER for as-of reads: the index maps the CURRENT snapshot, and
        // a group live at asOf but since replaced would be a false negative
        val secCols =
          if (asOf.isDefined) Set.empty[String]
          else graft.table.SecondaryIndex.enabledColumns(t.cfg).toSet
        // expression indexes register by the CANONICAL SQL of their
        // expression resolved against this schema (analysis only, no
        // job); a pushed filter side canonicalizing to the same form
        // probes the index. Unresolvable specs (column since dropped)
        // just don't register.
        val exprIdx: Map[String, String] =
          if (asOf.isDefined) Map.empty
          else graft.table.SecondaryIndex.expressionIndexes(t.cfg).flatMap { s =>
            scala.util.Try {
              val probe = t.spark.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](), dataSchema)
              val resolved = probe.select(expr(s.exprSql))
                .queryExecution.analyzed.expressions.head match {
                case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
                case other => other
              }
              GraftFileIndex.canonicalSql(resolved.sql) -> s.name
            }.toOption
          }.toMap
        // FIXED bucket-layout key pruning is time-invariant — valid at any
        // asOf; the CONSISTENT engine's key->group mapping changes with
        // splits, so it prunes latest reads only (as-of: no pruning, safe)
        val keyBucket: Option[(String, (String, String) => String)] =
          if (graft.table.ConsistentBuckets.enabled(t.cfg))
            (if (asOf.isDefined) None
             else graft.table.ConsistentBuckets.keyFieldPruner(t))
          else graft.table.BucketIndex.keyFieldPruner(t.cfg)
            .map { case (f, g) => (f, (_: String, v: String) => g(v)) }
        // stats-answered count(*) is only sound when every listed file is
        // guaranteed to still exist: an as-of read at or before the
        // cleaner's earliest retained instant may list physically deleted
        // files, and the count must fail like the scan would, not succeed
        // from metadata
        val statsOk = asOf.forall { ts =>
          t.timeline.completedInstants().filter(_.action == Action.Clean)
            .lastOption.forall { c =>
              ts >= Json.read[CleanMetadata](t.timeline.readContent(c))
                .earliestRetainedInstant
            }
        }
        entries.groupBy(e => graft.table.WritePipeline.formatOf(e.relPath))
          .toSeq.sortBy(_._1)
          .map { case (fmt, es) =>
            org.apache.spark.sql.GraftSqlBridge.fileScan(
                t.spark,
                new GraftFileIndex(t.spark, t.basePath, es, secCols,
                  (c, vs) => graft.table.SecondaryIndex.probeCurrentReadOnly(t, c, vs),
                  keyBucket, exprIdx, allowStatsAnswer = statsOk),
                dataSchema, fmt)
              .select(schema.fieldNames.map(col).toIndexedSeq: _*)
          }
          .reduce(_.unionByName(_))
    }
  }

  /** Merge-on-read for the slices that need it: base ∪ deltas →
    * latest-wins window → tombstones dropped (the DataFrame form of the
    * reference's per-slice merge iterators, HoodieMergeOnReadRDD.scala:58-305).
    */
  private def mergeSlices(t: GraftTable, slices: Seq[FileSlice],
      asOf: Option[String] = None): DataFrame = {
    val del = MetaCols.DeleteFlag
    val bases = t.readEntriesRaw(slices.flatMap(_.baseFile), asOf)
      .withColumn(del, lit(false))
    val deltas = t.readEntriesRaw(slices.flatMap(_.deltaFiles), asOf)
    val unioned = bases.unionByName(
      deltas.withColumn(del, coalesce(col(del), lit(false))),
      allowMissingColumns = true)
    // version resolution (ordering + column combination) is the table's
    // payload strategy — see graft.table.Payload
    graft.table.Payload.mergeVersions(t.cfg, unioned, del)
  }

  /** Layout-only rewrites: compaction, clustering, bucket rescale. They
    * move existing records between files with per-row commit times
    * preserved, so change-oriented readers (incremental, CDC) must treat
    * them as physical remaps, never as logical change.
    */
  private[graft] def isLayoutRewrite(i: GraftInstant, m: CommitMetadata): Boolean =
    i.action == Action.Compaction ||
      m.operationType == "cluster" || m.operationType == "rescale_buckets" ||
      m.operationType == graft.table.ConsistentBuckets.OpSplit ||
      m.operationType == graft.table.ConsistentBuckets.OpMerge

  /** Time travel — snapshot as of an instant (reference `as.of.instant`). */
  def timeTravel(t: GraftTable, instant: String): DataFrame =
    snapshot(t, asOf = Some(instant))

  /** Incremental query: the latest state of every record changed by commits
    * in `(beginTs, endTs]` (reference IncrementalRelation.scala:60-178 —
    * file lists come from commit metadata, then rows are filtered by
    * `_hoodie_commit_time` range; deleted records are dropped).
    *
    * `partitionGlob` prunes the pull to matching partition paths BEFORE
    * any file IO (reference `hoodie.datasource.read.incr.path.glob`,
    * DataSourceOptions.scala + IncrementalRelation's glob filter): `*`
    * matches within a path segment, `**` across segments, `?` one char.
    * A consumer of one partition subtree pays only for that subtree's
    * changed files.
    *
    * `fallbackFullScan` mirrors the reference's
    * `hoodie.datasource.read.incr.fallback.fulltablescan.enable`: when the
    * cleaner has removed files the range needs, fall back to scanning the
    * SNAPSHOT filtered by the commit-time range instead of failing. Same
    * documented caveat as the reference: the fallback returns the LATEST
    * state of records whose last change falls in the range — with a
    * bounded `endTs`, records changed again after the range are missed
    * (their stamp moved past `endTs`); with an open range the two paths
    * agree, which is the checkpoint-recovery case the fallback exists for.
    */
  def incremental(
      t: GraftTable,
      beginTs: String,
      endTs: Option[String] = None,
      partitionGlob: Option[String] = None,
      fallbackFullScan: Boolean = false): DataFrame = {
    val end = endTs.getOrElse("99999999999999999")
    val active = t.timeline.completedInstants()
      .filter(i => Action.DataActions.contains(i.action))
      .filter(i => i.ts > beginTs && i.ts <= end)
      .map(i => i -> t.timeline.readContent(i))
    // A begin older than the earliest active instant can span commits that
    // postCommit archiving moved off the active timeline — replay the
    // archive log for those so a consumer with an old checkpoint never
    // silently loses change records (round-1 ADVICE; reference reads the
    // archived timeline for the same case).
    val archived =
      if (t.timeline.earliestActiveCompleted().forall(e => beginTs < e))
        t.timeline.archivedInstants()
          .filter { case (i, _) => Action.DataActions.contains(i.action) }
          .filter { case (i, _) => i.ts > beginTs && i.ts <= end }
      else Seq.empty
    val metas = (archived ++ active)
      .map { case (i, content) => i -> CommitMetadata.fromJson(content) }
      // compaction/clustering/bucket-rescale rewrite existing records
      // (per-row commit times preserved) — no logical change
      .filter { case (i, m) => !isLayoutRewrite(i, m) }
    // glob prune happens on COMMIT METADATA, before any file existence
    // check or IO — the pruned-away partitions' files may even be cleaned.
    // glob → regex: ** crosses segments, * stays within one, ? is one
    // char; everything else is literal
    val globRegex: Option[String] = partitionGlob.map(g =>
      "(?s)^" + java.util.regex.Pattern.quote(g)
        .replace("**", "\\E.*\\Q")
        .replace("*", "\\E[^/]*\\Q")
        .replace("?", "\\E.\\Q") + "$")
    val keepPartition: String => Boolean = globRegex match {
      case None => _ => true
      case Some(rx) => val r = rx.r; p => r.matches(p)
    }
    val entries = metas.flatMap { case (i, m) =>
      m.writeStats.filter(ws => keepPartition(ws.partitionPath))
        .map(ws => FileEntry(ws.partitionPath, ws.fileId, i.ts, ws.path,
          ws.fileSizeInBytes, ws.isDelta, ws.minRecordKey, ws.maxRecordKey, ws.numWrites))
    }
    val missing = entries.filterNot(e =>
      Storage.exists(t.basePath.resolve(e.relPath)))
    if (missing.nonEmpty && fallbackFullScan) {
      val snapFiltered = snapshot(t)
        .filter(col(MetaCols.CommitTime) > beginTs &&
          col(MetaCols.CommitTime) <= end)
      return globRegex match {
        case None => snapFiltered
        case Some(rx) => // same glob semantics, as a codegen'd rlike
          snapFiltered.filter(col(MetaCols.PartitionPath).rlike(rx))
      }
    }
    require(missing.isEmpty,
      s"incremental range ($beginTs, $end] references cleaned/rolled-back files: " +
        missing.take(3).map(_.relPath).mkString(", "))
    val del = MetaCols.DeleteFlag
    val raw = t.readEntriesRaw(entries)
    val withDel =
      if (raw.columns.contains(del)) raw.withColumn(del, coalesce(col(del), lit(false)))
      else raw.withColumn(del, lit(false))
    val inRange = withDel.filter(
      col(MetaCols.CommitTime) > beginTs && col(MetaCols.CommitTime) <= end)
    // payload-resolved latest state of each changed record (PARTIAL_UPDATE
    // caveat: columns whose latest non-null version predates the range
    // surface as null — the range's files are the only inputs, like the
    // reference's incremental file-list scan)
    graft.table.Payload.mergeVersions(t.cfg, inRange, del)
  }

  /** Column carrying the change classification in [[incrementalChanges]]. */
  val ChangeTypeCol = "_change_type"

  /** Change-data-capture read: full before/after change images for
    * `(beginTs, endTs]` — `insert` / `update_before` / `update_after` /
    * `delete` rows, one per change, Debezium/Delta-CDF shaped. Beyond the
    * 0.x reference (whose incremental query returns only latest states and
    * DROPS deletes, IncrementalRelation.scala:60-178): downstream training
    * pipelines need the delete/before images to retract derived state.
    *
    * Derivation, not change logs: the table already versions every file
    * group, so changes come from diffing the two snapshots restricted to
    * the window's TOUCHED file groups (from commit metadata — no listing,
    * no untouched-group IO). Work scales with changed groups, not table
    * size: one full-outer join on (partition, key) over those groups.
    * Carried-over rows keep their original `_hoodie_commit_time` stamps
    * (the write path guarantees it), so "changed" = after-image stamped
    * inside the window — value-blind, column-compare-free. Compaction and
    * clustering within the window are physical rewrites, not logical
    * changes: excluded from the touched set, and their carried stamps keep
    * their rows out of the diff; clustering's group remaps are followed so
    * a relocated record is not misread as a delete.
    *
    * Needs the begin-side file versions to still exist (same cleaner
    * retention contract as [[incremental]] + [[timeTravel]]).
    */
  def incrementalChanges(
      t: GraftTable,
      beginTs: String,
      endTs: Option[String] = None): DataFrame = {
    val end = endTs.getOrElse("99999999999999999")
    // archive replay only when the window can actually reach archived
    // instants — a streaming change feed calls this per micro-batch and
    // must not re-read the archive log every trigger
    val archived =
      if (t.timeline.earliestActiveCompleted().forall(e => beginTs < e))
        t.timeline.archivedInstants()
      else Seq.empty
    val window = (archived ++
        t.timeline.completedInstants().map(i => i -> t.timeline.readContent(i)))
      .filter { case (i, _) => Action.DataActions.contains(i.action) }
      .filter { case (i, _) => i.ts > beginTs && i.ts <= end }
      .sortBy(_._1.ts)
      .map { case (i, c) => i -> CommitMetadata.fromJson(c) }
    if (window.isEmpty)
      return snapshot(t).drop(MetaCols.All: _*).limit(0)
        .withColumn(ChangeTypeCol, lit(null).cast("string"))
    val (physical, logical) = window.partition { case (i, m) =>
      isLayoutRewrite(i, m)
    }
    // groups logically changed in the window (written or replaced)
    val touched: Set[(String, String)] = logical.flatMap { case (_, m) =>
      m.writeStats.map(ws => (ws.partitionPath, ws.fileId)) ++
        m.replacedFileIds.toSeq.flatMap { case (p, fids) => fids.map(p -> _) }
    }.toSet
    // follow layout remaps IN ORDER: a touched group rewritten by a
    // physical commit lives on under that commit's written group ids.
    // "Rewritten" covers BOTH forms: listed in replacedFileIds (cluster —
    // fresh ids) and shadowed by a same-id write (bucket rescale — stable
    // ids, where a touched group's rows scatter across sibling buckets
    // that replaced nothing). Matching on written ids too means a
    // rescale's moved rows are found on the after side instead of
    // surfacing as phantom deletes; the extra groups read are bounded by
    // the rewritten partitions and their carried-over rows project no
    // change images.
    val afterTouched = physical.foldLeft(touched) { case (acc, (_, m)) =>
      val rewrittenTouched = (m.replacedFileIds.toSeq
        .flatMap { case (p, fids) => fids.map(p -> _) } ++
        m.writeStats.map(ws => (ws.partitionPath, ws.fileId))).filter(acc.contains)
      if (rewrittenTouched.isEmpty) acc
      else {
        val parts = rewrittenTouched.map(_._1).toSet
        acc ++ m.writeStats.filter(ws => parts.contains(ws.partitionPath))
          .map(ws => (ws.partitionPath, ws.fileId))
      }
    }
    // …and BACKWARD for the begin side: a touched group that a physical
    // commit in the window CREATED (cluster's fresh ids, rescale's
    // re-routed buckets) holds rows that lived in DIFFERENT groups at
    // beginTs — map it back through the commit's replaced + written ids
    // so the before image finds them (fresh ids simply don't exist in the
    // beginTs view and drop out). Without this, a drop/update after a
    // layout rewrite reports rows from pre-rewrite-only groups as never
    // having existed (missed deletes, updates surfacing as inserts).
    val beforeTouched = physical.reverse.foldLeft(touched) { case (acc, (_, m)) =>
      val writtenTouched = m.writeStats
        .map(ws => (ws.partitionPath, ws.fileId)).filter(acc.contains)
      if (writtenTouched.isEmpty) acc
      else {
        val parts = writtenTouched.map(_._1).toSet
        acc ++ m.replacedFileIds.toSeq
          .flatMap { case (p, fids) => if (parts(p)) fids.map(p -> _) else Nil } ++
          m.writeStats.filter(ws => parts(ws.partitionPath))
            .map(ws => (ws.partitionPath, ws.fileId))
      }
    }
    val beforeSlices = t.view.fileSlices(Some(beginTs))
      .filter(s => beforeTouched.contains((s.partitionPath, s.fileId)))
    val missing = beforeSlices.flatMap(_.allFiles)
      .filterNot(e => new org.apache.hadoop.fs.Path(e.relPath).isAbsolute)
      .filterNot(e => Storage.exists(t.basePath.resolve(e.relPath)))
    require(missing.isEmpty,
      s"change range ($beginTs, $end] needs cleaned begin-side files: " +
        missing.take(3).map(_.relPath).mkString(", "))
    val afterSlices = t.view.fileSlices(endTs)
      .filter(s => afterTouched.contains((s.partitionPath, s.fileId)))
    val after = readSliceSet(t, afterSlices, endTs)
    val dataCols = after.columns
      .filterNot((MetaCols.All :+ MetaCols.DeleteFlag).contains).toSeq
    // align the begin-side image to the current columns AND types (schema
    // evolution between the two snapshots surfaces nulls / widens, like any
    // old-file read) — exact type match is required for the single-pass
    // change array below
    val before0 = readSliceSet(t, beforeSlices, Some(beginTs))
    val before = dataCols.foldLeft(before0)((df, c) =>
      if (!df.columns.contains(c)) df.withColumn(c, lit(null).cast(after.schema(c).dataType))
      else if (df.schema(c).dataType != after.schema(c).dataType)
        df.withColumn(c, col(s"`$c`").cast(after.schema(c).dataType))
      else df)
    def img(df: DataFrame, prefix: String) = df.select(
      col(MetaCols.PartitionPath).as("_c_part"),
      col(MetaCols.RecordKey).as("_c_key"),
      col(MetaCols.CommitTime).as(s"${prefix}_ct"),
      struct(dataCols.map(c => col(s"`$c`")): _*).as(s"${prefix}_row"))
    val j = img(before, "_b").join(img(after, "_a"), Seq("_c_part", "_c_key"), "full_outer")
    val changed = col("_a_ct") > beginTs && col("_a_ct") <= end
    // SINGLE pass over the joined rows: each row projects the array of
    // change images that apply (0 for carried-over rows, 2 for updates)
    // and explodes it — the join subtree is planned and executed once,
    // instead of once per change type (4x the scan+join cost)
    def chg(kind: String, row: org.apache.spark.sql.Column) =
      struct(lit(kind).as("kind"), row.as("row"))
    val variants = array(
      when(col("_b_row").isNull && changed, chg("insert", col("_a_row"))),
      when(col("_a_row").isNull, chg("delete", col("_b_row"))),
      when(col("_b_row").isNotNull && changed, chg("update_before", col("_b_row"))),
      when(col("_b_row").isNotNull && changed, chg("update_after", col("_a_row"))))
    j.select(explode(filter(variants, v => v.isNotNull)).as("_chg"))
      .select(dataCols.map(c => col(s"_chg.row.`$c`").as(c)) :+
        col("_chg.kind").as(ChangeTypeCol): _*)
  }
}
