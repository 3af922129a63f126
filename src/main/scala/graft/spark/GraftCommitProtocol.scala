package graft.spark

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}

import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/** Direct-to-final-name commit protocol for graft data writes.
  *
  * The staged-write-then-rename publish is correct everywhere but pays a
  * FULL OBJECT COPY per file on object stores (s3a:// rename = copy +
  * delete: every committed byte written twice) plus a driver-side rename
  * round-trip per file. This protocol instead names each task's output
  * file with its FINAL table name while the task writes it —
  * `<base>/<partition>/<fileId>_<token>_<instant>[.delta].<fmt>` — so
  * publish moves zero bytes and issues zero per-file driver RPCs. This is
  * the reference's write shape: data files land at their final names with
  * a MARKER per file for crash reconciliation (reference
  * hudi-client-common/.../table/marker/DirectWriteMarkers.java;
  * HoodieCreateHandle opens the final path directly), instead of a
  * job-temp + rename dance.
  *
  * Safety against retries/speculation:
  *  - the write token embeds (taskId, attemptNumber), so two attempts of
  *    one task never collide on a name;
  *  - every file creation is PRECEDED by a marker under
  *    `.graft/.temp/<instant>/markers/` whose NAME encodes the file's
  *    table-relative path (one LIST recovers all attempted paths — no
  *    per-marker reads);
  *  - task commit goes through Spark's OutputCommitCoordinator (via
  *    super.commitTask), so exactly one attempt's file list reaches
  *    commitJob; commitJob deletes attempted-but-uncommitted files
  *    (markers minus committed set);
  *  - abortTask/abortJob delete this attempt's / all marker-listed files;
  *  - a writer that dies without aborting leaves markers + final-named
  *    files for the failed-writes reaper (Services.rollbackFailedWrites),
  *    which reads the SAME markers.
  *
  * For any output path that is NOT a graft staging dir
  * (`.../.graft/.temp/<instant>/{base,delta}`) the protocol is a pure
  * passthrough to [[SQLHadoopMapReduceCommitProtocol]], so it can stay
  * installed as the session's commitProtocolClass without affecting other
  * writes.
  */
class GraftCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
    extends SQLHadoopMapReduceCommitProtocol(jobId, path, dynamicPartitionOverwrite) {
  import GraftCommitProtocol._

  /** (table base URI, instant, isDelta) when `path` is a graft staging
    * dir; None = passthrough mode. Strings only — this object is
    * serialized into tasks.
    */
  private val direct: Option[(String, String, Boolean)] = {
    val p = new Path(path)
    val kind = p.getName
    val inst = Option(p.getParent)
    val temp = inst.flatMap(i => Option(i.getParent))
    val dotGraft = temp.flatMap(t => Option(t.getParent))
    val base = dotGraft.flatMap(g => Option(g.getParent))
    if ((kind == DirBase || kind == DirDelta) &&
        temp.exists(_.getName == ".temp") && dotGraft.exists(_.getName == ".graft") &&
        base.isDefined)
      Some((base.get.toString, inst.get.getName, kind == DirDelta))
    else None
  }

  // task-side state: files this attempt created (table-relative), lazily
  // initialized because the instance deserializes straight into tasks
  @transient private var added: ArrayBuffer[AddedFile] = _
  @transient private var fileCounter: Int = 0
  private def addedBuf: ArrayBuffer[AddedFile] = {
    if (added == null) added = ArrayBuffer.empty[AddedFile]
    added
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], spec: FileNameSpec): String = direct match {
    case None => super.newTaskTempFile(taskContext, dir, spec)
    case Some((base, instant, isDelta)) =>
      val d = dir.getOrElse(throw new IllegalStateException(
        "graft direct write requires (partition, fileId) staging dirs"))
      val segs = d.split("/")
      require(segs.length == 2 && segs(0).startsWith(PartPrefix) &&
        segs(1).startsWith(FilePrefix), s"unexpected graft staging dir: $d")
      val partition = decodeEscaped(segs(0).stripPrefix(PartPrefix))
      val fileId = decodeEscaped(segs(1).stripPrefix(FilePrefix))
      val att = taskContext.getTaskAttemptID
      // unique per (task, attempt, file-within-task); no '_' or '.' —
      // those are the file-name field separators
      val token = s"${att.getTaskID.getId}-${att.getId}-$fileCounter"
      fileCounter += 1
      val format = if (spec.suffix.endsWith(".orc")) "orc" else "parquet"
      val name =
        if (isDelta) s"${fileId}_${token}_$instant.delta.parquet"
        else s"${fileId}_${token}_$instant.$format"
      val rel = if (partition.isEmpty) name else s"$partition/$name"
      // marker FIRST: its existence must cover the file's whole lifetime.
      // The name embeds (jobId, relative path) — '_' never survives
      // encoding, so the first '_' splits them — and reconciliation scopes
      // to THIS job's markers: one commit can run several write jobs
      // against the same instant (MOR delta + base), and job B must not
      // treat job A's files as strays.
      val marker = new Path(markersDir(base, instant),
        jobId + "_" + encodeMarkerName(rel) + MarkerExt)
      val fs = marker.getFileSystem(taskContext.getConfiguration)
      fs.create(marker, true).close()
      addedBuf += AddedFile(partition, fileId, rel)
      new Path(new Path(base), rel).toString
  }

  override def commitTask(
      taskContext: TaskAttemptContext): FileCommitProtocol.TaskCommitMessage = {
    // the super call routes through Spark's OutputCommitCoordinator —
    // exactly one attempt of a task may commit (its message content is
    // empty in direct mode: no temp files were registered with it)
    val parentMsg = super.commitTask(taskContext)
    if (direct.isEmpty) parentMsg
    else new FileCommitProtocol.TaskCommitMessage(addedBuf.toVector)
  }

  override def abortTask(taskContext: TaskAttemptContext): Unit = {
    super.abortTask(taskContext)
    for ((base, instant, _) <- direct) {
      val conf = taskContext.getConfiguration
      addedBuf.foreach { f =>
        val p = new Path(new Path(base), f.relPath)
        try {
          val fs = p.getFileSystem(conf)
          fs.delete(p, false)
          fs.delete(new Path(markersDir(base, instant),
            jobId + "_" + encodeMarkerName(f.relPath) + MarkerExt), false)
        } catch { case _: java.io.IOException => () } // reaper covers it
      }
    }
  }

  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[FileCommitProtocol.TaskCommitMessage]): Unit = direct match {
    case None => super.commitJob(jobContext, taskCommits)
    case Some((base, instant, _)) =>
      // parent lifecycle with NO messages: Hadoop committer commitJob +
      // _temporary cleanup; our messages are not the parent's shape
      super.commitJob(jobContext, Seq.empty)
      val committed: Vector[AddedFile] = taskCommits.iterator
        .flatMap(_.obj.asInstanceOf[Vector[AddedFile]]).toVector
      // reconcile: attempted (markers, one LIST) minus committed = files
      // from failed/speculative attempts that abortTask didn't reach
      val conf = jobContext.getConfiguration
      val mdir = markersDir(base, instant)
      val fs = mdir.getFileSystem(conf)
      if (fs.exists(mdir)) {
        val valid = committed.map(_.relPath).toSet
        val myPrefix = jobId + "_"
        fs.listStatus(mdir).foreach { st =>
          val n = st.getPath.getName
          if (n.endsWith(MarkerExt) && n.startsWith(myPrefix)) {
            val rel = decodeEscaped(
              n.stripPrefix(myPrefix).stripSuffix(MarkerExt))
            if (!valid.contains(rel))
              fs.delete(new Path(new Path(base), rel), false)
          }
        }
      }
      results.put(resultKey(fs.makeQualified(new Path(path)).toString), committed)
  }

  override def abortJob(jobContext: JobContext): Unit = {
    super.abortJob(jobContext)
    // this job committed nothing: every file ITS markers list is garbage
    // (other jobs of the same instant may have published theirs)
    for ((base, instant, _) <- direct)
      deleteMarkedFiles(jobContext.getConfiguration, base, instant,
        onlyJobId = Some(jobId))
  }
}

object GraftCommitProtocol {
  /** Table-relative record of one committed data file. */
  final case class AddedFile(partition: String, fileId: String, relPath: String)

  // staging layout: <base>/.graft/.temp/<instant>/{base|delta} for data,
  // <base>/.graft/.temp/<instant>/markers for the marker files
  val DirBase = "base"
  val DirDelta = "delta"
  val MarkerExt = ".marker"
  private[spark] val PartPrefix = "_graft_part_dir="
  private[spark] val FilePrefix = "_graft_file_dir="

  def markersDir(base: String, instant: String): Path =
    new Path(new Path(base), s".graft/.temp/$instant/markers")

  /** Completed write results, keyed by qualified staging path — commitJob
    * runs on the driver, so the handoff to WritePipeline is in-process.
    */
  private val results =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[AddedFile]]()

  private def resultKey(qualifiedPath: String): String =
    qualifiedPath.stripSuffix("/")

  def takeResult(qualifiedStagingPath: String): Option[Vector[AddedFile]] =
    Option(results.remove(resultKey(qualifiedStagingPath)))

  /** Percent-encode a table-relative path into a single marker FILE NAME:
    * '/' and other separators escape to %XX so one directory listing
    * recovers every attempted path with zero content reads. Non-ASCII
    * stays raw (round-trips through [[decodeEscaped]] untouched).
    */
  def encodeMarkerName(rel: String): String = {
    val sb = new StringBuilder
    rel.foreach { c =>
      if (c.isLetterOrDigit || c == '-' || c == '.' || c == '=' || c >= 128) sb.append(c)
      else sb.append(f"%%${c.toInt}%02X")
    }
    sb.toString
  }

  /** Generic %XX decode — same transform as Spark's partition-dir
    * unescaping (WritePipeline.decodePartition), shared here so the
    * protocol has no dependency on the table package.
    */
  def decodeEscaped(escaped: String): String = {
    if (escaped == "__HIVE_DEFAULT_PARTITION__") return ""
    val sb = new StringBuilder
    var i = 0
    while (i < escaped.length) {
      val c = escaped.charAt(i)
      if (c == '%' && i + 2 < escaped.length) {
        val hex = escaped.substring(i + 1, i + 3)
        if (hex.forall(h => Character.digit(h, 16) >= 0)) {
          sb.append(Integer.parseInt(hex, 16).toChar); i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Table-relative paths of every marker under the instant's staging —
    * the complete set of file creations ATTEMPTED by that write (each
    * creation was preceded by its marker). One directory listing. Marker
    * names are `<jobId>_<percent-encoded relPath>.marker`; '_' never
    * survives the encoding, so the first '_' is the split point.
    */
  def markedRelPaths(conf: org.apache.hadoop.conf.Configuration,
      base: String, instant: String,
      onlyJobId: Option[String] = None): Seq[String] = {
    val mdir = markersDir(base, instant)
    val fs = mdir.getFileSystem(conf)
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(MarkerExt))
      .filter(n => onlyJobId.forall(j => n.startsWith(j + "_")))
      .map(_.stripSuffix(MarkerExt))
      .map(n => decodeEscaped(n.substring(n.indexOf('_') + 1)))
  }

  /** Delete marker-listed data files (crash/abort cleanup); all jobs of
    * the instant by default, one job's when `onlyJobId` is given.
    */
  def deleteMarkedFiles(conf: org.apache.hadoop.conf.Configuration,
      base: String, instant: String,
      onlyJobId: Option[String] = None): Seq[String] = {
    val rels = markedRelPaths(conf, base, instant, onlyJobId)
    rels.foreach { rel =>
      val p = new Path(new Path(base), rel)
      try p.getFileSystem(conf).delete(p, false)
      catch { case _: java.io.IOException => () }
    }
    rels
  }
}
