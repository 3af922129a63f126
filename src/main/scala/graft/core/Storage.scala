package graft.core

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, LocalFileSystem, Path}

/** Storage substrate for the table format: every metadata/data IO the
  * engine performs on a table's base path goes through Hadoop
  * [[FileSystem]], resolved from the path's scheme — so a table addressed
  * as `file:///...`, `hdfs://...` or `s3a://...` works identically
  * (reference hudi-common/.../fs/FSUtils.java — all reference IO is
  * FileSystem-routed for the same reason). Local no-scheme paths resolve
  * to the local FS.
  *
  * Design notes for object stores / HDFS:
  *  - `FileSystem.get` caches instances per (scheme, authority, ugi), so
  *    resolving per call is cheap.
  *  - Checksums are disabled on the local FS so `.crc` sidecars never
  *    pollute table directories (a stale sidecar after an overwrite makes
  *    reads throw ChecksumException).
  *  - `createExclusive` maps to `create(overwrite = false)`, which is the
  *    atomic create-no-overwrite primitive lock providers rely on.
  *  - `rename` deletes the target first when `overwrite` is requested —
  *    Hadoop rename never replaces (unlike POSIX) — and treats a `false`
  *    return as failure instead of silently continuing.
  */
object Storage {

  /** One shared Configuration: Spark's session Hadoop conf when a session
    * is active at first use (inherits fs.s3a.* etc.), plain defaults
    * otherwise.
    */
  lazy val conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def fs(p: Path): FileSystem = {
    val f = p.getFileSystem(conf)
    f match {
      case l: LocalFileSystem =>
        l.setWriteChecksum(false)
        l.setVerifyChecksum(false)
      case _ => ()
    }
    f
  }

  /** Fully-qualified form (scheme + authority made explicit) — stable as a
    * lock/cache key across differently-spelled references to one table.
    */
  def qualified(p: Path): Path = fs(p).makeQualified(p)

  /** Local java.io view of a local-FS path; None for remote schemes.
    * Callers use this to decide whether OS-level primitives (byte-range
    * locks) are available.
    */
  def localFile(p: Path): Option[java.io.File] = {
    val uri = qualified(p).toUri
    if (uri.getScheme == null || uri.getScheme == "file") Some(new java.io.File(uri.getPath))
    else None
  }

  def exists(p: Path): Boolean = fs(p).exists(p)
  def isDirectory(p: Path): Boolean = {
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }
  def mkdirs(p: Path): Unit = fs(p).mkdirs(p)
  def size(p: Path): Long = fs(p).getFileStatus(p).getLen
  def mtime(p: Path): Long = fs(p).getFileStatus(p).getModificationTime

  /** Immediate children; empty when `dir` is missing or not a directory. */
  def list(dir: Path): Seq[FileStatus] = {
    val f = fs(dir)
    if (!f.exists(dir) || !f.getFileStatus(dir).isDirectory) Seq.empty
    else f.listStatus(dir).toSeq
  }

  def listPaths(dir: Path): Seq[Path] = list(dir).map(_.getPath)

  /** Recursive walk (root included, directories included); empty when
    * `root` does not exist. Driver-side — callers at extreme file counts
    * use the distributed files index instead.
    */
  def walk(root: Path): Seq[FileStatus] = {
    val f = fs(root)
    if (!f.exists(root)) return Seq.empty
    def rec(st: FileStatus): Seq[FileStatus] =
      st +: (if (st.isDirectory) f.listStatus(st.getPath).toSeq.flatMap(rec)
             else Seq.empty)
    rec(f.getFileStatus(root))
  }

  def walkPaths(root: Path): Seq[Path] = walk(root).map(_.getPath)

  def readBytes(p: Path): Array[Byte] = {
    val in = fs(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def readString(p: Path): String = new String(readBytes(p), UTF_8)

  def readLines(p: Path): Seq[String] =
    readString(p).split("\n", -1).toSeq.filter(_.nonEmpty)

  /** Plain create (parents made as needed). Not atomic — timeline publish
    * goes through [[atomicWrite]].
    */
  def write(p: Path, bytes: Array[Byte], overwrite: Boolean = true): Unit = {
    val out = fs(p).create(p, overwrite)
    try out.write(bytes) finally out.close()
  }

  def writeString(p: Path, s: String, overwrite: Boolean = true): Unit =
    write(p, s.getBytes(UTF_8), overwrite)

  /** Atomic create-no-overwrite — the linearization primitive for lock
    * files. Returns false when the file already exists.
    */
  def createExclusive(p: Path, bytes: Array[Byte]): Boolean =
    try {
      val out = fs(p).create(p, false)
      try out.write(bytes) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException if messageSaysExists(e) => false
    }

  private def messageSaysExists(e: java.io.IOException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("already exists") || m.contains("File exists")
  }

  /** Rename; Hadoop semantics never replace a live target, so `overwrite`
    * deletes it first (the non-atomic window object stores accept — the
    * reference does the same for marker reconciliation). A `false` return
    * from the FS is surfaced as an error, not swallowed.
    */
  def rename(src: Path, dst: Path, overwrite: Boolean = true): Unit = {
    val f = fs(src)
    if (overwrite && f.exists(dst)) f.delete(dst, false)
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  /** Write content so the target appears atomically (tmp + rename).
    * `replaceExisting = false` gives create-new semantics: a live target
    * fails the publish (concurrent-writer collision).
    */
  def atomicWrite(target: Path, content: String, replaceExisting: Boolean = true): Unit = {
    val f = fs(target)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    writeString(tmp, content)
    if (!replaceExisting && f.exists(target)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"instant file already exists (concurrent-writer ts collision): $target")
    }
    if (replaceExisting && f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"atomic publish rename failed: $tmp -> $target")
  }

  /** Delete a file if present; false when it was already gone. */
  def deleteIfExists(p: Path): Boolean =
    try fs(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => false }

  def deleteRecursively(p: Path): Unit = {
    val f = fs(p)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Relative path of `p` under `base` (both produced from the same base
    * Path object, so plain prefix arithmetic is exact).
    */
  def relativize(base: Path, p: Path): String = {
    val b = base.toString
    val s = p.toString
    if (s == b) ""
    else if (s.startsWith(b + "/")) s.substring(b.length + 1)
    else {
      // differently-qualified spellings of the same location
      val qb = qualified(base).toString
      val qs = qualified(p).toString
      require(qs.startsWith(qb + "/") || qs == qb, s"$p is not under $base")
      if (qs == qb) "" else qs.substring(qb.length + 1)
    }
  }

  /** Minimal nio-like ergonomics for Hadoop paths so ported call sites
    * keep reading naturally.
    */
  implicit final class PathOps(private val p: Path) extends AnyVal {
    def resolve(child: String): Path = new Path(p, child)
    def resolveSibling(name: String): Path = new Path(p.getParent, name)
    /** String prefix containment — both paths spelled from one base. */
    def startsWith(base: Path): Boolean = {
      val b = base.toString
      p.toString == b || p.toString.startsWith(b + "/")
    }
  }
}
