package graft.core

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Closed-stream local-filesystem listing helpers.
  *
  * `Files.list`/`Files.walk` return a lazily-populated stream backed by an
  * OPEN directory descriptor that is released only on `close()` (or
  * eventually by GC). Draining via `.iterator().asScala` without closing
  * leaks one fd per call — invisible in a short process, fatal in a
  * long-lived driver: the timeline is listed several times per table
  * operation, so a test suite (and equally a week-long ingest job) walks
  * into EMFILE ("Too many open files") once the accumulated handles
  * outrun GC. Every listing in the engine goes through these helpers,
  * which materialize the result and close the stream in `finally`.
  */
object PathIO {

  /** Immediate children (closed), empty when `dir` is not a directory. */
  def list(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Recursive walk (closed), empty when `root` does not exist. */
  def walk(root: Path): Seq[Path] = {
    if (!Files.exists(root)) return Seq.empty
    val s = Files.walk(root)
    try s.iterator().asScala.toSeq finally s.close()
  }
}
