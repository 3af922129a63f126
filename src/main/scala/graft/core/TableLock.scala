package graft.core

import java.nio.channels.FileChannel
import java.nio.file.StandardOpenOption
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path

import graft.core.Storage.PathOps

/** Multi-writer concurrency control: commits serialize under a per-table
  * lock — an in-process monitor (same-JVM writers) plus an OS file lock
  * (cross-process writers). This is the analog of the reference's
  * OPTIMISTIC_CONCURRENCY_CONTROL lock providers
  * (reference client/transaction/TransactionManager.java +
  * InProcessLockProvider / FileSystemBasedLockProvider); conflict
  * detection stays trivial because instant timestamps are allocated and
  * published inside the critical section.
  *
  * Reentrant per thread, so inline services triggered from a commit's
  * post-commit hook don't self-deadlock.
  */
object TableLock {
  private val monitors = new ConcurrentHashMap[String, Object]()
  private val held = ThreadLocal.withInitial[java.util.HashSet[String]](
    () => new java.util.HashSet[String]())

  def withLock[T](base: Path)(body: => T): T = {
    val key = Storage.qualified(base).toString
    if (held.get().contains(key)) return body // reentrant
    val mon = monitors.computeIfAbsent(key, _ => new Object)
    mon.synchronized {
      val dir = base.resolve(".graft")
      Storage.mkdirs(dir)
      held.get().add(key)
      try {
        Storage.localFile(dir.resolve("lock")) match {
          case Some(local) if provider(base) != "lease" =>
            val ch = FileChannel.open(local.toPath,
              StandardOpenOption.CREATE, StandardOpenOption.WRITE)
            val fl = ch.lock()
            try body finally { fl.release(); ch.close() }
          case _ =>
            // non-local FileSystem (HDFS, object stores) or explicit
            // `lease` provider: lease file with heartbeat renewal + TTL
            // takeover — byte-range locks don't exist there
            val lease = LeaseLock.acquire(dir)
            try body finally lease.release()
        }
      } finally held.get().remove(key)
    }
  }

  /** `graft.lock.provider` table prop: `os` (default on local paths —
    * FileChannel byte-range lock) or `lease` ([[LeaseLock]]). Read from
    * the persisted table config so every writer process agrees on the
    * protocol; tables mid-create (no config yet) use the OS lock when
    * local. Non-local base paths always use the lease.
    */
  private def provider(base: Path): String =
    if (TableConfig.exists(base))
      try TableConfig.load(base).prop(ConfigKeys.LockProvider, "os")
      catch { case _: java.io.IOException => "os" }
    else "os"
}
