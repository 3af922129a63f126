package graft.core

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

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
    val key = base.toAbsolutePath.toString
    if (held.get().contains(key)) return body // reentrant
    val mon = monitors.computeIfAbsent(key, _ => new Object)
    mon.synchronized {
      val dir = base.resolve(".graft")
      Files.createDirectories(dir)
      held.get().add(key)
      try {
        if (provider(base) == "lease") {
          // shared stores without byte-range locks (HDFS, object-store
          // mounts): lease file with heartbeat renewal + TTL takeover
          val lease = LeaseLock.acquire(dir)
          try body finally lease.release()
        } else {
          val ch = FileChannel.open(dir.resolve("lock"),
            StandardOpenOption.CREATE, StandardOpenOption.WRITE)
          val fl = ch.lock()
          try body finally { fl.release(); ch.close() }
        }
      } finally held.get().remove(key)
    }
  }

  /** `graft.lock.provider` table prop: `os` (default — FileChannel
    * byte-range lock) or `lease` ([[LeaseLock]]). Read from the persisted
    * table config so every writer process agrees on the protocol; tables
    * mid-create (no config yet) use the OS lock.
    */
  private def provider(base: Path): String =
    if (TableConfig.exists(base))
      try TableConfig.load(base).prop(ConfigKeys.LockProvider, "os")
      catch { case _: java.io.IOException => "os" }
    else "os"
}
