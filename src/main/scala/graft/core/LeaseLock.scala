package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import org.apache.hadoop.fs.Path

import graft.core.Storage.PathOps

/** Lease-file lock for multi-driver writers on filesystems WITHOUT
  * byte-range locks — the analog of the reference's
  * FileSystemBasedLockProvider (reference hudi-client/hudi-client-common/
  * .../transaction/lock/FileSystemBasedLockProvider.java: atomic
  * create-no-overwrite of a lock file, retry loop, TTL-based stale-lock
  * expiry). `TableLock`'s default OS byte-range lock is strictly stronger
  * on local/NFSv4 filesystems; this provider exists for shared stores
  * where `FileChannel.lock` is unavailable (HDFS, object stores), selected
  * per table via `graft.lock.provider=lease` or automatically when the
  * base path resolves to a non-local FileSystem.
  *
  * Protocol: the holder atomically creates `lock.lease` containing
  * `owner-uuid expiry-epoch-ms`; a background heartbeat rewrites the
  * expiry every ttl/3 while held (the reference's FS provider has no
  * heartbeat and long commits can expire mid-flight — the renewal closes
  * that hole). Contenders poll; a file whose expiry has passed is taken
  * over by delete + re-create. Takeover is read-verify-delete, not
  * compare-and-swap — the same window the reference accepts on stores
  * without conditional writes; on stores with atomic create the create
  * itself is the linearization point.
  */
object LeaseLock {

  final class Handle private[LeaseLock] (
      file: Path, token: String, ttlMs: Long, hb: ScheduledExecutorService) {
    @volatile private[LeaseLock] var released = false

    private[LeaseLock] def renew(): Unit = if (!released) {
      // only the current owner renews; a takeover after an expiry blip
      // must not be clobbered by our stale heartbeat
      if (read(file).exists(_._1 == token))
        write(file, token, System.currentTimeMillis() + ttlMs)
    }

    def release(): Unit = {
      released = true
      hb.shutdownNow()
      if (read(file).exists(_._1 == token)) Storage.deleteIfExists(file)
    }
  }

  /** Acquire the lease under `dir`, blocking up to `timeoutMs`. */
  def acquire(dir: Path, ttlMs: Long = 60000L, timeoutMs: Long = 600000L): Handle = {
    val file = dir.resolve("lock.lease")
    Storage.mkdirs(dir)
    val token = UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 50L
    while (true) {
      if (tryCreate(file, token, ttlMs)) {
        val hb = Executors.newSingleThreadScheduledExecutor(r => {
          val t = new Thread(r, s"graft-lease-hb-$dir"); t.setDaemon(true); t
        })
        val h = new Handle(file, token, ttlMs, hb)
        val period = math.max(ttlMs / 3, 50L)
        hb.scheduleAtFixedRate(() => h.renew(), period, period, TimeUnit.MILLISECONDS)
        return h
      }
      // contended: expired leases are taken over, live ones awaited
      read(file) match {
        case Some((_, expiry)) if System.currentTimeMillis() > expiry =>
          Storage.deleteIfExists(file) // stale — next loop races to re-create
        case None => // vanished between create-fail and read — retry now
        case _ =>
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"timed out after ${timeoutMs}ms acquiring lease $file")
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 1000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def tryCreate(file: Path, token: String, ttlMs: Long): Boolean =
    Storage.createExclusive(file,
      s"$token ${System.currentTimeMillis() + ttlMs}".getBytes(UTF_8))

  private def write(file: Path, token: String, expiry: Long): Unit =
    try Storage.writeString(file, s"$token $expiry")
    catch { case _: java.io.IOException => () } // renewal is best-effort

  private[core] def read(file: Path): Option[(String, Long)] =
    try {
      val parts = Storage.readString(file).trim.split(" ")
      if (parts.length == 2) Some((parts(0), parts(1).toLong)) else None
    } catch { case _: java.io.IOException => None }
}
