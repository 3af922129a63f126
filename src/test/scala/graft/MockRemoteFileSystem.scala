package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A non-local-scheme Hadoop FileSystem backed by the local disk — the
  * standard trick for exercising the remote-store code paths (scheme
  * resolution, lease locking instead of OS byte-range locks, FileSystem
  * rename semantics) without a real HDFS/S3 endpoint. Registered under
  * `fs.graftmock.impl`; a table at `graftmock:///...` must behave exactly
  * like one at a plain local path.
  */
class MockRemoteFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: URI = URI.create("graftmock:///")

  // record every rename source path: on a real object store each rename is
  // a full COPY + delete, so specs assert the data path never renames
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    MockRemoteFileSystem.renamed.add(src.toUri.getPath)
    super.rename(src, dst)
  }
}

object MockRemoteFileSystem {
  val renamed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def resetRenames(): Unit = renamed.clear()
  def renames: Set[String] = {
    import scala.jdk.CollectionConverters._
    renamed.asScala.toSet
  }
}
