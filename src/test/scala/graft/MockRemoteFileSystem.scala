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
}
