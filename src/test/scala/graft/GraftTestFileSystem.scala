package graft

import java.net.URI

/** A Hadoop FileSystem under a NON-`file` scheme (`graftfs://`), backed by
  * the local disk: proves the table/state layer is written against the
  * `org.apache.hadoop.fs.FileSystem` abstraction (hdfs://, s3a://, ...) and
  * not `java.nio` — the storage-portability requirement from VERDICT r1. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
