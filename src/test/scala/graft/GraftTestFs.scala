package graft

/** A local-disk Hadoop filesystem registered under the `graftfs://` scheme —
  * stands in for an object store (s3a) in specs, proving the zone pathing
  * goes through the Hadoop FS layer rather than java.nio. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
