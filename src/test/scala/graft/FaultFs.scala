package graft

import java.net.URI

/** Fault-injecting local filesystem for the manifest-commit fault matrix
  * (registered under the `faultfs:` scheme): exposes the OBJECT-STORE
  * failure semantics the [[graft.sources.CellManifest]] protocol was
  * designed for — a conditional put that fails before landing, an
  * S3-style non-atomic rename (copy lands complete, source cleanup
  * crashes), and an eventually-consistent listing that hides the newest
  * manifest — so the old-or-new reader guarantee is provable without S3.
  * Configure via the static [[FaultFs]] companion; every injection is a
  * LOUD IOException or a deterministic listing filter, never silent
  * corruption (torn single puts don't exist on object stores; the torn-
  * manifest guard is tested separately by truncating a file directly).
  */
class FaultFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "faultfs"
  override def getUri: URI = URI.create("faultfs:///")

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    FaultFs.failCreateOn.foreach { sub =>
      if (f.toString.contains(sub))
        throw new java.io.IOException(
          s"FaultFs: injected create failure at $f (fail-before-put)")
    }
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    FaultFs.crashRenameAfterCopyOn.foreach { sub =>
      if (dst.toString.contains(sub)) {
        // S3-shape rename: the destination object lands COMPLETE (one
        // atomic put), then the crash hits before the source delete
        org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
          false, getConf)
        throw new java.io.IOException(
          s"FaultFs: injected crash after copy, before source delete " +
            s"($src -> $dst)")
      }
    }
    super.rename(src, dst)
  }

  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    val all = super.listStatus(f)
    if (FaultFs.hideNewestEpoch && f.toString.endsWith("_fence")) {
      // eventually-consistent listing over the FENCE dir: the newest
      // epoch file exists (point reads still see it) but the listing
      // hasn't caught up — the exact staleness Fence's successor walk
      // must see through
      val epochs = all.filter(_.getPath.getName.startsWith("epoch-"))
      if (epochs.isEmpty) return all
      val newest = epochs
        .maxBy(_.getPath.getName.stripPrefix("epoch-").toLong)
      return all.filterNot(_.getPath == newest.getPath)
    }
    if (!FaultFs.hideNewestManifest ||
        !f.toString.endsWith("_vmanifest")) all
    else {
      // eventually-consistent listing: the newest manifest exists but the
      // listing hasn't caught up — readers must resolve the previous one
      val manifests = all.filter(_.getPath.getName.startsWith("manifest-"))
      if (manifests.length <= 1) all
      else {
        val newest = manifests
          .maxBy(_.getPath.getName.stripPrefix("manifest-").toLong)
        all.filterNot(_.getPath == newest.getPath)
      }
    }
  }
}

object FaultFs {
  @volatile var failCreateOn: Option[String] = None
  @volatile var crashRenameAfterCopyOn: Option[String] = None
  @volatile var hideNewestManifest: Boolean = false
  @volatile var hideNewestEpoch: Boolean = false

  def reset(): Unit = {
    failCreateOn = None
    crashRenameAfterCopyOn = None
    hideNewestManifest = false
    hideNewestEpoch = false
  }
}
