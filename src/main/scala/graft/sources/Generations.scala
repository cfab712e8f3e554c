package graft.sources

/** The shared COMMIT-CORE of graft's two manifest swap implementations —
  * [[IndexStore.SwapManifest]] (text index: the CATALOG's partition
  * locations are the pointer) and [[CellManifest]] (vector cell tables:
  * a versioned manifest FILE is the pointer). The pointer layers differ
  * by design — a catalog table already has transactional per-partition
  * metadata, a bare parquet directory does not — but the on-disk
  * generation lifecycle beneath them is ONE protocol, and it lives here
  * so one discipline (and one test surface) covers both:
  *
  *  - staged data lands in hidden `_gen-N` directories under the table;
  *    data files NEVER move after being written;
  *  - generation numbers are MONOTONE and never reused while any copy
  *    of the number is still visible (staged dirs count, so a crashed
  *    unreferenced stage cannot be overwritten before gc reclaims it);
  *  - directories no pointer references are reclaimed only at the HEAD
  *    of the next maintenance pass — never mid-pass — giving in-flight
  *    readers of the previous pointer one full maintenance interval on
  *    intact files (two-generation retention, pinned by IndexStoreSpec's
  *    mid-flip test and ManifestFaultSpec's stale-listing test).
  */
private[sources] object Generations {

  val Prefix = "_gen-"

  /** Numbers of every `_gen-N` directory currently under `tableDir`. */
  def numbers(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path): Seq[Long] =
    fs.listStatus(tableDir).map(_.getPath.getName)
      .filter(_.startsWith(Prefix))
      .map(_.stripPrefix(Prefix).toLong).toSeq

  /** The next unused generation number: above every staged directory AND
    * above `floor` (the pointer layer's own highest number — manifest
    * file numbers for [[CellManifest]]), so no visible number is ever
    * reused. No wall clock anywhere.
    */
  def next(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path, floor: Long = -1L): Long =
    (numbers(fs, tableDir) :+ floor).foldLeft(-1L)(math.max) + 1

  def dirOf(tableDir: org.apache.hadoop.fs.Path, n: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tableDir, s"$Prefix$n")

  /** Reclaim every `_gen-N` directory whose number the pointer layer no
    * longer references (`live`) — replaced generations and crashed
    * unreferenced stages alike. Call ONLY at a maintenance head.
    */
  def dropUnreferenced(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path, live: Long => Boolean): Unit =
    numbers(fs, tableDir).filterNot(live).foreach { n =>
      fs.delete(dirOf(tableDir, n), true); ()
    }
}
