package graft.sources

import graft.Cols
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistent index storage, bucketed on the join key.
  *
  * At cluster scale the MinHash index is not rebuilt per session — it is
  * written once and joined against by every query. Storing both the index
  * and the id-keyed side bucketed by `id` (same bucket count) lets Spark
  * plan those equi-joins with NO shuffle exchange on either side: each
  * bucket file pair joins locally. This is the storage half of the
  * "co-locate joins via bucketing" scale design (PERF.md).
  */
object IndexStore {

  /** Partition value reserved for DELETE markers in an inverted posting
    * table. Real partition values are prefixes of bucket ids — hex strings
    * (md5 / xx128 modes) or decimal strings (xx-fast mode) — so a value
    * containing 'z' can never collide with data, at any `prefixLen`.
    */
  val TombstonePrefix = "zz"

  /** Directory-swap strategies for partition-scoped compaction.
    *
    * `SwapRename` (default): per-directory rename-aside protocol — the
    * live directory renames ASIDE (never deleted first), the staged one
    * renames in, and the aside copies drop only after EVERY dirty
    * directory swapped. Any crash leaves a recoverable copy (aside or
    * stage); [[compactInverted]] self-recovers at its next run. Assumes
    * atomic directory rename (HDFS, local, ABFS) — NOT S3.
    *
    * `SwapManifest`: the object-store-safe mode — data files NEVER move.
    * The compacted slice is written once into a fresh hidden generation
    * directory (`_gen-N/` under the table dir) and each dirty partition's
    * catalog entry flips to its new location (`ALTER TABLE .. PARTITION ..
    * SET LOCATION` — one metadata operation per partition; the catalog IS
    * the manifest). A reader resolves either the old or the new complete
    * location, never a half-swapped directory, and in-flight readers that
    * resolved the old generation keep a complete copy until the NEXT
    * compaction garbage-collects it (two-generation retention). Requires a
    * catalog that persists partition metadata (the deployment shape —
    * tools/derby_serving_drive.scala); the catalog-less cold-start
    * directory fallback of [[loadInverted]] cannot see relocated
    * partitions and refuses manifest tables.
    */
  val SwapRename = "rename"
  val SwapManifest = "manifest"

  /** DEFAULT hash-partition count of the maintenance id-map
    * ([[appendInverted]] scaladoc): a compaction decision reads at most
    * (delta's touched partitions / idMapBuckets) of the narrow id-map, so
    * the knob bounds the decision read the way `prefixLen` bounds a point
    * query — size it so one partition spans a few row groups at your
    * scale (64 for the test corpora; tens of thousands for a 100 TB
    * table, where a small delta must not drag in 1/64th of the id-map).
    * Persisted per table in the meta file; appends and compactions derive
    * it from there.
    */
  val IdMapBuckets = 64

  /** Hot-stats maintenance modes. `HotExact` (default): [[mergeHotStats]]
    * recounts each delta bucket EXACTLY via point reads — right for most
    * tables, but a boiler-heavy delta makes the recount read those
    * buckets' FULL posting lists (hot buckets are big by definition).
    * `HotCms`: occupancy rides a Count-Min sketch ([[HotCmsDepth]] ×
    * [[HotCmsWidth]] counters, ~128 KB) — the merge reads ONLY the sketch
    * and the delta log, never the table, and a bucket goes hot when its
    * sketch ESTIMATE passes the threshold. The error is ONE-SIDED
    * (est ≥ true: CMS collisions over-count, a crash-replayed merge
    * re-adds its delta, and compaction removals are not subtracted — all
    * upward), so the failure direction only marks buckets hot EARLY,
    * which sharpens precision and never serves stale data; estimates
    * reset to exact at every O(table) refresh (save / relayout /
    * capped-delta fallback). Bound: est ≤ true + e/width · N plus the
    * uncompacted removals.
    */
  val HotExact = "exact"
  val HotCms = "cms"
  val HotCmsDepth = 4
  val HotCmsWidth = 4096

  /** Cap on the distinct delta buckets [[mergeHotStats]] will recount via
    * pushed bucket-IN point reads before falling back to the full-table
    * recount of [[refreshHotStats]]: the IN-literal and the driver-side
    * candidate set are both bounded by this. Past the cap the delta is a
    * meaningful fraction of the table anyway, so the full recount IS
    * delta-proportional there.
    */
  val HotMergeCandidateCap = 65536

  /** Layout metadata persisted WITH an inverted posting table (a
    * `_graft_meta.json` file inside the table directory — underscore
    * names are invisible to the table's own file listing, and the file
    * survives appends and compaction because neither moves the
    * directory). `prefixLen` is recorded here rather than trusted from
    * serve-time callers: a mismatched serve-side prefix probes partition
    * values that do not exist and silently returns empty results.
    * `hotThreshold` < 0 means no hot-bucket stats are maintained;
    * `numBuckets` 0 means the posting files are not bucketed; `swap`
    * names the compaction swap strategy ([[SwapRename]]/[[SwapManifest]])
    * — a table property, not a per-call choice, because mixing protocols
    * on one table would leave both aside dirs and orphaned generations.
    */
  final case class InvertedMeta(prefixLen: Int, hotThreshold: Long,
      numBuckets: Int, swap: String = SwapRename,
      idMapBuckets: Int = IdMapBuckets, hotMode: String = HotExact)

  /** Write a DataFrame bucketed + sorted by `id` as a managed table. */
  def saveBucketed(df: DataFrame, table: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, Cols.Id)
      .sortBy(Cols.Id)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-INVERTED persisted ANN index — the point-query serving layout.
    *
    * [[saveBucketed]]'s id-keyed layout serves sig-fetch equi-joins but is
    * useless for candidate pruning: a single `approxNearestNeighbors` call
    * against it scans the ENTIRE index with `arrays_overlap` (reference
    * parity — minhash_pyspark.py:308-317 does the same — but at 100 TB one
    * point query reads 100 TB). This writes the exploded
    * (bucket, id, signature) posting table PARTITIONED on disk by a
    * fixed-width hex prefix of the bucket value, so a point query reads
    * ≤ numBands partition directories (each query bucket maps to exactly
    * one prefix directory) with PartitionFilters pruning at the scan;
    * inside a directory the full bucket equality is pushed to the parquet
    * reader (PushedFilters → row-group stats/dictionary pruning).
    *
    * `prefixLen` is the occupancy knob, NOT a correctness parameter: the
    * directory count is bounded by the prefix space (16^prefixLen),
    * independent of corpus size — 2 hex chars = ≤ 256 directories (right
    * for the test scales), 3-4 for a 100 TB index where each directory
    * should still span many row groups. Storage is ~numBands× the id-keyed
    * index (each doc posts once per band) — the classic inverted-index
    * space-for-latency trade. The chosen prefixLen persists in the table's
    * meta file; every later append and serve derives it from there, so a
    * caller can never probe with the wrong width.
    *
    * `hotBucketThreshold`: when set, per-bucket occupancy is aggregated
    * after the write and every bucket holding MORE than the threshold
    * postings is recorded in a `_hot` side file. Point queries skip those
    * buckets (see `MinHashLSH.serveFromInverted`): a stop-word-like bucket
    * that a boilerplate-heavy corpus inflates to millions of postings
    * would otherwise make ONE point query read them all; skipping it only
    * sharpens precision (candidates from the remaining buckets share
    * rarer — more selective — band signatures).
    *
    * `numBuckets` > 0 additionally BUCKETS the posting files by the full
    * `bucket` value (Hive-style bucketing, composed with the prefix
    * partitioning): a batch serving workload that equi-joins its exploded
    * query buckets against the table then plans with NO Exchange on the
    * posting side — the scan's own hash partitioning satisfies the join
    * (the query side alone shuffles, and a workload is always the small
    * side against a 100 TB index). Maintenance preserves the spec:
    * tombstone appends and compaction rewrites carry the same bucketing,
    * so the exchange-free property survives the table's whole lifecycle.
    *
    * Seq-carrying tables (an `ingest_seq` column — the maintained serving
    * shape) additionally seed the maintenance side state: a hidden
    * `_graft_idmap/` narrow mirror hash-partitioned by id (so compaction
    * can find a re-ingested id's OLD postings without scanning the table)
    * and an empty `_graft_dirtylog/` (each later append records its
    * (id, seq) delta there; the compaction decision reads the log + the
    * touched id-map partitions only — O(delta), not O(table)). The save
    * contract for these tables is ONE seq per id; supersession enters via
    * appends.
    */
  def saveInverted(index: DataFrame, table: String, prefixLen: Int = 2,
      hotBucketThreshold: Long = -1L, numBuckets: Int = 0,
      swapMode: String = SwapRename, idMapBuckets: Int = IdMapBuckets,
      hotMode: String = HotExact): Unit = {
    val spark = index.sparkSession
    // a re-save overwrites every partition location a snapshot pin
    // references — refuse while pins exist (the whole-table guard)
    if (spark.catalog.tableExists(table))
      requireNoInvertedPins(spark, table, "saveInverted (overwrite)")
    // a save CLAIMS the table: the overwrite wipes the fence dir with the
    // rest of the directory, so the epoch re-seeds monotonically past the
    // pre-save value — a stale pre-save writer's token can never collide
    // with a post-save claim
    val preEpoch = Fence.current(spark, tablePath(spark, table).toString)
    graft.SparkUtil.ptime("save.writeInverted") {
      writeInverted(index, table, prefixLen, SaveMode.Overwrite, numBuckets) }
    Fence.begin(spark, tablePath(spark, table).toString, preEpoch + 1)
    graft.SparkUtil.ptime("save.writeMeta") {
      writeMeta(spark, table,
        InvertedMeta(prefixLen, hotBucketThreshold, numBuckets, swapMode,
          idMapBuckets, hotMode)) }
    // the id-map seed and the hot-stats recount both READ the freshly
    // written table and WRITE disjoint side-states — independent, so they
    // overlap (guide §2.6) instead of paying two serial table scans' wall
    graft.SparkUtil.ptime("save.sideStates") {
      graft.SparkUtil.inParallel(
        if (index.columns.contains("ingest_seq"))
          () => seedIdMap(spark, table, idMapBuckets)
        else null,
        // a save is the one O(table) event: the full recount is already
        // delta-proportional here (the whole table IS the delta), and it
        // absorbs/clears any stale append-delta log
        () => refreshHotStats(spark, table)) }
  }

  /** Append a micro-batch of (re-)ingested documents to an inverted
    * posting table — the streaming-ingestion sink shape for the SERVING
    * index. The frame should carry an `ingest_seq` column (later
    * re-ingests supersede earlier ones at [[compactInverted]] time); a
    * superseded document's OLD postings may live in DIFFERENT buckets
    * than its new ones (the signature changed — that's why it was
    * re-ingested), so appends leave stale postings behind by design and
    * [[compactInverted]] is the maintenance step that drops them.
    *
    * The layout (prefix width, bucket spec, swap mode) comes from the
    * table's own meta file when it exists; the `seed*` parameters only
    * apply to a table CREATED by this first append (the streaming
    * cold-create path), so a stream can cold-create the co-located
    * (`seedNumBuckets` > 0) layout without a batch save first. Hot-bucket
    * stats are NOT refreshed per append (a per-micro-batch full-column
    * aggregate would dominate streaming ingestion at scale) — instead a
    * stats-keeping append RECORDS its per-bucket posting delta in the
    * `_graft_hotdelta/` side log (one delta-sized aggregate), and the
    * `_hot` list merges those deltas at the maintenance points, save and
    * compact ([[mergeHotStats]] — reads proportional to the delta, never
    * the table), so a bucket running hot mid-stream is capped at the next
    * compaction.
    *
    * Maintenance side state: a seq-carrying append also records its
    * narrow delta — (id, seq) into the `_graft_dirtylog/` and the
    * exploded (id, seq, bucket, prefix) rows into the id-hash-partitioned
    * `_graft_idmap/` — two delta-sized writes that make the next
    * compaction's decision pass O(delta) (see [[compactInverted]]). A
    * legacy table with no id-map stays legacy (full-scan decisions);
    * logging a partial history would be worse than none. The three writes
    * (table, id-map, log) are not atomic: a crashed append must be
    * REPLAYED whole — the at-least-once contract every streaming caller
    * already has — and the replay's duplicate copies collapse at the next
    * compaction like any redelivery.
    */
  def appendInverted(index: DataFrame, table: String, prefixLen: Int = 2,
      seedHotThreshold: Long = -1L, seedNumBuckets: Int = 0,
      seedSwapMode: String = SwapRename): Unit = {
    val spark = index.sparkSession
    val meta = readMeta(spark, table)
    val m = meta.getOrElse(
      InvertedMeta(prefixLen, seedHotThreshold, seedNumBuckets, seedSwapMode))
    val hasSeq = index.columns.contains("ingest_seq")
    val idx = if (hasSeq) index.cache() else index
    // an append CLAIMS the table (single-shot: the claim itself is what
    // invalidates any in-flight staged op's later commit); a cold-create
    // append claims after the table exists. On a PINNABLE (manifest-swap)
    // table the claim token is re-validated at the append's visibility
    // point through the staged path — see [[stagedVisibleAppend]] — so an
    // append can never materialize half-landed inside a snapshot-pin
    // window. Rename-mode tables (unpinnable) keep the direct write.
    val token =
      if (meta.nonEmpty) Some(Fence.begin(spark, tablePath(spark, table).toString))
      else None
    try {
      token match {
        case Some(t) if m.swap == SwapManifest =>
          // on a raced-but-partially-kept batch the maintenance delta
          // still records (see handleRacedVisibleAppend) — the kept rows
          // must be decision-visible so the replay's copies collapse
          val logDelta: () => Unit = () =>
            if (hasSeq && fsOf(spark, table).exists(idMapPath(spark, table)))
              appendMaintLog(spark, table, explodedNarrow(idx, m.prefixLen),
                m.idMapBuckets, alsoHotDelta = m.hotThreshold >= 0L)
          graft.SparkUtil.ptime("append.staged") {
            stagedVisibleAppend(spark, table, indexRows(idx, m.prefixLen),
              m.numBuckets, t, logDelta) }
        case _ =>
          graft.SparkUtil.ptime("append.write") {
            writeInverted(idx, table, m.prefixLen, SaveMode.Append, m.numBuckets) }
      }
      if (meta.isEmpty) {
        Fence.begin(spark, tablePath(spark, table).toString)
        writeMeta(spark, table, m)
        // first append CREATED the table. Unlike a save (contract: one
        // seq per id), one append batch can carry supersession WITHIN
        // itself (a micro-batch holding both an ingest and its
        // correction), so the cold-create append both seeds the id-map
        // and logs itself as a dirty delta. The explicit mkdirs marks the
        // table as maintained even when the seeding batch is EMPTY (the
        // delete-only streaming cold start) — an empty write may emit no
        // files, and existence is what later appends key their logging on.
        if (hasSeq) {
          fsOf(spark, table).mkdirs(idMapPath(spark, table))
          appendMaintLog(spark, table, explodedNarrow(idx, m.prefixLen),
            m.idMapBuckets, alsoHotDelta = m.hotThreshold >= 0L)
        }
      } else if (hasSeq) {
        val fs = fsOf(spark, table)
        if (fs.exists(idMapPath(spark, table)))
          appendMaintLog(spark, table, explodedNarrow(idx, m.prefixLen),
            m.idMapBuckets, alsoHotDelta = m.hotThreshold >= 0L)
      }
    } finally if (hasSeq) { idx.unpersist(); () }
  }

  /** Append DELETE markers (tombstones) for `ids` — the takedown path
    * (copyright removal, opt-out, contamination): real pipelines must be
    * able to REMOVE a document, not just replace it. A tombstone is one
    * row per id in the reserved [[TombstonePrefix]] partition with a null
    * signature/bucket and the given `seq`; serving paths exclude any id
    * whose newest tombstone outranks its newest posting (so a LATER
    * re-ingest resurrects the document — sequence order is the contract),
    * and [[compactInverted]] physically drops a tombstoned id's postings
    * while KEEPING the marker itself as the at-least-once redelivery
    * guard (a replayed pre-delete batch must not resurrect the id).
    *
    * `ids` is one column of document ids; `seq` must outrank the ingest
    * seqs being deleted. The table must carry `ingest_seq` (supersession
    * is undefined without an order).
    */
  def appendTombstones(spark: SparkSession, table: String, ids: DataFrame,
      seq: Long): Unit = {
    import org.apache.spark.sql.functions._
    appendTombstoneRows(spark, table,
      ids.select(col(ids.columns.head).as(Cols.Id), lit(seq).as("ingest_seq")))
  }

  /** [[appendTombstones]] with DATA-BORNE sequences: `rows` carries
    * (id, ingest_seq) — the streaming-feed shape, where each delete event
    * arrives with its own position in the change order and micro-batch
    * boundaries must not flatten distinct seqs onto one. On a
    * `numBuckets` > 0 table the marker append carries the same bucket
    * spec (saveAsTable rejects a spec-less append to a bucketed table,
    * and a spec-less file would break the co-located read).
    */
  def appendTombstoneRows(spark: SparkSession, table: String,
      rows: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains("ingest_seq"),
      s"tombstones need the append-sequence column 'ingest_seq' in $table")
    // takedowns claim too; on a pinnable (manifest-swap) table the marker
    // append goes through the same staged-visible path as data appends —
    // a marker lost to a concurrent location flip would be a silent
    // RESURRECTION risk, the worst failure class a takedown can have
    val token = Fence.begin(spark, tablePath(spark, table).toString)
    val meta = readMeta(spark, table)
    val numBuckets = meta.map(_.numBuckets).getOrElse(0)
    val sigType = cur.schema(Cols.Signature).dataType
    val bktType = cur.schema("bucket").dataType
    val markers = rows
      .select(col(Cols.Id).cast("long").as(Cols.Id),
        lit(null).cast(sigType).as(Cols.Signature),
        lit(null).cast(bktType).as("bucket"),
        col("ingest_seq").cast("long").as("ingest_seq"),
        lit(TombstonePrefix).as("bkt_pfx"))
      .repartition(1) // a takedown batch is tiny; one file in the marker dir
      .cache()
    try {
      val logDelta: () => Unit = () =>
        if (fsOf(spark, table).exists(idMapPath(spark, table)))
          appendMaintLog(spark, table,
            markers.select(col(Cols.Id), col("ingest_seq"), col("bucket"),
              col("bkt_pfx")),
            meta.map(_.idMapBuckets).getOrElse(IdMapBuckets))
      if (meta.exists(_.swap == SwapManifest))
        stagedVisibleAppend(spark, table, markers, numBuckets, token, logDelta)
      else {
        val w = markers.write.mode(SaveMode.Append)
          .partitionBy("bkt_pfx")
          .format("parquet")
        (if (numBuckets > 0) w.bucketBy(numBuckets, "bucket").sortBy("bucket")
         else w).saveAsTable(table)
      }
      logDelta()
    } finally { markers.unpersist(); () }
  }

  /** The exploded posting-row projection of an index frame — the physical
    * row shape of the inverted table: (id, signature, bucket
    * [, ingest_seq], bkt_pfx).
    */
  private def indexRows(index: DataFrame, prefixLen: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val extra = if (index.columns.contains("ingest_seq")) Seq(col("ingest_seq"))
                else Seq.empty
    // no isnotnull(signature) pre-filter: a null signature implies a null
    // bucket_ids (featurize builds one from the other) and explode drops
    // null arrays, so the filter changed nothing — while Catalyst pushed
    // it below the exchange to the scan, re-evaluating the whole
    // signature kernel per row on the scan's (often single) task
    // (measured on sf0.1: 9.1 s → 0.8 s for the exploded write, r20)
    index
      .select(col(Cols.Id) +: col(Cols.Signature) +:
        explode(col(Cols.BucketIds)).as("bucket") +: extra: _*)
      .withColumn("bkt_pfx", substring(col("bucket"), 1, prefixLen))
  }

  private def writeInverted(index: DataFrame, table: String, prefixLen: Int,
      saveMode: SaveMode, numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions._
    // align writer tasks to partition dirs: without this every shuffle
    // task writes a sliver into every directory (tasks × dirs files)
    val w = indexRows(index, prefixLen)
      .repartition(col("bkt_pfx"))
      .write.mode(saveMode)
      .partitionBy("bkt_pfx")
      .format("parquet")
    (if (numBuckets > 0) w.bucketBy(numBuckets, "bucket").sortBy("bucket") else w)
      .saveAsTable(table)
  }

  /** STAGED visible append for a pinnable ([[SwapManifest]]) table — the
    * closer for the append CLAIM-TO-WRITE GAP (round-19): a single-shot
    * append used to claim the fence and then materialize its bytes
    * directly into the live partition directories, so an append that
    * claimed BEFORE a snapshot-pin window but was still writing DURING it
    * was invisible to the pin's epoch checks and could be captured
    * half-landed (a torn pinned view). Now the batch stages beside the
    * table, re-validates the claim at the VISIBILITY point (the pattern
    * every compaction swap uses), moves files into the live partition
    * locations with metadata renames only, and re-validates once more
    * after the moves:
    *
    *  - a writer (or pin) that claimed during the STAGE build fences this
    *    append out before anything is visible — the stage is dropped and
    *    the caller replays (the existing at-least-once contract);
    *  - a claim landing during the (metadata-priced) MOVE window is
    *    caught by the post-move check: the append keeps every moved file
    *    some pin captured (a committed pin must never dangle — the gc
    *    sweep's last-moment-re-probe rule), deletes the rest, POISONS any
    *    pin that captured a PROPER SUBSET of the batch (its reads then
    *    refuse loudly instead of serving a torn view — see
    *    [[pinInventory]]), and throws [[FenceViolation]] so the caller
    *    replays whole. Replayed copies of kept files collapse at the next
    *    compaction like any redelivery.
    *
    * Rename-mode tables keep the direct write: they cannot hold pins
    * (pins require the manifest swap), so the gap has no observer there
    * and the staged double-write would be pure overhead on the streaming
    * hot path. Cost here: one extra localized write of the batch (to the
    * stage) plus one metadata rename per staged file — delta-priced,
    * never table-priced.
    */
  private def stagedVisibleAppend(spark: SparkSession, table: String,
      rows: DataFrame, numBuckets: Int, token: Long,
      onKept: () => Unit = () => ()): Unit = {
    import org.apache.spark.sql.functions._
    val tableDir = tablePath(spark, table)
    val fs = fsOf(spark, table)
    val stage = new org.apache.hadoop.fs.Path(
      tableDir.getParent, table.toLowerCase + "__append_stage")
    val stageTbl = table + "__append_stage_tbl"
    // reclaim a crashed previous append's stage first (same head-recovery
    // shape as the compaction stage)
    spark.sql(s"DROP TABLE IF EXISTS $stageTbl")
    fs.delete(stage, true)
    try {
      val w = rows.repartition(col("bkt_pfx"))
        .write.mode(SaveMode.Overwrite).partitionBy("bkt_pfx")
        .format("parquet")
      // bucketed layouts stage through a scratch TABLE so the staged file
      // names carry the bucket-id encoding the live spec promises —
      // moved-in files keep their names, preserving the co-located join
      if (numBuckets > 0)
        w.option("path", stage.toString)
          .bucketBy(numBuckets, "bucket").sortBy("bucket").saveAsTable(stageTbl)
      else w.parquet(stage.toString)
      MaintHooks.at("append.staged", table)
      // cheap abort: nothing is visible yet, so a raced claim costs only
      // the staged bytes (dropped below) and a replay
      Fence.check(spark, tableDir.toString, token)
      // VISIBILITY: move each staged file into its partition's live
      // location (metadata renames; file names are unique by writer UUID)
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
      val liveLoc = scala.collection.mutable.Map(
        spark.sessionState.catalog.listPartitions(ident)
          .map(p => p.spec("bkt_pfx") -> new org.apache.hadoop.fs.Path(
            new java.net.URI(p.location.toString))): _*)
      val moved = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.Path]
      fs.listStatus(stage)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bkt_pfx="))
        .foreach { pdir =>
          val pfx = pdir.getPath.getName.stripPrefix("bkt_pfx=")
          val live = liveLoc.getOrElse(pfx, {
            // brand-new partition: register it at the default location
            // (mixed locations are normal under the manifest swap)
            spark.sql(
              s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION (bkt_pfx='$pfx')")
            val loc = new org.apache.hadoop.fs.Path(new java.net.URI(
              spark.sessionState.catalog
                .getPartition(ident, Map("bkt_pfx" -> pfx)).location.toString))
            liveLoc(pfx) = loc; loc
          })
          fs.mkdirs(live)
          fs.listStatus(pdir.getPath)
            .filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
              val dst = new org.apache.hadoop.fs.Path(live, f.getPath.getName)
              fs.rename(f.getPath, dst)
              moved += dst
            }
        }
      MaintHooks.at("append.visible", table)
      try Fence.check(spark, tableDir.toString, token)
      catch {
        case e: FenceViolation =>
          handleRacedVisibleAppend(spark, table, fs, moved.toSeq, onKept, e)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $stageTbl")
      fs.delete(stage, true)
      spark.catalog.refreshTable(table)
    }
  }

  /** A staged append's post-visibility fence check failed: a writer — in
    * the gap case, a snapshot pin — claimed the table while the append's
    * file moves were in flight. Resolve so that NO committed pin ever
    * dangles and NO pin silently serves a torn batch, then rethrow for
    * the caller to replay whole.
    */
  private def handleRacedVisibleAppend(spark: SparkSession, table: String,
      fs: org.apache.hadoop.fs.FileSystem,
      moved: Seq[org.apache.hadoop.fs.Path], onKept: () => Unit,
      cause: FenceViolation): Unit = {
    val ours = moved.map(f => fs.makeQualified(f).toString).toSet
    val pd = pinsDir(spark, table)
    // older pins cannot reference our files (their inventories predate
    // the batch and file names are writer-unique), so every pin on disk
    // is classified purely by what it captured. A pin file we cannot
    // parse (torn mid-put) is treated as capturing everything —
    // conservative: keep all files, let the pin's own validation decide.
    var keep = Set.empty[String]
    var unreadable = false
    if (fs.exists(pd)) fs.listStatus(pd).map(_.getPath.getName)
      .filter(_.startsWith("pin-")).map(_.stripPrefix("pin-")).foreach { n =>
        val inv: Set[String] =
          try readPinInventory(spark, table, n)
            .map(_.map(_._2).toSet).getOrElse(Set.empty)
          catch { case _: Exception => unreadable = true; Set.empty[String] }
        val ref = inv.intersect(ours)
        if (ref.nonEmpty) {
          keep ++= ref
          if (ref != ours) {
            // the pin froze a PROPER SUBSET of this batch — a torn view.
            // Poison it: its reads refuse loudly until unpin + re-pin
            // (the same never-silent rule as every other commit here)
            try fs.create(new org.apache.hadoop.fs.Path(pd, s"torn-$n"), false)
              .close()
            catch { case _: java.io.IOException => () } // already poisoned
          }
        }
      }
    if (!unreadable)
      moved.filterNot(f => keep.contains(fs.makeQualified(f).toString))
        .foreach { f => fs.delete(f, false); () }
    // files were kept for a pin: the batch is now PARTIALLY LANDED
    // pending replay, so its maintenance side-state (id-map / dirty-log
    // delta) must record it — otherwise the replay's second copy of the
    // kept rows would never read as duplicated at the next compaction
    // decision and would survive forever. Between this throw and the
    // replay the table holds the standard crashed-append shape the
    // at-least-once contract already covers.
    if (unreadable || keep.nonEmpty) onKept()
    throw new FenceViolation(
      s"append to $table raced a writer that claimed the table during the " +
        "append's visibility window — " +
        (if (unreadable) "an in-flight pin was mid-commit, so every moved " +
          "file was left in place for its validation; "
        else s"${ours.size - keep.size} unreferenced moved files were " +
          s"rolled back and ${keep.size} pin-captured files were kept; ") +
        "replay the batch whole (kept copies collapse at the next " +
        "compaction like any at-least-once redelivery)", cause)
  }

  /** The narrow (id, seq, bucket, prefix) projection of an index frame —
    * the id-map/dirty-log row shape of [[appendInverted]]'s delta.
    */
  private def explodedNarrow(index: DataFrame, prefixLen: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    // no isnotnull(signature) pre-filter — same reasoning as [[indexRows]]
    index
      .select(col(Cols.Id), col("ingest_seq"),
        explode(col(Cols.BucketIds)).as("bucket"))
      .withColumn("bkt_pfx", substring(col("bucket"), 1, prefixLen))
  }

  /** (Re-)seed the maintenance id-map from the table itself: the complete
    * narrow posting history, hash-partitioned by id so a later compaction
    * can read ONLY the partitions its delta ids hash into. One columnar
    * narrow read of the table — paid at save time, when an O(table) write
    * just happened anyway.
    */
  private def seedIdMap(spark: SparkSession, table: String,
      idMapBuckets: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dir = idMapPath(spark, table)
    fsOf(spark, table).delete(dir, true)
    spark.table(table)
      .select(col(Cols.Id), col("ingest_seq"), col("bucket"), col("bkt_pfx"),
        pmod(hash(col(Cols.Id)), lit(idMapBuckets)).as("idh"))
      .repartition(col("idh"))
      .write.mode(SaveMode.Overwrite).partitionBy("idh")
      .parquet(dir.toString)
    // the log starts empty: everything in the id-map is compaction-clean
    fsOf(spark, table).delete(dirtyLogPath(spark, table), true)
  }

  /** Record an append's narrow delta: exploded rows into the id-map (so
    * the id's full posting history stays id-addressable) and the distinct
    * (id, seq) pairs into the dirty log (so the next compaction knows
    * WHICH ids changed without reading anything table-sized).
    */
  private def appendMaintLog(spark: SparkSession, table: String,
      narrow: DataFrame, idMapBuckets: Int, alsoHotDelta: Boolean = false): Unit = graft.SparkUtil.ptime("append.maintLog") {
    import org.apache.spark.sql.functions._
    // the id-map and hot-delta writes are mutually independent
    // post-visibility side-states with a replay-whole crash contract —
    // run them concurrently (guide §2.6). The dirty log commits STRICTLY
    // AFTER the id-map append succeeds: compaction's decision trusts
    // "dirty log lists an id ⇒ its id-map mirror is complete" (it
    // computes the id's winner from the mirror and physically drops
    // non-winning rows), so a dirty-log-first crash could list an id
    // whose newest mirror rows are missing and silently demote the
    // table's visible newest ingest. The inverse crash shape (id-map
    // written, log missing) is safe by design: an id absent from the log
    // yields no winner and every row is kept until the batch replays.
    graft.SparkUtil.inParallel(
      () => narrow
        .withColumn("idh", pmod(hash(col(Cols.Id)), lit(idMapBuckets)))
        .repartition(col("idh"))
        .write.mode(SaveMode.Append).partitionBy("idh")
        .parquet(idMapPath(spark, table).toString),
      if (alsoHotDelta) () => appendHotDelta(spark, table, narrow) else null)
    narrow.select(col(Cols.Id), col("ingest_seq")).distinct()
      .coalesce(1)
      .write.mode(SaveMode.Append)
      .parquet(dirtyLogPath(spark, table).toString)
    compactDirtyLogIfNeeded(spark, table)
  }

  /** Record an append's per-bucket posting-count delta in the
    * `_graft_hotdelta/` side log — the delta-sized aggregate that lets
    * [[mergeHotStats]] update the `_hot` occupancy list at maintenance
    * points without rescanning the table. Only buckets that GAINED rows
    * since the last merge can newly cross the threshold (appends only add
    * physical rows; rows only drop at compaction, whose rewritten
    * partitions are recounted exactly), so the logged buckets are exactly
    * the candidate set the merge must re-examine.
    */
  private def appendHotDelta(spark: SparkSession, table: String,
      narrow: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    narrow.groupBy(col("bucket").cast("string").as("bucket")).count()
      .coalesce(1)
      .write.mode(SaveMode.Append)
      .parquet(hotDeltaPath(spark, table).toString)
  }

  /** Compact an append-log INVERTED posting table, PARTITION-SCOPED: per
    * id keep only the postings of the winning (max `seqCol`) ingest —
    * dropping old postings in buckets the new signature no longer hashes
    * to, duplicate rows a same-seq at-least-once redelivery landed twice,
    * and every posting of a tombstoned id — and rewrite ONLY the dirty
    * partition directories (those holding at least one superseded or
    * duplicated row). Clean directories are never rewritten: their data
    * files stay byte-identical, so a maintenance pass after a 0.1%
    * re-ingest rewrites ~0.1% of a 100 TB table, not all of it.
    *
    * DECISION cost is O(delta) on tables maintained by this module: each
    * append logged its (id, seq) delta, so the decision reads the dirty
    * log plus ONLY the id-map partitions the delta ids hash into —
    * the full history of exactly the ids that could have gained a
    * superseded or duplicated row. An empty log returns immediately. A
    * legacy table (no `_graft_idmap/`) falls back to the original
    * full-table narrow scan. Decision jobs run under the job description
    * `graft-compact-decision` and the rewrite under
    * `graft-compact-rewrite`, so ladders can attribute input bytes
    * (tools/compact_ladder.scala).
    *
    * The REWRITE stages the dirty slice in one job (a scratch path for
    * plain tables; a scratch BUCKETED table when the layout carries a
    * bucket spec, so rewritten files keep the bucket-id file-name encoding
    * the catalog promises and the co-located exchange-free join survives
    * compaction), then swaps per directory via the table's swap strategy
    * ([[SwapRename]] rename-aside with crash recovery, or [[SwapManifest]]
    * catalog-location flips — see the strategy scaladoc at the top).
    * Either way the catalog needs no MSCK and a crash mid-swap leaves a
    * recoverable mix of compacted and not-yet-compacted directories —
    * exactly the pre-compaction state serving already tolerates (max-seq
    * wins). NOT dynamic partition overwrite: Spark 4.1's `insertInto`
    * ignores the writer-level `partitionOverwriteMode` option (measured: a
    * 1-partition insert truncated the whole table), and the session-conf
    * form leaks dynamic-overwrite semantics to concurrent writers.
    * Dirty directories left EMPTY by supersession are dropped (data +
    * catalog partition entry). Tombstone markers themselves survive
    * compaction (deduped to the max seq per id): they are the guard that
    * keeps an at-least-once redelivery of a pre-delete batch from
    * resurrecting the id. The maintained id-map partitions compact in the
    * same pass and the dirty log clears LAST — so a crash anywhere
    * re-runs as a (cheaper) idempotent decision, never losing an id.
    *
    * Concurrent readers under [[SwapRename]]: each directory flips
    * old→new atomically (rename), but a query that LISTED a dirty
    * directory before its swap can hit a moved file and FAILS (Spark
    * default `spark.sql.files.ignoreMissingFiles=false` — loudly, never a
    * silent partial answer; IndexStoreSpec pins this) — re-planning the
    * query succeeds. Operationally: run compaction in the ingestion pause
    * between micro-batches (the gates' shape), or accept query retry
    * during the swap window, or use [[SwapManifest]] where in-flight
    * readers keep the complete old generation.
    */
  def compactInverted(spark: SparkSession, table: String,
      seqCol: String = "ingest_seq", maxFilesPerDir: Int = -1): Unit = {
    import org.apache.spark.sql.functions._
    // a crashed relayout swap may have left the flagged side table as the
    // only (complete) copy — adopt it before touching anything else
    recoverRelayout(spark, table)
    val cur = spark.table(table)
    require(cur.columns.contains(seqCol),
      s"compactInverted needs the append-sequence column '$seqCol'")
    val meta = readMeta(spark, table)
      .getOrElse(InvertedMeta(2, -1L, 0, SwapRename))
    val tableDir = tablePath(spark, table)
    // claim the table; the token re-validates right before the partition
    // swap, so a writer arriving during the (long) stage build fails this
    // op's commit instead of interleaving with it
    val fenceTok = Fence.begin(spark, tableDir.toString)
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(
      tableDir.getParent, table.toLowerCase + "__compact_stage")
    val stageTbl = table + "__compact_stage_tbl"
    // recover any crashed previous run FIRST: restore swapped-aside
    // directories whose new copy never landed, then clear the leftovers
    recoverAside(fs, tableDir, asideDir(tableDir, table))
    graft.SparkUtil.ptime("compact.dropStagePre") {
      spark.sql(s"DROP TABLE IF EXISTS $stageTbl") }
    fs.delete(stage, true)
    if (meta.swap == SwapManifest) graft.SparkUtil.ptime("compact.gcGen") {
      gcStaleGenerations(spark, fs, table, tableDir) }

    val sc = spark.sparkContext
    val idMapDir = idMapPath(spark, table)
    val logDir = dirtyLogPath(spark, table)
    // the id-map records the canonical column; a custom seqCol can only
    // come from a table maintained outside this module — full-scan it
    val maintained = seqCol == "ingest_seq" && fs.exists(idMapDir)
    sc.setJobDescription("graft-compact-decision")
    // the PURE-APPEND path's physical debt (opt-in): partitions whose
    // parquet-file count exceeds `maxFilesPerDir` rewrite too — appends
    // land one file per touched partition per batch and ONLY a rewrite
    // folds them, so without this a never-superseded stream's read
    // fan-out grows one footer per append forever. Counted from the
    // catalog's live partition locations (one listStatus each, bounded
    // by 16^prefixLen); the rows of a file-dirty-only partition pass
    // through the winner join untouched (no winner recorded ⇒ kept).
    require(maxFilesPerDir < 1 || meta.numBuckets <= 0 ||
      maxFilesPerDir >= meta.numBuckets,
      s"maxFilesPerDir=$maxFilesPerDir is below the table's bucket count " +
        s"${meta.numBuckets} — a bucketed rewrite lands one file per bucket " +
        "per partition, so the threshold could never be met and every pass " +
        "would rewrite again; set it at or above the bucket count")
    val fileDirty: Set[String] =
      if (maxFilesPerDir < 1) Set.empty
      else partitionFileCounts(spark, table)
        .filter(_._2 > maxFilesPerDir).map(_._1).toSet
    def decideFromLog(): (Set[String], DataFrame, Seq[Int]) = {
      val log = spark.read.parquet(logDir.toString)
        .select(col(Cols.Id)).distinct()
      val touched = log
        .select(pmod(hash(col(Cols.Id)), lit(meta.idMapBuckets)).as("idh"))
        .distinct().collect().map(_.getInt(0)).toSeq // bounded: ≤ min(delta, idMapBuckets)
      // full posting history of exactly the delta ids — a partition-
      // pruned read of the narrow id-map, O(touched/64 of the id-map).
      // Delta-sized, read by three downstream actions (the dirty-set
      // collect here, the kept-slice rewrite, the id-map rewrite) —
      // persist so each action doesn't re-pay the log + id-map scans
      // (scoped: released by compactInverted's finally / harness sweep)
      val hist = graft.SparkUtil.scopedPersist(
        spark.read.parquet(idMapDir.toString)
          .where(col("idh").isin(touched: _*))
          .join(log, Seq(Cols.Id), "left_semi"))
      val w = graft.SparkUtil.scopedPersist(
        hist.groupBy(col(Cols.Id))
          .agg(max(col("ingest_seq")).as("__wseq")))
      val superseded = hist.join(w, Seq(Cols.Id))
        .where(col("ingest_seq") < col("__wseq")).select(col("bkt_pfx"))
      val duplicated = hist
        .groupBy(col(Cols.Id), col("ingest_seq"), col("bucket"), col("bkt_pfx"))
        .count().where(col("count") > 1).select(col("bkt_pfx"))
      (superseded.union(duplicated).distinct()
        .collect().map(_.getString(0)).toSet, w, touched)
    }
    val (seqDirty, winners, touchedIdh) = graft.SparkUtil.ptime("compact.decision") {
      if (maintained) {
        def noParquet(d: org.apache.hadoop.fs.Path): Boolean = !fs.exists(d) ||
          !fs.listStatus(d).exists { st =>
            st.getPath.getName.endsWith(".parquet") ||
              (st.isDirectory && fs.listStatus(st.getPath)
                .exists(_.getPath.getName.endsWith(".parquet")))
          }
        // empty log = no appends since the last clear; empty id-map = the
        // table has never held a row (an empty cold seed) — either way
        // nothing can be SEQ-dirty, and reading a file-less dir would fail
        // schema inference. A requested file fold still proceeds: the log
        // clearing at the last pass proved the table supersession-clean,
        // so its rewrite carries every row through an absent winner.
        if (noParquet(logDir) || noParquet(idMapDir)) {
          if (fileDirty.isEmpty) {
            sc.setJobDescription(null)
            fs.delete(logDir, true)
            // nothing was appended since the last clear, so the occupancy
            // stats cannot have moved — the no-op early return costs no scan
            return
          }
          fs.delete(logDir, true)
          (Set.empty[String],
            cur.select(col(Cols.Id)).limit(0)
              .withColumn("__wseq", lit(null).cast("long")),
            Seq.empty[Int])
        } else decideFromLog()
      } else {
        // LEGACY decision: one narrow scan of the whole table (id, seq,
        // bucket, prefix — parquet column pruning never reads the wide
        // signature column); the collect is bounded by the prefix space.
        // winners persist for the same three-action reuse as decideFromLog
        val w = graft.SparkUtil.scopedPersist(
          cur.groupBy(col(Cols.Id)).agg(max(col(seqCol)).as("__wseq")))
        val superseded = cur.select(col(Cols.Id), col(seqCol), col("bkt_pfx"))
          .join(w, Seq(Cols.Id))
          .where(col(seqCol) < col("__wseq"))
          .select(col("bkt_pfx"))
        val duplicated = cur
          .groupBy(col(Cols.Id), col(seqCol), col("bucket"), col("bkt_pfx"))
          .count().where(col("count") > 1).select(col("bkt_pfx"))
        (superseded.union(duplicated).distinct()
          .collect().map(_.getString(0)).toSet, w, Seq.empty[Int])
      }
    }
    val dirty = seqDirty ++ fileDirty
    if (dirty.isEmpty) {
      sc.setJobDescription(null)
      if (maintained) fs.delete(logDir, true) // appends were clean (pure inserts)
      // pure inserts still moved bucket occupancy: merge the append deltas
      // (reads bounded by the delta's buckets, no partitions were rewritten)
      mergeHotStats(spark, table, Set.empty)
      return
    }

    sc.setJobDescription("graft-compact-rewrite")
    // keep: rows of ids with no recorded winner (untouched ids — already
    // exactly one seq each, the previous compaction's invariant) plus the
    // winning-seq rows of delta ids; same-seq redeliveries land identical
    // rows twice and the winner join keeps every copy — collapse them
    // (nulls compare equal, so duplicate tombstone markers dedup too)
    val kept = cur.where(col("bkt_pfx").isin(dirty.toSeq: _*))
      .join(winners, Seq(Cols.Id), "left_outer")
      .where(col("__wseq").isNull || col(seqCol) === col("__wseq"))
      .drop("__wseq")
      .dropDuplicates(Cols.Id, seqCol, "bucket")
      // align writer tasks to partition dirs (one file per rewritten dir)
      .repartition(col("bkt_pfx"))
    // manifest mode stages DIRECTLY at its retained generation path —
    // the one job that writes the compacted slice is the only data
    // movement of the whole swap (no rename at all: object-store renames
    // are copies); rename mode stages at the transient sibling. A
    // crashed manifest stage is just an unreferenced generation the next
    // pass garbage-collects.
    val stageDst =
      if (meta.swap == SwapManifest) nextGenDir(fs, tableDir) else stage
    try {
      // ONE job writes the whole dirty slice, partitioned the same way as
      // the table; the per-directory swap below is metadata-only. A
      // bucketed layout stages through a scratch TABLE so every staged
      // file carries the bucket-id file-name encoding the catalog's spec
      // promises — swapped-in files keep their names, so the co-located
      // exchange-free join property survives the swap.
      graft.SparkUtil.ptime("compact.rewrite") {
        if (meta.numBuckets > 0) {
          kept.write.mode(SaveMode.Overwrite)
            .option("path", stageDst.toString)
            .partitionBy("bkt_pfx")
            .bucketBy(meta.numBuckets, "bucket").sortBy("bucket")
            .format("parquet")
            .saveAsTable(stageTbl)
        } else
          kept.write.mode(SaveMode.Overwrite).partitionBy("bkt_pfx")
            .parquet(stageDst.toString)
      }
      // COMMIT POINT: everything above only staged; a second writer that
      // claimed the table since this op began fences the swap out loudly
      // (the stage is abandoned garbage its own recovery reclaims)
      MaintHooks.at("compact.staged", table)
      Fence.check(spark, tableDir.toString, fenceTok)
      graft.SparkUtil.ptime("compact.swap") {
        swapPartitions(spark, fs, table, tableDir, stageDst, meta.swap,
          dirty.toSeq.sorted.map(p => (s"bkt_pfx=$p", s"bkt_pfx='$p'"))) }
      // the id-map compacts in the same pass: rewrite the touched idh
      // partitions to the same winners-only state (always rename-swapped —
      // the id-map is maintenance-internal, no concurrent readers)
      if (maintained && touchedIdh.nonEmpty) graft.SparkUtil.ptime("compact.idmap") {
        val mapStage = new org.apache.hadoop.fs.Path(
          tableDir.getParent, table.toLowerCase + "__idmap_stage")
        fs.delete(mapStage, true)
        spark.read.parquet(idMapDir.toString)
          .where(col("idh").isin(touchedIdh: _*))
          .join(winners, Seq(Cols.Id), "left_outer")
          .where(col("__wseq").isNull || col("ingest_seq") === col("__wseq"))
          .drop("__wseq")
          .dropDuplicates(Cols.Id, "ingest_seq", "bucket")
          .withColumn("idh", pmod(hash(col(Cols.Id)), lit(meta.idMapBuckets)))
          .repartition(col("idh"))
          .write.mode(SaveMode.Overwrite).partitionBy("idh")
          .parquet(mapStage.toString)
        touchedIdh.foreach { h =>
          val src = new org.apache.hadoop.fs.Path(mapStage, s"idh=$h")
          val dst = new org.apache.hadoop.fs.Path(idMapDir, s"idh=$h")
          fs.delete(dst, true)
          if (fs.exists(src)) { fs.rename(src, dst); () }
        }
        fs.delete(mapStage, true)
      }
      // the log clears LAST: a crash before this line re-runs the whole
      // decision from the intact log — idempotent, never lossy
      if (maintained) fs.delete(logDir, true)
    } finally {
      sc.setJobDescription(null)
      // rename mode: the transient sibling stage drops only once every
      // aside copy is spent (a failed run keeps both for recovery).
      // Manifest mode never deletes its stage — it IS the new generation
      // (adopted on success, GC'd as unreferenced on failure).
      graft.SparkUtil.ptime("compact.dropStage") {
        spark.sql(s"DROP TABLE IF EXISTS $stageTbl") }
      if (meta.swap != SwapManifest && asideIsClear(fs, tableDir, table)) {
        fs.delete(stage, true); ()
      }
    }
    spark.catalog.refreshTable(table)
    // incremental occupancy update: append deltas merge in, and ONLY the
    // partitions this compaction rewrote are recounted exactly
    graft.SparkUtil.ptime("compact.hotStats") { mergeHotStats(spark, table, dirty) }
  }

  /** Swap each staged partition directory into the live table via the
    * table's strategy. `parts` carries (dirName, sqlSpec) pairs, e.g.
    * `("bkt_pfx=ab", "bkt_pfx='ab'")`.
    *
    * [[SwapRename]]: live dir renames ASIDE (into the hidden
    * `_compact_aside` sibling of the stage), staged dir renames in, aside
    * drops only after every swap succeeded. A staged dir can be absent —
    * every row of that partition was superseded — in which case the
    * partition drops from data AND catalog (the old data is 100%
    * superseded rows, so no aside copy is kept: a crash after the DROP
    * loses only rows compaction was deleting anyway).
    *
    * [[SwapManifest]]: no data file ever moves — the staged directory IS
    * the new generation (`_gen-N/` under the table, written there
    * directly), and each dirty partition's catalog entry flips to its
    * subdirectory (atomic per-partition metadata); the previous location
    * survives for in-flight readers until the next compaction's
    * [[gcStaleGenerations]].
    */
  private def swapPartitions(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, table: String,
      tableDir: org.apache.hadoop.fs.Path, stage: org.apache.hadoop.fs.Path,
      swapMode: String, parts: Seq[(String, String)]): Unit = {
    if (swapMode == SwapManifest) {
      parts.foreach { case (dirName, sqlSpec) =>
        val src = new org.apache.hadoop.fs.Path(stage, dirName)
        if (fs.exists(src))
          spark.sql(s"ALTER TABLE $table PARTITION ($sqlSpec) " +
            s"SET LOCATION '${fs.makeQualified(src)}'")
        else
          // every row superseded: the partition leaves the CATALOG now but
          // its data is RETAINED (a plain SQL DROP would purge the managed
          // directory immediately, breaking both the one-pass in-flight-
          // reader retention and any snapshot pin referencing it) — the
          // next pass's gcStaleGenerations reclaims it once nothing
          // references it, like every other replaced location
          spark.sessionState.catalog.dropPartitions(
            org.apache.spark.sql.catalyst.TableIdentifier(table),
            Seq(Map("bkt_pfx" -> dirName.stripPrefix("bkt_pfx="))),
            ignoreIfNotExists = true, purge = false, retainData = true)
      }
    } else {
      val aside = asideDir(tableDir, table)
      fs.mkdirs(aside)
      parts.foreach { case (dirName, sqlSpec) =>
        val src = new org.apache.hadoop.fs.Path(stage, dirName)
        val dst = new org.apache.hadoop.fs.Path(tableDir, dirName)
        if (fs.exists(src)) {
          if (fs.exists(dst)) { fs.rename(dst, new org.apache.hadoop.fs.Path(aside, dirName)); () }
          fs.rename(src, dst); ()
        } else {
          // every row superseded: the directory is gone for good
          spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($sqlSpec)")
          fs.delete(dst, true); ()
        }
      }
      // every dirty directory swapped — only now do the old copies drop
      fs.delete(aside, true); ()
    }
  }

  /** Crash recovery for the [[SwapRename]] protocol: an aside directory
    * left behind means the previous compaction died mid-swap. Any aside
    * partition whose live directory is MISSING was between its two
    * renames — restore it (the pre-compaction state, which serving
    * tolerates); any whose live directory exists completed its swap —
    * drop the old copy. Runs unconditionally at the head of
    * [[compactInverted]]; the interrupted delta is still in the dirty
    * log, so the retry redoes it.
    */
  private def recoverAside(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path,
      aside: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(aside)) return
    fs.listStatus(aside).foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(tableDir, st.getPath.getName)
      if (!fs.exists(dst)) { fs.rename(st.getPath, dst); () }
      else { fs.delete(st.getPath, true); () }
    }
    fs.delete(aside, true); ()
  }

  private def asideIsClear(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path, table: String): Boolean =
    !fs.exists(asideDir(tableDir, table))

  private def asideDir(tableDir: org.apache.hadoop.fs.Path,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tableDir.getParent,
      table.toLowerCase + "__compact_aside")

  /** The next unused hidden generation directory under the table
    * (`_gen-N`) — the shared [[Generations]] discipline; monotone, no
    * wall clock.
    */
  private def nextGenDir(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    Generations.dirOf(tableDir, Generations.next(fs, tableDir))

  /** Drop generation directories (and replaced default-location
    * partition directories) no catalog partition references any more —
    * the [[SwapManifest]] garbage collector. Runs at the head of each
    * compaction, so the PREVIOUS generation survives one full maintenance
    * interval for in-flight readers (two-generation retention).
    */
  private def gcStaleGenerations(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, table: String,
      tableDir: org.apache.hadoop.fs.Path): Unit = {
    // PINNED snapshots extend liveness: every location a pin references
    // survives gc until the pin drops — the snapshot contract; orphan
    // pin side copies (a crashed half-pin's log/hot) sweep here too
    val pins = pinsInverted(spark, table)
    val pd = pinsDir(spark, table)
    if (fs.exists(pd)) fs.listStatus(pd).map(_.getPath).foreach { p =>
      val n = p.getName
      val orphanOf = if (n.startsWith("log-")) Some(n.stripPrefix("log-"))
        else if (n.startsWith("hot-")) Some(n.stripPrefix("hot-"))
        else if (n.startsWith("torn-")) Some(n.stripPrefix("torn-")) else None
      orphanOf.filterNot(pins.contains).foreach { name =>
        // re-probe the pin file at the last moment: a pin COMMITTING
        // between this pass's pins listing and this delete would lose its
        // just-staged side copies (its own post-commit validation would
        // catch that and roll the pin back loudly, but not sweeping a pin
        // that already won beats making it retry)
        if (!fs.exists(new org.apache.hadoop.fs.Path(pd, s"pin-$name"))) {
          fs.delete(p, true); ()
        }
      }
    }
    // pins inventory FILES; gc reclaims whole directories, so a pinned
    // file keeps its PARENT directory alive (post-pin appends sharing the
    // dir ride along until unpin — bounded by the append backlog)
    val referenced = spark.sessionState.catalog
      .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .map(p => fs.makeQualified(
        new org.apache.hadoop.fs.Path(new java.net.URI(p.location.toString))))
      .toSet ++ pins.values.flatten.map { case (_, f) => fs.makeQualified(
        new org.apache.hadoop.fs.Path(new java.net.URI(f))).getParent }
    // whole-dir sweep through the shared core: a generation with NO
    // referenced partition left (all replaced by later flips, or a
    // crashed stage nothing ever adopted) drops whole — including its
    // writer metadata (_SUCCESS)
    Generations.dropUnreferenced(fs, tableDir, n =>
      fs.listStatus(Generations.dirOf(tableDir, n))
        .exists(sub => referenced.contains(fs.makeQualified(sub.getPath))))
    fs.listStatus(tableDir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(Generations.Prefix)) {
        // a surviving (partially referenced) generation sheds only its
        // individually replaced partition children — the catalog pointer
        // is per-partition, finer than CellManifest's per-cell lists
        fs.listStatus(st.getPath).foreach { sub =>
          if (!referenced.contains(fs.makeQualified(sub.getPath))) {
            fs.delete(sub.getPath, true); ()
          }
        }
      } else if (name.startsWith("bkt_pfx=") &&
          !referenced.contains(fs.makeQualified(st.getPath))) {
        fs.delete(st.getPath, true); ()
      }
    }
  }

  /** Re-LAYOUT an inverted posting table to a new target meta — the
    * migration a growing corpus eventually needs: the prefix width that
    * gave a 10 GB index ≤ 256 tidy directories leaves a 100 TB index with
    * multi-TB directories, and PERF.md's guidance ("the knobs move
    * together") is operational only if the knobs can actually move.
    * Changes any of: `prefixLen` (partition regrouping), `numBuckets`
    * (file-bucketing on/off/width), `hotThreshold`, `swap`, and
    * `idMapBuckets`.
    *
    * Shape: one O(table) offline rebuild through the standard write path —
    * the exploded postings regroup to (id, signature, bucket_ids, seq)
    * rows (one wide shuffle keyed on (id, seq) — the honest migration
    * cost, paid once per layout generation), stage to a scratch
    * directory, then the table rebuilds via [[saveInverted]] and the
    * tombstone markers re-append — so the new meta, id-map, hot stats,
    * and bucket spec are all correct BY CONSTRUCTION (no bespoke
    * migration writer to diverge from the canonical one). The table is
    * absent during the rebuild window: this is an OFFLINE migration
    * (schedule it like any reindex); an online generation-flip variant
    * would compose the [[SwapManifest]] machinery table-wide.
    *
    * The migration COMPACTS en route: an O(table) rewrite that carried
    * superseded rows through would pay full price to keep garbage — worse,
    * the rebuilt table's fresh id-map would declare them compaction-clean
    * (the save contract is one seq per id) and they would never drop. So
    * the regroup keeps each id's winning-seq postings only, tombstone
    * markers keep their seqs (re-appended — still outranking any replayed
    * pre-delete batch), and serving answers are identical before and
    * after; post-migration appends/compactions continue normally on the
    * re-seeded maintenance state (gate `ann_index_relayout`).
    *
    * CRASH SAFETY — the live table is never the build site: the rebuild
    * lands COMPLETELY in a side table (`<table>__relayout_next`, markers
    * included), a `_graft_relayout_ready` flag marks it complete, and only
    * then does the metadata-only swap run (DROP old + ALTER RENAME next —
    * the catalog rewrites partition locations with the directory move).
    * Any failure BEFORE the flag leaves the original table untouched (the
    * incomplete side table is garbage the next migration's
    * [[recoverRelayout]] resets); any crash INSIDE the swap window leaves
    * the complete flagged side table, and [[recoverRelayout]] — run at
    * the head of every relayout AND compaction — finishes the rename.
    * Serving therefore always sees the complete old or the complete new
    * layout, never an empty or partial table.
    */
  def relayoutInverted(spark: SparkSession, table: String,
      target: InvertedMeta): Unit = {
    import org.apache.spark.sql.functions._
    recoverRelayout(spark, table)
    // the DROP + RENAME swap destroys every location a snapshot pin
    // references — refuse while pins exist (the whole-table guard),
    // before the O(table) rebuild is paid for
    requireNoInvertedPins(spark, table, "relayoutInverted")
    val cur = spark.table(table)
    require(cur.columns.contains("ingest_seq"),
      "relayoutInverted needs the maintained (ingest_seq-carrying) layout")
    val dir = tablePath(spark, table)
    // claim; re-validated before the readiness flag (the commit point) so
    // a writer arriving during the O(table) rebuild fences this swap out
    val fenceTok = Fence.begin(spark, dir.toString)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val scratch = new org.apache.hadoop.fs.Path(
      dir.getParent, table.toLowerCase + "__relayout_stage")
    fs.delete(scratch, true)
    // regroup the exploded postings back to the saveInverted input shape,
    // winners only (markers — null buckets under the reserved prefix —
    // count toward the winner seq, so a tombstoned id's postings drop
    // here exactly as compaction would drop them). ONE id-keyed
    // aggregation carries the wide rows exactly once: a winners JOIN
    // instead flips to a sort-merge past the broadcast ceiling and
    // re-shuffles the whole table a second time (measured 1.5×/unit
    // shuffle at sf1 — the single-agg form is ~1.0×). Markers ride
    // separately (narrow).
    graft.SparkUtil.ptime("relayout.regroup") {
    cur
      .groupBy(col(Cols.Id))
      .agg(max(col("ingest_seq")).as("ingest_seq"),
        collect_list(struct(col("ingest_seq").as("s"), col("bucket").as("b"),
          col(Cols.Signature).as("sig"))).as("__all"))
      .withColumn("__win", filter(col("__all"),
        x => x.getField("s") === col("ingest_seq") && x.getField("b").isNotNull))
      .where(size(col("__win")) > 0)
      .select(col(Cols.Id),
        element_at(col("__win"), 1).getField("sig").as(Cols.Signature),
        array_distinct(transform(col("__win"), x => x.getField("b")))
          .as(Cols.BucketIds),
        col("ingest_seq"))
      .write.mode(SaveMode.Overwrite).parquet(new org.apache.hadoop.fs.Path(
        scratch, "postings").toString)
    cur.where(col("bkt_pfx") === TombstonePrefix)
      .groupBy(col(Cols.Id))
      .agg(max(col("ingest_seq")).as("ingest_seq"))
      .write.mode(SaveMode.Overwrite).parquet(new org.apache.hadoop.fs.Path(
        scratch, "markers").toString)
    }
    val next = table + "__relayout_next"
    try {
      // build the WHOLE new layout in the side table first; the live
      // table keeps serving (and stays the recovery point) throughout
      graft.SparkUtil.ptime("relayout.resetNext") { reset(spark, next) }
      graft.SparkUtil.ptime("relayout.saveNext") { saveInverted(
        spark.read.parquet(new org.apache.hadoop.fs.Path(scratch, "postings").toString),
        next, target.prefixLen, target.hotThreshold, target.numBuckets,
        target.swap, target.idMapBuckets, target.hotMode) }
      val markers = spark.read.parquet(
        new org.apache.hadoop.fs.Path(scratch, "markers").toString)
      graft.SparkUtil.ptime("relayout.markers") {
        if (!markers.isEmpty) appendTombstoneRows(spark, next, markers) }
      // COMMIT POINT: the flag commits the migration — fence first, so a
      // writer that claimed the live table mid-rebuild leaves it serving
      // its own truth and this side table is discarded unflagged
      MaintHooks.at("relayout.staged", table)
      requireNoInvertedPins(spark, table, "relayoutInverted") // a pin landed
      Fence.check(spark, dir.toString, fenceTok)
      // the readiness flag: recovery adopts a flagged side table (the
      // build completed; only the swap remains) and discards an unflagged
      // one (incomplete — the live table is still the truth)
      fs.create(new org.apache.hadoop.fs.Path(
        tablePath(spark, next), RelayoutReadyFlag), true).close()
      graft.SparkUtil.ptime("relayout.swap") { finishRelayoutSwap(spark, table) }
    } finally { fs.delete(scratch, true); () }
  }

  /** Name of the completion flag a relayout writes into its side table. */
  private val RelayoutReadyFlag = "_graft_relayout_ready"

  /** The metadata-only swap at the end of [[relayoutInverted]], shared
    * with crash recovery: DROP the old table (its directory goes with the
    * managed-table drop; any partially-deleted leftover is cleared
    * explicitly) and RENAME the flagged side table in (the catalog moves
    * the directory — every hidden side file, meta/_hot/id-map/log, rides
    * inside it). Partition locations are then REBASED explicitly: the
    * catalog's own rename rewrites them by URI-string prefix replacement,
    * which silently misses when the stored URIs normalize differently
    * (measured: `file:///` partition URIs vs a `file:/` table location
    * leave every partition pointing at the vanished side directory — a
    * zero-row table). The rebase is path-component math, idempotent when
    * the catalog already fixed them.
    */
  private def finishRelayoutSwap(spark: SparkSession, table: String): Unit = {
    val next = table + "__relayout_next"
    // the swap replaces the table directory (and the fence inside it)
    // with the side table's — re-seed the epoch past the OLD table's so
    // stale pre-migration tokens can never collide with fresh claims
    val preEpoch = Fence.current(spark, tablePath(spark, table).toString)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val leftover = warehouseLocation(spark, table)
    if (leftover.exists()) {
      import scala.reflect.io.Directory
      new Directory(leftover).deleteRecursively(); ()
    }
    spark.sql(s"ALTER TABLE $next RENAME TO $table")
    val cat = spark.sessionState.catalog
    val tid = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val newDir = new org.apache.hadoop.fs.Path(
      new java.net.URI(cat.getTableMetadata(tid).location.toString))
    val fs = newDir.getFileSystem(spark.sessionState.newHadoopConf())
    // both sides normalize through the SAME makeQualified, so the prefix
    // test is exact (java.net.URI.relativize is too strict for this)
    val oldPrefix = fs.makeQualified(new org.apache.hadoop.fs.Path(
      newDir.getParent, next.toLowerCase(java.util.Locale.ROOT)))
      .toString.stripSuffix("/") + "/"
    val rebased = cat.listPartitions(tid).flatMap { p =>
      val loc = fs.makeQualified(new org.apache.hadoop.fs.Path(
        new java.net.URI(p.location.toString))).toString
      if (!loc.startsWith(oldPrefix)) None // already under the new dir
      else Some(p.copy(storage = p.storage.copy(locationUri = Some(
        fs.makeQualified(new org.apache.hadoop.fs.Path(
          newDir, loc.substring(oldPrefix.length))).toUri))))
    }
    if (rebased.nonEmpty) cat.alterPartitions(tid, rebased)
    spark.catalog.refreshTable(table)
    fsOf(spark, table).delete(
      new org.apache.hadoop.fs.Path(tablePath(spark, table), RelayoutReadyFlag),
      false)
    Fence.begin(spark, tablePath(spark, table).toString, preEpoch + 1); ()
  }

  /** Crash recovery for [[relayoutInverted]] — runs at the head of every
    * relayout and compaction. A leftover `<table>__relayout_next` means a
    * previous migration died: if it carries the readiness flag its build
    * completed and only the metadata swap remains — finish it (the new
    * layout serves); without the flag the build was cut short — drop the
    * fragment (the ORIGINAL table was never touched and keeps serving).
    * Either way the caller proceeds against a complete table.
    */
  def recoverRelayout(spark: SparkSession, table: String): Unit = {
    val next = table + "__relayout_next"
    if (!spark.catalog.tableExists(next)) return
    val flag = new org.apache.hadoop.fs.Path(
      tablePath(spark, next), RelayoutReadyFlag)
    if (fsOf(spark, next).exists(flag)) finishRelayoutSwap(spark, table)
    else reset(spark, next)
  }

  /** The newest APPEND seq per id recorded in the dirty log since the
    * last compaction — the supersession CUTOFF serving paths use to
    * exclude a re-ingested id's stale postings EXACTLY, before any
    * compaction: a data row below its id's cutoff belongs to a superseded
    * version (appends log their (id, seq) AFTER the posting rows land, so
    * a logged cutoff always has its current rows on disk). None when the
    * table has no log or no appends since the last clear — then every
    * stored row is current by the compaction invariant. USUALLY
    * broadcast-sized (it clears at every compaction), but it grows with
    * the uncompacted backlog — serving paths must size the join via
    * [[supersessionCutoffsSized]] and degrade to a shuffle join past
    * their broadcast budget instead of OOMing the driver.
    */
  def supersessionCutoffs(spark: SparkSession, table: String): Option[DataFrame] =
    supersessionCutoffsSized(spark, table).map(_._1)

  /** [[supersessionCutoffs]] plus the dirty log's on-disk byte size — the
    * zero-job broadcast-budget signal (parquet bytes upper-bound the
    * cutoff frame: the log holds ≥ one (id, seq) row per cutoff row, and
    * the aggregate only shrinks it). Callers compare the bytes against
    * their broadcast threshold; a backlog past it joins by shuffle — the
    * plan degrades, never fails.
    */
  def supersessionCutoffsSized(spark: SparkSession,
      table: String): Option[(DataFrame, Long)] = {
    import org.apache.spark.sql.functions._
    val logDir = dirtyLogPath(spark, table)
    val fs = fsOf(spark, table)
    if (!fs.exists(logDir)) return None
    val files = fs.listStatus(logDir).filter(_.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) None
    else Some((spark.read.parquet(logDir.toString)
      .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__cut")),
      files.map(_.getLen).sum))
  }

  /** DEFAULT file-count trigger for dirty-log self-compaction: each append
    * lands one small log file, and a high-cadence stream accumulates
    * thousands between compactions — past this many files the log folds
    * into one aggregated (id, max seq) file. Override per session with
    * `spark.conf.set("graft.maint.logCompactFiles", n)`.
    */
  val LogCompactFileCount = 64

  /** Fold the dirty log's one-file-per-append accretion into a single
    * aggregated file once it passes the file-count trigger — the
    * maintenance that keeps BOTH log consumers cheap under a long
    * compaction interval: the serve-path cutoff read stops opening
    * thousands of footers, and the log's bytes (the broadcast-budget
    * signal) stop over-counting superseded duplicates. Semantics are
    * preserved exactly: both consumers reduce the log per id (distinct
    * ids for the compaction decision, max seq for the cutoffs), and
    * (id, max seq) is a sufficient statistic for both.
    *
    * Crash-safe without a swap: the aggregated file APPENDS first (the
    * union of old files + aggregate has the same per-id reduction), the
    * old files delete after — any crash window leaves a superset whose
    * reduction is unchanged. Single-writer per table, like every append.
    */
  def compactDirtyLogIfNeeded(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions._
    val trigger = spark.conf.getOption("graft.maint.logCompactFiles")
      .map(_.toInt).getOrElse(LogCompactFileCount)
    val logDir = dirtyLogPath(spark, table)
    val fs = fsOf(spark, table)
    if (!fs.exists(logDir)) return
    val files = fs.listStatus(logDir)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    if (files.length <= trigger) return
    spark.read.parquet(files.map(_.toString).toIndexedSeq: _*)
      .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("ingest_seq"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(logDir.toString)
    files.foreach(f => fs.delete(f, false))
  }

  // ------------------------------------------------------------- pins

  private val PinName = "[A-Za-z0-9][A-Za-z0-9._-]*".r

  private def pinsDir(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_pins")

  /** PIN the inverted table's current state as a named SNAPSHOT — the
    * text twin of [[CellManifest.pin]], same contract: zero copies of
    * DATA (under [[SwapManifest]] no data file ever changes or moves —
    * the pin records a FILE inventory, manifest-style, and
    * [[gcStaleGenerations]] retains the containing directories until
    * unpin; files rather than directories because text APPENDS land new
    * files inside the live partition dirs, and a directory pin would
    * leak post-pin rows into the frozen read), reader-initiated (no
    * fence claim), immutable per name, whole-table writers (re-save,
    * relayout) refuse while pins exist, and takedowns PIERCE the pin
    * (pinned serving reads the LIVE tombstone markers — compliance
    * outranks reproducibility; text markers are permanent, so no
    * retention complexity).
    *
    * Two delta-sized side states DO copy, because the live ones mutate in
    * place: the supersession dirty log (so a pinned serve keeps the
    * exact-on-arrival cutoffs of its moment — the live log clears at
    * every compaction) and the `_hot` occupancy list (so the hot-skip
    * serving policy is frozen with the data it was computed over, and a
    * pinned query's answer never drifts with live ingest). Both are
    * bounded: the log by the pin-time backlog, `_hot` by the
    * over-threshold tail.
    *
    * The pin file itself is the commit point (create-exclusive,
    * `#eof`-terminated like every manifest put); the post-put validation
    * rolls back loudly if a concurrent maintenance pass reclaimed a
    * pinned location (the same two-pass race as the vector pin).
    */
  def pinInverted(spark: SparkSession, table: String, name: String): Unit = {
    // the pin CLAIMS the table's writer fence for the duration of its
    // capture (round-19; the object doc's "reader-initiated" contract
    // changed here): the claim is what lets an IN-FLIGHT append — one
    // that claimed before this pin began and is still materializing —
    // detect the pin at its own visibility check and refuse instead of
    // landing half inside the capture (the claim-to-write gap). Two
    // metadata puts; epochs are not leases, nothing is held open.
    val token = Fence.begin(spark, fenceDirOf(spark, table))
    pinInvertedUnfenced(spark, table, name)
    try Fence.check(spark, fenceDirOf(spark, table), token)
    catch {
      case e: FenceViolation =>
        unpinInverted(spark, table, name)
        throw new FenceViolation(
          s"snapshot pin '$name' on $table raced a maintenance writer that " +
            "claimed the table during the capture — the pin was rolled " +
            "back; re-pin (the retry resolves the settled state)", e)
    }
  }

  /** [[pinInverted]] WITHOUT the pin's own fence claim/check — for
    * callers that already hold the table inside their own fence window
    * ([[Snapshots.pinTrainingSet]]'s claim-all → pin-all → check-all: a
    * nested claim here would move the epoch past the outer token and
    * fail the outer commit unconditionally).
    */
  private[graft] def pinInvertedUnfenced(spark: SparkSession, table: String,
      name: String): Unit = {
    require(PinName.pattern.matcher(name).matches(),
      s"pin name '$name' must match ${PinName.regex}")
    val meta = invertedMeta(spark, table)
    require(meta.swap == SwapManifest,
      s"$table compacts under '${meta.swap}' — snapshots need the manifest " +
        "swap strategy (rename-mode compaction rewrites directories in " +
        "place, which cannot freeze); relayout with swap = manifest first")
    require(spark.catalog.tableExists(table),
      s"$table has no catalog entry — pinned locations are catalog metadata")
    val fs = fsOf(spark, table)
    val pd = pinsDir(spark, table)
    fs.mkdirs(pd)
    // side copies land BEFORE the pin-file commit point: a crash here
    // leaves orphan copies the next gc sweeps (no pin references them)
    def hasParquet(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    val logCopy = new org.apache.hadoop.fs.Path(pd, s"log-$name")
    fs.delete(logCopy, true)
    val logDir = dirtyLogPath(spark, table)
    val wroteLog = hasParquet(logDir)
    if (wroteLog)
      spark.read.parquet(logDir.toString).coalesce(1)
        .write.parquet(logCopy.toString)
    val hotCopy = new org.apache.hadoop.fs.Path(pd, s"hot-$name")
    fs.delete(hotCopy, true)
    val hotDir = new org.apache.hadoop.fs.Path(tablePath(spark, table), "_hot")
    // same guard as the log copy: a _hot directory holding no parquet
    // (e.g. only _SUCCESS after an interrupted recompute) would fail the
    // whole pin on schema inference — an empty hot list pins as "no hot
    // stats", which is what the directory's contents say
    val wroteHot = hasParquet(hotDir)
    if (wroteHot)
      spark.read.parquet(hotDir.toString).coalesce(1)
        .write.parquet(hotCopy.toString)
    // staged-but-uncommitted window: side copies exist, pin file doesn't
    // — a maintenance head's orphan sweep in exactly this window reads
    // them as crashed half-pin leftovers (IndexStoreSpec interleaves one
    // here; the post-commit validation below must then roll back loudly)
    MaintHooks.at("pin.staged", table)
    // the pin inventories FILES, not directories: a post-pin APPEND lands
    // new parquet files INSIDE the live partition directories (text
    // appends are in-place even under the manifest swap — only rewrites
    // flip to generations), and a directory-level pin would leak them
    // into the frozen read. Files themselves never change or move under
    // SwapManifest, so the pin-time file list is byte-stable; the pin
    // file is a manifest-style inventory whose size scales with the
    // table's file count at pin time.
    // one listStatus per partition, but PARALLEL across partitions: at
    // the 16^4-dir layout OPERATIONS.md recommends for 100 TB a serial
    // driver loop is minutes of round-trip latency, while the calls are
    // independent metadata reads a bounded pool overlaps to ~seconds
    // (hadoop FileSystem instances are shared and thread-safe for reads;
    // the inventory itself stays bounded — compaction caps files per
    // partition). Small tables skip the pool: thread spin-up would cost
    // more than 16 serial lists.
    def listInventory(): Seq[(String, String)] = {
      val specs = spark.sessionState.catalog
        .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .map(p => p.spec("bkt_pfx") -> new org.apache.hadoop.fs.Path(
          new java.net.URI(p.location.toString)))
      def listOne(pfx: String, dir: org.apache.hadoop.fs.Path) =
        fs.listStatus(dir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => pfx -> fs.makeQualified(f).toString)
      (if (specs.size <= 64)
        specs.flatMap { case (pfx, dir) => listOne(pfx, dir) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
        try {
          val futures = specs.map { case (pfx, dir) =>
            pool.submit(new java.util.concurrent.Callable[
                Array[(String, String)]] {
              def call(): Array[(String, String)] = listOne(pfx, dir)
            })
          }
          // unwrap the pool's ExecutionException so the pooled path's
          // failure contract (the IOException the serial listStatus loop
          // throws) is identical regardless of partition count — handlers
          // keyed on exception type must not see a different shape past
          // 64 partitions
          futures.flatMap { f =>
            try f.get() catch {
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          }
        } finally pool.shutdown()
      }).sortBy(identity).toSeq
    }
    val parts = listInventory()
    val pinFile = new org.apache.hadoop.fs.Path(pd, s"pin-$name")
    val out = try fs.create(pinFile, false) catch {
      case e: java.io.IOException =>
        fs.delete(logCopy, true); fs.delete(hotCopy, true)
        throw new IllegalStateException(
          s"snapshot pin '$name' already exists on $table — pins are " +
            "immutable; unpin first or choose a new name", e)
    }
    // header: the table's fence epoch at pin time — the pin's AGE is then
    // current-epoch − this (one unit per writer op: append, compaction,
    // takedown, relayout all claim), the wall-clock-free staleness signal
    // snapshotDebt surfaces. Comment lines are skipped by every parser,
    // so pre-header pins read fine (age reports as unknown)
    val claimEpoch = Fence.current(spark, fenceDirOf(spark, table))
    try out.write(((s"#epoch $claimEpoch" +:
        parts.map { case (pfx, f) => s"$pfx\t$f" }) :+ "#eof")
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // committed-but-unvalidated window: the pin file is visible, the
    // existence/extra-files/poison validations below have not run —
    // specs interleave a writer here to drive the post-commit matrix
    MaintHooks.at("pin.committed", table)
    // pin-vs-gc race: every pinned file must still exist now that the
    // pin is visible — else roll back loudly (re-pin resolves the newer
    // state)
    val missing = parts.filterNot { case (_, f) =>
      fs.exists(new org.apache.hadoop.fs.Path(new java.net.URI(f)))
    }
    if (missing.nonEmpty) {
      fs.delete(pinFile, false); fs.delete(logCopy, true); fs.delete(hotCopy, true)
      throw new FenceViolation(
        s"snapshot pin '$name' on $table raced a maintenance pass that " +
          s"reclaimed ${missing.map(_._1).mkString(", ")} — the pin was " +
          "rolled back; re-pin")
    }
    // ...and the SIDE copies must have survived too: they land BEFORE the
    // pin-file commit, so a maintenance head whose orphan sweep listed
    // pins in that window reads them as crashed half-pin leftovers and
    // deletes them. A pin missing its frozen cutoffs/hot list would serve
    // silently wrong (superseded rows over an uncompacted backlog) — the
    // exact silent-failure class every other commit here refuses loudly.
    val lostSides =
      (if (wroteLog && !hasParquet(logCopy)) Seq(s"log-$name") else Nil) ++
        (if (wroteHot && !hasParquet(hotCopy)) Seq(s"hot-$name") else Nil)
    if (lostSides.nonEmpty) {
      fs.delete(pinFile, false); fs.delete(logCopy, true); fs.delete(hotCopy, true)
      throw new FenceViolation(
        s"snapshot pin '$name' on $table raced a maintenance pass whose " +
          s"orphan sweep removed its staged ${lostSides.mkString(", ")} " +
          "side copies before the pin file landed — the pin was rolled " +
          "back; re-pin")
    }
    // EXTRA-files validation (the append claim-to-write gap): re-inventory
    // the table now that the pin is committed. Any parquet file present
    // that the pin did NOT capture means a writer's batch was landing
    // BETWEEN the two listings — the capture may hold only part of that
    // batch, so refuse and let the caller re-pin the settled state. (A
    // fully-pre-capture or fully-post-capture batch passes: the first
    // contributes to both listings, the second to neither... — files it
    // lands after this re-listing are invisible here AND absent from the
    // pin, which is the consistent "pin linearizes first" outcome; the
    // in-flight append's own post-visibility check covers that tail.)
    val extra = listInventory().map(_._2).toSet -- parts.map(_._2).toSet
    if (extra.nonEmpty) {
      fs.delete(pinFile, false); fs.delete(logCopy, true); fs.delete(hotCopy, true)
      throw new FenceViolation(
        s"snapshot pin '$name' on $table raced an append whose batch was " +
          s"still materializing during the capture (${extra.size} files " +
          "landed between the pin's two inventory passes) — the pin was " +
          "rolled back; re-pin (the retry captures the settled state)")
    }
    // ...and a concurrent append's visibility check may have POISONED
    // this pin (it detected a proper-subset capture of its batch) in the
    // window since the re-listing — fold that refusal into the retry
    // path now instead of leaving it for the first read
    if (fs.exists(new org.apache.hadoop.fs.Path(pd, s"torn-$name"))) {
      fs.delete(pinFile, false); fs.delete(logCopy, true); fs.delete(hotCopy, true)
      fs.delete(new org.apache.hadoop.fs.Path(pd, s"torn-$name"), false)
      throw new FenceViolation(
        s"snapshot pin '$name' on $table captured part of an append batch " +
          "that was materializing during the capture (the append's " +
          "visibility check poisoned the pin) — the pin was rolled back; " +
          "re-pin")
    }
  }

  /** Drop a named snapshot: its locations reclaim at the next maintenance
    * pass; the pin-private log/hot copies drop now. Loud on a typo.
    */
  def unpinInverted(spark: SparkSession, table: String, name: String): Unit = {
    val fs = fsOf(spark, table)
    val pd = pinsDir(spark, table)
    val pinFile = new org.apache.hadoop.fs.Path(pd, s"pin-$name")
    require(fs.exists(pinFile),
      s"no snapshot pin '$name' on $table (pins: " +
        s"${pinsInverted(spark, table).keys.toSeq.sorted.mkString(", ")})")
    fs.delete(pinFile, false)
    fs.delete(new org.apache.hadoop.fs.Path(pd, s"log-$name"), true)
    fs.delete(new org.apache.hadoop.fs.Path(pd, s"hot-$name"), true)
    fs.delete(new org.apache.hadoop.fs.Path(pd, s"torn-$name"), false); ()
  }

  /** One named snapshot's (bkt_pfx, file URI) inventory — a single point
    * read of `pin-<name>`, None when no such pin. The latency-sensitive
    * pinned SERVE resolves its pin through this instead of
    * [[pinsInverted]] (which lists and parses EVERY pin file — right for
    * gc and writer guards, a per-query filesystem tax proportional to
    * pin count on the point path).
    */
  def pinInventory(spark: SparkSession, table: String,
      name: String): Option[Seq[(String, String)]] = {
    val fs = fsOf(spark, table)
    // a POISONED pin (an append's visibility check proved it captured a
    // proper subset of a batch that was materializing during the capture)
    // refuses loudly instead of serving the torn view — unpin and re-pin
    // resolves it. Retention still honors the pin ([[pinsInverted]] reads
    // raw), so the refusal never turns into missing-file chaos.
    if (fs.exists(new org.apache.hadoop.fs.Path(pinsDir(spark, table),
        s"torn-$name")) &&
        fs.exists(new org.apache.hadoop.fs.Path(pinsDir(spark, table),
          s"pin-$name")))
      throw new IllegalStateException(
        s"snapshot pin '$name' on $table is POISONED: it captured part of " +
          "an append batch that was still materializing when the pin " +
          "committed, so its frozen view is torn — unpin and re-pin to " +
          "capture the settled state (nothing is served from a torn pin)")
    readPinInventory(spark, table, name)
  }

  /** The raw pin-file parse, WITHOUT the poison refusal — gc/retention
    * and writer guards must keep honoring a poisoned pin's locations
    * until it is unpinned.
    */
  private def readPinInventory(spark: SparkSession, table: String,
      name: String): Option[Seq[(String, String)]] = {
    val fs = fsOf(spark, table)
    val p = new org.apache.hadoop.fs.Path(pinsDir(spark, table), s"pin-$name")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = body.linesIterator.filter(_.nonEmpty).toSeq
    require(lines.lastOption.contains("#eof"),
      s"snapshot pin '$name' of $table is TORN — the put did not land " +
        "whole; delete and re-pin")
    Some(lines.filterNot(_.startsWith("#")).map { l =>
      val Array(pfx, loc) = l.split("\t", 2); pfx -> loc
    })
  }

  /** The fence epoch recorded in a pin's `#epoch` header — None for an
    * unknown pin or one written before the header existed.
    */
  private def pinClaimEpoch(spark: SparkSession, table: String,
      name: String): Option[Long] = {
    val fs = fsOf(spark, table)
    val p = new org.apache.hadoop.fs.Path(pinsDir(spark, table), s"pin-$name")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.find(_.startsWith("#epoch "))
      .map(_.stripPrefix("#epoch ").trim.toLong)
  }

  /** Every named snapshot: name -> pinned (bkt_pfx, file URI) inventory. */
  def pinsInverted(spark: SparkSession,
      table: String): Map[String, Seq[(String, String)]] = {
    val fs = fsOf(spark, table)
    val pd = pinsDir(spark, table)
    if (!fs.exists(pd)) return Map.empty
    fs.listStatus(pd).map(_.getPath.getName)
      .filter(_.startsWith("pin-")).map(_.stripPrefix("pin-"))
      .flatMap(n => readPinInventory(spark, table, n).map(n -> _))
      .toMap
  }

  /** Loud guard for whole-table writer ops (re-save, relayout). */
  def requireNoInvertedPins(spark: SparkSession, table: String,
      op: String): Unit = {
    val ps = pinsInverted(spark, table)
    if (ps.nonEmpty) throw new IllegalStateException(
      s"$op on $table refused: snapshot pins " +
        s"${ps.keys.toSeq.sorted.mkString("[", ", ", "]")} reference the " +
        "current partition locations, which this op would replace " +
        "wholesale — unpin them first; nothing was changed")
  }

  /** TIME-TRAVEL read of a pinned snapshot's posting rows: one
    * explicit-schema read per parent directory over exactly the pinned
    * locations (basePath recovers the `bkt_pfx` partition column) — the
    * same bytes every time, however far the live table has flipped past
    * them. Loud on an unknown pin.
    */
  def loadInvertedPinned(spark: SparkSession, table: String,
      name: String, prefixes: Option[Seq[String]] = None): DataFrame = {
    // one point read of pin-<name> — never a list-and-parse of every pin
    // on the serve path; the full listing is error-path only
    val all = pinInventory(spark, table, name).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot pin '$name' on $table (pins: " +
          s"${pinsInverted(spark, table).keys.toSeq.sorted.mkString(", ")})"))
    // point-query shape: the inventory carries each file's bkt_pfx, so a
    // probed read subsets the FILE LIST on the driver (string ops over
    // the inventory) before any reader is built — the pinned twin of the
    // live scan's PartitionFilters, without handing Spark thousands of
    // never-matching files to plan over
    require(all.nonEmpty, s"pin '$name' on $table lists no files")
    val files = prefixes.fold(all)(ps => all.filter(f => ps.contains(f._1)))
    val fs = fsOf(spark, table)
    val dataSchema = spark.read.parquet(
      new org.apache.hadoop.fs.Path(new java.net.URI(all.head._2)).toString)
      .schema
    if (files.isEmpty) // no pinned file under the probed prefixes: a
      // legitimately empty match, same contract as the live scan
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        dataSchema.add("bkt_pfx", org.apache.spark.sql.types.StringType))
    // basePath = the pinned file's grandparent (tableDir or a _gen-N
    // under it) recovers the bkt_pfx partition column from the path
    files.map { case (_, f) =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(new java.net.URI(f))) }
      .groupBy(_.getParent.getParent.toString).toSeq.sortBy(_._1)
      .map { case (base, paths) =>
        spark.read.option("basePath", base)
          .schema(dataSchema.add("bkt_pfx", org.apache.spark.sql.types.StringType))
          .parquet(paths.map(_.toString): _*)
      }.reduce(_.unionByName(_))
  }

  /** The pinned supersession cutoffs plus their on-disk byte size — the
    * pin-time dirty log's newest append seq per id, sized like
    * [[supersessionCutoffsSized]] so the serve applies the same broadcast
    * budget (None when the log was empty at pin time: the table was
    * compaction-clean, winners resolve by max seq alone).
    */
  def pinnedCutoffsSized(spark: SparkSession, table: String,
      name: String): Option[(DataFrame, Long)] = {
    import org.apache.spark.sql.functions._
    val p = new org.apache.hadoop.fs.Path(pinsDir(spark, table), s"log-$name")
    val fs = fsOf(spark, table)
    if (!fs.exists(p)) None
    else Some((spark.read.parquet(p.toString)
      .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__cut")),
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum))
  }

  /** The pinned `_hot` occupancy list — the hot-skip policy frozen with
    * the data it was computed over (empty when the table had no hot
    * stats at pin time).
    */
  def pinnedHotBuckets(spark: SparkSession, table: String,
      name: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(pinsDir(spark, table), s"hot-$name")
    if (!fsOf(spark, table).exists(p)) Set.empty
    else spark.read.parquet(p.toString).select("bucket")
      .collect().map(_.getString(0)).toSet
  }

  /** MATERIALIZE a named snapshot as a standalone inverted table at
    * `destTable` — the escape hatch the save/relayout refusals point at:
    * export + unpin, and the long-lived snapshot stops holding the live
    * table's generations. The export is the SERVED state of the pin —
    * pinned supersession cutoffs applied, newest surviving version per
    * id, LIVE tombstones applied (takedown compliance travels with the
    * copy) — regrouped to (id, signature, bucket_ids, seq) rows and
    * written through the canonical [[saveInverted]] path with the source
    * table's meta, so the standalone table's layout, id-map, and hot
    * stats are correct by construction. One O(snapshot) distributed
    * write — the only time a snapshot costs data movement, paid exactly
    * when the operator chooses durability over zero-copy.
    */
  def exportPinned(spark: SparkSession, table: String, name: String,
      destTable: String): Unit = {
    import org.apache.spark.sql.functions._
    val meta = invertedMeta(spark, table)
    val pinned = loadInvertedPinned(spark, table, name)
      .where(col("bkt_pfx") =!= TombstonePrefix)
    val cut = pinnedCutoffsSized(spark, table, name).map(_._1)
    val fresh = cut.fold(pinned)(c =>
      pinned.join(broadcast(c), Seq(Cols.Id), "left_outer")
        .where(col("__cut").isNull || col("ingest_seq") >= col("__cut"))
        .drop("__cut"))
    // winner per id, regrouped to the save shape: buckets fold per
    // (id, seq) version first, then the newest version wins — the
    // signature and bucket set ride the winning seq together
    val perVersion = fresh.groupBy(col(Cols.Id), col("ingest_seq"))
      .agg(first(col(Cols.Signature)).as(Cols.Signature),
        collect_set(col("bucket")).as(Cols.BucketIds))
    val winners = perVersion.groupBy(col(Cols.Id))
      .agg(max_by(struct(col(Cols.Signature), col(Cols.BucketIds)),
          col("ingest_seq")).as("__w"),
        max(col("ingest_seq")).as("ingest_seq"))
      .select(col(Cols.Id), col(s"__w.${Cols.Signature}").as(Cols.Signature),
        col(s"__w.${Cols.BucketIds}").as(Cols.BucketIds), col("ingest_seq"))
    // LIVE tombstones: a takedown excludes its id from the export unless
    // a pinned posting outranks the marker (the serve rule, verbatim)
    val tomb = loadInverted(spark, table)
      .where(col("bkt_pfx") === TombstonePrefix)
      .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__tomb_seq"))
    val served = winners
      .join(broadcast(tomb), Seq(Cols.Id), "left_outer")
      .where(col("__tomb_seq").isNull || col("__tomb_seq") < col("ingest_seq"))
      .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds),
        col("ingest_seq"))
    saveInverted(served, destTable, meta.prefixLen, meta.hotThreshold,
      meta.numBuckets, meta.swap, meta.idMapBuckets, meta.hotMode)
  }

  /** Everything the index stores about the given document ids — the
    * AUDIT lookup a takedown pipeline needs ("which buckets does doc X
    * still post to, at which seqs, and is there a marker?"): one row per
    * stored posting/marker, `(id, ingest_seq, bucket, bkt_pfx)` with a
    * null bucket marking tombstones. Pre-compaction this includes
    * superseded rows — that is the point: the audit shows physical
    * state, serving semantics (winner/marker resolution) live in the
    * query paths.
    *
    * Cost shape: the posting table is partitioned by bucket PREFIX, so an
    * id lookup against it would scan everything; the maintenance id-map
    * is partitioned by id HASH, so the DATA rows come from the ≤ |ids|
    * touched `idh=` partitions — the same bound as a compaction decision.
    * MARKER rows come from the table's own tombstone partition instead
    * (one partition-pruned read of the takedown-sized `zz` directory):
    * the id-map's marker mirrors are subject to [[pruneIdMapMarkers]]
    * retention, and a compliance audit must keep seeing a delete after
    * its mirror aged out. Requires the maintained layout (the id-map
    * exists exactly when `ingest_seq` does).
    */
  def postingsOf(spark: SparkSession, table: String,
      ids: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val idMapDir = idMapPath(spark, table)
    require(fsOf(spark, table).exists(idMapDir),
      s"$table has no maintenance id-map — postingsOf needs the " +
        "seq-carrying layout (saveInverted over an ingest_seq column)")
    val meta = invertedMeta(spark, table)
    // the touched partitions come from the SAME Spark expression the write
    // side partitions with (pmod(hash(id), buckets)) — a driver-side
    // re-implementation of the hash could silently diverge on a Spark
    // upgrade or id-type change and make this audit primitive return
    // empty rows, the worst failure mode a verification tool can have
    import spark.implicits._
    val touched = ids.toDF(Cols.Id)
      .select(pmod(hash(col(Cols.Id)), lit(meta.idMapBuckets)))
      .distinct().collect().map(_.getInt(0)).toSeq
    val data = spark.read.parquet(idMapDir.toString)
      .where(col("idh").isin(touched: _*))
      .where(col(Cols.Id).isin(ids: _*))
      .where(col("bkt_pfx") =!= TombstonePrefix)
      .select(col(Cols.Id), col("ingest_seq"), col("bucket"), col("bkt_pfx"))
    val markers = loadInverted(spark, table)
      .where(col("bkt_pfx") === TombstonePrefix) // one pruned directory
      .where(col(Cols.Id).isin(ids: _*))
      .select(col(Cols.Id), col("ingest_seq"),
        col("bucket").cast("string").as("bucket"), col("bkt_pfx"))
    data.unionByName(markers)
  }

  /** Drop tombstone-marker MIRROR rows with `ingest_seq` < `horizon` from
    * the maintenance id-map — the retention pass that stops a delete-heavy
    * table's id-map from growing with total deletes EVER. The markers in
    * the TABLE's tombstone partition are never touched (they are the
    * serving guard and the compliance record), and serving never reads the
    * id-map — so even a violated horizon cannot resurrect a deleted id at
    * serve time: the newest table marker still outranks any replayed
    * pre-delete batch at every query. What the horizon DOES bound is
    * physical garbage collection — a pre-delete batch replayed below a
    * pruned marker keeps its rows on disk (the compaction decision no
    * longer sees the marker outranking them) while remaining
    * serve-invisible forever. Set `horizon` at or below the oldest seq
    * the ingestion layer could still redeliver (e.g. the streaming
    * checkpoint's committed watermark).
    *
    * Cost: one narrow scan of the id-map's marker rows to find the
    * affected partitions, then a rewrite of ONLY those (≤ idMapBuckets,
    * usually far fewer — delete-heavy ids hash into a stable subset).
    */
  def pruneIdMapMarkers(spark: SparkSession, table: String,
      horizon: Long): Unit = {
    import org.apache.spark.sql.functions._
    val idMapDir = idMapPath(spark, table)
    val fs = fsOf(spark, table)
    if (!fs.exists(idMapDir)) return
    Fence.begin(spark, tablePath(spark, table).toString) // retention claims
    val idMap = spark.read.parquet(idMapDir.toString)
    val stale = col("bkt_pfx") === TombstonePrefix && col("ingest_seq") < horizon
    val touched = idMap.where(stale)
      .select(col("idh")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val tableDir = tablePath(spark, table)
    val mapStage = new org.apache.hadoop.fs.Path(
      tableDir.getParent, table.toLowerCase + "__idmap_stage")
    fs.delete(mapStage, true)
    idMap.where(col("idh").isin(touched: _*))
      .where(!stale)
      .repartition(col("idh"))
      .write.mode(SaveMode.Overwrite).partitionBy("idh")
      .parquet(mapStage.toString)
    touched.foreach { h =>
      val src = new org.apache.hadoop.fs.Path(mapStage, s"idh=$h")
      val dst = new org.apache.hadoop.fs.Path(idMapDir, s"idh=$h")
      fs.delete(dst, true)
      if (fs.exists(src)) { fs.rename(src, dst); () }
    }
    fs.delete(mapStage, true); ()
  }

  /** The MAINTENANCE DEBT of a maintained inverted table — the signal a
    * backlog-aware compaction trigger needs, now that serving is exact on
    * arrival and compaction is purely a cost operation. One row:
    *
    *  - `log_files` / `log_bytes`: the dirty log's accretion — bytes is
    *    the serve path's broadcast-budget signal (the cutoff join degrades
    *    to a shuffle past `graft.serve.cutoffBroadcastMaxBytes`), files is
    *    the per-serve footer-open count (self-compacts past the
    *    [[LogCompactFileCount]] trigger);
    *  - `backlog_ids`: distinct ids appended since the last compaction —
    *    the cutoff frame's row count;
    *  - `dead_postings`: rows a compaction would physically drop as
    *    superseded (delta ids' rows below their winning seq) — the space
    *    and scan-waste reclaim on the table.
    *
    * Cost shape is the compaction DECISION's: the log plus only the
    * touched id-map partitions — O(delta), so the report is cheap enough
    * to poll. Trigger recipe: compact when `log_bytes` approaches the
    * serve broadcast budget (keeps the cutoff join broadcast), or when
    * `dead_postings / live rows` passes the space-amplification target
    * (e.g. 10%), whichever first; `tools/debt_drive.scala` drives the
    * loop under continuous ingest.
    */
  def maintenanceDebt(spark: SparkSession, table: String,
      withFileCounts: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val meta = invertedMeta(spark, table)
    val fs = fsOf(spark, table)
    val logDir = dirtyLogPath(spark, table)
    // OPT-IN (one listStatus per partition, bounded by 16^prefixLen —
    // a real cost at prefixLen 4, so the default poll stays O(delta)):
    // the PURE-APPEND path's physical debt, invisible to every other
    // signal here — appends land one file per touched partition per
    // batch and only a rewrite folds them, so the max per-partition
    // parquet-file count is what drives compactInverted's
    // maxFilesPerDir trigger
    def dataFilesMax: Long =
      if (!withFileCounts) -1L
      else partitionFileCounts(spark, table).map(_._2.toLong)
        .foldLeft(0L)(math.max)
    val files =
      if (!fs.exists(logDir)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(logDir).filter(_.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty)
      return Seq((0, 0L, 0L, 0L, dataFilesMax))
        .toDF("log_files", "log_bytes", "backlog_ids", "dead_postings",
          "data_files_max")
    val log = spark.read.parquet(logDir.toString).select(col(Cols.Id)).distinct()
    val backlog = log.count()
    val touched = log
      .select(pmod(hash(col(Cols.Id)), lit(meta.idMapBuckets)).as("idh"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val hist = spark.read.parquet(idMapPath(spark, table).toString)
      .where(col("idh").isin(touched: _*))
      .join(log, Seq(Cols.Id), "left_semi")
    val w = hist.groupBy(col(Cols.Id))
      .agg(max(col("ingest_seq")).as("__wseq"))
    val dead = hist.join(w, Seq(Cols.Id))
      .where(col("ingest_seq") < col("__wseq") &&
        col("bkt_pfx") =!= TombstonePrefix)
      .count()
    Seq((files.length, files.map(_.getLen).sum, backlog, dead, dataFilesMax))
      .toDF("log_files", "log_bytes", "backlog_ids", "dead_postings",
        "data_files_max")
  }

  /** The SNAPSHOT-RETENTION debt of an inverted table — the pin twin of
    * [[maintenanceDebt]]: long-lived pins block whole-table writers and
    * hold replaced locations out of gc BY DESIGN, and this is the signal
    * that turns OPERATIONS.md's "never leave a pin behind" rule from a
    * documentation convention into a pollable number. One row:
    *
    *  - `pins`: named snapshots currently held;
    *  - `oldest_pin` / `oldest_pin_age_claims`: the stalest pin and its
    *    age in WRITER CLAIMS (the table's fence epoch now minus at pin
    *    time — one unit per append/compaction/takedown/relayout, never
    *    wall clock; −1 with no pins or under a pre-header pin);
    *  - `retained_locations`: partition directories (generation children
    *    and replaced base dirs) no catalog partition references — the
    *    storage gc is holding for pins, reclaimed at the first
    *    maintenance head after the last unpin.
    *
    * Cost shape: one point read per pin file, one listing per generation
    * directory plus the table root — metadata-only, poll-friendly.
    * Trigger recipe: alert when `oldest_pin_age_claims` passes the
    * maintenance-interval budget (a pin older than N compaction passes
    * is a forgotten pin, not a training run) or when
    * `retained_locations` grows past the space-amplification target.
    */
  def snapshotDebt(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, table)
    val pd = pinsDir(spark, table)
    val names =
      if (!fs.exists(pd)) Seq.empty[String]
      else fs.listStatus(pd).map(_.getPath.getName)
        .filter(_.startsWith("pin-")).map(_.stripPrefix("pin-")).toSeq
    val cur = Fence.current(spark, fenceDirOf(spark, table))
    val ages = names.map(n =>
      n -> pinClaimEpoch(spark, table, n).map(cur - _).getOrElse(-1L))
    val (oldestName, oldestAge) =
      if (ages.isEmpty) (None: Option[String], -1L)
      else { val (n, a) = ages.maxBy(_._2); (Some(n), a) }
    val tableDir = tablePath(spark, table)
    val liveLocs = spark.sessionState.catalog
      .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .map(p => fs.makeQualified(
        new org.apache.hadoop.fs.Path(new java.net.URI(p.location.toString))))
      .toSet
    val retained = fs.listStatus(tableDir).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(Generations.Prefix))
        fs.listStatus(st.getPath).map(_.getPath) // per-child: gens can be partially live
      else if (n.startsWith("bkt_pfx=")) Array(st.getPath)
      else Array.empty[org.apache.hadoop.fs.Path]
    }.count(p => !liveLocs.contains(fs.makeQualified(p))).toLong
    Seq((names.size, oldestName, oldestAge, retained))
      .toDF("pins", "oldest_pin", "oldest_pin_age_claims",
        "retained_locations")
  }

  /** Parquet-file count per live partition, CATALOG-resolved — a
    * manifest-flipped partition counts its current generation directory,
    * not the stale base one. One listStatus per partition (bounded by
    * 16^prefixLen); callers opt in.
    */
  private def partitionFileCounts(spark: SparkSession,
      table: String): Seq[(String, Int)] = {
    val fs = fsOf(spark, table)
    spark.sessionState.catalog
      .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .map { p =>
        val loc = new org.apache.hadoop.fs.Path(
          new java.net.URI(p.location.toString))
        val n =
          if (!fs.exists(loc)) 0
          else fs.listStatus(loc)
            .count(_.getPath.getName.endsWith(".parquet"))
        (p.spec("bkt_pfx"), n)
      }
  }

  /** OPT-IN reconciliation of the maintenance side state — the loud
    * escape hatch for a violated append-replay contract:
    * [[appendInverted]]'s three writes (posting table, id-map, dirty log)
    * are not atomic, and a caller that swallows a failure after the table
    * write landed leaves superseded rows invisible to both the O(delta)
    * compaction decision and the supersession cutoff — silently. This
    * cross-checks the DATA-row multiset — (id, seq, bucket) with
    * occurrence counts — between the table and the id-map and throws with
    * samples on any divergence, so a periodic (or pre-compaction) run
    * turns the silent drift into an operational alarm; re-seed via
    * [[relayoutInverted]] (or a save) to repair. Tombstone markers are
    * excluded: [[pruneIdMapMarkers]] drops their mirrors by design. One
    * narrow O(table) scan — the price of distrust, paid only when asked.
    */
  def verifyMaintState(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions._
    val idMapDir = idMapPath(spark, table)
    require(fsOf(spark, table).exists(idMapDir),
      s"$table has no maintenance id-map — nothing to reconcile")
    def counts(df: DataFrame): DataFrame = df
      .where(col("bkt_pfx") =!= TombstonePrefix)
      .groupBy(col(Cols.Id), col("ingest_seq"), col("bucket"))
      .count()
    val diff = counts(spark.table(table)).withColumnRenamed("count", "__t")
      .join(counts(spark.read.parquet(idMapDir.toString))
        .withColumnRenamed("count", "__m"),
        Seq(Cols.Id, "ingest_seq", "bucket"), "full_outer")
      .where(col("__t").isNull || col("__m").isNull || col("__t") =!= col("__m"))
    val sample = diff.limit(5).collect()
    if (sample.nonEmpty)
      throw new IllegalStateException(
        s"maintenance id-map of $table diverges from the table — a crashed " +
          "append was not replayed whole (appendInverted's contract); " +
          "sample (id, seq, bucket, tableCount, idMapCount): " +
          sample.map(_.toSeq.mkString("(", ", ", ")")).mkString(" "))
  }

  /** FULL recompute of the `_hot` occupancy side file when the table's
    * meta asks for hot-bucket stats (threshold ≥ 0). One narrow aggregate
    * over the bucket column of the WHOLE table (tombstone markers don't
    * count) — the O(table) form, paid only where an O(table) event just
    * happened anyway ([[saveInverted]], [[relayoutInverted]] via save, or
    * a [[mergeHotStats]] whose delta overflowed [[HotMergeCandidateCap]]).
    * Routine maintenance goes through the incremental merge instead.
    * Absorbs (and clears) the `_graft_hotdelta/` append log.
    */
  def refreshHotStats(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions._
    readMeta(spark, table).filter(_.hotThreshold >= 0L).foreach { m =>
      val sc = spark.sparkContext
      sc.setJobDescription("graft-hot-refresh-full")
      try {
        val counts = spark.table(table)
          .where(col("bkt_pfx") =!= TombstonePrefix)
          .groupBy(col("bucket").cast("string").as("bucket")).count()
        if (m.hotMode == HotCms) {
          // the O(table) event resets the sketch to EXACT per-bucket
          // counts (accumulated over-estimates clear here); hot
          // membership comes from the sketch's own estimates so the
          // serve-time policy and the maintained state can never
          // disagree on which side of the threshold a bucket sits
          val matrix = cmsCellsOf(counts.withColumnRenamed("count", "cnt"))
          writeHotCms(spark, table, matrix)
          val hot = cmsEstimates(spark, counts.select(col("bucket")),
              readHotCms(spark, table))
            .where(col("est") > m.hotThreshold)
            .select(col("bucket"), col("est").as("count"))
          writeHotFile(spark, table, hot)
        } else {
          writeHotFile(spark, table, counts.where(col("count") > m.hotThreshold))
        }
      } finally sc.setJobDescription(null)
    }
    // every delta is absorbed in the recount; clear AFTER the rename so a
    // crash in between just re-merges (the merge recounts, never adds)
    fsOf(spark, table).delete(hotDeltaPath(spark, table), true)
  }

  /** INCREMENTAL `_hot` update — the maintenance-point twin of
    * [[refreshHotStats]] whose reads track the DELTA, not the table:
    *
    *  - buckets that gained rows since the last merge are exactly the
    *    `_graft_hotdelta/` log's buckets (appends record their per-bucket
    *    delta; nothing else adds physical rows) — each candidate is
    *    recounted EXACTLY via the point-query read shape (partition
    *    literals on the candidate prefixes + a pushed bucket-IN, so the
    *    scan touches matching row groups, not the table);
    *  - partitions the compaction just REWROTE (`rewritten`) are the only
    *    places rows can have dropped — they are recounted exactly, a read
    *    already bounded by the compaction's own delta-proportional
    *    argument;
    *  - every other `_hot` entry is carried over unchanged (its partition
    *    kept its files and its bucket gained nothing).
    *
    * Recount-based rather than add-based, so a crash between the `_hot`
    * rename and the delta-log clear re-merges idempotently (an add-based
    * merge would double-count the replayed delta). A delta wider than
    * [[HotMergeCandidateCap]] distinct buckets falls back to the full
    * recount — at that width the "delta" is a table-sized event anyway.
    */
  def mergeHotStats(spark: SparkSession, table: String,
      rewritten: Set[String]): Unit = {
    import org.apache.spark.sql.functions._
    val metaOpt = readMeta(spark, table).filter(_.hotThreshold >= 0L)
    if (metaOpt.isEmpty) return
    val m = metaOpt.get
    val fs = fsOf(spark, table)
    val deltaDir = hotDeltaPath(spark, table)
    val hasDelta = fs.exists(deltaDir) &&
      fs.listStatus(deltaDir).exists(_.getPath.getName.endsWith(".parquet"))
    if (!hasDelta && rewritten.isEmpty) return // nothing can have moved
    val sc = spark.sparkContext
    sc.setJobDescription("graft-hot-refresh")
    if (m.hotMode == HotCms) {
      // SKETCH merge: reads the ~128 KB matrix and the delta log ONLY —
      // never a posting file, however boiler-heavy the delta. Additive
      // fold (delta counts into the matrix), then estimate exactly the
      // delta's buckets against the merged matrix; hot entries are
      // monotone between O(table) refreshes (rewrites not subtracted —
      // the documented one-sided band), so carried entries stay.
      try {
        if (hasDelta) {
          val deltaAgg = spark.read.parquet(deltaDir.toString)
            .groupBy(col("bucket").cast("string").as("bucket"))
            .agg(sum(col("count")).as("cnt"))
          val merged = readHotCms(spark, table)
            .unionByName(cmsCellsOf(deltaAgg))
            .groupBy(col("r"), col("cell")).agg(sum(col("v")).as("v"))
          writeHotCms(spark, table, merged)
          val newlyHot = cmsEstimates(spark, deltaAgg.select(col("bucket")),
              readHotCms(spark, table))
            .where(col("est") > m.hotThreshold)
            .select(col("bucket"), col("est").as("count"))
          val hotDest = new org.apache.hadoop.fs.Path(
            tablePath(spark, table), "_hot")
          val carried =
            if (!fs.exists(hotDest)) newlyHot
            else spark.read.parquet(hotDest.toString)
              .select(col("bucket"), col("count"))
              .join(newlyHot.select(col("bucket")), Seq("bucket"), "left_anti")
              .unionByName(newlyHot)
          writeHotFile(spark, table, carried)
        }
      } finally sc.setJobDescription(null)
      fs.delete(deltaDir, true)
      return
    }
    try {
      val cands: Option[Set[String]] =
        if (!hasDelta) Some(Set.empty)
        else {
          val rows = spark.read.parquet(deltaDir.toString)
            .select(col("bucket")).distinct()
            .limit(HotMergeCandidateCap + 1).collect()
          if (rows.length > HotMergeCandidateCap) None
          else Some(rows.map(_.getString(0)).toSet)
        }
      cands match {
        case None =>
          sc.setJobDescription(null)
          refreshHotStats(spark, table) // table-sized delta: recount all
        case Some(candSet) =>
          val cur = spark.table(table)
            .where(col("bkt_pfx") =!= TombstonePrefix)
          def over(df: DataFrame): DataFrame =
            df.groupBy(col("bucket").cast("string").as("bucket")).count()
              .where(col("count") > m.hotThreshold)
          val candOutside = candSet.filterNot(b =>
            rewritten.contains(b.substring(0, math.min(m.prefixLen, b.length))))
          val candPrefixes = candOutside
            .map(b => b.substring(0, math.min(m.prefixLen, b.length))).toSeq
          val parts = Seq(
            if (rewritten.isEmpty) None
            else Some(over(cur.where(col("bkt_pfx").isin(rewritten.toSeq: _*)))),
            if (candOutside.isEmpty) None
            else Some(over(cur
              .where(col("bkt_pfx").isin(candPrefixes: _*))        // PartitionFilters
              .where(col("bucket").isin(candOutside.toSeq: _*))))  // PushedFilters
          ).flatten
          val hotDest = new org.apache.hadoop.fs.Path(
            tablePath(spark, table), "_hot")
          val carried =
            if (!fs.exists(hotDest)) None
            else Some(spark.read.parquet(hotDest.toString)
              .where(!col("bucket").isin(candSet.toSeq: _*))
              .where(!substring(col("bucket"), 1, m.prefixLen)
                .isin(rewritten.toSeq: _*)))
          val pieces = parts ++ carried
          if (pieces.nonEmpty)
            writeHotFile(spark, table, pieces.reduce(_ unionByName _))
      }
    } finally sc.setJobDescription(null)
    // clears LAST: a crash above re-merges idempotently from the log
    fs.delete(deltaDir, true); ()
  }

  /** Sparse CMS cells of a (bucket, cnt) frame: one (r, cell, v) row per
    * occupied counter, hashed with the byte-exact
    * [[graft.functions.CountMinAgg]] rule (uint32 of the first 8 md5 hex
    * chars of "r:bucket", mod width) — DuckDB-replayable, the repo's
    * oracle idiom.
    */
  private def cmsCellsOf(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    counts.select(
        explode(array((0 until HotCmsDepth).map(lit): _*)).as("r"),
        col("bucket"), col("cnt"))
      .withColumn("cell",
        conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("bucket"))), 1, 8), 16, 10).cast("long") % HotCmsWidth)
      .groupBy(col("r"), col("cell")).agg(sum(col("cnt")).as("v"))
  }

  /** Point-query estimates for `buckets` (one column `bucket`) against a
    * sparse (r, cell, v) matrix: min over the depth rows, absent cells
    * reading 0 (possible only when the bucket was never counted).
    */
  private def cmsEstimates(spark: SparkSession, buckets: DataFrame,
      matrix: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    buckets.distinct()
      .select(col("bucket"),
        explode(array((0 until HotCmsDepth).map(lit): _*)).as("r"))
      .withColumn("cell",
        conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("bucket"))), 1, 8), 16, 10).cast("long") % HotCmsWidth)
      .join(broadcast(matrix), Seq("r", "cell"), "left_outer")
      .groupBy(col("bucket"))
      .agg(min(coalesce(col("v"), lit(0L))).as("est"))
  }

  private def hotCmsPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_hotcms")

  private def readHotCms(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(hotCmsPath(spark, table).toString)

  /** Stage → rename the `_hotcms` sparse matrix, like the `_hot` file. */
  private def writeHotCms(spark: SparkSession, table: String,
      matrix: DataFrame): Unit = {
    val dir = tablePath(spark, table)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(dir.getParent,
      table.toLowerCase + "__hotcms_stage")
    matrix.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dest = hotCmsPath(spark, table)
    fs.delete(dest, true)
    fs.rename(tmp, dest); ()
  }

  /** Stage → rename the `_hot` side file: it must never be half-written
    * while a concurrent point query reads it.
    */
  private def writeHotFile(spark: SparkSession, table: String,
      hot: DataFrame): Unit = {
    val dir = tablePath(spark, table)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(dir.getParent, table.toLowerCase + "__hot_stage")
    hot.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(dir, "_hot")
    fs.delete(dest, true)
    fs.rename(tmp, dest); ()
  }

  /** Bucket values the `_hot` stats file marks as over-occupied — empty
    * when the table keeps no stats. Bounded: only buckets ABOVE the
    * threshold are recorded (the hot list is the stop-word tail, not a
    * per-bucket histogram of the corpus).
    */
  def hotBuckets(spark: SparkSession, table: String): Set[String] = {
    val dir = new org.apache.hadoop.fs.Path(tablePath(spark, table), "_hot")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Set.empty
    else spark.read.parquet(dir.toString).select("bucket")
      .collect().map(_.getString(0)).toSet
  }

  /** Load the inverted posting table written by [[saveInverted]] — from
    * this session's catalog when registered, else straight from its
    * warehouse directory (the COLD-START path: an in-memory catalog
    * forgets tables between JVMs but the managed directory survives).
    * The directory read pins an EXPLICIT schema — data columns from one
    * parquet footer plus `bkt_pfx` as STRING — so hex prefixes like "00"
    * can't be inferred as INT 0 (which would break string prefix
    * pruning), without toggling any session-global inference conf.
    * Caveat: the directory fallback serves POINT queries at full fidelity
    * (partition pruning rides the explicit schema) but cannot expose a
    * `numBuckets` table's file bucketing — exchange-free batch
    * co-location needs a catalog entry, i.e. a persistent metastore in
    * deployment (tools/derby_serving_drive{,2}.scala is that shape) —
    * and REFUSES a [[SwapManifest]] table (its live partition locations
    * exist only in the catalog; a path listing would resurrect replaced
    * generations).
    */
  def loadInverted(spark: SparkSession, table: String): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else {
      require(readMeta(spark, table).forall(_.swap != SwapManifest),
        s"$table compacts under the manifest swap strategy: its live " +
          "partition locations are catalog metadata, so a catalog-less " +
          "directory read could serve replaced generations — use a " +
          "persistent metastore for manifest-mode serving")
      val dir = tablePath(spark, table)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val leaf = fs.listStatus(dir)
        .find(s => s.isDirectory && s.getPath.getName.startsWith("bkt_pfx="))
        .getOrElse(throw new IllegalArgumentException(
          s"$table: no catalog entry and no partition directories under $dir"))
      val dataSchema = spark.read.parquet(leaf.getPath.toString).schema
      spark.read
        .schema(dataSchema.add("bkt_pfx", org.apache.spark.sql.types.StringType))
        .parquet(dir.toString)
    }

  /** The layout meta persisted beside an inverted table's data, or None
    * for a table predating the meta convention.
    */
  def readMeta(spark: SparkSession, table: String): Option[InvertedMeta] = {
    val p = metaPath(spark, table)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      def field(k: String): Option[String] =
        (s""""$k"\\s*:\\s*(-?\\d+)""".r).findFirstMatchIn(txt).map(_.group(1))
      val swap = ("\"swap\"\\s*:\\s*\"(\\w+)\"".r).findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse(SwapRename)
      val hotMode = ("\"hotMode\"\\s*:\\s*\"(\\w+)\"".r).findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse(HotExact)
      Some(InvertedMeta(
        field("prefixLen").map(_.toInt).getOrElse(2),
        field("hotThreshold").map(_.toLong).getOrElse(-1L),
        field("numBuckets").map(_.toInt).getOrElse(0),
        swap,
        field("idMapBuckets").map(_.toInt).getOrElse(IdMapBuckets),
        hotMode))
    }
  }

  /** The directory whose [[Fence]] epoch governs this table's writers —
    * a second pipeline (or a spec) claims the table via
    * `Fence.begin(spark, IndexStore.fenceDirOf(spark, table))`, which
    * fences out every in-flight staged op's commit.
    */
  def fenceDirOf(spark: SparkSession, table: String): String =
    tablePath(spark, table).toString

  /** The meta for a table that must have one — serving paths derive their
    * partition-probe width from here instead of trusting a caller.
    */
  def invertedMeta(spark: SparkSession, table: String): InvertedMeta =
    readMeta(spark, table).getOrElse(throw new IllegalArgumentException(
      s"$table carries no _graft_meta.json — not an inverted posting table " +
        "written by IndexStore.saveInverted/appendInverted"))

  private def writeMeta(spark: SparkSession, table: String, m: InvertedMeta): Unit = {
    val p = metaPath(spark, table)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      (s"""{"prefixLen":${m.prefixLen},"hotThreshold":${m.hotThreshold},""" +
        s""""numBuckets":${m.numBuckets},"swap":"${m.swap}",""" +
        s""""idMapBuckets":${m.idMapBuckets},"hotMode":"${m.hotMode}"}""")
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def metaPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_meta.json")

  private def idMapPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_idmap")

  private def dirtyLogPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_dirtylog")

  private def hotDeltaPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_hotdelta")

  private def fsOf(spark: SparkSession, table: String): org.apache.hadoop.fs.FileSystem =
    tablePath(spark, table).getFileSystem(spark.sessionState.newHadoopConf())

  /** The table's directory as a Hadoop path (catalog location when
    * registered, warehouse convention otherwise) — filesystem-agnostic,
    * unlike [[warehouseLocation]]'s local-file form.
    */
  private def tablePath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    if (spark.catalog.tableExists(table))
      new org.apache.hadoop.fs.Path(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
    else new org.apache.hadoop.fs.Path(warehouseLocation(spark, table).getAbsolutePath)

  /** Append a micro-batch to a bucketed index table (the streaming
    * ingestion sink shape): every append lands new small files in each
    * bucket, preserving the shuffle-free join property but growing the
    * file count linearly with append cadence — [[compact]] is the
    * maintenance step that bounds it.
    */
  def appendBucketed(df: DataFrame, table: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, Cols.Id)
      .sortBy(Cols.Id)
      .format("parquet")
      .saveAsTable(table)

  /** The bucket count recorded in the catalog for `table` — compaction
    * derives it instead of trusting a caller parameter: a wrong constant
    * would silently re-bucket the table, breaking the co-located
    * shuffle-free joins against every side bucketed to the original spec.
    */
  def bucketCountOf(spark: SparkSession, table: String): Int =
    spark.sql(s"DESCRIBE FORMATTED $table").collect()
      .collectFirst {
        case r if r.getString(0).trim == "Num Buckets" => r.getString(1).trim.toInt
      }
      .getOrElse(throw new IllegalArgumentException(
        s"$table has no bucket spec — compact only applies to bucketed index tables"))

  /** Compact an append-log index table: drop superseded signatures (for
    * each id keep the row with the highest `seqCol` — later re-ingests of
    * a changed document supersede earlier ones) and merge each bucket's
    * small append files into ONE file (repartition by the bucketing key
    * with `buckets` tasks aligns writer tasks to buckets, so the rewritten
    * table holds exactly `buckets` data files). The bucket count comes
    * from the table's own catalog spec.
    *
    * The rewrite lands in `<table>_compact_tmp`, then swaps in via
    * DROP + ALTER TABLE RENAME (the catalog-pointer swap — no second data
    * write). The swap window is metadata-only; if a crash lands inside
    * it, the fully-written tmp table is the recovery point (rename it to
    * `table` by hand). Data movement: one decision-sized shuffle keyed on
    * id (max_by per id) — signatures ride it exactly once.
    */
  def compact(spark: SparkSession, table: String,
      seqCol: String = "ingest_seq"): Unit = {
    import org.apache.spark.sql.functions._
    val buckets = bucketCountOf(spark, table)
    val cur = spark.table(table)
    require(cur.columns.contains(seqCol),
      s"compact needs the append-sequence column '$seqCol'")
    val others = cur.columns.toSeq.filterNot(c => c == Cols.Id || c == seqCol)
    val winner = cur.groupBy(col(Cols.Id))
      .agg(max_by(struct((seqCol +: others).map(col): _*), col(seqCol)).as("__w"))
      .select(col(Cols.Id) +: (seqCol +: others).map(c => col(s"__w.$c").as(c)): _*)
      .repartition(buckets, col(Cols.Id))
    val tmp = table + "_compact_tmp"
    reset(spark, tmp)
    saveBucketed(winner, tmp, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Drop `table` AND remove its leftover warehouse directory. The
    * in-memory catalog forgets tables between JVMs but their managed
    * directories survive, and a stale directory makes the next
    * `saveAsTable` CREATE fail — every harness re-build goes through this.
    * The location is resolved from `spark.sql.warehouse.dir` (URI or bare
    * path), not a hardcoded relative `spark-warehouse/`.
    */
  def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = warehouseLocation(spark, table)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  /** The managed-table directory under `spark.sql.warehouse.dir` (URI or
    * bare path — both forms ship depending on how the session was built).
    */
  def warehouseLocation(spark: SparkSession, table: String): java.io.File = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base =
      if (wh.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(wh))
      else java.nio.file.Paths.get(wh)
    base.resolve(table.toLowerCase(java.util.Locale.ROOT)).toFile
  }

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
