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
      numBuckets: Int, swap: String = SwapRename, idMapBuckets: Int = IdMapBuckets)

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
      swapMode: String = SwapRename, idMapBuckets: Int = IdMapBuckets): Unit = {
    val spark = index.sparkSession
    writeInverted(index, table, prefixLen, SaveMode.Overwrite, numBuckets)
    writeMeta(spark, table,
      InvertedMeta(prefixLen, hotBucketThreshold, numBuckets, swapMode, idMapBuckets))
    if (index.columns.contains("ingest_seq")) seedIdMap(spark, table, idMapBuckets)
    refreshHotStats(spark, table)
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
    * aggregate would dominate streaming ingestion at scale) — the `_hot`
    * list updates at the maintenance points, save and compact, so a
    * bucket running hot mid-stream is capped at the next compaction.
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
    try {
      writeInverted(idx, table, m.prefixLen, SaveMode.Append, m.numBuckets)
      if (meta.isEmpty) {
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
            m.idMapBuckets)
        }
      } else if (hasSeq) {
        val fs = fsOf(spark, table)
        if (fs.exists(idMapPath(spark, table)))
          appendMaintLog(spark, table, explodedNarrow(idx, m.prefixLen),
            m.idMapBuckets)
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
    val numBuckets = readMeta(spark, table).map(_.numBuckets).getOrElse(0)
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
      val w = markers.write.mode(SaveMode.Append)
        .partitionBy("bkt_pfx")
        .format("parquet")
      (if (numBuckets > 0) w.bucketBy(numBuckets, "bucket").sortBy("bucket") else w)
        .saveAsTable(table)
      if (fsOf(spark, table).exists(idMapPath(spark, table)))
        appendMaintLog(spark, table,
          markers.select(col(Cols.Id), col("ingest_seq"), col("bucket"),
            col("bkt_pfx")),
          readMeta(spark, table).map(_.idMapBuckets).getOrElse(IdMapBuckets))
    } finally { markers.unpersist(); () }
  }

  private def writeInverted(index: DataFrame, table: String, prefixLen: Int,
      saveMode: SaveMode, numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions._
    val extra = if (index.columns.contains("ingest_seq")) Seq(col("ingest_seq"))
                else Seq.empty
    val w = index.where(col(Cols.Signature).isNotNull)
      .select(col(Cols.Id) +: col(Cols.Signature) +:
        explode(col(Cols.BucketIds)).as("bucket") +: extra: _*)
      .withColumn("bkt_pfx", substring(col("bucket"), 1, prefixLen))
      // align writer tasks to partition dirs: without this every shuffle
      // task writes a sliver into every directory (tasks × dirs files)
      .repartition(col("bkt_pfx"))
      .write.mode(saveMode)
      .partitionBy("bkt_pfx")
      .format("parquet")
    (if (numBuckets > 0) w.bucketBy(numBuckets, "bucket").sortBy("bucket") else w)
      .saveAsTable(table)
  }

  /** The narrow (id, seq, bucket, prefix) projection of an index frame —
    * the id-map/dirty-log row shape of [[appendInverted]]'s delta.
    */
  private def explodedNarrow(index: DataFrame, prefixLen: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    index.where(col(Cols.Signature).isNotNull)
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
      narrow: DataFrame, idMapBuckets: Int): Unit = {
    import org.apache.spark.sql.functions._
    narrow
      .withColumn("idh", pmod(hash(col(Cols.Id)), lit(idMapBuckets)))
      .repartition(col("idh"))
      .write.mode(SaveMode.Append).partitionBy("idh")
      .parquet(idMapPath(spark, table).toString)
    narrow.select(col(Cols.Id), col("ingest_seq")).distinct()
      .coalesce(1)
      .write.mode(SaveMode.Append)
      .parquet(dirtyLogPath(spark, table).toString)
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
      seqCol: String = "ingest_seq"): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains(seqCol),
      s"compactInverted needs the append-sequence column '$seqCol'")
    val meta = readMeta(spark, table)
      .getOrElse(InvertedMeta(2, -1L, 0, SwapRename))
    val tableDir = tablePath(spark, table)
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(
      tableDir.getParent, table.toLowerCase + "__compact_stage")
    val stageTbl = table + "__compact_stage_tbl"
    // recover any crashed previous run FIRST: restore swapped-aside
    // directories whose new copy never landed, then clear the leftovers
    recoverAside(fs, tableDir, asideDir(tableDir, table))
    spark.sql(s"DROP TABLE IF EXISTS $stageTbl")
    fs.delete(stage, true)
    if (meta.swap == SwapManifest) gcStaleGenerations(spark, fs, table, tableDir)

    val sc = spark.sparkContext
    val idMapDir = idMapPath(spark, table)
    val logDir = dirtyLogPath(spark, table)
    // the id-map records the canonical column; a custom seqCol can only
    // come from a table maintained outside this module — full-scan it
    val maintained = seqCol == "ingest_seq" && fs.exists(idMapDir)
    sc.setJobDescription("graft-compact-decision")
    val (dirty, winners, touchedIdh) =
      if (maintained) {
        def noParquet(d: org.apache.hadoop.fs.Path): Boolean = !fs.exists(d) ||
          !fs.listStatus(d).exists { st =>
            st.getPath.getName.endsWith(".parquet") ||
              (st.isDirectory && fs.listStatus(st.getPath)
                .exists(_.getPath.getName.endsWith(".parquet")))
          }
        // empty log = no appends since the last clear; empty id-map = the
        // table has never held a row (an empty cold seed) — either way
        // nothing can be dirty, and reading a file-less dir would fail
        // schema inference
        if (noParquet(logDir) || noParquet(idMapDir)) {
          sc.setJobDescription(null)
          fs.delete(logDir, true)
          refreshHotStats(spark, table)
          return
        }
        val log = spark.read.parquet(logDir.toString)
          .select(col(Cols.Id)).distinct()
        val touched = log
          .select(pmod(hash(col(Cols.Id)), lit(meta.idMapBuckets)).as("idh"))
          .distinct().collect().map(_.getInt(0)).toSeq // bounded: ≤ min(delta, idMapBuckets)
        // full posting history of exactly the delta ids — a partition-
        // pruned read of the narrow id-map, O(touched/64 of the id-map)
        val hist = spark.read.parquet(idMapDir.toString)
          .where(col("idh").isin(touched: _*))
          .join(log, Seq(Cols.Id), "left_semi")
        val w = hist.groupBy(col(Cols.Id))
          .agg(max(col("ingest_seq")).as("__wseq"))
        val superseded = hist.join(w, Seq(Cols.Id))
          .where(col("ingest_seq") < col("__wseq")).select(col("bkt_pfx"))
        val duplicated = hist
          .groupBy(col(Cols.Id), col("ingest_seq"), col("bucket"), col("bkt_pfx"))
          .count().where(col("count") > 1).select(col("bkt_pfx"))
        (superseded.union(duplicated).distinct()
          .collect().map(_.getString(0)).toSet, w, touched)
      } else {
        // LEGACY decision: one narrow scan of the whole table (id, seq,
        // bucket, prefix — parquet column pruning never reads the wide
        // signature column); the collect is bounded by the prefix space
        val w = cur.groupBy(col(Cols.Id)).agg(max(col(seqCol)).as("__wseq"))
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
    if (dirty.isEmpty) {
      sc.setJobDescription(null)
      if (maintained) fs.delete(logDir, true) // appends were clean (pure inserts)
      refreshHotStats(spark, table)
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
      swapPartitions(spark, fs, table, tableDir, stageDst, meta.swap,
        dirty.toSeq.sorted.map(p => (s"bkt_pfx=$p", s"bkt_pfx='$p'")))
      // the id-map compacts in the same pass: rewrite the touched idh
      // partitions to the same winners-only state (always rename-swapped —
      // the id-map is maintenance-internal, no concurrent readers)
      if (maintained && touchedIdh.nonEmpty) {
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
      spark.sql(s"DROP TABLE IF EXISTS $stageTbl")
      if (meta.swap != SwapManifest && asideIsClear(fs, tableDir, table)) {
        fs.delete(stage, true); ()
      }
    }
    spark.catalog.refreshTable(table)
    refreshHotStats(spark, table)
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
          spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($sqlSpec)")
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
    * (`_gen-N`) — monotone by scanning existing names, no wall clock.
    */
  private def nextGenDir(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path = {
    val n = fs.listStatus(tableDir)
      .map(_.getPath.getName)
      .filter(_.startsWith("_gen-"))
      .map(_.stripPrefix("_gen-").toLong)
      .foldLeft(-1L)(math.max) + 1
    new org.apache.hadoop.fs.Path(tableDir, s"_gen-$n")
  }

  /** Drop generation directories (and replaced default-location
    * partition directories) no catalog partition references any more —
    * the [[SwapManifest]] garbage collector. Runs at the head of each
    * compaction, so the PREVIOUS generation survives one full maintenance
    * interval for in-flight readers (two-generation retention).
    */
  private def gcStaleGenerations(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, table: String,
      tableDir: org.apache.hadoop.fs.Path): Unit = {
    val referenced = spark.sessionState.catalog
      .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .map(p => fs.makeQualified(
        new org.apache.hadoop.fs.Path(new java.net.URI(p.location.toString))))
      .toSet
    fs.listStatus(tableDir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("_gen-")) {
        // a generation with NO referenced partition left (all replaced by
        // later flips, or a crashed stage nothing ever adopted) drops
        // whole — including its writer metadata (_SUCCESS)
        if (!fs.listStatus(st.getPath)
            .exists(sub => referenced.contains(fs.makeQualified(sub.getPath)))) {
          fs.delete(st.getPath, true); ()
        } else fs.listStatus(st.getPath).foreach { sub =>
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
    */
  def relayoutInverted(spark: SparkSession, table: String,
      target: InvertedMeta): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains("ingest_seq"),
      "relayoutInverted needs the maintained (ingest_seq-carrying) layout")
    val dir = tablePath(spark, table)
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
    try {
      reset(spark, table)
      saveInverted(
        spark.read.parquet(new org.apache.hadoop.fs.Path(scratch, "postings").toString),
        table, target.prefixLen, target.hotThreshold, target.numBuckets,
        target.swap, target.idMapBuckets)
      val markers = spark.read.parquet(
        new org.apache.hadoop.fs.Path(scratch, "markers").toString)
      if (!markers.isEmpty) appendTombstoneRows(spark, table, markers)
    } finally { fs.delete(scratch, true); () }
  }

  /** The newest APPEND seq per id recorded in the dirty log since the
    * last compaction — the supersession CUTOFF serving paths use to
    * exclude a re-ingested id's stale postings EXACTLY, before any
    * compaction: a data row below its id's cutoff belongs to a superseded
    * version (appends log their (id, seq) AFTER the posting rows land, so
    * a logged cutoff always has its current rows on disk). None when the
    * table has no log or no appends since the last clear — then every
    * stored row is current by the compaction invariant. Broadcast-sized
    * by the same argument as the tombstone partition: it grows with the
    * uncompacted backlog and clears at every compaction.
    */
  def supersessionCutoffs(spark: SparkSession, table: String): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val logDir = dirtyLogPath(spark, table)
    val fs = fsOf(spark, table)
    val has = fs.exists(logDir) &&
      fs.listStatus(logDir).exists(_.getPath.getName.endsWith(".parquet"))
    if (!has) None
    else Some(spark.read.parquet(logDir.toString)
      .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__cut")))
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
    * is partitioned by id HASH, so the read prunes to the ≤ |ids| touched
    * `idh=` partitions — the same bound as a compaction decision.
    * Requires the maintained layout (the id-map exists exactly when
    * `ingest_seq` does).
    */
  def postingsOf(spark: SparkSession, table: String,
      ids: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val idMapDir = idMapPath(spark, table)
    require(fsOf(spark, table).exists(idMapDir),
      s"$table has no maintenance id-map — postingsOf needs the " +
        "seq-carrying layout (saveInverted over an ingest_seq column)")
    val meta = invertedMeta(spark, table)
    val touched = ids.map(id =>
      org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
        id, org.apache.spark.sql.types.LongType, 42) % meta.idMapBuckets)
      .map(h => (if (h < 0) h + meta.idMapBuckets else h).toInt).distinct
    spark.read.parquet(idMapDir.toString)
      .where(col("idh").isin(touched: _*))
      .where(col(Cols.Id).isin(ids: _*))
      .select(col(Cols.Id), col("ingest_seq"), col("bucket"), col("bkt_pfx"))
  }

  /** Recompute the `_hot` occupancy side file when the table's meta asks
    * for hot-bucket stats (threshold ≥ 0). One narrow aggregate over the
    * bucket column only; tombstone markers don't count.
    */
  def refreshHotStats(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions._
    readMeta(spark, table).filter(_.hotThreshold >= 0L).foreach { m =>
      val hot = spark.table(table)
        .where(col("bkt_pfx") =!= TombstonePrefix)
        .groupBy(col("bucket").cast("string").as("bucket")).count()
        .where(col("count") > m.hotThreshold)
      // stage → rename: the hot file must never be half-written while a
      // concurrent point query reads it
      val dir = tablePath(spark, table)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val tmp = new org.apache.hadoop.fs.Path(dir.getParent, table.toLowerCase + "__hot_stage")
      hot.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val dest = new org.apache.hadoop.fs.Path(dir, "_hot")
      fs.delete(dest, true)
      fs.rename(tmp, dest)
    }
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
      Some(InvertedMeta(
        field("prefixLen").map(_.toInt).getOrElse(2),
        field("hotThreshold").map(_.toLong).getOrElse(-1L),
        field("numBuckets").map(_.toInt).getOrElse(0),
        swap,
        field("idMapBuckets").map(_.toInt).getOrElse(IdMapBuckets)))
    }
  }

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
        s""""idMapBuckets":${m.idMapBuckets}}""")
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def metaPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_meta.json")

  private def idMapPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_idmap")

  private def dirtyLogPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_dirtylog")

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
