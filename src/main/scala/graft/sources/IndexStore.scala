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

  /** Layout metadata persisted WITH an inverted posting table (a
    * `_graft_meta.json` file inside the table directory — underscore
    * names are invisible to the table's own file listing, and the file
    * survives appends and compaction because neither moves the
    * directory). `prefixLen` is recorded here rather than trusted from
    * serve-time callers: a mismatched serve-side prefix probes partition
    * values that do not exist and silently returns empty results.
    * `hotThreshold` < 0 means no hot-bucket stats are maintained;
    * `numBuckets` 0 means the posting files are not bucketed.
    */
  final case class InvertedMeta(prefixLen: Int, hotThreshold: Long, numBuckets: Int)

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
    * side against a 100 TB index).
    */
  def saveInverted(index: DataFrame, table: String, prefixLen: Int = 2,
      hotBucketThreshold: Long = -1L, numBuckets: Int = 0): Unit = {
    writeInverted(index, table, prefixLen, SaveMode.Overwrite, numBuckets)
    writeMeta(index.sparkSession, table,
      InvertedMeta(prefixLen, hotBucketThreshold, numBuckets))
    refreshHotStats(index.sparkSession, table)
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
    * The layout (prefix width, bucket spec) comes from the table's own
    * meta file when it exists; `prefixLen` only seeds a table created by
    * a first append (the streaming cold-create path). Hot-bucket stats
    * are NOT refreshed per append (a per-micro-batch full-column
    * aggregate would dominate streaming ingestion at scale) — the `_hot`
    * list updates at the maintenance points, save and compact, so a
    * bucket running hot mid-stream is capped at the next compaction.
    */
  def appendInverted(index: DataFrame, table: String, prefixLen: Int = 2): Unit = {
    val spark = index.sparkSession
    val meta = readMeta(spark, table)
    val m = meta.getOrElse(InvertedMeta(prefixLen, -1L, 0))
    writeInverted(index, table, m.prefixLen, SaveMode.Append, m.numBuckets)
    if (meta.isEmpty) writeMeta(spark, table, m)
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
    * boundaries must not flatten distinct seqs onto one.
    */
  def appendTombstoneRows(spark: SparkSession, table: String,
      rows: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains("ingest_seq"),
      s"tombstones need the append-sequence column 'ingest_seq' in $table")
    val sigType = cur.schema(Cols.Signature).dataType
    val bktType = cur.schema("bucket").dataType
    rows
      .select(col(Cols.Id).cast("long").as(Cols.Id),
        lit(null).cast(sigType).as(Cols.Signature),
        lit(null).cast(bktType).as("bucket"),
        col("ingest_seq").cast("long").as("ingest_seq"),
        lit(TombstonePrefix).as("bkt_pfx"))
      .repartition(1) // a takedown batch is tiny; one file in the marker dir
      .write.mode(SaveMode.Append)
      .partitionBy("bkt_pfx")
      .format("parquet")
      .saveAsTable(table)
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
    * Cost shape: one DECISION pass over narrow columns only (id, seq,
    * bucket, prefix — parquet column pruning never reads the wide
    * signature column), then ONE rewrite job of the dirty slice staged to
    * a scratch directory (breaking the read-own-table cycle), swapped in
    * per DIRECTORY at the filesystem level: delete the dirty
    * `bkt_pfx=p` directory, rename the staged one into its place. Each
    * directory is atomically old-or-new (rename), the catalog's partition
    * locations never change (no MSCK, safe under both the in-memory and a
    * persistent Derby/Hive catalog), and a crash mid-swap leaves a mix of
    * compacted and not-yet-compacted directories — exactly the
    * pre-compaction state serving already tolerates (max-seq wins). NOT
    * dynamic partition overwrite: Spark 4.1's `insertInto` ignores the
    * writer-level `partitionOverwriteMode` option (measured: a 1-partition
    * insert truncated the whole table), and the session-conf form leaks
    * dynamic-overwrite semantics to concurrent writers in the session.
    * Dirty directories left EMPTY by supersession are dropped (data +
    * catalog partition entry). Tombstone markers themselves survive
    * compaction (deduped to the max seq per id): they are the guard that
    * keeps an at-least-once redelivery of a pre-delete batch from
    * resurrecting the id.
    *
    * Concurrent readers: each directory flips old→new atomically
    * (rename), but a query that LISTED a dirty directory before its swap
    * can hit a deleted file and must retry — the layout bounds the blast
    * radius to the dirty directories, it does not make compaction
    * transactional. Operationally: run compaction in the ingestion pause
    * between micro-batches (the gates' shape), or accept query retry
    * during the swap window; on an object store the per-directory swap is
    * the unit to make atomic.
    */
  def compactInverted(spark: SparkSession, table: String,
      seqCol: String = "ingest_seq"): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains(seqCol),
      s"compactInverted needs the append-sequence column '$seqCol'")
    val winners = cur.groupBy(col(Cols.Id)).agg(max(col(seqCol)).as(seqCol))
    // dirty = partitions holding a superseded row (seq < its id's winner)
    // or a duplicated (id, seq, bucket) row — both aggregates read narrow
    // columns only; the collect is bounded by the prefix space (16^len + 1)
    val superseded = cur.select(col(Cols.Id), col(seqCol), col("bkt_pfx"))
      .join(winners.withColumnRenamed(seqCol, "__wseq"), Seq(Cols.Id))
      .where(col(seqCol) < col("__wseq"))
      .select(col("bkt_pfx"))
    val duplicated = cur.groupBy(col(Cols.Id), col(seqCol), col("bucket"), col("bkt_pfx"))
      .count().where(col("count") > 1).select(col("bkt_pfx"))
    val dirty = superseded.union(duplicated).distinct()
      .collect().map(_.getString(0)).toSet
    if (dirty.isEmpty) { refreshHotStats(spark, table); return }

    val kept = cur.where(col("bkt_pfx").isin(dirty.toSeq: _*))
      .join(winners, Seq(Cols.Id, seqCol), "left_semi")
      // same-seq redelivery lands identical rows twice; the winner
      // semi-join keeps every copy — collapse them here (nulls compare
      // equal, so duplicate tombstone markers dedup too)
      .dropDuplicates(Cols.Id, seqCol, "bucket")
      // align writer tasks to partition dirs (one file per rewritten dir)
      .repartition(col("bkt_pfx"))
    val tableDir = tablePath(spark, table)
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(
      tableDir.getParent, table.toLowerCase + "__compact_stage")
    try {
      // ONE job writes the whole dirty slice, partitioned the same way as
      // the table; the per-directory swap below is pure fs metadata
      kept.write.mode(SaveMode.Overwrite).partitionBy("bkt_pfx").parquet(stage.toString)
      dirty.foreach { p =>
        val src = new org.apache.hadoop.fs.Path(stage, s"bkt_pfx=$p")
        val dst = new org.apache.hadoop.fs.Path(tableDir, s"bkt_pfx=$p")
        fs.delete(dst, true)
        if (fs.exists(src)) fs.rename(src, dst)
        else // every row superseded: the directory is gone for good
          spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (bkt_pfx='$p')")
      }
    } finally fs.delete(stage, true)
    spark.catalog.refreshTable(table)
    refreshHotStats(spark, table)
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
    * deployment (tools/derby_serving_drive{,2}.scala is that shape).
    */
  def loadInverted(spark: SparkSession, table: String): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else {
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
      Some(InvertedMeta(
        field("prefixLen").map(_.toInt).getOrElse(2),
        field("hotThreshold").map(_.toLong).getOrElse(-1L),
        field("numBuckets").map(_.toInt).getOrElse(0)))
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
      s"""{"prefixLen":${m.prefixLen},"hotThreshold":${m.hotThreshold},"numBuckets":${m.numBuckets}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def metaPath(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tablePath(spark, table), "_graft_meta.json")

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
