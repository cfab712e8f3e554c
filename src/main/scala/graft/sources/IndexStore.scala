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
    * space-for-latency trade.
    */
  def saveInverted(index: DataFrame, table: String, prefixLen: Int = 2): Unit =
    writeInverted(index, table, prefixLen, SaveMode.Overwrite)

  /** Append a micro-batch of (re-)ingested documents to an inverted
    * posting table — the streaming-ingestion sink shape for the SERVING
    * index. The frame should carry an `ingest_seq` column (later
    * re-ingests supersede earlier ones at [[compactInverted]] time); a
    * superseded document's OLD postings may live in DIFFERENT buckets
    * than its new ones (the signature changed — that's why it was
    * re-ingested), so appends leave stale postings behind by design and
    * [[compactInverted]] is the maintenance step that drops them.
    */
  def appendInverted(index: DataFrame, table: String, prefixLen: Int = 2): Unit =
    writeInverted(index, table, prefixLen, SaveMode.Append)

  private def writeInverted(index: DataFrame, table: String, prefixLen: Int,
      saveMode: SaveMode): Unit = {
    import org.apache.spark.sql.functions._
    val extra = if (index.columns.contains("ingest_seq")) Seq(col("ingest_seq"))
                else Seq.empty
    index.where(col(Cols.Signature).isNotNull)
      .select(col(Cols.Id) +: col(Cols.Signature) +:
        explode(col(Cols.BucketIds)).as("bucket") +: extra: _*)
      .withColumn("bkt_pfx", substring(col("bucket"), 1, prefixLen))
      // align writer tasks to partition dirs: without this every shuffle
      // task writes a sliver into every directory (tasks × dirs files)
      .repartition(col("bkt_pfx"))
      .write.mode(saveMode)
      .partitionBy("bkt_pfx")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Compact an append-log INVERTED posting table: per id keep only the
    * postings of the winning (max `seqCol`) ingest — including dropping
    * old postings in buckets the new signature no longer hashes to — and
    * rewrite each partition directory's append slivers into one file.
    * Supersession is keyed on id alone (all postings of one (id, seq)
    * carry the same signature): one decision-sized (id, seq) aggregate,
    * one semi-join; signatures ride the rewrite exactly once. The rewrite
    * lands in `<table>_compact_tmp`, then swaps in via DROP + RENAME (the
    * [[compact]] crash-recovery convention).
    */
  def compactInverted(spark: SparkSession, table: String,
      seqCol: String = "ingest_seq"): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains(seqCol),
      s"compactInverted needs the append-sequence column '$seqCol'")
    val winners = cur.groupBy(col(Cols.Id))
      .agg(max(col(seqCol)).as(seqCol))
    val kept = cur.join(winners, Seq(Cols.Id, seqCol), "left_semi")
      .repartition(col("bkt_pfx"))
    val tmp = table + "_compact_tmp"
    reset(spark, tmp)
    kept.write.mode(SaveMode.Overwrite).partitionBy("bkt_pfx")
      .format("parquet").saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    // PARTITIONED managed tables: the in-memory catalog's RENAME moves the
    // directory but keeps per-partition locations pointing at the old tmp
    // paths — scans silently read zero files (Hive/derby catalogs rewrite
    // them; InMemoryCatalog does not). Re-discover from the moved location.
    spark.sql(s"MSCK REPAIR TABLE $table")
  }

  /** Load the inverted posting table written by [[saveInverted]] — from
    * this session's catalog when registered, else straight from its
    * warehouse directory (the COLD-START path: an in-memory catalog
    * forgets tables between JVMs but the managed directory survives, and
    * partition discovery recovers `bkt_pfx`). Partition-type inference is
    * disabled around the directory read: hex prefixes like "00" would
    * otherwise infer as INT 0 and break string prefix pruning.
    */
  def loadInverted(spark: SparkSession, table: String): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else {
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "false")
      try spark.read.parquet(warehouseLocation(spark, table).getPath)
      finally spark.conf.set(key, prev)
    }

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
