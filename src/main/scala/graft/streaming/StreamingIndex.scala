package graft.streaming

import graft.{Cols, MinHashConfig}
import graft.operators.{MinHashLSH, MinHashLSHModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Incremental corpus ingestion (SURVEY.md §7.6 north star): because the
  * direct-mode featurize pipeline is a pure per-row projection (no global
  * vocabulary, no shuffle), the same expressions run unchanged over a
  * Structured Streaming source — each micro-batch of new documents is
  * signed and bucketed as it arrives and appended to the index sink.
  */
object StreamingIndex {

  /** Streaming featurize over a parquet document directory. Direct mode
    * only: the vocabulary path needs a global sort and is inherently batch
    * (the reference rebuilds its whole index on ingest for the same reason).
    */
  def incrementalIndex(spark: SparkSession, dir: String, schema: StructType,
      cfg: MinHashConfig = MinHashConfig(), idCol: String = "doc_id",
      textCol: String = "text", maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    require(!cfg.useVocabulary, "streaming ingestion requires direct (vocabulary-free) mode")
    val reader = spark.readStream.schema(schema)
    // bound each micro-batch so a backlogged directory streams as many
    // small appends (the incremental contract) instead of one giant batch
    val stream = maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n))
      .parquet(dir)
      .select(col(idCol).cast("long").as(Cols.Id), col(textCol).as(Cols.Text))
    new MinHashLSH(cfg)
      .featurize(stream, Cols.Id, Cols.Text, None)
      .select(Cols.Id, Cols.Signature, Cols.BucketIds)
  }

  /** Streaming exact deduplication: drops any document whose content hash
    * was already seen — across micro-batches, via the streaming state store
    * (`dropDuplicates` on a streaming DataFrame is stateful). The state key
    * is the 16-byte md5, not the text, so state size is bounded per doc.
    */
  def dedupedStream(spark: SparkSession, dir: String, schema: StructType,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .select(col(idCol).cast("long").as(Cols.Id), col(textCol).as(Cols.Text))
      .withColumn("text_hash", md5(col(Cols.Text)))
      .dropDuplicates("text_hash")

  /** Run `body` for a non-empty micro-batch, then unpersist every RDD block
    * pinned DURING the batch: the model's per-batch query-side cache blocks
    * would otherwise accumulate for the stream's lifetime (only driver GC
    * frees them). The fitted index / vocabulary caches are materialized
    * once up front so the per-batch sweep can never evict them. The swept
    * blocks are plain persists — recomputable, so the sweep can never
    * invalidate a frame some later plan still references.
    */
  private def perBatch(model: MinHashLSHModel)(body: DataFrame => Unit): DataFrame => Unit = {
    model.indexDf.count() // materialize the shared caches BEFORE any sweep
    model.vocabulary.foreach(_.count())
    batch => {
      val sc = batch.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      try body(batch)
      finally {
        // Dataset-level release first: unpersist deregisters the
        // CacheManager entry too (the RDD sweep below frees blocks but
        // would leak one dead registry entry per micro-batch)
        model.releaseQueryCaches()
        sc.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Streaming ingestion into the bucket-inverted SERVING index
    * ([[graft.sources.IndexStore.saveInverted]] layout): each micro-batch
    * of (id, text, ingest_seq) documents is featurized — a stateless
    * direct-mode projection, NO state store — and APPENDED to the posting
    * table. The supersession sequence rides IN THE DATA (not the batch
    * id), so the final table state is a pure function of the corpus:
    * micro-batch boundaries cannot affect it, and
    * [[graft.sources.IndexStore.compactInverted]] afterwards drops
    * superseded postings exactly as the batch maintenance path does.
    *
    * Debt-triggered maintenance (`compactAtDeadPostings` /
    * `compactAtLogBytes` / `compactAtDataFiles`, all off by default):
    * after each append the micro-batch head polls
    * [[graft.sources.IndexStore.maintenanceDebt]]
    * — an O(delta) read of the dirty log plus the touched id-map
    * partitions, never the table — and runs
    * [[graft.sources.IndexStore.compactInverted]] when the reclaimable
    * rows pass `compactAtDeadPostings`, the log's bytes (the serve
    * path's broadcast-budget signal) pass `compactAtLogBytes`, or any
    * partition's parquet-file count passes `compactAtDataFiles` (the
    * PURE-APPEND path's physical debt: each micro-batch lands one file
    * per touched partition, and only a rewrite folds them — the file
    * poll adds one listStatus per partition, so it is opt-in). This is
    * tools/debt_drive.scala's recipe wired into the sink: compaction
    * cost is paid exactly when the backlog justifies it, inside the
    * ingestion pause between micro-batches (the documented concurrent-
    * reader window), and a quiet stream never pays it at all.
    */
  def streamingInvertedIngest(spark: SparkSession, dir: String,
      schema: StructType, cfg: MinHashConfig, table: String,
      idCol: String = "id", textCol: String = "text",
      maxFilesPerTrigger: Int = 1, prefixLen: Int = 2,
      seedNumBuckets: Int = 0, seedHotThreshold: Long = -1L,
      compactAtDeadPostings: Long = -1L,
      compactAtLogBytes: Long = -1L,
      compactAtDataFiles: Int = -1): StreamingQuery = {
    require(!cfg.useVocabulary, "streaming ingestion requires direct (vocabulary-free) mode")
    val lsh = new MinHashLSH(cfg)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.sources.IndexStore.appendInverted(
            lsh.featurize(batch, idCol, textCol, None)
              .select(col(idCol).cast("long").as(Cols.Id), col(Cols.Signature),
                col(Cols.BucketIds), col("ingest_seq")),
            table, prefixLen, seedHotThreshold = seedHotThreshold,
            seedNumBuckets = seedNumBuckets)
          if (compactAtDeadPostings >= 0L || compactAtLogBytes >= 0L ||
              compactAtDataFiles >= 1) {
            val debt = graft.sources.IndexStore.maintenanceDebt(spark, table,
              withFileCounts = compactAtDataFiles >= 1).collect()(0)
            val fire =
              (compactAtDeadPostings >= 0L &&
                debt.getAs[Long]("dead_postings") >= compactAtDeadPostings) ||
              (compactAtLogBytes >= 0L &&
                debt.getAs[Long]("log_bytes") >= compactAtLogBytes) ||
              (compactAtDataFiles >= 1 &&
                debt.getAs[Long]("data_files_max") > compactAtDataFiles)
            // the file knob rides along on ANY firing, so a supersession-
            // triggered pass folds offending partitions opportunistically
            if (fire) graft.sources.IndexStore.compactInverted(spark, table,
              maxFilesPerDir = compactAtDataFiles)
          }
        }
        ()
      }.start()
  }

  /** Streaming CHANGE-FEED maintenance of the serving index — the
    * full-lifecycle sibling of [[streamingInvertedIngest]]: each
    * micro-batch carries an `op` column and routes per row — upserts
    * ('U') featurize statelessly and append postings, deletes ('D')
    * append tombstone markers ([[graft.sources.IndexStore
    * .appendTombstoneRows]], seq riding in the data). Because BOTH event
    * kinds carry their own `ingest_seq`, the final table state is a pure
    * function of the event set: micro-batch boundaries, U/D interleaving,
    * and at-least-once redelivery all collapse under the same
    * supersession order at serve/compact time.
    *
    * Cold start is op-agnostic: a FIRST micro-batch containing only
    * deletes seeds an empty seq-carrying posting table before its
    * tombstones append (a takedown feed may open with deletes for
    * documents another pipeline will ingest later — the marker must land
    * and outrank them when they arrive). `seedNumBuckets` /
    * `seedHotThreshold` let the cold-created table carry the co-located
    * file-bucketed layout and the hot-bucket occupancy policy (the `_hot`
    * stats themselves still refresh at the maintenance points — save and
    * compact — never per micro-batch).
    */
  def streamingIndexMaintenance(spark: SparkSession, dir: String,
      schema: StructType, cfg: MinHashConfig, table: String,
      idCol: String = "id", textCol: String = "text", opCol: String = "op",
      maxFilesPerTrigger: Int = 1, prefixLen: Int = 2,
      seedNumBuckets: Int = 0, seedHotThreshold: Long = -1L): StreamingQuery = {
    require(!cfg.useVocabulary, "streaming ingestion requires direct (vocabulary-free) mode")
    val lsh = new MinHashLSH(cfg)
    def append(rows: DataFrame): Unit =
      graft.sources.IndexStore.appendInverted(
        lsh.featurize(rows, idCol, textCol, None)
          .select(col(idCol).cast("long").as(Cols.Id), col(Cols.Signature),
            col(Cols.BucketIds), col("ingest_seq")),
        table, prefixLen, seedHotThreshold = seedHotThreshold,
        seedNumBuckets = seedNumBuckets)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val upserts = batch.where(col(opCol) === "U")
        if (!upserts.isEmpty) append(upserts)
        val deletes = batch.where(col(opCol) === "D")
        if (!deletes.isEmpty) {
          // delete-only cold start: tombstones need the table's schema to
          // exist — seed it empty (zero rows, zero partitions) with the
          // same featurize projection, so the seq/signature types match
          // the upserts that will follow
          if (!spark.catalog.tableExists(table)) append(batch.limit(0))
          graft.sources.IndexStore.appendTombstoneRows(spark, table,
            deletes.select(col(idCol).cast("long").as(Cols.Id), col("ingest_seq")))
        }
        ()
      }.start()
  }

  /** Streaming UPSERT ingestion into a persisted VECTOR index — the
    * [[streamingInvertedIngest]] twin on the embedding side, completing
    * the operational symmetry: each micro-batch of (id, vector, seq)
    * arrivals assigns to the FROZEN centroids (a stateless zero-shuffle
    * projection — the bounded codebook rides in the plan, no state store)
    * and appends to the cell-partitioned table via
    * [[graft.operators.IvfModel.appendVectors]]'s seq-column form (`pq =
    * true` routes through [[graft.operators.PqModel.appendVectors]], ONE
    * logical append maintaining both persisted tables). The supersession
    * sequence rides IN THE DATA, so the final index state is a pure
    * function of the event set: micro-batch boundaries cannot affect it,
    * and a manifest-mode table commits each batch as its own generation
    * flip (the single-writer manifest contract under micro-batch
    * cadence).
    *
    * Debt-triggered maintenance (both knobs off by default): after each
    * append the micro-batch head polls
    * [[graft.sources.VectorAudit.maintenanceDebt]] — an O(delta) read of
    * the narrow audit id-map plus the manifest's generation lists, never
    * the cell tables — and runs `compactUpserts` when the
    * superseded-version count passes `compactAtSuperseded` (re-embedding
    * backlog), or `compactGenerations` when any cell's generation-list
    * length passes `compactAtGenLists` (the PURE-APPEND path's physical
    * debt, which upsert compaction cannot touch: every micro-batch
    * commits as its own generation, so an all-new-ids stream grows every
    * cell's read fan-out by one per batch until folded). Maintenance
    * cost lands exactly when the backlog justifies it, inside the
    * ingestion pause between micro-batches; a quiet stream never pays.
    */
  def streamingVectorIngest(spark: SparkSession, dir: String,
      schema: StructType, modelDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seqCol: String = "ingest_seq",
      maxFilesPerTrigger: Int = 1, pq: Boolean = false,
      compactAtSuperseded: Long = -1L,
      compactAtGenLists: Int = -1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (pq)
            graft.operators.PqModel.appendVectors(
              spark, modelDir, batch, idCol, vecCol, seqCol)
          else
            graft.operators.IvfModel.appendVectors(
              spark, modelDir, batch, idCol, vecCol, seqCol)
          if (compactAtSuperseded >= 0L || compactAtGenLists >= 1) {
            // a PQ model's audit id-map (and markers) live under its ivf
            // subtree — the coarse quantizer is the system of record for
            // per-id state; the encoded table mirrors it in lockstep
            val debtDir = if (pq) s"$modelDir/ivf" else modelDir
            val debt = graft.sources.VectorAudit
              .maintenanceDebt(spark, debtDir).collect()(0)
            if (compactAtSuperseded >= 0L &&
                debt.getAs[Long]("superseded_rows") >= compactAtSuperseded) {
              if (pq) graft.operators.PqModel.compactUpserts(spark, modelDir)
              else graft.operators.IvfModel.compactUpserts(spark, modelDir)
            }
            if (compactAtGenLists >= 1 &&
                math.max(debt.getAs[Long]("gen_lists_max"),
                debt.getAs[Long]("cell_files_max")) > compactAtGenLists) {
              if (pq)
                graft.operators.PqModel.compactGenerations(
                  spark, modelDir, compactAtGenLists)
              else
                graft.operators.IvfModel.compactGenerations(
                  spark, modelDir, compactAtGenLists)
            }
          }
        }
        ()
      }.start()

  /** Streaming CHANGE-FEED maintenance of a persisted VECTOR index — the
    * [[streamingIndexMaintenance]] twin, completing the change-feed side
    * of the text/vector symmetry: each micro-batch carries an `op`
    * column and routes per row — upserts ('U') assign to the frozen
    * centroids and append ([[graft.operators.IvfModel.appendVectors]]'s
    * seq-column form; `pq = true` routes both PQ tables), deletes ('D')
    * append takedown markers with the row's own sequence
    * ([[graft.operators.IvfModel.deleteVectors]]'s seq-column form).
    * Because BOTH event kinds carry their own `seqCol`, the served state
    * is a pure function of the event set: micro-batch boundaries, U/D
    * interleaving, and at-least-once redelivery all collapse under the
    * same supersession order at load/compact time — a marker outranks
    * every row at or below its seq, and a later re-ingest resurrects
    * (the documented vector-marker contract; unlike text tombstones,
    * markers CLEAR at `compactDeletes`, so close the redelivery window
    * before running vector maintenance).
    *
    * The model must already be SAVED (a frozen quantizer is the premise
    * of streaming vector ingestion — there are no centroids to cold-
    * create from a delete); a delete-only FIRST micro-batch is fine, the
    * markers land beside the existing model and outrank the ingest that
    * follows at a lower seq.
    *
    * Debt knobs: `compactAtSuperseded` / `compactAtGenLists` mirror
    * [[streamingVectorIngest]] (both redelivery-safe — upsert compaction
    * keeps winners, the fold moves nothing logically). There is
    * DELIBERATELY no marker-count trigger: `compactDeletes` CLEARS the
    * takedown markers, and firing it from inside the sink would close
    * the redelivery-protection window mid-stream (a replayed pre-delete
    * batch could then resurrect the id) — scheduling vector delete
    * compaction belongs to the operator who knows the feed's redelivery
    * horizon (OPERATIONS.md).
    */
  def streamingVectorMaintenance(spark: SparkSession, dir: String,
      schema: StructType, modelDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seqCol: String = "ingest_seq", opCol: String = "op",
      maxFilesPerTrigger: Int = 1, pq: Boolean = false,
      compactAtSuperseded: Long = -1L,
      compactAtGenLists: Int = -1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val upserts = batch.where(col(opCol) === "U")
        if (!upserts.isEmpty) {
          if (pq)
            graft.operators.PqModel.appendVectors(
              spark, modelDir, upserts, idCol, vecCol, seqCol)
          else
            graft.operators.IvfModel.appendVectors(
              spark, modelDir, upserts, idCol, vecCol, seqCol)
        }
        val deletes = batch.where(col(opCol) === "D")
        if (!deletes.isEmpty) {
          if (pq)
            graft.operators.PqModel.deleteVectors(
              spark, modelDir, deletes, idCol, seqCol)
          else
            graft.operators.IvfModel.deleteVectors(
              spark, modelDir, deletes, idCol, seqCol)
        }
        if (!batch.isEmpty &&
            (compactAtSuperseded >= 0L || compactAtGenLists >= 1)) {
          val debtDir = if (pq) s"$modelDir/ivf" else modelDir
          val debt = graft.sources.VectorAudit
            .maintenanceDebt(spark, debtDir).collect()(0)
          if (compactAtSuperseded >= 0L &&
              debt.getAs[Long]("superseded_rows") >= compactAtSuperseded) {
            if (pq) graft.operators.PqModel.compactUpserts(spark, modelDir)
            else graft.operators.IvfModel.compactUpserts(spark, modelDir)
          }
          if (compactAtGenLists >= 1 &&
              math.max(debt.getAs[Long]("gen_lists_max"),
                debt.getAs[Long]("cell_files_max")) > compactAtGenLists) {
            if (pq)
              graft.operators.PqModel.compactGenerations(
                spark, modelDir, compactAtGenLists)
            else
              graft.operators.IvfModel.compactGenerations(
                spark, modelDir, compactAtGenLists)
          }
        }
        ()
      }.start()

  /** Streaming ANN: answer a stream of text queries against a static fitted
    * index — the stream-static pattern via `foreachBatch`, re-using the
    * batch multi-query plan (bucket equi-join + per-query top-n window)
    * per micro-batch. The index side stays cached across batches; only the
    * micro-batch of queries is featurized each trigger (and its checkpoint
    * blocks are swept after the sink consumes the result). `sink` receives
    * the (qid, id, jaccard, rank) result frame of each micro-batch.
    */
  def streamingAnn(model: MinHashLSHModel, queries: DataFrame, qidCol: String,
      textCol: String, n: Int)(sink: DataFrame => Unit): StreamingQuery = {
    val run = perBatch(model)(b => sink(model.approxNearestNeighborsAll(b, qidCol, textCol, n)))
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) run(batch)
      }.start()
  }

  /** Streaming near-duplicate curation: each micro-batch of incoming
    * documents is filtered against the static fitted index
    * ([[graft.operators.MinHashLSHModel.filterNovel]]) and `sink` receives
    * only the novel survivors — the ingestion-time twin of the batch
    * near-dup pruning in the curation pipeline.
    */
  def streamingNearDupFilter(model: MinHashLSHModel, docs: DataFrame,
      idCol: String, textCol: String, threshold: Double)
      (sink: DataFrame => Unit): StreamingQuery = {
    val run = perBatch(model)(b => sink(model.filterNovel(b, idCol, textCol, threshold)))
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) run(batch)
      }.start()
  }

  /** Streaming benchmark decontamination: every micro-batch of incoming
    * documents is scrubbed of train-test overlap against a STATIC benchmark
    * set ([[graft.operators.Dedup.decontaminate]] — the benchmark's distinct
    * shingle set broadcasts once per batch plan; the stream side is a
    * narrow shingle-explode). `sink` receives only the clean survivors.
    * A pure stream-static broadcast pattern: no state store needed because
    * the benchmark never changes mid-stream.
    */
  def streamingDecontaminate(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 2)
      (sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.Dedup.decontaminate(
            batch, idCol, textCol, bench, benchTextCol, k))
      }.start()
}
