package graft.operators

import graft._
import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** MinHash + LSH near-duplicate / approximate-nearest-neighbor engine.
  *
  * Re-expression of the reference pipeline
  * (/root/reference/src/minhash_pyspark.py:85-182) as lazy, codegen-friendly
  * Spark plans: tokenize → k-shingle → [optional global vocabulary] →
  * MinHash signature → LSH band buckets, then queries as single plans with
  * no driver round-trips.
  *
  * Scale design (100 TB target):
  *  - direct mode (`useVocabulary = false`) is a single **narrow** projection
  *    per document — no global state, no shuffle, embarrassingly parallel.
  *  - vocab mode reproduces the reference's boolean-matrix formulation, but
  *    distributed: the vocabulary index is assigned with `zipWithIndex` (no
  *    driver collect, no 2 GB ceiling — reference aborts at
  *    minhash_pyspark.py:365-374) and vectorization is an equi-join that
  *    Catalyst turns into a broadcast join while the vocab is small.
  */
final class MinHashLSH(val cfg: MinHashConfig = MinHashConfig()) {

  /** Global shingle vocabulary: (shingle, idx), idx = rank in sorted shingle
    * order (reference `shing_dict`, minhash_pyspark.py:341-389; sort flag
    * DO_SORT_SHING_DICT minhash_config.py:27-28). Distributed via
    * sort + zipWithIndex — order-preserving, no driver ceiling.
    */
  def buildVocabulary(docs: DataFrame, textCol: String = Cols.Text): DataFrame = {
    // persist the sorted vocabulary: zipWithIndex runs an internal
    // partition-count job, which would otherwise re-execute the whole
    // explode→groupBy→sort chain a second time. persist (not
    // localCheckpoint): blocks stay recomputable under memory-pressure
    // eviction or an external cache sweep — a truncated-lineage block that
    // gets dropped kills the query instead of recomputing.
    // tokenize lives in its own projection below the Generate: a Generate
    // input gets no subexpression elimination, so inlining the tokenizer
    // would re-run the regex chain per reference inside the shingle lambda
    // (CollapseProject keeps the split because `tokens` is referenced more
    // than once in a non-cheap expression).
    val sorted = SparkUtil.ensureParallelism(docs)
      .select(T.tokenize(col(textCol)).as(Cols.Tokens))
      .select(explode(T.kShingles(col(Cols.Tokens), cfg.numShingles)).as(Cols.Shingle))
      .groupBy(Cols.Shingle).count() // agg-shingle-count
      .sort(Cols.Shingle) // sort-vocab
      .select(Cols.Shingle)
      .persist()
    val rdd = sorted.rdd.map(_.getString(0)).zipWithIndex()
      .map { case (s, i) => Row(s, i) }
    docs.sparkSession.createDataFrame(rdd, StructType(Seq(
      StructField(Cols.Shingle, StringType, nullable = false),
      StructField(Cols.VocabIdx, LongType, nullable = false))))
  }

  /** Adds `shingles`, `signature`, `bucket_ids` columns. Direct mode is one
    * narrow projection; vocab mode adds the vectorizing equi-join
    * (explode → join vocab → collect_list, reference bool_vec
    * minhash_pyspark.py:319-339 with OOV-drop via inner join).
    * Docs with no (in-vocabulary) shingles get a null signature — the
    * reference crashes on these (minhash_utils.py:66,81); we define them away.
    */
  private[graft] def featurize(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Option[DataFrame]): DataFrame = {
    // the signature kernel (shingle → N hashes per shingle) is the
    // CPU-heavy step of every index build; local single-parquet-file
    // inputs plan as one scan task and serialize it (guide §2.5 input
    // skew). No-op at scale, where inputs arrive pre-split.
    val base = SparkUtil.ensureParallelism(df)
    val shingled = base.withColumn(Cols.Shingles, T.shingles(col(textCol), cfg.numShingles))
    val withSig = vocab match {
      case Some(v) =>
        val exploded = shingled.select(col(idCol), explode(col(Cols.Shingles)).as(Cols.Shingle))
        val vside = if (cfg.vocabBroadcast) broadcast(v) else v
        val bv = exploded.join(vside, Seq(Cols.Shingle))
          .groupBy(idCol)
          .agg(array_sort(collect_list(col(Cols.VocabIdx))).as(Cols.BoolVec))
        shingled.join(bv, Seq(idCol), "left").withColumn(Cols.Signature, cfg.mode match {
          case Md5Parity => H.minhashMd5Indices(col(Cols.BoolVec), cfg.numHash)
          case XxFast =>
            H.minhashXxFromBases(transform(col(Cols.BoolVec), ix => xxhash64(ix)), cfg.numHash)
          case Xx128Parity => // reference default family over vocab indices — bit-parity
            graft.functions.XxHashExpr.minhashXx128(col(Cols.BoolVec), cfg.numHash)
        })
      case None =>
        shingled.withColumn(Cols.Signature, cfg.mode match {
          case Md5Parity => H.minhashMd5(col(Cols.Shingles), cfg.numHash)
          case XxFast => H.minhashXx(col(Cols.Shingles), cfg.numHash)
          case Xx128Parity => // same family over shingle strings (no reference twin)
            graft.functions.XxHashExpr.minhashXx128(col(Cols.Shingles), cfg.numHash)
        })
    }
    withSig.withColumn(Cols.BucketIds, cfg.mode match {
      case Md5Parity =>
        H.bandBucketsMd5(col(Cols.Signature), cfg.numBands, cfg.numRows, cfg.bucketHexLen)
      case XxFast =>
        H.bandBucketsXx(col(Cols.Signature), cfg.numBands, cfg.numRows, cfg.numBuckets)
      case Xx128Parity =>
        graft.functions.XxHashExpr.bandBucketsXx32(
          col(Cols.Signature), cfg.numBands, cfg.numRows, cfg.numBuckets)
    })
  }

  /** Index build (reference `run()`, minhash_pyspark.py:170-182). The index
    * (id, signature, bucket_ids) is cached — rt-cache parity with the
    * reference's minhash_df/lsh_df caching (minhash_pyspark.py:435-447).
    */
  def fit(docs: DataFrame, idCol: String = Cols.Id, textCol: String = Cols.Text): MinHashLSHModel = {
    val base = SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as(Cols.Id), col(textCol).as(Cols.Text)))
    val vocab =
      if (cfg.useVocabulary) Some(buildVocabulary(base, Cols.Text).cache()) else None
    val index = featurize(base, Cols.Id, Cols.Text, vocab)
      .select(Cols.Id, Cols.Signature, Cols.BucketIds)
      .cache()
    new MinHashLSHModel(cfg, this, base, index, vocab)
  }
}

/** Fitted index + the query surface (reference §3.3). */
final class MinHashLSHModel private[operators] (
    cfg: MinHashConfig,
    lsh: MinHashLSH,
    val documents: DataFrame,
    val indexDf: DataFrame,
    val vocabulary: Option[DataFrame]) {

  private def spark = documents.sparkSession

  /** The query key run through the *same* expression pipeline as the corpus
    * (reference `process_query`, minhash_pyspark.py:184-198 — but with zero
    * kernel duplication and no driver-side dict math): a 1-row DataFrame
    * with q_sig / q_buckets, broadcast into the query plan.
    */
  def queryFeatures(key: String): DataFrame = {
    val one = spark.createDataFrame(
      java.util.Collections.singletonList(Row(0L, key)),
      StructType(Seq(
        StructField(Cols.Id, LongType, nullable = false),
        StructField(Cols.Text, StringType, nullable = true))))
    lsh.featurize(one, Cols.Id, Cols.Text, vocabulary)
      .select(col(Cols.Signature).as("q_sig"), col(Cols.BucketIds).as("q_buckets"))
  }

  /** Top-n approximate nearest neighbors of `key`
    * (reference approxNearestNeighbors, minhash_pyspark.py:200-241) as ONE
    * lazy plan: bucket filter → signature jaccard → TakeOrderedAndProject →
    * broadcast join back to documents. `bucketThres > 0` applies the
    * bucket-set-jaccard filter with the reference's zero-result fallback to
    * plain overlap (minhash_pyspark.py:296-306; `isEmpty` instead of its
    * `count() == 0`). Ties broken by ascending id (reference tie order is
    * engine-dependent, SURVEY.md §2.6).
    */
  def approxNearestNeighbors(key: String, n: Int, bucketThres: Double = 0.0): DataFrame = {
    val candBase = indexDf
      .where(col(Cols.Signature).isNotNull)
      .crossJoin(broadcast(queryFeatures(key).where(col("q_sig").isNotNull)))
    val overlap = candBase.where(arrays_overlap(col(Cols.BucketIds), col("q_buckets")))
    val cands =
      if (bucketThres > 0.0) {
        val strict =
          candBase.where(H.setJaccard(col(Cols.BucketIds), col("q_buckets")) >= bucketThres)
        if (strict.isEmpty) overlap else strict // flt-thres-fallback
      } else overlap
    val topk = cands
      .select(col(Cols.Id),
        H.signatureJaccard(col(Cols.Signature), col("q_sig")).as(Cols.Jaccard))
      .orderBy(col(Cols.Jaccard).desc, col(Cols.Id).asc)
      .limit(n)
    documents.join(broadcast(topk), Seq(Cols.Id))
      .select(col(Cols.Id), col(Cols.Text), col(Cols.Jaccard))
      .orderBy(col(Cols.Jaccard).desc, col(Cols.Id).asc)
  }

  /** Persist this model's index in the bucket-inverted point-query layout
    * ([[graft.sources.IndexStore.saveInverted]]): the exploded
    * (bucket, id, signature) posting table partitioned by a hex prefix of
    * the bucket, so [[approxNearestNeighborsIndexed]] can answer a point
    * query reading ≤ numBands partition directories instead of the whole
    * index. The layout knobs (prefix width, hot-bucket threshold, file
    * bucketing) persist in the table's meta file — serving derives them
    * from there, never from a caller.
    */
  def saveInvertedIndex(table: String, prefixLen: Int = 2,
      hotBucketThreshold: Long = -1L, numBuckets: Int = 0): Unit =
    graft.sources.IndexStore.saveInverted(indexDf, table, prefixLen,
      hotBucketThreshold, numBuckets)

  /** Top-n ANN answered from the PERSISTED inverted index written by
    * [[saveInvertedIndex]] — the point-query SERVING path.
    *
    * Result-identical to [[approxNearestNeighbors]] in overlap mode: an id
    * shares ≥ 1 band bucket with the query ⇔ the posting table holds a row
    * (bucket ∈ q_buckets, id), so the candidate set is the same; scoring,
    * tie order and the document join are the same expressions. What changes
    * is the READ: instead of `arrays_overlap` over the ENTIRE index
    * (reference parity, minhash_pyspark.py:308-317 — 100 TB scanned per
    * query at scale), the scan carries PartitionFilters on the query's
    * bucket prefixes (≤ numBands directories of the 16^prefixLen space)
    * plus a pushed bucket-equality data filter for row-group pruning inside
    * them — point-query cost tracks the matching postings, not the corpus.
    *
    * The single bounded driver round-trip is the query-key feature fetch
    * (numBands bucket strings): partition pruning requires the bucket
    * values as plan literals. That fetch is the same "single query-key
    * fetch" the in-memory path already pays (rt-collect, SURVEY §2.11).
    * The probe width comes from the table's own meta file — a caller
    * can't silently probe non-existent partition values.
    */
  def approxNearestNeighborsIndexed(table: String, key: String, n: Int): DataFrame =
    MinHashLSH.serveFromInverted(spark, table, documents,
      queryFeatures(key).where(col("q_sig").isNotNull), n)

  /** Featurize a (qid, text) frame and explode its band buckets — shared
    * candidate-generation front end of the batch ANN and novel-doc filter.
    *
    * The featurized side MUST be cached before the explode: otherwise
    * InferFiltersFromGenerate + predicate pushdown substitute the whole
    * nested featurize expression tree (buckets→signature→shingles) into a
    * scan-level filter, re-evaluating the shingle pipeline once per
    * signature slot per band (~2500× recompute; measured 130s vs 0.5s at
    * sf0.1). The InMemoryRelation is the optimizer barrier AND what a
    * cluster deployment wants for the small query-feature table. persist
    * (not localCheckpoint): blocks stay recomputable if evicted or swept,
    * instead of failing with truncated lineage. The streaming wrappers
    * (StreamingIndex) still sweep them after each micro-batch.
    */
  /** Per-query feature frames persisted by [[explodedQueryFeatures]]; each
    * batch-ANN / novel-filter invocation adds one. [[releaseQueryCaches]]
    * drains it — Dataset.unpersist both frees the blocks AND deregisters
    * the CacheManager entry (an RDD-level sweep alone leaks one dead
    * registry entry per invocation for the model's lifetime).
    */
  private val queryCaches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every per-query feature cache accumulated since the last
    * release. Call after consuming the result of a batch query — the
    * streaming wrappers (StreamingIndex) do this per micro-batch.
    */
  def releaseQueryCaches(): Unit = {
    var df = queryCaches.poll()
    while (df != null) { df.unpersist(); df = queryCaches.poll() }
  }

  private def explodedQueryFeatures(
      queries: DataFrame, qidCol: String, textCol: String): DataFrame = {
    val qFeatured = lsh.featurize(
        graft.SparkUtil.ensureParallelism(
          queries.select(col(qidCol).cast("long").as("qid"), col(textCol))),
        "qid", textCol, vocabulary)
      .select(col("qid"), col(Cols.Signature).as("q_sig"), col(Cols.BucketIds))
      .persist()
    queryCaches.add(qFeatured)
    // null-signature filter strictly ABOVE the persist: placed below it,
    // predicate pushdown substitutes the whole minhash expression tree into
    // a filter under the parallelizing repartition — evaluating the entire
    // signature per row on the 1-task file scan just to test isNotNull
    // (measured: 5.9 s single-task stage vs 0.2 s parallel at sf0.1), then
    // recomputing it again above the shuffle. Against the cache it reads
    // the materialized column. (Semantically the filter is belt-and-braces:
    // a null signature yields null bucket_ids, which explode drops.)
    qFeatured.where(col("q_sig").isNotNull)
      .select(col("qid"), col("q_sig"), explode(col(Cols.BucketIds)).as("bucket"))
  }

  /** Batch ANN for a whole DataFrame of queries — the scale path the
    * reference lacks: explode band buckets on both sides, equi-join on the
    * bucket (shuffle key), dedup pairs, score, top-n per query via window.
    */
  def approxNearestNeighborsAll(
      queries: DataFrame, qidCol: String, textCol: String, n: Int): DataFrame =
    batchAnnAgainst(explodedQueryFeatures(queries, qidCol, textCol),
      indexDf.where(col(Cols.Signature).isNotNull)
        .select(col(Cols.Id), col(Cols.Signature),
          explode(col(Cols.BucketIds)).as("bucket")), n)

  /** [[approxNearestNeighborsAll]] answered from the PERSISTED inverted
    * posting table instead of the in-memory index — the batch-throughput
    * serving path: the workload's exploded buckets equi-join the stored
    * postings directly (no per-corpus featurize, no bucket explode — the
    * explode was paid once at [[saveInvertedIndex]] time). Result-identical
    * to the in-memory form: the posting table IS the exploded index.
    * Unlike the point path no partition pruning applies — a workload
    * touches most prefixes — but the join key (bucket) is the same
    * shuffle key, and a table written with `numBuckets > 0`
    * ([[graft.sources.IndexStore.saveInverted]]) is FILE-BUCKETED on it:
    * the posting-side scan then satisfies the join's distribution by
    * itself and only the (small) query workload shuffles — no Exchange
    * over the 100 TB side (plan-asserted in PlanPropertiesSpec).
    *
    * Maintenance semantics: tombstoned ids ([[graft.sources.IndexStore
    * .appendTombstones]]) are excluded exactly, even before compaction —
    * each posting row survives only if its seq outranks the id's newest
    * delete marker (the marker partition is tiny: broadcast join). A
    * RE-INGESTED id's stale postings are excluded by its supersession
    * cutoff (livePostings scaladoc) before the join, so the batch path is
    * exactly fresh-build between compactions too; the per-(query, id)
    * max-seq scoring stays beneath as the no-log fallback.
    *
    * `skipHotBuckets` extends the point path's hot-bucket occupancy cap
    * to the batch workload ([[MinHashLSH.hotCapQueryBuckets]]): capped
    * query buckets never join, trading bounded recall (measured on the
    * planted boiler corpus — tools/hot_batch_ladder.scala) for freedom
    * from the stop-word bucket's quadratic pairing. Default OFF: the
    * uncapped form is the recall-exact contract.
    */
  def approxNearestNeighborsAllIndexed(table: String, queries: DataFrame,
      qidCol: String, textCol: String, n: Int,
      skipHotBuckets: Boolean = false): DataFrame =
    approxNearestNeighborsAllIndexed(table, queries, qidCol, textCol, n,
      skipHotBuckets, None)

  /** The batch path served AT A NAMED SNAPSHOT — postings, cutoffs, and
    * the hot list resolve through the pin ([[graft.sources.IndexStore
    * .pinInverted]]); tombstones alone read live. The batch twin of the
    * point path's pinned overload.
    */
  def approxNearestNeighborsAllIndexed(table: String, queries: DataFrame,
      qidCol: String, textCol: String, n: Int,
      skipHotBuckets: Boolean, pin: Option[String]): DataFrame = {
    import graft.sources.IndexStore
    val qf = explodedQueryFeatures(queries, qidCol, textCol)
    val capped =
      if (skipHotBuckets)
        MinHashLSH.hotCapQueryBuckets(qf,
          pin.fold(IndexStore.hotBuckets(spark, table))(p =>
            IndexStore.pinnedHotBuckets(spark, table, p)))
      else qf
    batchAnnAgainst(capped,
      MinHashLSH.livePostings(spark, table, None, pin), n)
  }

  /** [[approxNearestNeighborsAllIndexed]] for SMALL batches: collect the
    * workload's band buckets (bounded: ≤ nQueries × numBands strings —
    * the batch generalization of the point path's single query-key fetch)
    * and prune the posting scan to their partition directories, exactly
    * like a point query. A 5-query batch then reads ≤ 20 directories of
    * the prefix space instead of the whole index. MEASURED crossover
    * (tools/pruned_batch_ladder.scala, 256-dir prefix space): the read
    * advantage is 12.5× at batch 5 and gone by batch ≈ 250 — prune while
    * the workload's distinct buckets stay under ~a quarter of the
    * 16^prefixLen space, else take the unpruned full-scan join. That
    * knob is the caller's, not a hidden heuristic. Results identical to
    * the unpruned form (the pruned scan keeps every posting the join
    * could match).
    */
  def approxNearestNeighborsAllIndexedPruned(table: String, queries: DataFrame,
      qidCol: String, textCol: String, n: Int,
      skipHotBuckets: Boolean = false): DataFrame =
    approxNearestNeighborsAllIndexedPruned(table, queries, qidCol, textCol,
      n, skipHotBuckets, None)

  /** The pruned batch path AT A NAMED SNAPSHOT: the probe prefixes subset
    * the pin's file inventory on the driver (the pinned twin of the
    * partition-pruned scan), the pinned cutoffs and hot list apply, live
    * tombstones pierce. Answers equal the unpruned pinned form exactly.
    */
  def approxNearestNeighborsAllIndexedPruned(table: String, queries: DataFrame,
      qidCol: String, textCol: String, n: Int,
      skipHotBuckets: Boolean, pin: Option[String]): DataFrame = {
    import graft.sources.IndexStore
    val qf = explodedQueryFeatures(queries, qidCol, textCol)
    val meta = IndexStore.invertedMeta(spark, table)
    val pairs = qf.select(col("qid"), col("bucket")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    if (pairs.isEmpty)
      return qf.limit(0).select(col("qid"), col("qid").as(Cols.Id),
        lit(null).cast("float").as(Cols.Jaccard), lit(0).cast("int").as("rank"))
    // HOT-CAP composition (skipHotBuckets): the probe set is already on
    // the driver, so the point path's policy applies per query verbatim —
    // drop each query's over-occupied buckets (they never enter the probe
    // literals, so their postings are never READ, not merely unmatched),
    // falling back to the full set for a query whose every bucket is hot.
    val hot = if (!skipHotBuckets) Set.empty[String]
              else pin.fold(IndexStore.hotBuckets(spark, table))(p =>
                IndexStore.pinnedHotBuckets(spark, table, p))
    val (qServe, served) =
      if (hot.isEmpty) (qf, pairs)
      else {
        val capped = pairs.groupBy(_._1).toSeq.flatMap { case (_, bs) =>
          val live = bs.filterNot(p => hot(p._2)); if (live.isEmpty) bs else live
        }
        val spark2 = spark
        import spark2.implicits._
        val keep = broadcast(capped.toDF("qid", "bucket"))
        (qf.join(keep, Seq("qid", "bucket"), "left_semi"), capped)
      }
    val qBuckets = served.map(_._2).distinct
    val prefixes = qBuckets
      .map(b => b.substring(0, math.min(meta.prefixLen, b.length))).distinct
    val pruned = MinHashLSH.livePostings(spark, table,
      Some((prefixes, qBuckets)), pin)
    batchAnnAgainst(qServe, pruned, n)
  }

  /** Shared batch-ANN tail over an exploded (qid, q_sig, bucket) workload
    * and an exploded (id, signature, bucket) posting side.
    */
  private def batchAnnAgainst(qf: DataFrame, ix: DataFrame, n: Int): DataFrame = {
    // score BEFORE dedup: candidate pairs reached via multiple bands are
    // rescored (deterministic, cheap) so the dedup shuffle carries 24-byte
    // (qid, id, jaccard) rows instead of two 100-slot signatures per row
    // per-query top-n via the bounded-heap aggregate, not a row_number
    // window: the window form shuffles AND SORTS every candidate row per
    // qid, the heap aggregate reduces each map partition to ≤ n rows per
    // qid before the exchange (same deterministic (jaccard desc, id asc)
    // order — ties pinned by id; TopKAgg scaladoc)
    val matched = qf.join(ix, Seq("bucket"))
    val perId =
      if (ix.columns.contains("ingest_seq"))
        // seq-carrying posting side (a maintained table PRE-compaction may
        // hold several versions of an id): the NEWEST matched posting
        // scores, mirroring serveFromInverted's winner rule — an arbitrary
        // dropDuplicates pick would flip the served jaccard between runs
        // for a re-ingested id. Ties (one version matched via several
        // bands) share one signature, so the score is identical.
        matched.select(col("qid"), col(Cols.Id),
            H.signatureJaccard(col(Cols.Signature), col("q_sig")).as(Cols.Jaccard),
            col("ingest_seq"))
          .groupBy("qid", Cols.Id)
          .agg(max_by(col(Cols.Jaccard), col("ingest_seq")).as(Cols.Jaccard))
      else
        matched.select(col("qid"), col(Cols.Id),
            H.signatureJaccard(col(Cols.Signature), col("q_sig")).as(Cols.Jaccard))
          .dropDuplicates("qid", Cols.Id)
    perId
      .groupBy("qid")
      .agg(graft.functions.TopKAgg.topK(col(Cols.Jaccard), col(Cols.Id), n).as("__topk"))
      .select(col("qid"), posexplode(col("__topk")).as(Seq("__r0", "__e")))
      .select(col("qid"), col("__e.id").as(Cols.Id),
        // score travels as double inside the heap; the cast back to float
        // is lossless (it started as a float) and keeps the public schema
        col("__e.score").cast("float").as(Cols.Jaccard),
        (col("__r0") + 1).cast("int").as("rank"))
  }

  /** All-pairs near-duplicate join (MLlib approxSimilarityJoin analogue,
    * SURVEY.md §7.6): explode buckets → self-equi-join on bucket → dedup
    * pairs (a < b) → signature jaccard ≥ threshold. Bucket is the shuffle
    * key; AQE skew handling covers hot buckets.
    */
  def approxSimilarityJoin(threshold: Double): DataFrame = {
    val live = indexDf.where(col(Cols.Signature).isNotNull)
    val a = live.select(col(Cols.Id).as("a_id"), col(Cols.Signature).as("a_sig"),
      explode(col(Cols.BucketIds)).as("bucket"))
    val b = live.select(col(Cols.Id).as("b_id"), col(Cols.Signature).as("b_sig"),
      explode(col(Cols.BucketIds)).as("bucket"))
    // score + threshold BEFORE dedup (deterministic per pair): the distinct
    // shuffle then carries only surviving (a_id, b_id, jaccard) triples
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        H.signatureJaccard(col("a_sig"), col("b_sig")).as(Cols.Jaccard))
      .where(col(Cols.Jaccard) >= threshold)
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col(Cols.Jaccard))
  }

  /** 1-bit MinHash pair scoring (Li & König 2010, "b-Bit Minwise
    * Hashing"): each k-hash signature collapses to its k LOWEST BITS
    * packed into ONE long, and the Jaccard estimate becomes
    * `2·(matched bits)/k − 1` — the b=1 estimator (the paper's general
    * form degenerates to this when the set-size/universe ratios r₁,r₂ → 0,
    * the text-shingle regime). Candidates still come from the SAME LSH
    * bucket equi-join as [[approxSimilarityJoin]] — never all pairs.
    *
    * The point is exchange width: the candidate join ships 8 bytes of
    * signature per row instead of k×32-char hash strings (64× narrower at
    * k=16, 400× at k=100), and the per-pair score is one XOR + popcount
    * instead of a k-element array walk. At 100 TB this turns the dominant
    * pair-scoring shuffle into a (long, long, long) stream. The estimate
    * is noisier per hash (the paper's variance trade: b=1 needs ~3× the
    * hashes of b=64 for equal variance at J≈0.5) — the gate carries both
    * the matched-bit count and the estimate, and thresholds on the latter.
    */
  def bbitSimilarityJoin(threshold: Double): DataFrame = {
    val k = cfg.numHash
    require(k <= 63, s"bit packing needs numHash <= 63, got $k")
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // hex-string signatures (md5 / xxh128-parity modes): lowest bit = parity
    // of the last hex digit; long signatures (xx-fast mode): low bit direct
    val bitOf = indexDf.schema(Cols.Signature).dataType match {
      case ArrayType(StringType, _) =>
        "cast(conv(right(h, 1), 16, 10) as bigint) % 2"
      case _ => "h & cast(1 as bigint)"
    }
    val pack = expr(s"aggregate(transform(${Cols.Signature}, (h, i) -> " +
      s"($bitOf) * shiftleft(cast(1 as bigint), i)), " +
      "cast(0 as bigint), (acc, x) -> acc + x)")
    val packed = indexDf.where(col(Cols.Signature).isNotNull)
      .select(col(Cols.Id), pack.as("bits"), col(Cols.BucketIds))
    val a = packed.select(col(Cols.Id).as("a_id"), col("bits").as("a_bits"),
      explode(col(Cols.BucketIds)).as("bucket"))
    val b = packed.select(col(Cols.Id).as("b_id"), col("bits").as("b_bits"),
      explode(col(Cols.BucketIds)).as("bucket"))
    val mask = (1L << k) - 1
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr(s"bit_count((~(a_bits ^ b_bits)) & ${mask}L)").cast("long")
          .as("matched_bits"))
      .withColumn("jaccard_est",
        round((col("matched_bits").cast("double") * 2 - k) / k, 6))
      .where(col("jaccard_est") >= threshold)
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col("matched_bits"), col("jaccard_est"))
  }

  /** Keep only documents that do NOT near-duplicate any indexed document
    * (signature jaccard ≥ threshold against some index entry) — the
    * curation filter for incremental ingestion: featurize incoming docs,
    * bucket equi-join against the cached index, score, anti-join the
    * matched ids away. Docs with null signatures (empty/OOV) cannot match
    * anything and are kept. One bucket-key shuffle; the anti join carries
    * only ids.
    */
  def filterNovel(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val qf = explodedQueryFeatures(docs, idCol, textCol)
    val ix = indexDf.where(col(Cols.Signature).isNotNull)
      .select(col(Cols.Signature).as("ix_sig"), explode(col(Cols.BucketIds)).as("bucket"))
    val dupIds = qf.join(ix, Seq("bucket"))
      .where(H.signatureJaccard(col("q_sig"), col("ix_sig")) >= threshold)
      .select(col("qid")).distinct()
    docs.join(dupIds, docs(idCol).cast("long") === dupIds("qid"), "left_anti")
  }

  /** Incrementally extend the fitted index with new documents — the
    * operation the reference cannot do (its vocabulary pins the whole
    * corpus; ingest = full rebuild). Direct mode's featurize is a pure
    * per-row projection, so the new docs are signed independently and the
    * index is a union: no reshuffle, no recompute of the existing side
    * (it reuses this model's cached blocks). The returned model is
    * independent; `unpersist()` the old one when done with it. Ids are the
    * caller's contract — duplicates are indexed twice, exactly like
    * fitting over a corpus with repeated ids.
    */
  def append(newDocs: DataFrame, idCol: String = Cols.Id,
      textCol: String = Cols.Text): MinHashLSHModel = {
    require(vocabulary.isEmpty,
      "append requires direct (vocabulary-free) mode: the vocabulary pins a " +
        "global shingle index that new documents would invalidate")
    val newBase = graft.SparkUtil.ensureParallelism(
      newDocs.select(col(idCol).cast("long").as(Cols.Id), col(textCol).as(Cols.Text)))
    val addition = lsh.featurize(newBase, Cols.Id, Cols.Text, None)
      .select(Cols.Id, Cols.Signature, Cols.BucketIds)
    new MinHashLSHModel(cfg, lsh, documents.union(newBase),
      indexDf.union(addition).cache(), None)
  }

  def unpersist(): Unit = {
    releaseQueryCaches()
    indexDf.unpersist()
    vocabulary.foreach(_.unpersist())
  }

  /** Persist the fitted model: index + documents (+ vocabulary) as parquet,
    * config as a 1-row JSON — filesystem-agnostic (all writes go through
    * Spark, no driver-local file APIs).
    */
  def save(path: String): Unit = {
    indexDf.write.mode("overwrite").parquet(s"$path/index")
    documents.write.mode("overwrite").parquet(s"$path/documents")
    vocabulary.foreach(_.write.mode("overwrite").parquet(s"$path/vocabulary"))
    val s = documents.sparkSession
    import s.implicits._
    Seq(MinHashLSH.ConfigRow.from(cfg)).toDS()
      .coalesce(1).write.mode("overwrite").json(s"$path/config")
  }
}

object MinHashLSH {
  private[operators] final case class ConfigRow(
      numShingles: Int, numHash: Int, numBands: Int, numRows: Int,
      numBuckets: Int, bucketHexLen: Int, mode: String,
      useVocabulary: Boolean, vocabBroadcast: Boolean) {
    def toConfig: MinHashConfig = MinHashConfig(numShingles, numHash, numBands,
      numRows, numBuckets, bucketHexLen,
      mode match {
        case "xx" => XxFast
        case "xx128" => Xx128Parity
        case _ => Md5Parity
      }, useVocabulary, vocabBroadcast)
  }
  private[operators] object ConfigRow {
    def from(c: MinHashConfig): ConfigRow = ConfigRow(c.numShingles, c.numHash,
      c.numBands, c.numRows, c.numBuckets, c.bucketHexLen,
      c.mode match {
        case XxFast => "xx"
        case Xx128Parity => "xx128"
        case Md5Parity => "md5"
      }, c.useVocabulary, c.vocabBroadcast)
  }

  /** FIT-FREE point-query ANN from a persisted inverted index — the
    * COLD-START server path: a fresh session answers from the warehouse
    * posting table plus the documents table alone, never featurizing or
    * even counting the corpus (direct mode only: query featurization is
    * stateless; vocabulary mode needs the fitted vocab — use [[loadModel]]
    * and [[MinHashLSHModel.approxNearestNeighborsIndexed]] there). Result
    * contract and plan shape are [[MinHashLSHModel.approxNearestNeighborsIndexed]]'s:
    * the scan carries PartitionFilters on the query's bucket prefixes.
    */
  def annFromInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, docs: DataFrame, idCol: String, textCol: String,
      key: String, n: Int, cfg: MinHashConfig): DataFrame =
    annFromInvertedIndex(spark, table, docs, idCol, textCol, key, n, cfg, None)

  /** [[annFromInvertedIndex]] served AT A NAMED SNAPSHOT
    * ([[graft.sources.IndexStore.pinInverted]]): the postings, the
    * supersession cutoffs, and the hot-skip list all resolve through the
    * pin — the exact index state the pin froze, however far the live
    * table has appended or compacted past it. Tombstones alone read LIVE
    * (takedown compliance pierces the snapshot). The text twin of
    * [[IvfModel.load]]'s pinned overload.
    */
  def annFromInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, docs: DataFrame, idCol: String, textCol: String,
      key: String, n: Int, cfg: MinHashConfig,
      pin: Option[String]): DataFrame = {
    require(!cfg.useVocabulary,
      "vocabulary mode needs the fitted vocabulary — use loadModel + approxNearestNeighborsIndexed")
    val one = spark.createDataFrame(
      java.util.Collections.singletonList(Row(0L, key)),
      StructType(Seq(
        StructField(Cols.Id, LongType, nullable = false),
        StructField(Cols.Text, StringType, nullable = true))))
    val qf = new MinHashLSH(cfg).featurize(one, Cols.Id, Cols.Text, None)
      .select(col(Cols.Signature).as("q_sig"), col(Cols.BucketIds).as("q_buckets"))
      .where(col("q_sig").isNotNull)
    val base = docs.select(col(idCol).cast("long").as(Cols.Id),
      col(textCol).as(Cols.Text))
    serveFromInverted(spark, table, base, qf, n, pin)
  }

  /** The batch form of the point path's hot-bucket policy: drop each
    * query's buckets that sit on the table's over-occupied `_hot` list —
    * a stop-word-like bucket would pair EVERY query in the workload with
    * its entire (huge) posting list, and skipping it only sharpens
    * precision — with the same per-query fallback (a query whose every
    * bucket is hot keeps its full set: an empty answer serves nobody).
    * The hot list is bounded (the over-threshold tail), so both the
    * isin literal and the fallback anti-join stay driver-cheap; `qf` is
    * backed by the persisted query-feature cache, so the double
    * reference costs no recompute.
    */
  private[operators] def hotCapQueryBuckets(qf: DataFrame,
      hot: Set[String]): DataFrame =
    if (hot.isEmpty) qf
    else {
      val live = qf.where(!col("bucket").isin(hot.toSeq: _*))
      val fallback = qf.join(live.select(col("qid")).distinct(),
        Seq("qid"), "left_anti")
      live.unionByName(fallback)
    }

  /** The supersession-cutoff frame of a maintained table, pre-hinted for
    * its serve-side join: broadcast while the dirty log's bytes fit the
    * budget (`graft.serve.cutoffBroadcastMaxBytes`, default 32 MB — the
    * common case, since the log clears at every compaction), SHUFFLE_HASH
    * past it — unlike the tombstone frame (takedown-sized by nature), the
    * backlog is workload-sized, and a long compaction interval must
    * degrade the plan to an id-keyed shuffle join, never grow an
    * unbounded broadcast until the driver OOMs. The byte signal is the
    * log's file lengths — no job runs to decide.
    */
  private def cutoffSide(spark: org.apache.spark.sql.SparkSession,
      table: String, pin: Option[String] = None): Option[DataFrame] =
    pin.fold(graft.sources.IndexStore.supersessionCutoffsSized(spark, table))(
        p => graft.sources.IndexStore.pinnedCutoffsSized(spark, table, p))
      .map { case (c, bytes) =>
        val cap = spark.conf.getOption("graft.serve.cutoffBroadcastMaxBytes")
          .map(_.toLong).getOrElse(32L << 20)
        if (bytes <= cap) broadcast(c) else c.hint("shuffle_hash")
      }

  /** The queryable posting rows of an inverted table: every data posting
    * (tombstone markers excluded by partition value) whose seq outranks
    * its id's newest DELETE marker — so a takedown is served exactly from
    * the moment its tombstone lands, before any compaction, and a later
    * re-ingest (seq above the tombstone) resurrects the id — AND whose
    * seq reaches its id's supersession cutoff ([[graft.sources.IndexStore
    * .supersessionCutoffs]], the dirty log's newest append seq per id):
    * a re-ingested id's stale postings are excluded the moment the
    * re-ingest lands, so serving between compactions is EXACTLY a fresh
    * build over the current corpus (gate `ann_index_fresh`). Tables with
    * no `ingest_seq` column never carry tombstones (appendTombstones
    * requires the column) and pass through untouched. The tombstone frame
    * is broadcast-sized by construction (one marker row per deleted id);
    * the cutoff frame is broadcast only while its backlog fits the budget
    * ([[cutoffSide]] — past it the join degrades to shuffle).
    */
  private[operators] def livePostings(
      spark: org.apache.spark.sql.SparkSession, table: String,
      probe: Option[(Seq[String], Seq[String])] = None,
      pin: Option[String] = None): DataFrame = {
    import graft.sources.IndexStore
    // a PINNED read resolves the snapshot's file inventory and its frozen
    // cutoffs; tombstones still read LIVE (compliance pierces the pin —
    // the serveFromInverted contract, on the batch path)
    val postings = pin.fold(IndexStore.loadInverted(spark, table))(p =>
      IndexStore.loadInvertedPinned(spark, table, p, probe.map(_._1)))
    val data = probe match {
      // literal probe set (prefixes, buckets): PartitionFilters prune the
      // directories, the bucket IN goes to the parquet reader — the
      // point-query scan shape applied to a small batch. The tombstone
      // partition is excluded by construction (markers carry null buckets
      // under the reserved prefix, never a probed value).
      case Some((prefixes, buckets)) =>
        postings.where(col("bkt_pfx").isin(prefixes: _*))
          .where(col("bucket").isin(buckets: _*))
      case None =>
        postings.where(col("bkt_pfx") =!= IndexStore.TombstonePrefix)
    }
    if (!postings.columns.contains("ingest_seq"))
      data.select(col(Cols.Id), col(Cols.Signature), col("bucket"))
    else {
      val tomb = pin.fold(postings)(_ => IndexStore.loadInverted(spark, table))
        .where(col("bkt_pfx") === IndexStore.TombstonePrefix)
        .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__tomb_seq"))
      val unTombed = data.join(broadcast(tomb), Seq(Cols.Id), "left_outer")
        .where(col("__tomb_seq").isNull || col("__tomb_seq") < col("ingest_seq"))
      cutoffSide(spark, table, pin).fold(unTombed)(c =>
          unTombed.join(c, Seq(Cols.Id), "left_outer")
            .where(col("__cut").isNull || col("ingest_seq") >= col("__cut")))
        .select(col(Cols.Id), col(Cols.Signature), col("bucket"), col("ingest_seq"))
    }
  }

  /** Shared serving core of the two inverted-index query paths: partition-
    * pruned posting scan → per-id winner → signature scoring →
    * TakeOrderedAndProject → broadcast document join. The single bounded
    * driver round-trip is the query-feature fetch (numBands bucket
    * strings) — required to turn the query's buckets into literal
    * partition predicates the scan can prune on.
    *
    * Layout knobs come from the table's own meta file ([[graft.sources
    * .IndexStore.invertedMeta]]): the partition-probe width (a
    * caller-supplied width that disagreed with the written layout would
    * probe values that don't exist and silently return nothing) and the
    * hot-bucket policy. When the table keeps occupancy stats, query
    * buckets on the over-occupied list are SKIPPED: a stop-word-like
    * bucket (boilerplate-heavy corpus) would make one point query read
    * its entire posting list, and dropping it only sharpens precision —
    * the surviving buckets carry rarer, more selective band signatures.
    * A query whose EVERY bucket is hot falls back to the full probe set
    * (an empty answer serves nobody).
    *
    * Maintenance semantics: EXACT in both directions, before any
    * compaction. Deletes — ids whose newest tombstone outranks their
    * newest posting are excluded the moment the marker lands. Re-ingest
    * supersession — matched postings below their id's supersession
    * cutoff ([[graft.sources.IndexStore.supersessionCutoffs]], the dirty
    * log's newest append seq per id) are dropped before scoring, so a
    * stale version can never surface, even when ONLY it shares a query
    * bucket (the pre-round-15 transient-anomaly window — now closed;
    * gate `ann_index_fresh` serves an uncompacted maintained table
    * against the fresh-build oracle). The per-id max-seq winner rule
    * stays beneath as the no-log fallback.
    */
  private[operators] def serveFromInverted(
      spark: org.apache.spark.sql.SparkSession, table: String,
      documents: DataFrame, qf: DataFrame, n: Int,
      pin: Option[String] = None): DataFrame = {
    import graft.sources.IndexStore
    val qRows = qf.select(col("q_buckets")).collect()
    if (qRows.isEmpty || qRows(0).isNullAt(0))
      // empty/degenerate key: no signature ⇒ no candidates (same contract
      // as the in-memory path, which crossJoins an empty broadcast)
      return documents.limit(0)
        .select(col(Cols.Id), col(Cols.Text),
          lit(null).cast("float").as(Cols.Jaccard))
    val meta = IndexStore.invertedMeta(spark, table)
    val all = qRows(0).getSeq[String](0).distinct
    // a PINNED serve freezes the policy inputs with the data: the pin's
    // own hot list and dirty-log cutoffs, never the live ones — a pinned
    // answer must not drift with live ingest
    val hot = pin.fold(IndexStore.hotBuckets(spark, table))(p =>
      IndexStore.pinnedHotBuckets(spark, table, p))
    val qBuckets = { val live = all.filterNot(hot); if (live.isEmpty) all else live }
    val prefixes =
      qBuckets.map(b => b.substring(0, math.min(meta.prefixLen, b.length))).distinct
    // pinned point path: the probe prefixes subset the pin's FILE
    // inventory on the driver before the reader is built — the pinned
    // twin of the live scan's PartitionFilters
    val postings = pin.fold(IndexStore.loadInverted(spark, table))(p =>
      IndexStore.loadInvertedPinned(spark, table, p, Some(prefixes)))
    val matched = postings
      .where(col("bkt_pfx").isin(prefixes: _*))   // PartitionFilters
      .where(col("bucket").isin(qBuckets: _*))    // PushedFilters in-dir
    val cands =
      if (!postings.columns.contains("ingest_seq"))
        matched.select(col(Cols.Id), col(Cols.Signature))
          .dropDuplicates(Cols.Id) // multi-band hits rejoin once; sig identical
      else {
        // pre-compaction exactness: matched rows below their id's
        // supersession cutoff drop first (a stale version can never
        // surface, even as the ONLY match), the newest surviving posting
        // wins per id, and an id whose newest tombstone outranks its
        // newest posting is deleted. Tombstones are read from the LIVE
        // table even under a pin — takedown compliance pierces the
        // snapshot (the [[graft.sources.IndexStore.pinInverted]]
        // contract; text markers persist, so live ⊇ pin-time)
        val fresh = cutoffSide(spark, table, pin).fold(matched)(c =>
          matched.join(c, Seq(Cols.Id), "left_outer")
            .where(col("__cut").isNull || col("ingest_seq") >= col("__cut")))
        val tomb = pin.fold(postings)(_ => IndexStore.loadInverted(spark, table))
          .where(col("bkt_pfx") === IndexStore.TombstonePrefix)
          .groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__tomb_seq"))
        fresh.groupBy(col(Cols.Id))
          .agg(max_by(col(Cols.Signature), col("ingest_seq")).as(Cols.Signature),
            max(col("ingest_seq")).as("__seq"))
          .join(broadcast(tomb), Seq(Cols.Id), "left_outer")
          .where(col("__tomb_seq").isNull || col("__tomb_seq") < col("__seq"))
          .select(col(Cols.Id), col(Cols.Signature))
      }
    val topk = cands
      .crossJoin(broadcast(qf.select(col("q_sig"))))
      .select(col(Cols.Id),
        H.signatureJaccard(col(Cols.Signature), col("q_sig")).as(Cols.Jaccard))
      .orderBy(col(Cols.Jaccard).desc, col(Cols.Id).asc)
      .limit(n)
    documents.join(broadcast(topk), Seq(Cols.Id))
      .select(col(Cols.Id), col(Cols.Text), col(Cols.Jaccard))
      .orderBy(col(Cols.Jaccard).desc, col(Cols.Id).asc)
  }

  /** Load a model persisted by [[MinHashLSHModel.save]]; the index is
    * re-cached, ready for queries.
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): MinHashLSHModel = {
    import spark.implicits._
    // JSON infers ints as bigint; pin the schema from the encoder
    val cfg = spark.read
      .schema(org.apache.spark.sql.Encoders.product[ConfigRow].schema)
      .json(s"$path/config").as[ConfigRow].collect()(0).toConfig
    val lsh = new MinHashLSH(cfg)
    val docs = spark.read.parquet(s"$path/documents")
    val index = spark.read.parquet(s"$path/index").cache()
    val vocab =
      if (cfg.useVocabulary) Some(spark.read.parquet(s"$path/vocabulary").cache()) else None
    new MinHashLSHModel(cfg, lsh, docs, index, vocab)
  }
}
