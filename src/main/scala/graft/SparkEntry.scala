package graft

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}
import graft.operators._
import graft.sources.IndexStore
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2 ids + training-pipeline extensions), each with a DuckDB
  * oracle in `oracleSql`. Column names and deterministic ORDER BYs are kept
  * identical on both sides; md5 hash mode makes the whole MinHash pipeline
  * bit-comparable across engines.
  */
object SparkEntry {

  // Canonical configs: cfg16 keeps mid-tier oracle queries cheap; cfg100 is
  // the reference-shape flagship (NUM_HASH=100, 25×4 bands,
  // /root/reference/src/minhash_config.py:2-19).
  private val cfg16 = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

  /** Fixed boilerplate paragraph for the hot-bucket adversarial gates: a
    * third of the corpus is replaced with this one text, inflating its
    * band buckets to ~N/3 postings each (the stop-word-bucket shape of a
    * boilerplate-heavy crawl). Lowercase a-z words only — embeds verbatim
    * in the DuckDB oracle literal.
    */
  private[graft] val hotBoiler = "terms and conditions apply all rights reserved " +
    "unauthorized reproduction of this document or any portion thereof is " +
    "strictly prohibited please refer to the licensing agreement for further " +
    "details about permitted use storage transmission and distribution of " +
    "the enclosed material in any medium the publisher assumes no " +
    "responsibility for errors or omissions and makes no warranty express " +
    "or implied regarding fitness for a particular purpose"
  private val cfg16Vocab = cfg16.copy(useVocabulary = true)
  private val cfg100 = MinHashConfig(numHash = 100, numBands = 25, numRows = 4, bucketHexLen = 4)
  private val cfg100Fast = cfg100.copy(mode = XxFast)
  // the reference's DEFAULT config: xxh128 family over vocab indices,
  // xxh32 % 500 band buckets — bit-parity mode (functions/XxHash.scala)
  private val cfg100Xx128 = cfg100.copy(mode = Xx128Parity, useVocabulary = true)

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    // InferFiltersFromGenerate clones the (expensive) generator input
    // expression into a pre-filter that pushdown then moves below any
    // repartition, onto the narrow scan — re-evaluating the whole shingle
    // pipeline twice on one task (PERF.md). It only adds redundant work for
    // this workload (explode already skips empty arrays), so exclude it.
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    s.read.parquet(s"$dir/$name.parquet")
  }

  private def docs(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "documents")

  /** Occupancy-constant index sizing for the cell/bucket-blocked embedding
    * operators: per-cell pair joins are quadratic in OCCUPANCY, so the
    * cell count must grow with the corpus — a fixed nLists that is right
    * at sf0.1 is 100× too coarse at sf10. Targets are chosen so every
    * gate scale (sf ≤ 0.1) derives the HISTORIC constants (8 lists /
    * 4 sign bits — the values the oracles replay); only beyond-gate
    * corpora (the sf1 validation bench and up) scale out, capped at the
    * typedlit ceiling (shard the corpus for more, per the operator docs).
    */
  /** The planted CDC change feed of the `cdc_apply_*` gate family: base
    * projection of orders plus updates (stacked on %20), deletes (%7≡3),
    * and inserts (key+10^9) — shared by the plain and Bloom-pruned MERGE
    * gates, which must produce row-identical results.
    */
  private def cdcPlantedFeed(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    def ch(pred: org.apache.spark.sql.Column, seq: Int, op: String,
        key: org.apache.spark.sql.Column,
        status: org.apache.spark.sql.Column,
        price: org.apache.spark.sql.Column): DataFrame =
      o.where(pred).select(key.as("o_orderkey"),
        lit(seq.toLong).as("seq"), lit(op).as("op"), col("o_custkey"),
        status.as("o_orderstatus"), price.as("o_totalprice"))
    val changes =
      ch(col("o_orderkey") % 10 === 0, 1, "U", col("o_orderkey"),
          lit("U1"), col("o_totalprice") + 1.5)
        .unionByName(ch(col("o_orderkey") % 20 === 0, 2, "U",
          col("o_orderkey"), lit("U2"), col("o_totalprice") + 2.5))
        .unionByName(ch(col("o_orderkey") % 7 === 3, 3, "D",
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
        .unionByName(ch(col("o_orderkey") % 13 === 1, 1, "I",
          col("o_orderkey") + 1000000000L, col("o_orderstatus"),
          col("o_totalprice")))
    (o, changes)
  }

  private def ivfListsFor(n: Long): Int =
    math.min(graft.operators.SimSearch.TypedLitCentroidMax.toLong,
      math.max(8L, n / 250L)).toInt // sf0.1 (n=2000) ⇒ the historic 8
  private def signBitsFor(n: Long): Int = {
    val cells = (n + 127L) / 128L // target occupancy ~128 (sf0.1 ⇒ 4 bits)
    if (cells <= 1L) 4
    else math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(cells - 1L))
  }

  /** Shared planted page table of the link-graph gate family
    * (`graph_link_extract` / `graph_host_rank` / `pipeline_curate_v5`):
    * each doc lives on host h⟨rh⟩.example with rh = (doc_id div 2) % 10
    * (pairs share a host), and its markup carries one external anchor to
    * h⟨(2·rh+1)%10⟩.example (an odd host — for rh=9 that resolves back to
    * h9 itself), one relative anchor, one absolute SELF anchor with
    * uppercase scheme/HREF and an explicit port, and four anchors that
    * extraction must drop (fragment, mailto, javascript, empty href, plus
    * a no-href `<a name>`). Every field derives from doc_id arithmetic, so
    * the oracles recompute links and ranks in closed form.
    */
  private def linkPages(s: SparkSession, d: String): DataFrame = {
    val dd = SparkUtil.ensureParallelism(docs(s, d))
    val rh = expr("(doc_id div 2) % 10")
    dd.select(col("doc_id"),
      concat(lit("http://h"), rh, lit(".EXAMPLE/p"),
        col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><body><p>doc</p><a class=\"c\" href=\"http://h"),
        expr("(2 * ((doc_id div 2) % 10) + 1) % 10"),
        lit(".example/q\">ext</a><a href=\"/rel/p\">rel</a>" +
          "<A HREF=\"HTTP://h"), rh,
        lit(".example:8080/x\">self</A><a href=\"#top\">t</a>" +
          "<a href=\"mailto:a@b.c\">m</a>" +
          "<a href=\"JavaScript:void(0)\">j</a>" +
          "<a href=\"\">e</a><a name=\"n\">plain</a></body></html>"))
        .as("html"))
  }

  /** Shared planted corpus of the bloom-decontamination gate pair: bench =
    * every 20th doc with a 5-token canary phrase appended (canary number
    * cycles 0-4 over bench docs), corpus = the rest, with the mod-7==3 docs
    * carrying a matching canary — the only deterministic 5-shingle overlap,
    * so exact contamination is selective and the negatives can witness
    * bloom false positives. Mirrored verbatim by the oracle CTEs.
    */
  private def bloomGateTables(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val dd = docs(s, d)
    val bench = dd.where(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" benchmark canary sequence number "),
          (expr("doc_id div 20") % 5).cast("string")).as("text"))
    val corpus = dd.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" benchmark canary sequence number "),
            (col("doc_id") % 5).cast("string")))
          .otherwise(col("text")).as("text"))
    (corpus, bench)
  }

  /** Shared planted crawl-URL corpus of the URL gate family (canonical,
    * url-keyed dedup, domain stats): three messy raw-form families per
    * doc_id — see the `text_url_canonical` gate comment. Mirrored verbatim
    * by `plantedUrlSql`.
    */
  /** Planted quality-classifier weight table (4096 hashed buckets, integer
    * micro-logits): w[b] = (((b·37+11) mod 2001) − 1000) milli-logits — a
    * stand-in for offline-trained fastText weights, replayable in SQL.
    */
  private lazy val qualityWeights: Seq[Long] =
    (0 until 4096).map(b => (((b * 37 + 11) % 2001) - 1000) * 1000L)

  /** Stopword-trained deterministic langid weight table + the planted
    * corpus for its gates: doc_id % 5 ∈ {0..3} gets that language's full
    * stopword list prepended (explicit signal for both the heuristic and
    * the classifier); the 5th residue stays unplanted.
    */
  // 16384: with ~120 trained buckets, a body trigram collides at ~0.7% —
  // collision noise stays an order of magnitude under the planted-prefix
  // signal (at 4096 the es/fr stopword overlap plus ~6% collisions tipped
  // a third of planted-es docs to fr)
  private val LangIdBuckets = 16384
  private lazy val langIdWeights =
    graft.operators.TextAnalysis.langIdTrainFromStopwords(LangIdBuckets)
  // 3 repetitions: the explicit signal must dominate the body's incidental
  // stopword-trigram mass (a 2000-char synthetic doc carries ~20M micro of
  // accidental hits; one 10-word list ≈ 30M is too close, three ≈ 90M is not)
  private def langIdPrefix(lang: String): String = {
    val one = graft.operators.TextAnalysis.Stopwords(lang).mkString(" ")
    s"$one $one $one "
  }
  private def langIdPlanted(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(lit(langIdPrefix("de")), col("text")))
        .when(col("doc_id") % 5 === 1, concat(lit(langIdPrefix("en")), col("text")))
        .when(col("doc_id") % 5 === 2, concat(lit(langIdPrefix("es")), col("text")))
        .when(col("doc_id") % 5 === 3, concat(lit(langIdPrefix("fr")), col("text")))
        .otherwise(col("text")).as("text"))

  private def plantedUrls(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://Sub"), (col("doc_id") % 10).cast("string"),
          lit(".Example.ORG:443/P/"), (col("doc_id") % 20).cast("string"),
          lit("?id="), (col("doc_id") % 20).cast("string"),
          lit("#sec"), col("doc_id").cast("string")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://sub"), (col("doc_id") % 10).cast("string"),
            lit(".example.org/p/gclid=x?next=/a?gclid=1&myfbclid=keep"),
            lit("&utm_medium=z"), col("doc_id").cast("string")))
        .otherwise(concat(lit("https://sub"), (col("doc_id") % 10).cast("string"),
          lit(".example.org/P/"), (col("doc_id") % 20).cast("string"),
          lit("?utm_source=feed&id="), (col("doc_id") % 20).cast("string"),
          lit("&fbclid=x"), col("doc_id").cast("string"))).as("raw_url"))

  /** Shared front end of the source round-trip gates: docs without line
    * breaks (line-per-row formats cannot represent them; the oracles filter
    * identically) and a deterministic per-corpus temp dir so repeated runs
    * overwrite instead of accumulating copies.
    */
  private def lineSafeDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(!col("text").rlike("[\\n\\r]"))
  private def roundTripDir(dir: String, prefix: String): String =
    sys.props("java.io.tmpdir") + s"/$prefix-${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** Stage a streaming gate's input files once per (session, corpus, name).
    *
    * Every `stream_*_real` gate used to rewrite its staged parquet on every
    * execution, so a bench rep paid a full batch write job before the
    * streaming query even started — pure machinery billed to the operator
    * (round-10 verdict task 2). The staged content is a deterministic
    * function of (corpus dir, gate), so it is staged exactly once per
    * process and reused — the same memoize-per-(session, dir) convention as
    * the fitted-index cache. A regenerated corpus is picked up at next
    * process start (each process stages fresh on first use).
    */
  private val stagedDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]
  private def stageOnce(s: SparkSession, dir: String, prefix: String)(
      write: String => Unit): String =
    stagedDirs.getOrElseUpdate((s, dir, prefix), {
      val tmp = roundTripDir(dir, prefix)
      write(tmp)
      tmp
    })

  /** Pin the state-store partition count for a streaming query START.
    *
    * A stateful streaming query materializes one state store per shuffle
    * partition per micro-batch; the count is captured when the query starts.
    * The bench session runs 32 shuffle partitions, which would mean 32
    * store opens+commits per batch for gates whose whole state is a few
    * cells — 8 keeps the stores proportionate to the gate data while
    * remaining a real multi-partition shuffle. Scoped: set at start,
    * restored immediately after (the running query keeps its pinned value).
    */
  private def withStatePartitions[T](s: SparkSession, n: Int = 8)(start: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try start finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** The raw events.parquet file staged for file-source streaming — ONE
    * copy shared by every gate that streams the unmodified events table
    * (join / tumbling / topk); the gates previously kept three identical
    * copies under three prefixes, re-copied per execution.
    */
  private def stagedEventsRaw(s: SparkSession, d: String): String =
    stageOnce(s, d, "graft-stream-events") { tmp =>
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.copy(java.nio.file.Paths.get(d, "events.parquet"),
        p.resolve("events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** `documents(doc_id, text)` staged as 4 parquet files — the shared
    * 4-trigger source for the stateless-projection stream gates
    * (html / gopher / cms / index-update).
    */
  private def stagedDocs4(s: SparkSession, d: String): String =
    stageOnce(s, d, "graft-stream-docs4") { tmp =>
      docs(s, d).select(col("doc_id"), col("text")).repartition(4)
        .write.mode("overwrite").parquet(tmp)
    }

  /** `events.ts` has shipped as TWO physical types across driver testdata
    * generations: TIMESTAMP(NANOS) (Spark 4 only reads it as long nanos
    * under the legacy flag — convert with integer division, a double
    * roundtrip would lose precision at 1.7e18) and TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ). Accept both, normalizing to the same
    * session-zone TIMESTAMP instants — the session zone is pinned UTC, so
    * the NTZ cast reproduces the nanos-path values bit-for-bit.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    SparkUtil.normalizeEventTs(tbl(s, dir, "events"))
  }

  /** The deterministic query key: first 120 chars of doc 0 (the reference's
    * key_short is likewise a prefix of doc 0, BASELINE.md). Memoized per
    * (session, dir) — one collect per corpus, not one per query.
    */
  private val keyCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def keyOf(s: SparkSession, dir: String): String =
    keyCache.getOrElseUpdate((s, dir),
      docs(s, dir).where(col("doc_id") === 0).select("text")
        .collect()(0).getString(0).take(120))

  /** Fitted models memoized per (session, dir, cfg): an LSH index is
    * database infrastructure — built once, queried many times (the
    * reference fits once under DO_CACHE and serves every query from the
    * cached index, /root/reference/src/minhash_pyspark.py:435-447). The 14
    * index-backed gate queries share 4 fits per process instead of refitting
    * per query. The cached frames are plain persists: an external cache
    * sweep (graft.Bench between reps) just means the next use recomputes.
    */
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, MinHashConfig), MinHashLSHModel]
  private def fitted(s: SparkSession, dir: String, cfg: MinHashConfig): MinHashLSHModel = {
    // evict entries of stopped sessions — the memo must not pin dead
    // sessions (and their full-corpus model plans) for the JVM's lifetime
    modelCache.keys.filter(_._1.sparkContext.isStopped).foreach(modelCache.remove)
    keyCache.keys.filter(_._1.sparkContext.isStopped).foreach(keyCache.remove)
    val m = modelCache.getOrElseUpdate((s, dir, cfg),
      new MinHashLSH(cfg).fit(docs(s, dir), idCol = "doc_id", textCol = "text"))
    // an external clearCache() sweep (graft.Bench between reps) deregisters
    // the shared index; without re-registering, every later plan reference
    // would recompute the featurize pipeline (twice in self-joins)
    org.apache.spark.sql.graftshim.CacheBridge.ensureCached(m.indexDf)
    m.vocabulary.foreach(org.apache.spark.sql.graftshim.CacheBridge.ensureCached)
    m
  }

  /** Persisted bucket-inverted ANN index, memoized per (session, dir): the
    * point-query serving layout is written ONCE per corpus (like a real
    * deployment's index build) and every `ann_query_indexed` execution
    * answers from it with partition-pruned scans. The memo stores only the
    * table name; the data lives in the warehouse, surviving cache sweeps.
    */
  private val invertedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, MinHashConfig, Int), String]
  private def invertedIndexFor(s: SparkSession, d: String,
      cfg: MinHashConfig = cfg100, numBuckets: Int = 0): String = {
    invertedCache.keys.filter(_._1.sparkContext.isStopped).foreach(invertedCache.remove)
    invertedCache.getOrElseUpdate((s, d, cfg, numBuckets), {
      // the name spells out EVERY signature-determining config field (and
      // the file-bucketing layout): the memo keys on the full config, so
      // two configs sharing numHash (a fast-mode or different-band
      // variant) must not collapse onto one table name — the second build
      // would silently overwrite the first while both memo entries keep
      // serving it
      val table = s"graft_ann_inverted_${cfg.numHash}_${cfg.numBands}x${cfg.numRows}_" +
        s"${cfg.bucketHexLen}_${cfg.mode.toString.toLowerCase(java.util.Locale.ROOT)}_" +
        (if (numBuckets > 0) s"b${numBuckets}_" else "") +
        d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      fitted(s, d, cfg).saveInvertedIndex(table, prefixLen = 2, numBuckets = numBuckets)
      table
    })
  }

  /** Planted hot-bucket corpus + its stats-bearing inverted table for
    * `ann_query_hotskip`, memoized per (session, dir): the gate measures
    * the SERVE policy, so the adversarial index (a pure function of the
    * corpus) is built once per process like [[invertedIndexFor]].
    */
  private val hotskipCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, DataFrame)]
  private def hotskipIndexFor(s: SparkSession, d: String): (String, DataFrame) = {
    hotskipCache.keys.filter(_._1.sparkContext.isStopped).foreach(hotskipCache.remove)
    hotskipCache.getOrElseUpdate((s, d), {
      val table = "graft_ann_hotskip_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      val planted = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 3 === 0, lit(hotBoiler))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      val ix = new MinHashLSH(cfg16).featurize(planted, Cols.Id, Cols.Text, None)
        .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
      IndexStore.saveInverted(ix, table, prefixLen = 2,
        hotBucketThreshold = planted.count() / 10)
      (table, planted)
    })
  }

  /** The hot-bucket corpus again, maintained under the SKETCH hot mode
    * ([[IndexStore.HotCms]]): the non-boiler slice saves as the base and
    * the boiler slice arrives as an APPEND, so the hot list the serve
    * policy reads comes from the Count-Min MERGE (matrix + delta log
    * only — no posting file is read however boiler-heavy the delta), not
    * from an exact recount. Memoized per (session, dir) like the exact
    * twin.
    */
  private val hotskipCmsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, DataFrame)]
  private def hotskipCmsIndexFor(s: SparkSession, d: String): (String, DataFrame) = {
    hotskipCmsCache.keys.filter(_._1.sparkContext.isStopped).foreach(hotskipCmsCache.remove)
    hotskipCmsCache.getOrElseUpdate((s, d), {
      val table = "graft_ann_hotskip_cms_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      val planted = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 3 === 0, lit(hotBoiler))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      def feat(df: DataFrame, seq: Long) = new MinHashLSH(cfg16)
        .featurize(df, Cols.Id, Cols.Text, None)
        .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
        .withColumn("ingest_seq", lit(seq))
      IndexStore.saveInverted(feat(planted.where(col(Cols.Id) % 3 =!= 0), 1L),
        table, prefixLen = 2, hotBucketThreshold = planted.count() / 10,
        hotMode = IndexStore.HotCms)
      IndexStore.appendInverted(feat(planted.where(col(Cols.Id) % 3 === 0), 2L),
        table)
      IndexStore.compactInverted(s, table) // the sketch merge runs here
      (table, planted)
    })
  }

  /** Seq-carrying inverted table WITH one tombstone (doc 82) for the
    * audit-lookup gate, built once per (session, dir): unlike the
    * mutating takedown gates, `ann_postings_audit` only READS the table —
    * the build is setup, the id-keyed lookup is the operator under test.
    */
  private val auditIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def auditIndexFor(s: SparkSession, d: String): String = {
    auditIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(auditIndexCache.remove)
    auditIndexCache.getOrElseUpdate((s, d), {
      val table = "graft_ann_audit_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      val ix = new MinHashLSH(cfg16).featurize(dd, Cols.Id, Cols.Text, None)
        .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
        .withColumn("ingest_seq", lit(1L))
      IndexStore.saveInverted(ix, table, prefixLen = 1)
      IndexStore.appendTombstones(s, table,
        dd.where(col(Cols.Id) === 82L).select(col(Cols.Id)), seq = 2L)
      table
    })
  }

  /** Persisted IVF-PQ index (sim_recall_pq's parameters), trained + saved
    * once per (session, dir); `sim_recall_pq_loaded` replays from it. The
    * memo stores the directory — data survives cache sweeps on disk.
    */
  private val pqIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def pqIndexFor(s: SparkSession, d: String): String = {
    pqIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(pqIndexCache.remove)
    pqIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-pq-index")
      val m = SimSearch.trainIvfPq(tbl(s, d, "embeddings"), "vec_id",
        "embedding", nLists = 16, m = 16, ks = 64)
      m.save(dir)
      m.unpersist()
      dir
    })
  }

  /** Persisted IVF index (sim_recall_ivf's parameters), trained + saved
    * once per (session, dir); `sim_recall_ivf_loaded` replays from it —
    * the coarse-quantizer sibling of [[pqIndexFor]].
    */
  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ivfIndexFor(s: SparkSession, d: String): String = {
    ivfIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(ivfIndexCache.remove)
    ivfIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-ivf-index")
      val m = SimSearch.trainIvf(tbl(s, d, "embeddings"), "vec_id",
        "embedding", nLists = 16, iters = 2)
      m.save(dir)
      m.unpersist()
      dir
    })
  }

  /** Persisted IVF-PQ index for the PQ-upsert gate ([[ivfUpsertIndexFor]]
    * rationale: stale %17==3 slice at seq 1; the gate re-embeds it at
    * seq 2 through BOTH tables via PqModel.appendVectors). Mutating, so
    * its own dir.
    */
  private val pqUpsertIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def pqUpsertIndexFor(s: SparkSession, d: String): String = {
    pqUpsertIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(pqUpsertIndexCache.remove)
    pqUpsertIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-pq-upsert-index")
      val staleCorpus = tbl(s, d, "embeddings").select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
        nLists = 16, m = 16, ks = 64)
      PqModel(IvfModel(m.ivf.centroids,
          m.ivf.assigned.withColumn("ingest_seq", lit(1L))),
        m.codebooks, m.subDim,
        m.encoded.withColumn("ingest_seq", lit(1L))).save(dir)
      m.unpersist()
      dir
    })
  }

  /** A SEPARATE persisted IVF-PQ index for the PQ-takedown gate (the
    * [[ivfDelIndexFor]] rationale: it mutates, so it never shares
    * [[pqIndexFor]]'s replayed directory).
    */
  private val pqDelIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def pqDelIndexFor(s: SparkSession, d: String): String = {
    pqDelIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(pqDelIndexCache.remove)
    pqDelIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-pq-del-index")
      val m = SimSearch.trainIvfPq(tbl(s, d, "embeddings"), "vec_id",
        "embedding", nLists = 16, m = 16, ks = 64)
      m.save(dir)
      m.unpersist()
      dir
    })
  }

  /** A SEPARATE persisted IVF index for the vector-takedown gate — it
    * mutates (delete markers + compaction), so it must never share
    * [[ivfIndexFor]]'s directory that the loaded-replay gates replay.
    */
  private val ivfDelIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ivfDelIndexFor(s: SparkSession, d: String): String = {
    ivfDelIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(ivfDelIndexCache.remove)
    ivfDelIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-ivf-del-index")
      val m = SimSearch.trainIvf(tbl(s, d, "embeddings"), "vec_id",
        "embedding", nLists = 16, iters = 2)
      m.save(dir)
      m.unpersist()
      dir
    })
  }

  /** Persisted IVF index for the UPSERT gate: trained over the corpus with
    * the %17==3 slice deliberately STALE (negated vectors — the
    * "first-generation embedding"), saved seq-carrying at ingest_seq 1.
    * The gate re-embeds the slice (the true vectors) at seq 2 through
    * [[graft.operators.IvfModel.appendVectors]]. Mutating, so its own dir.
    */
  private val ivfUpsertIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ivfUpsertIndexFor(s: SparkSession, d: String): String = {
    ivfUpsertIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(ivfUpsertIndexCache.remove)
    ivfUpsertIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-ivf-upsert-index")
      val staleCorpus = tbl(s, d, "embeddings").select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir)
      m.unpersist()
      dir
    })
  }

  /** The manifest-mode twin of [[ivfUpsertIndexFor]]: identical stale
    * corpus and seeding, saved with the OBJECT-STORE-SAFE swap
    * ([[graft.sources.IndexStore.SwapManifest]]) so the gate's appends
    * and compaction commit through [[graft.sources.CellManifest]]
    * generation flips instead of directory renames.
    */
  private val ivfManifestIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ivfManifestIndexFor(s: SparkSession, d: String): String = {
    ivfManifestIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(ivfManifestIndexCache.remove)
    ivfManifestIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-ivf-manifest-index")
      val staleCorpus = tbl(s, d, "embeddings").select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      dir
    })
  }

  /** Persisted IVF index for the VECTOR AUDIT gate: the upsert builders'
    * stale corpus (%17==3 negated) saved at seq 1, the true %17==3 slice
    * re-embedded at seq 2, and vec_id 5 takedown-marked at seq 2. Like
    * [[auditIndexFor]], the mutations are all build — the gate only READS
    * the table afterwards, so the memo is sound.
    */
  private val vecAuditIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def vecAuditIndexFor(s: SparkSession, d: String): String = {
    vecAuditIndexCache.keys.filter(_._1.sparkContext.isStopped).foreach(vecAuditIndexCache.remove)
    vecAuditIndexCache.getOrElseUpdate((s, d), {
      val dir = roundTripDir(d, "graft-vec-audit-index")
      // the builder replays per JVM: save() overwrites the tables but the
      // takedown markers APPEND — wipe the dir so a re-run's audit shows
      // one event set, not one per Verify invocation
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val staleCorpus = tbl(s, d, "embeddings").select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir)
      m.unpersist()
      IvfModel.appendVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      IvfModel.deleteVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") === 5).select("vec_id"),
        seq = 2L)
      dir
    })
  }

  /** Pinned-snapshot lifecycle table for the `ann_snapshot_*` gates: the
    * prelim corpus saved manifest-mode at seq 1, the %5 correction
    * appended at seq 2 (an UNCOMPACTED backlog — the pin must carry its
    * cutoffs), pin `train_v1`, then the post-pin churn — the %3 revision
    * at seq 3, a compaction (dirty partitions flip to new generations;
    * pinned files retained), a doc-50 takedown (pierces every serving
    * state), and the pin exported to `<table>_exp` as a standalone
    * table. All mutations happen here; the gates only SERVE, so the
    * memo is sound and bench reps measure serving, not rebuilds.
    */
  private val annPinTableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def annPinTableFor(s: SparkSession, d: String): String = {
    annPinTableCache.keys.filter(_._1.sparkContext.isStopped).foreach(annPinTableCache.remove)
    annPinTableCache.getOrElseUpdate((s, d), {
      val table = "graft_ann_pin_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl", table + "_exp")
        .foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0,
          concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1,
        swapMode = IndexStore.SwapManifest)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table)
      IndexStore.pinInverted(s, table, "train_v1")
      // the revision REPLACES the text (not a prefix): the %3 docs'
      // signatures change completely, so pinned-vs-live divergence is
      // structural at every scale, never a minhash coin-flip
      IndexStore.appendInverted(feat(
        dd.where(col(Cols.Id) % 3 === 0).select(col(Cols.Id),
          concat(lit("revised edition number "), col(Cols.Id).cast("string"),
            lit(" replaces the prior draft")).as(Cols.Text)), 3),
        table)
      IndexStore.compactInverted(s, table)
      IndexStore.appendTombstones(s, table,
        dd.where(col(Cols.Id) === 50).select(col(Cols.Id)), seq = 4L)
      IndexStore.exportPinned(s, table, "train_v1", table + "_exp")
      table
    })
  }

  /** Cross-index consistent PIN-PAIR fixture for `snapshot_pair_pin`
    * ([[graft.sources.Snapshots.pinTrainingSet]]): a text index and a
    * vector index pinned as ONE training-set snapshot, with a RACING
    * vector ingest interleaved into the first attempt's pin window (via
    * the `pin.staged` hook) — the claim-all → pin-all → check-all
    * protocol must fence the straddled attempt out, roll it back whole,
    * and commit attempt 2 against the post-append state. Post-pin churn
    * on both surfaces (revision + compaction) then proves the pair
    * frozen. PROTOCOL gate: the corpus is capped at the sf0.01 shape
    * (doc_id/vec_id < 500) — the claims are about commit-window
    * atomicity, not scale; the scale rows live with the whole-corpus
    * index/ingest gates (round-17 verdict task 7).
    */
  private val pairPinCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String, Int)]
  private def pairPinSetupFor(s: SparkSession, d: String): (String, String, Int) = {
    pairPinCache.keys.filter(_._1.sparkContext.isStopped).foreach(pairPinCache.remove)
    pairPinCache.getOrElseUpdate((s, d), {
      val table = "graft_pair_pin_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(s, _))
      val vecDir = roundTripDir(d, "graft-pair-pin-vec")
      val vp = new org.apache.hadoop.fs.Path(vecDir)
      vp.getFileSystem(s.sessionState.newHadoopConf()).delete(vp, true)
      val dd = docs(s, d).where(col("doc_id") < 500)
        .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      IndexStore.saveInverted(feat(dd, 1), table, prefixLen = 1,
        swapMode = IndexStore.SwapManifest)
      val m = graft.operators.SimSearch.trainIvf(emb, "vec_id", "embedding",
        nLists = 8, iters = 1)
      graft.operators.IvfModel(m.centroids,
          m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(vecDir, IndexStore.SwapManifest)
      m.unpersist()
      // the race: a vector ingest lands INSIDE the first pin window (both
      // fences already claimed, text pin staged) — its head claim moves
      // the vector epoch, so the commit-point check-all must refuse
      var fired = false
      graft.sources.MaintHooks.hook = (point, _) =>
        if (point == "pin.staged" && !fired) {
          fired = true
          graft.operators.IvfModel.appendVectors(s, vecDir,
            emb.where(col("vec_id") % 13 === 2), "vec_id", "embedding",
            seq = 2L)
        }
      val attempts =
        try graft.sources.Snapshots.pinTrainingSet(s, "pair_v1",
          Seq(table), Seq(vecDir))
        finally graft.sources.MaintHooks.reset()
      // post-pin churn on BOTH surfaces: the committed pair must freeze
      IndexStore.appendInverted(feat(
        dd.where(col(Cols.Id) % 3 === 0).select(col(Cols.Id),
          concat(lit("revised edition number "), col(Cols.Id).cast("string"),
            lit(" replaces the prior draft")).as(Cols.Text)), 2), table)
      IndexStore.compactInverted(s, table)
      graft.operators.IvfModel.appendVectors(s, vecDir,
        emb.where(col("vec_id") % 17 === 3), "vec_id", "embedding", seq = 3L)
      graft.operators.IvfModel.compactUpserts(s, vecDir)
      (table, vecDir, attempts)
    })
  }

  /** Flagship: full-config ANN on sf0.001 (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    fitted(spark, dir, cfg100)
      .approxNearestNeighbors(keyOf(spark, dir), 10)
      .withColumnRenamed(Cols.Id, "doc_id")
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / projections / filters (SURVEY §2.1-2.2)
    "src_scan_documents" -> ((s, d) =>
      docs(s, d).select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")),
    "src_scan_limit" -> ((s, d) =>
      docs(s, d).select("doc_id", "n_chars").orderBy("doc_id").limit(100)),
    "src_text_scan" -> ((s, d) => {
      // the reference's true ingestion path (read_from_txt): round-trip the
      // corpus through a line-per-document text file and scan it back with
      // DocumentSource.readText. The synthetic monotonic id is partition-
      // dependent (as the reference documents), so the gate compares the
      // text multiset, not ids.
      val tmp = roundTripDir(d, "graft-txt-scan")
      lineSafeDocs(s, d)
        .orderBy("doc_id").select("text").coalesce(1)
        .write.mode("overwrite").text(tmp)
      graft.sources.DocumentSource.readText(s, tmp)
        .select(col(Cols.Text), length(col(Cols.Text)).as("n_chars"))
        .orderBy("text")
    }),
    "src_csv_scan" -> ((s, d) => {
      // the in-memory twin's ingestion path (pandas read_csv,
      // /root/reference/src/minhash_in_memory.py:328-360): round-trip
      // (doc_id, text) through quoted CSV and scan it back with an explicit
      // schema. Embedded line breaks need multiLine parsing, which kills
      // split-ability — filtered on both sides like src_text_scan.
      // Writer-side whitespace trimming is ON by default and would corrupt
      // whitespace-edged text relative to the oracle — pinned off.
      val tmp = roundTripDir(d, "graft-csv-scan")
      lineSafeDocs(s, d)
        .select("doc_id", "text").coalesce(1)
        .write.mode("overwrite").option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(tmp)
      s.read.option("header", "true")
        .schema("doc_id LONG, text STRING")
        .csv(tmp)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .orderBy("doc_id")
    }),
    "src_json_scan" -> ((s, d) => {
      // JSON-lines round-trip: write (doc_id, lang, n_chars) as JSONL, scan
      // back with an explicit schema (schema inference is a second full
      // pass at 100 TB — always pin the schema)
      val tmp = roundTripDir(d, "graft-json-scan")
      docs(s, d).select("doc_id", "lang", "n_chars").coalesce(1)
        .write.mode("overwrite").json(tmp)
      s.read.schema("doc_id LONG, lang STRING, n_chars LONG").json(tmp)
        .orderBy("doc_id")
    }),
    "src_orc_scan" -> ((s, d) => {
      // ORC round-trip (the other columnar format Spark ships natively);
      // values are preserved exactly, so the oracle is the source table
      val tmp = roundTripDir(d, "graft-orc-scan")
      docs(s, d).select("doc_id", "lang", "source", "n_chars").coalesce(1)
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).orderBy("doc_id")
    }),
    "src_partitioned_scan" -> ((s, d) => {
      // partitioned-parquet round-trip: write docs partitioned by lang,
      // read back with a partition filter — the scan must prune to the
      // lang=en directory (asserted on the physical plan in
      // PlanPropertiesSpec), the 100 TB pattern for any dimension-sliced
      // corpus
      val tmp = roundTripDir(d, "graft-part-scan")
      docs(s, d).select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("lang").parquet(tmp)
      s.read.parquet(tmp).where(col("lang") === "en")
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    }),
    "src_robots_eval" -> ((s, d) => {
      // RFC 9309 robots.txt evaluation: planted per-host files exercising
      // comments, an inapplicable specific group (evilbot), multi-agent
      // group headers, a Crawl-delay that must not end the group, RFC
      // wildcards (/*.zip$), and a * group that must be IGNORED because a
      // graftbot group exists (the /all/y family stays allowed). Verdicts
      // are closed-form: blocked iff the private-secret or zip family
      import s.implicits._
      val robots = (0 until 7).map { k =>
        ("host" + k + ".example",
          "# crawl policy\nUser-agent: evilbot\nDisallow: /\n\n" +
          "User-agent: graftbot\nUser-agent: otherbot\n" +
          "Disallow: /private" + k + "/\nAllow: /private" + k + "/pub\n" +
          "Crawl-delay: 5\nDisallow: /*.zip$\n\n" +
          "User-agent: *\nDisallow: /all\n")
      }.toDF("rhost", "rcontent")
      val urls = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(lit("https://host"), (col("doc_id") % 7).cast("string"),
          lit(".example"),
          element_at(array(
            concat(lit("/private"), (col("doc_id") % 7).cast("string"), lit("/secret")),
            concat(lit("/private"), (col("doc_id") % 7).cast("string"), lit("/pub/x")),
            concat(lit("/all/y"), col("doc_id").cast("string")),
            concat(lit("/dl/a"), col("doc_id").cast("string"), lit(".zip"))),
            (col("doc_id") % 4 + 1).cast("int"))).as("url"))
      graft.sources.RobotsTxt.robotsFlags(urls, "doc_id", "url",
          robots, "rhost", "rcontent", userAgent = "graftbot")
        .select(col("doc_id"), col("host"), col("path"), col("allowed"))
        .orderBy("doc_id")
    }),
    "src_warc_scan" -> ((s, d) =>
      // WARC ingestion (ISO 28500, the Common Crawl container): spec-valid
      // planted files (warcinfo + 1-3 response records each, one 404 per
      // mod-5 doc) walked by the strict pure-JVM record parser; every
      // emitted field — URI, declared Content-Length, HTTP status, body —
      // replays from the (id, j) formulas in closed form. Zero shuffle:
      // parsing is a per-partition batch map
      graft.sources.WarcSource.extractWarcRecords(
          graft.sources.WarcSource.plantWarcPayloads(
            SparkUtil.ensureParallelism(docs(s, d)), "doc_id"))
        .where(col("rec_type") === "response")
        .select(col("doc_id"), (col("rec_seq") - 1).cast("long").as("rec_idx"),
          col("target_uri"), col("content_length"),
          col("http_status").cast("long").as("http_status"),
          length(col("body")).cast("long").as("body_len"),
          md5(col("body")).as("body_md5"))
        .orderBy("doc_id", "rec_idx")),
    "prj_select" -> ((s, d) =>
      tbl(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),
    "prj_derived_tokens" -> ((s, d) =>
      SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        size(T.tokenize(col("text"))).as("n_tokens")).orderBy("doc_id")),
    "flt_predicate" -> ((s, d) =>
      tbl(s, d, "lineitem")
        .where(col("l_quantity") >= 45 && col("l_returnflag") === "R" &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),
    "flt_subquery" -> ((s, d) => {
      // correlated EXISTS + scalar subquery through the SQL frontend —
      // Catalyst decorrelates the EXISTS into a left-semi join and plans
      // the scalar subquery as a broadcast one-row aggregate
      tbl(s, d, "orders").createOrReplaceTempView("orders_v")
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderkey, o_orderpriority
        FROM orders_v
        WHERE EXISTS (SELECT 1 FROM lineitem_v
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
          AND o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
        ORDER BY o_orderkey""")
    }),
    "flt_sample_hash" -> ((s, d) =>
      // deterministic ~10% corpus sample: keep rows whose md5(key) hex
      // prefix sorts below '1a' (26/256). Unlike rand()-based sample(),
      // this is reproducible across runs, partitionings, and engines, and
      // stays a codegen'd scan-level filter at any scale.
      docs(s, d)
        .where(substring(md5(col("doc_id").cast("string")), 1, 2) < "1a")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")),
    "flt_sample_weighted" -> ((s, d) =>
      // deterministic weighted sampling without replacement (A-ES): top
      // 100 docs by md5-uniform^(1/n_chars) — longer docs proportionally
      // likelier, the same 100 on every engine/partitioning; ranked on
      // the ROUNDED micro key so the cut cannot drift across engines
      TextAnalysis.weightedSampleTopK(docs(s, d), "doc_id", "n_chars",
        seed = "w", k = 100)),
    "flt_sample_stratified" -> ((s, d) =>
      // deterministic stratified sampling (sampleBy twin): per-language
      // md5-prefix thresholds — keep ~10% of English, ~50% of everything
      // else. Same scan-level-filter scale shape as flt_sample_hash.
      docs(s, d)
        .where(substring(md5(col("doc_id").cast("string")), 1, 2) <
          when(col("lang") === "en", "1a").otherwise("80"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")),
    "flt_bucket_overlap" -> ((s, d) => {
      val m = fitted(s, d, cfg16)
      m.indexDf.crossJoin(broadcast(m.queryFeatures(keyOf(s, d))))
        .where(arrays_overlap(col(Cols.BucketIds), col("q_buckets")))
        .select(col(Cols.Id).as("doc_id")).orderBy("doc_id")
    }),
    "flt_bucket_thres" -> ((s, d) => {
      // threshold 0.1 ADMITS rows at gate scale (max bucket_sim at sf0.01
      // is 1/6; the old 0.2 matched on 0 = 0 rows, proving nothing about
      // the intersect/union ratio)
      val m = fitted(s, d, cfg16)
      m.indexDf.crossJoin(broadcast(m.queryFeatures(keyOf(s, d))))
        .withColumn("bucket_sim", H.setJaccard(col(Cols.BucketIds), col("q_buckets")))
        .where(col("bucket_sim") >= 0.1)
        .select(col(Cols.Id).as("doc_id"), round(col("bucket_sim"), 6).as("bucket_sim6"))
        .orderBy("doc_id")
    }),

    // --- joins (SURVEY §2.3 + anti/window extensions)
    "join_inner_agg" -> ((s, d) =>
      tbl(s, d, "orders").join(tbl(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"))
        // sum in exact decimal, emit as double: Spark's sum(DECIMAL(18,4))
        // result type (DECIMAL(28,4)) differs from DuckDB's (DECIMAL(38,4))
        // and the driver's comparator hashes the rendered value, so a
        // canonical final type is required on both sides.
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_price"))
        .orderBy("nationkey")),
    "join_semi" -> ((s, d) =>
      tbl(s, d, "orders").join(tbl(s, d, "lineitem").where(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")),
    "join_anti" -> ((s, d) =>
      tbl(s, d, "customer").join(
        tbl(s, d, "orders").where(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "join_docs_topk" -> ((s, d) => {
      val dd = docs(s, d)
      val topk = dd.select("doc_id", "n_chars")
        .orderBy(col("n_chars").desc, col("doc_id").asc).limit(10)
      dd.select("doc_id", "text").join(broadcast(topk), Seq("doc_id"))
        .select("doc_id", "text", "n_chars")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
    }),
    "join_range" -> ((s, d) => {
      // purchases within 5 minutes after each error, same user — bucketed
      // equi-join (no nested-loop range join; see Joins.rangeJoinBucketed)
      val ev = events(s, d)
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("err_ts"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("err_end"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      val matched = Joins.rangeJoinBucketed(errors, purchases, Seq("user_id"),
        "err_ts", "err_end", "p_ts", bucketMillis = 5 * 60 * 1000L, pointCols = Seq("p_id"))
      errors
        .join(matched.groupBy("err_id").agg(count(lit(1)).as("n_purchases")),
          Seq("err_id"), "left")
        .select(col("err_id"), col("user_id"),
          date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
        .orderBy("err_id")
    }),
    "join_interval_overlap" -> ((s, d) => {
      // error and purchase 10-minute windows overlapping for the same user
      // — interval×interval via cell blocking (no inequality BNLJ)
      val ev = events(s, d)
      def windowed(typ: String, idAs: String, sAs: String, eAs: String) =
        ev.where(col("event_type") === typ)
          .select(col("user_id"), col("event_id").as(idAs), col("ts").as(sAs),
            (col("ts") + expr("INTERVAL 10 MINUTES")).as(eAs))
      Joins.intervalOverlapJoin(
          windowed("error", "err_id", "e_s", "e_e"),
          windowed("purchase", "p_id", "p_s", "p_e"),
          Seq("user_id"), "e_s", "e_e", "err_id", "p_s", "p_e", "p_id",
          bucketMillis = 10 * 60 * 1000L)
        .select("user_id", "err_id", "p_id")
        .orderBy("err_id", "p_id")
    }),
    "join_skew_salted" -> ((s, d) => {
      // salted lineitem ⋈ orders (the manual skew defense; results must be
      // exactly the plain join's — the oracle IS the plain join)
      val li = tbl(s, d, "lineitem")
      val ord = tbl(s, d, "orders").select("o_orderkey", "o_orderpriority")
      Joins.saltedJoin(li, ord, Seq("l_orderkey"), Seq("o_orderkey"),
          saltFrom = concat_ws("|", col("l_orderkey"), col("l_linenumber")), salt = 8)
        .groupBy("o_orderpriority")
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),
    "agg_histogram" -> ((s, d) =>
      // fixed-width-bin value histogram per event type (the profiling
      // primitive); bin = floor(value / 25), bin edges exact in binary
      events(s, d)
        .groupBy(col("event_type"), floor(col("value") / 25).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")),
    "agg_mode" -> ((s, d) => {
      // deterministic mode: most frequent ship-priority value per flag,
      // smallest value on count ties (built-in mode() leaves ties
      // unspecified — the window construction pins them, twin in SQL)
      val counts = tbl(s, d, "orders")
        .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("n"))
      counts
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_orderstatus")
            .orderBy(col("n").desc, col("o_orderpriority").asc)))
        .where(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy("o_orderstatus")
    }),
    "agg_funnel" -> ((s, d) =>
      // ordered conversion funnel view → click → purchase, 6h stage windows
      EventStream.funnel(events(s, d), Seq("view", "click", "purchase"), "6 hours")
        .select(col("user_id"),
          date_format(col("t1"), "yyyy-MM-dd HH:mm:ss").as("t_view"),
          date_format(col("t2"), "yyyy-MM-dd HH:mm:ss").as("t_click"),
          date_format(col("t3"), "yyyy-MM-dd HH:mm:ss").as("t_purchase"))
        .orderBy("user_id")),
    "agg_retention_cohort" -> ((s, d) =>
      // weekly cohort retention: users bucketed by the Monday week of
      // their first event; n active per (cohort, week offset). Offsets
      // are exact (both instants week-truncated ⇒ day diff is a multiple
      // of 7); counts are exact ints over the distinct (user, week) frame
      TimeSeries.retentionCohorts(events(s, d))
        .orderBy("cohort_week", "offset_weeks")),
    "ts_seasonal_decompose" -> ((s, d) =>
      // classical additive decomposition of hourly counts per type:
      // densified grid (gap hours are real zeros), centered 25-hour
      // moving-mean trend (null edges), hour-of-day seasonals centered to
      // ~0, residual — every division an exact integer micro `div`, so
      // the whole decomposition replays bit-for-bit
      TimeSeries.seasonalDecompose(events(s, d), "event_type", "ts")
        .select(col("k").as("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("n"), col("trend_micro"), col("seasonal_micro"),
          col("resid_micro"))
        .orderBy("event_type", "h")),
    "ts_resample_ffill" -> ((s, d) =>
      // fixed 6-hour grid per user from first-event midnight through the
      // last event, forward-filling the latest observed value (union +
      // one per-user ordered window — the as-of fill without a range
      // join); filled doubles are carried verbatim, never recomputed
      TimeSeries.resampleFfill(events(s, d), stepHours = 6)
        .orderBy("user_id", "grid_ts")),
    "window_wow_growth" -> ((s, d) => {
      // period-over-period reporting: weekly event counts per type with
      // week-over-week growth in exact integer micro-units
      // ((cur − prev)·10⁶ div prev — no float division); first week null
      val weekly = events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
        .agg(count(lit(1)).as("n"))
      weekly
        .withColumn("__prev", lag(col("n"), 1).over(
          Window.partitionBy("event_type").orderBy("week")))
        .select(col("event_type"), col("week"), col("n"),
          expr("((n - __prev) * 1000000) div __prev").as("wow_micro"))
        .orderBy("event_type", "week")
    }),
    "window_longest_streak" -> ((s, d) => {
      // gaps-and-islands classic: longest run of CONSECUTIVE active days
      // per user — island anchor = day − row_number days, all date-integer
      // arithmetic, no floats anywhere
      val days = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val anchored = days.withColumn("__rn", row_number().over(
          Window.partitionBy("user_id").orderBy("day")))
        .withColumn("__anchor", date_sub(col("day"), col("__rn")))
      anchored.groupBy("user_id", "__anchor").agg(count(lit(1)).as("__len"))
        .groupBy("user_id")
        .agg(max(col("__len")).as("longest_streak"),
          sum(col("__len")).as("n_active_days"))
        .orderBy("user_id")
    }),
    "agg_gini" -> ((s, d) => {
      // inequality of order values per nation: exact-rank Gini via
      // Σ(2i−n−1)x = 2Σix − (n+1)Σx — every sum an exact long, ranks
      // pinned by (cents, orderkey). SCALE BOUND: Σi·cents stays under
      // 2⁵³ (double-exact) only up to ~10⁵ orders/nation at TPC-H prices
      // (i·cents ≈ 3e14 per term beyond that); at larger SFs switch six
      // to DecimalType(38,0) on both engines to keep the bit-identical
      // claim — the gate runs at sf≤0.1 where longs are exact
      val rows = tbl(s, d, "orders")
        .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val ranked = rows.withColumn("i", row_number().over(
        Window.partitionBy("c_nationkey")
          .orderBy(col("cents").asc, col("o_orderkey").asc)).cast("long"))
      ranked.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("i") * col("cents")).as("six"))
        .select(col("c_nationkey"), col("n"),
          round((lit(2L) * col("six") - (col("n") + 1) * col("sx")).cast("double")
            / (col("n") * col("sx")).cast("double"), 6).as("gini6"))
        .orderBy("c_nationkey")
    }),
    "agg_contribution" -> ((s, d) =>
      // ratio-to-report: each nation's share of total order revenue in
      // exact integer micro-units — cents via round(×100) (2-dp doubles
      // are exact in cents), share = (cents·10⁶) div total
      tbl(s, d, "orders")
        .join(tbl(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("share_micro",
          expr("(cents * 1000000) div sum(cents) over ()"))
        .select(col("c_nationkey"), col("n_orders"), col("cents"),
          col("share_micro"))
        .orderBy("c_nationkey")),
    "agg_kmv_reagg" -> ((s, d) => {
      // the property that makes sketches infrastructure: PER-GROUP KMV
      // sketches re-aggregate to the global sketch EXACTLY (k smallest
      // distinct hashes of a union = k smallest of the k-smallest sets),
      // so daily partials roll up to weekly/corpus totals without
      // re-reading data. Asserts bit-equality of the rolled-up and direct
      // sketches plus the exact distinct count
      val k = 1024
      val perType = events(s, d).groupBy("event_type")
        .agg(graft.functions.Sketches.kmvAgg(xxhash64(col("user_id")), k)
          .as("sk"))
      val rolled = perType.agg(
        slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
          1, k).as("merged"))
      val direct = events(s, d).agg(
        graft.functions.Sketches.kmvAgg(xxhash64(col("user_id")), k).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
      rolled.crossJoin(broadcast(direct))
        .select(col("n_exact"),
          (col("merged") === col("sk")).as("reagg_identical"),
          (abs(graft.functions.Sketches.kmvDistinct(col("merged"), k) -
            col("n_exact").cast("double")) <=
            col("n_exact").cast("double") * 0.1).as("kmv_ok"))
    }),
    "agg_kmv_distinct" -> ((s, d) =>
      // bottom-k distinct sketch, tolerance-gated like agg_approx_distinct:
      // the boolean asserts the KMV estimate lands within 10% of exact
      // (xxhash64 is fixed-seed, so the estimate is a constant of the
      // dataset — a drifting sketch fails the hash, not a coin flip)
      tbl(s, d, "orders")
        .agg(graft.functions.Sketches.kmvAgg(xxhash64(col("o_custkey")), 1024)
            .as("__sk"),
          countDistinct(col("o_custkey")).as("n_exact"))
        .select(col("n_exact"),
          (abs(graft.functions.Sketches.kmvDistinct(col("__sk"), 1024) -
            col("n_exact").cast("double")) <=
            col("n_exact").cast("double") * 0.1).as("kmv_ok"))),
    "agg_kmv_intersect" -> ((s, d) => {
      // what HLL cannot do: distinct-INTERSECTION from two mergeable
      // 2 KB sketches — viewers ∩ purchasers estimated from k smallest
      // union hashes, within 20% of the exact co-shuffled answer
      val ev = events(s, d)
      def sk(t: String) = ev.where(col("event_type") === t)
        .agg(graft.functions.Sketches.kmvAgg(xxhash64(col("user_id")), 1024)
          .as(s"__sk_$t"))
      val exact = ev.where(col("event_type") === "view")
        .select("user_id").distinct()
        .join(ev.where(col("event_type") === "purchase")
          .select("user_id").distinct(), Seq("user_id"))
        .agg(count(lit(1)).as("n_exact"))
      sk("view").crossJoin(sk("purchase")).crossJoin(broadcast(exact))
        .select(col("n_exact"),
          (abs(graft.functions.Sketches.kmvIntersect(
              col("__sk_view"), col("__sk_purchase"), 1024) -
            col("n_exact").cast("double")) <=
            col("n_exact").cast("double") * 0.2).as("kmv_ok"))
    }),
    "fn_json_props" -> ((s, d) => {
      // semi-structured column surface: the events.props JSON payload
      // parsed with the codegen'd path extractor (get_json_object), a
      // %113 malformed sliver planted in-flight — broken JSON must yield
      // null, never kill the row; per-type exact integer stats
      val ev = events(s, d).select(col("event_type"),
        when(col("event_id") % 113 === 0, lit("{not json"))
          .otherwise(col("props")).as("props"))
      ev.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"),
          sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),
    "agg_event_transitions" -> ((s, d) => {
      // first-order Markov transition matrix of user behavior: per-user
      // event-time-ordered (type → next type) counts and exact integer
      // micro-probabilities ((n_ab · 10⁶) div n_a — no float division);
      // the behavioral prior a sessionization/anomaly model starts from
      val seq = events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        .where(col("next_type").isNotNull)
      val cab = seq.groupBy(col("event_type").as("a"), col("next_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      cab.join(cab.groupBy("a").agg(sum(col("n_ab")).as("n_a")), Seq("a"))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"),
          expr("(n_ab * 1000000) div n_a").as("p_micro"))
        .orderBy("a", "b")
    }),
    "ts_cusum_alarms" -> ((s, d) => {
      // CUSUM burst detection with a PLANTED burst: every %7 event is
      // cloned onto synthetic user 99999 inside one 3-hour span, so that
      // user's 6h bucket count explodes and the closed-form
      // P − min(0, running-min P) walk must alarm there (and wherever the
      // organic rate sustains > drift); all-integer arithmetic
      val ev = events(s, d)
      val burst = ev.where(col("event_id") % 7 === 0)
        .select(col("event_id"), lit(99999L).as("user_id"),
          expr("timestamp '2024-01-05 00:00:00' + " +
            "make_interval(0, 0, 0, 0, cast(event_id % 3 as int), 0, 0)").as("ts"))
      TimeSeries.cusumAlarms(
          ev.select("event_id", "user_id", "ts").unionByName(burst),
          bucketSeconds = 21600, drift = 3L, threshold = 8L)
        .orderBy("user_id", "bucket")
    }),
    "agg_collect_ordered" -> ((s, d) =>
      // behavioral sequence construction: each user's event-type string in
      // event-time order (the session→sequence step of a behavior-model
      // pipeline). Order is imposed INSIDE the aggregate (array_sort on
      // (ts, event_id) structs) — collect_list alone has no deterministic
      // order under parallel merge.
      events(s, d)
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ",").as("event_seq"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")),
    "agg_approx_distinct" -> ((s, d) =>
      // HLL++ distinct estimate, gated by tolerance: the emitted boolean
      // asserts the sketch lands within 5% of exact (the oracle emits the
      // exact count and literal TRUE, so a drifting sketch fails the hash)
      tbl(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_nd"),
          approx_count_distinct(col("l_partkey"), 0.02).as("__approx"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("__approx") - col("exact_nd")) <=
            col("exact_nd") * 0.05).as("approx_within_5pct"))
        .orderBy("l_returnflag")),
    "join_asof_next" -> ((s, d) => {
      // FORWARD as-of: next click at-or-after each purchase, same user —
      // the descending-scan twin of join_asof (one windowed shuffle)
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      Joins.asofJoinNext(purchases, clicks, Seq("user_id"), "ts",
          payloadCols = Seq("event_id", "ts"), tieBreak = "event_id",
          outPrefix = "click_")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("click_event_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
        .orderBy("event_id")
    }),
    "join_asof" -> ((s, d) => {
      // most recent prior click per purchase, same user — union + one
      // windowed shuffle on user_id (no range join / cartesian; see Joins)
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      Joins.asofJoinPrior(purchases, clicks, Seq("user_id"), "ts",
          payloadCols = Seq("event_id", "ts"), tieBreak = "event_id",
          outPrefix = "click_")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("click_event_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
        .orderBy("event_id")
    }),

    "join_asof_tolerance" -> ((s, d) => {
      // staleness-bounded as-of (the feature-store freshness contract):
      // prior clicks older than 1 hour null out — exact microsecond
      // comparison, same single windowed-union shuffle as join_asof
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      Joins.asofJoinPriorWithin(purchases, clicks, Seq("user_id"), "ts",
          payloadCols = Seq("event_id", "ts"), tieBreak = "event_id",
          outPrefix = "click_", toleranceSeconds = 3600L)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("click_event_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
        .orderBy("event_id")
    }),
    "join_left_outer" -> ((s, d) => {
      // customers with their big-order stats; customers without big orders
      // survive the outer join (nulls coalesced to canonical sentinels —
      // the driver comparator hashes rendered values)
      val big = tbl(s, d, "orders").where(col("o_totalprice") > 400000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"),
          max(col("o_totalprice")).as("max_big"))
      tbl(s, d, "customer").join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_big"), lit(0L)).as("n_big"),
          coalesce(col("max_big"), lit(-1.0)).as("max_big"))
        .orderBy("c_custkey")
    }),
    "join_full_outer" -> ((s, d) => {
      // per-nation rich-customer vs rich-supplier counts; either side may be
      // absent for a nation — USING-style join coalesces the key
      val c = tbl(s, d, "customer").where(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
      val su = tbl(s, d, "supplier").where(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(col("nationkey"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),
    "join_3way_agg" -> ((s, d) =>
      // TPC-H Q3 shape: 3-table join with per-table pushed filters, decimal
      // revenue (exact in both engines: 2-dp inputs recovered from double),
      // top-10. Catalyst broadcast-joins the filtered customer side.
      tbl(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(tbl(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") < to_timestamp(lit("1997-06-01 00:00:00")))
        .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > to_timestamp(lit("1997-06-01 00:00:00")))
        .groupBy("o_orderkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc).limit(10)),

    // --- aggregations / sorts (SURVEY §2.4, §2.6)
    "agg_shingle_count" -> ((s, d) =>
      // tokens materialized in their own projection below the Generate —
      // generator inputs get no subexpression elimination (PERF.md)
      SparkUtil.ensureParallelism(docs(s, d))
        .select(T.tokenize(col("text")).as("tokens"))
        .select(explode(T.kShingles(col("tokens"), 2)).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("cnt")).orderBy("shingle")),
    "agg_cms_heavy" -> ((s, d) => {
      // Count-Min sketch heavy hitters: ONE fixed 4×1024-long buffer per
      // map task (no vocabulary-wide shuffle), then point-query estimates
      // for every distinct token against the collected 32 KB matrix (the
      // one-row cross join is the bounded declared probe convention);
      // CMS guarantee est ≥ true holds exactly, oracle replays the
      // matrix cell-for-cell
      val toks = SparkUtil.ensureParallelism(docs(s, d))
        .select(explode(T.tokenize(col("text"))).as("token"))
        .transform(SparkUtil.scopedPersist)
      val sk = toks.agg(graft.functions.Sketches
        .countMinAgg(col("token"), 4, 1024).as("sk"))
      cmsHeavyHitters(toks, sk, depth = 4, width = 1024)
    }),
    "agg_constraint_report" -> ((s, d) => {
      // dbt-shape data-quality validation with every violation kind
      // PLANTED in-flight: %89 null status (not-null), %97 rows duplicated
      // (unique key), %41 custkeys shifted out of the parent domain
      // (referential), %73 prices negated (predicate); each check is one
      // exact single-pass count, the oracle replays plant + counts
      val base = tbl(s, d, "orders")
      val mutated = base.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 41 === 0, col("o_custkey") + 900000000L)
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(col("o_orderkey") % 89 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(col("o_orderkey") % 73 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      val planted = mutated.unionAll(mutated.where(col("o_orderkey") % 97 === 0))
      DataQuality.constraintReport(planted,
        notNull = Seq("o_orderstatus"),
        uniqueKeys = Seq(Seq("o_orderkey")),
        refs = Seq(("o_custkey", tbl(s, d, "customer"), "c_custkey")),
        predicates = Seq(("totalprice_positive", col("o_totalprice") > 0)))
        .orderBy("check_name")
    }),
    "join_bloom_pruned" -> ((s, d) =>
      // explicit runtime-filter join: orders pruned by the 3-nation
      // customer subset's Bloom filter BEFORE any exchange; result
      // provably the plain inner join (no false negatives, false
      // positives die in the real join)
      Joins.bloomPrunedJoin(tbl(s, d, "orders"),
          tbl(s, d, "customer").where(col("c_nationkey") < 3)
            .select(col("c_custkey"), col("c_mktsegment")),
          "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
        .orderBy("o_orderkey")),
    "er_sorted_neighborhood" -> ((s, d) => {
      // the OTHER ER blocking strategy: global sort + fixed window — pair
      // volume exactly n·w regardless of key distribution; same dirty
      // plant as er_blocked_match, rank via distributed sort+zipWithIndex
      // (no single-partition window), maxDist 1 keeps the pair set tight
      val cust = tbl(s, d, "customer")
      val dirty = cust.select((col("c_custkey") + 1000000L).as("rid"),
        when(col("c_custkey") % 3 === 0, concat(col("c_name"), lit("Q")))
          .when(col("c_custkey") % 3 === 1,
            expr("substring(c_name, 1, length(c_name) - 1)"))
          .otherwise(concat(expr("substring(c_name, 1, length(c_name) - 1)"),
            lit("X"))).as("rname"))
      val all = cust.select(col("c_custkey").as("rid"), col("c_name").as("rname"))
        .unionByName(dirty)
      Dedup.sortedNeighborhoodMatch(all, "rid", "rname",
          windowSize = 3, maxDistance = 1)
        .orderBy("a_id", "b_id")
    }),
    "er_blocked_match" -> ((s, d) => {
      // entity resolution: customer names corrupted in-flight three ways
      // (append / delete / substitute — distances 1,1,1 to the source) are
      // resolved back against the clean table by prefix blocking +
      // Levenshtein best-match; the substitute kind ties with its block
      // siblings at distance 1, exercising the pinned (dist, r_id) rule
      val cust = tbl(s, d, "customer")
      val dirty = cust.select((col("c_custkey") + 1000000L).as("d_id"),
        when(col("c_custkey") % 3 === 0, concat(col("c_name"), lit("Q")))
          .when(col("c_custkey") % 3 === 1,
            expr("substring(c_name, 1, length(c_name) - 1)"))
          .otherwise(concat(expr("substring(c_name, 1, length(c_name) - 1)"),
            lit("X"))).as("d_name"))
      Dedup.blockedFuzzyMatch(dirty, cust, "d_id", "d_name",
          "c_custkey", "c_name", blockLen = 17, maxDistance = 2)
        .orderBy("q_id")
    }),
    "dq_schema_drift" -> ((s, d) => {
      // contract check on a new delivery: snapshot B drops a column, adds
      // one, retypes totalprice to string, and nulls the %89 statuses —
      // the report must classify every column and carry the exact
      // null-count delta
      val base = tbl(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      val next = tbl(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 89 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice").cast("string").as("o_totalprice"),
        concat(lit("web"), col("o_orderkey") % 3).as("o_channel"))
      DataQuality.schemaDrift(base, next).orderBy("column_name")
    }),
    "dq_cardinality_drift" -> ((s, d) => {
      // KMV cardinality monitoring loop end-to-end: per-(type, day)
      // sketches of snapshot A (full events) and snapshot B (the 'view'
      // type loses its user_id % 5 == 0 users — a planted 20% audience
      // drop) PERSIST as managed tables, reload, merge per type via the
      // agg_kmv_reagg property, and compare. k = 4096 over 1,500 distinct
      // users/type keeps every sketch below capacity, so the estimates
      // are EXACT and the oracle replays them as count(DISTINCT ...) —
      // only 'view' may cross the 10% drift floor
      val k = 4096
      val (ta, tb) = ("graft_kmv_snap_a", "graft_kmv_snap_b")
      Seq(ta, tb).foreach(IndexStore.reset(s, _))
      val ev = events(s, d)
      DataQuality.saveKmvSnapshot(ev, "event_type", to_date(col("ts")),
        "user_id", k, ta)
      DataQuality.saveKmvSnapshot(
        ev.where(!(col("event_type") === "view" && col("user_id") % 5 === 0)),
        "event_type", to_date(col("ts")), "user_id", k, tb)
      DataQuality.cardinalityDrift(s, ta, tb, k, driftFloorMicro = 100000L)
        .orderBy("grp")
    }),
    "dq_winsorize" -> ((s, d) =>
      // robust repair to MAD's flagging: clamp each type's values at the
      // exact rank-based P5/P95 (ceil/floor rank convention, (value,
      // event_id)-pinned ranks, all micro-longs) — cut points, clamp
      // counts and the winsorized sum replay bit-for-bit
      DataQuality.winsorizedStats(events(s, d), "event_type", "value",
          "event_id")
        .orderBy("event_type")),
    "dq_mad_outliers" -> ((s, d) => {
      // robust outlier stats with PLANTED spikes: every %131 event's
      // value is multiplied by 50, so each type's Hampel count (|x−med| >
      // 3·MAD with exact sort-based medians) must pick the spikes up
      // without the spikes inflating the scale estimate itself — the
      // failure mode of mean/stddev z-scores
      val ev = events(s, d).select(col("event_type"),
        when(col("event_id") % 131 === 0, col("value") * 50)
          .otherwise(col("value")).as("value"))
      DataQuality.madOutlierStats(ev, "event_type", "value", k = 3.0)
        .orderBy("event_type")
    }),
    "dq_k_anonymity" -> ((s, d) =>
      // k-anonymity audit (Sweeney 2002) on the customer release under
      // the (c_nationkey, c_mktsegment) quasi-identifier: class count,
      // classes under k=5, exposed rows, min/max class size — one
      // map-side-combined count per class, all-integer summary
      DataQuality.kAnonymityReport(tbl(s, d, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)),
    "agg_psi_drift" -> ((s, d) => {
      // drift monitor: snapshot B doubles the %3==0 docs' text, shifting
      // the token-length distribution rightward — the per-bucket PSI
      // terms must reproduce the planted shift exactly
      val lens = docs(s, d).select(col("doc_id"),
        size(T.tokenize(col("text"))).cast("double").as("v"))
      val shifted = docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"), size(T.tokenize(col("text"))).cast("double").as("v"))
      DataQuality.psiBuckets(lens, shifted, "v",
          cutoffs = Seq(20.0, 40.0, 60.0, 80.0, 120.0))
        .orderBy("bucket")
    }),
    "agg_column_profile" -> ((s, d) =>
      // ANALYZE-style table stats over orders with a planted null sliver
      // (%89 status nulls) so the null counts are non-vacuous
      DataQuality.columnProfile(
        tbl(s, d, "orders").withColumn("o_orderstatus",
          when(col("o_orderkey") % 89 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus"))),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
        .orderBy("column_name")),
    "agg_group_stats" -> ((s, d) =>
      tbl(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          min(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("min_price"),
          max(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("max_price"))
        .orderBy("l_returnflag", "l_linestatus")),
    "agg_distinct" -> ((s, d) =>
      tbl(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts")).orderBy("l_returnflag")),
    "agg_corr_stats" -> ((s, d) =>
      // second-moment statistics (one-pass co-moment aggregates). Rounding
      // absorbs the engines' different partial-merge orders: corr is O(1)
      // magnitude (6 dp safe); covar is O(1e4) so 3 dp.
      tbl(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity").cast("double"),
            col("l_extendedprice").cast("double")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity").cast("double"),
            col("l_extendedprice").cast("double")), 3).as("qty_price_covar"),
          round(stddev_samp(col("l_quantity").cast("double")), 6).as("qty_sd"),
          round(var_samp(col("l_quantity").cast("double")), 4).as("qty_var"))
        .orderBy("l_returnflag")),
    "agg_rollup" -> ((s, d) =>
      tbl(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    "window_lag" -> ((s, d) =>
      events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .select("user_id", "event_id", "value", "prev_value")
        .orderBy("user_id", "ts", "event_id")),
    "window_rank" -> ((s, d) =>
      tbl(s, d, "orders")
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn").orderBy("o_custkey", "rn")),
    "window_dist" -> ((s, d) =>
      // distribution window family: percent_rank + cume_dist over a
      // fully-tie-broken ordering (ratios of exact integer ranks → 6 dp)
      tbl(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(percent_rank().over(Window.partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice"), col("o_orderkey"))), 6).as("pr6"),
          round(cume_dist().over(Window.partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice"), col("o_orderkey"))), 6).as("cd6"))
        .where(col("o_orderkey") % 20 === 0)
        .orderBy("o_orderkey")),
    "window_cumsum" -> ((s, d) =>
      // running sum in exact decimal (order-independent), emitted as double
      events(s, d)
        .withColumn("run_value", sum(col("value").cast("decimal(18,6)"))
          .over(Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "event_id", "run_value")),
    "window_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      tbl(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          dense_rank().over(w).as("drk"), ntile(4).over(w).as("quartile"))
        .where(col("drk") <= 100)
        .orderBy("o_orderpriority", "drk")
    }),
    "window_range_frame" -> ((s, d) => {
      // RANGE frame over event time: per-user rolling 1-hour event count
      // ending at each event (value-based frame — ROWS frames can't express
      // "last hour" under irregular event spacing)
      events(s, d).createOrReplaceTempView("events_range_v")
      s.sql("""
        SELECT user_id, event_id,
          count(*) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        FROM events_range_v
        ORDER BY user_id, ts, event_id""")
    }),
    "window_first_last" -> ((s, d) => {
      // first/last/nth value window family; last/nth need the full-partition
      // frame (the default frame stops at CURRENT ROW)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          first_value(col("event_id")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_eid"),
          last_value(col("event_id")).over(full).as("last_eid"),
          nth_value(col("event_id"), 2).over(full).as("second_eid"))
        .orderBy("user_id", "event_id")
    }),
    "agg_cube" -> ((s, d) =>
      tbl(s, d, "lineitem").cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    "agg_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS through the SQL frontend — the gate's only
      // spark.sql() entry, so the SQL surface is exercised end-to-end too
      tbl(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),
    "agg_percentiles" -> ((s, d) =>
      // exact interpolated percentiles (sort-based, not a sketch) — rounded
      // so double ulp differences between engines cannot flip the compare
      // one array-percentile aggregate, not three scalar ones — each scalar
      // percentile keeps its own per-group value buffer over the full table
      tbl(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("__ps"))
        .select(col("l_returnflag"),
          round(element_at(col("__ps"), 1), 4).as("p50"),
          round(element_at(col("__ps"), 2), 4).as("p90"),
          round(element_at(col("__ps"), 3), 4).as("p99"))
        .orderBy("l_returnflag")),
    "agg_median" -> ((s, d) =>
      tbl(s, d, "lineitem").groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("med_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")),
    "agg_approx_percentile" -> ((s, d) =>
      // quantile sketch, tolerance-gated like agg_approx_distinct: the
      // boolean asserts the sketch lands within 1% of the exact median
      tbl(s, d, "lineitem").groupBy("l_returnflag")
        .agg(median(col("l_extendedprice").cast("double")).as("__exact"),
          percentile_approx(col("l_extendedprice").cast("double"),
            lit(0.5), lit(10000)).as("__apx"))
        .select(col("l_returnflag"), round(col("__exact"), 4).as("exact_median"),
          (abs(col("__apx") - col("__exact")) <= col("__exact") * 0.01)
            .as("approx_within_1pct"))
        .orderBy("l_returnflag")),
    "agg_pivot" -> ((s, d) =>
      // pivot(count) yields null for absent cells; DuckDB's FILTER count
      // yields 0 — coalesce to the canonical 0
      tbl(s, d, "lineitem").groupBy("l_returnflag").pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0)).as("n_f"), coalesce(col("O"), lit(0)).as("n_o"))
        .orderBy("l_returnflag")),
    "gen_posexplode" -> ((s, d) =>
      docs(s, d).where(col("doc_id") < 50)
        .select(col("doc_id"), T.tokenize(col("text")).as("tokens"))
        .select(col("doc_id"), posexplode(col("tokens")).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")),
    "fn_json_extract" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),
    "fn_datetime" -> ((s, d) =>
      // calendar kernel surface: truncation, field extraction, day
      // arithmetic. dow emitted 0=Sunday (DuckDB convention; Spark's
      // dayofweek is 1=Sunday); week truncation is Monday-start in both.
      events(s, d).select(col("event_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        hour(col("ts")).as("hh"),
        (dayofweek(col("ts")) - 1).as("dow"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week_start"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("days_since"))
        .orderBy("event_id")),

    // --- set ops (SURVEY §2.7 + DataFrame-level extension)
    "set_array_ops" -> ((s, d) => {
      val dd = docs(s, d)
      val q = broadcast(dd.where(col("doc_id") === 0)
        .select(array_distinct(T.tokenize(col("text"))).as("q_toks")))
      dd.select(col("doc_id"), array_distinct(T.tokenize(col("text"))).as("toks"))
        .crossJoin(q)
        .select(col("doc_id"),
          size(array_intersect(col("toks"), col("q_toks"))).as("n_common"),
          size(array_union(col("toks"), col("q_toks"))).as("n_union"),
          arrays_overlap(col("toks"), col("q_toks")).as("overlaps"))
        .orderBy("doc_id")
    }),
    "setop_intersect" -> ((s, d) => {
      // customers that are BOTH in the building segment and hold an open
      // order — DataFrame intersect (plans as a distinct + semi-ish hash)
      val building = tbl(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val withOpen = tbl(s, d, "orders")
        .where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(withOpen).orderBy("c_custkey")
    }),
    "setop_union" -> ((s, d) => {
      val dd = docs(s, d)
      dd.where(col("lang") === "en").select("doc_id")
        .union(dd.where(col("source") === "src1").select("doc_id"))
        .distinct().orderBy("doc_id")
    }),
    "setop_except" -> ((s, d) => {
      val dd = docs(s, d)
      dd.where(col("lang") === "en").select("doc_id")
        .except(dd.where(col("source") === "src1").select("doc_id"))
        .orderBy("doc_id")
    }),

    // --- MinHash pipeline stages (SURVEY §2.8), md5 parity mode.
    // Array results are emitted as separator-joined strings: the driver's
    // comparator sorts the result frame by every column, which a list-typed
    // cell breaks. The join is lossless (tokens/shingles can't contain the
    // separator) and identical on the DuckDB side (array_to_string).
    "fn_tokenize" -> ((s, d) =>
      SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        array_join(T.tokenize(col("text")), " ").as("tokens_str"))
        .orderBy("doc_id")),
    "fn_tokenize_unicode" -> ((s, d) => {
      // Python-re `\w` parity mode, oracle-paired via a PLANTED FIXTURE
      // (round-12 verdict task 5): DuckDB's RE2 `\w` is ASCII-only so it
      // cannot recompute the tokenizer, but it can compare against
      // EXPECTED token strings derived by hand from the Unicode `\w`
      // semantics (letters incl. accented/CJK/Cyrillic/Greek, Nd digits
      // incl. Arabic-Indic, underscore survive; Unicode punctuation and
      // symbols — em-dash, inverted marks, emoji — become separators;
      // NBSP is `(?U)\s` whitespace). Corpus-wide unicode coverage stays
      // gated by fn_tokenize_unicode_agree (ASCII half) + KernelSpec.
      import s.implicits._
      val cases = Seq(
        (0L, "Héllo, Wörld! Ça va?"),
        (1L, "naïve café — déjà-vu"),
        (2L, "中文 分词 test123"),
        (3L, "Москва-2026 ΑΒΓ αβγ"),
        (4L, "under_score stays ١٢٣"),
        (5L, "nbsp separated ok"),
        (6L, "!!! ¿¡ …"),
        (7L, "emoji 😀 splits"),
        (8L, "MIXED Ünïcôde-ASCII_42"))
      SparkUtil.ensureParallelism(cases.toDF("case_id", "text"))
        .select(col("case_id"),
          array_join(T.tokenize(col("text"), unicode = true), " ").as("tokens_str"))
        .orderBy("case_id")
    }),
    "fn_tokenize_unicode_agree" -> ((s, d) =>
      // the checkable HALF of unicode mode: on text with no non-ASCII
      // word chars, `(?U)\w` and ASCII `\w` are the same class, so the
      // unicode tokenizer must equal the ASCII kernel token-for-token —
      // a per-doc boolean DuckDB can assert as constant true (the
      // non-ASCII half stays rows-only; KernelSpec covers its semantics)
      SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        (!col("text").rlike("[^\\x00-\\x7F]") &&
          T.tokenize(col("text"), unicode = true) <=> T.tokenize(col("text")))
          .as("ascii_and_equal"))
        .where(col("ascii_and_equal"))
        .orderBy("doc_id")),
    "fn_tokenize_sql" -> ((s, d) => {
      // the registered SQL surface (GraftExtensions) end-to-end: identical
      // expression tree to fn_tokenize, reached through SQL text
      SparkUtil.ensureParallelism(docs(s, d)).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT doc_id, array_join(graft_tokenize(text), ' ') AS tokens_str
        FROM documents_v ORDER BY doc_id""")
    }),
    "fn_bpe_sql" -> ((s, d) => {
      // the registered BPE SQL surface (GraftExtensions) end-to-end:
      // identical kernel to text_token_counts_bpe, reached through SQL
      // text; the constant probe word pins the per-word encode path
      // ('weathering' -> w|e|a|ther|ing under the planted merge ranks)
      SparkUtil.ensureParallelism(docs(s, d)).createOrReplaceTempView("documents_bpe_v")
      s.sql("""
        SELECT doc_id, graft_bpe_count(graft_tokenize(text)) AS n_bpe_tokens,
          array_join(graft_bpe_encode('weathering'), '|') AS probe
        FROM documents_bpe_v ORDER BY doc_id""")
    }),
    "fn_k_shingles" -> ((s, d) =>
      SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        array_join(array_sort(T.shingles(col("text"), 2)), "|").as("shingles_str"))
        .orderBy("doc_id")),
    "fn_levenshtein" -> ((s, d) => {
      // edit distance of each doc's 40-char prefix to the query key's —
      // capped inputs keep the O(n·m) DP bounded per row
      val q = keyOf(s, d).take(40)
      SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        levenshtein(substring(col("text"), 1, 40), lit(q)).as("edit_dist"))
        .orderBy("doc_id")
    }),
    "fn_char_ngrams" -> ((s, d) =>
      SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        array_join(array_sort(T.charNGrams(col("text"), 3)), "").as("ngrams_str"))
        .orderBy("doc_id")),
    "fn_bool_vectorizer" -> ((s, d) => {
      // vocabulary comes from the shared fitted vocab-mode model (the model
      // index drops bool_vec, so the vectorizing join reruns here)
      val vocab = fitted(s, d, cfg16Vocab).vocabulary
      val base = SparkUtil.ensureParallelism(docs(s, d).select(col("doc_id"), col("text")))
      new MinHashLSH(cfg16Vocab).featurize(base, "doc_id", "text", vocab)
        .where(size(col(Cols.BoolVec)) > 0)
        .select(col("doc_id"),
          array_join(col(Cols.BoolVec).cast("array<string>"), ",").as("bool_vec_str"))
        .orderBy("doc_id")
    }),
    "fn_minhash_sig" -> ((s, d) => {
      val m = fitted(s, d, cfg16)
      m.indexDf.where(col(Cols.Signature).isNotNull)
        .select(col(Cols.Id).as("doc_id"),
          array_join(col(Cols.Signature), ",").as("signature_str")).orderBy("doc_id")
    }),
    "fn_simhash_md5" -> ((s, d) =>
      // md5-mode SimHash: oracle-checkable bit for bit (DuckDB rebuilds the
      // majority fingerprint from md5 hex nibbles); docs with zero tokens
      // excluded on both sides (no hash evidence to fingerprint)
      SparkUtil.ensureParallelism(docs(s, d))
        .select(col("doc_id"), T.tokenize(col("text")).as("__toks"))
        .where(size(col("__toks")) > 0)
        .select(col("doc_id"),
          graft.functions.SimHash64.simhashMd5(col("__toks")).as("simhash"))
        .orderBy("doc_id")),
    "fn_minhash_agg" -> ((s, d) =>
      // MinHash as a distributed aggregate over the exploded (doc, shingle)
      // relation — same signatures as the per-row kernel, but folded by the
      // hash aggregate with map-side combine (MinHashAgg scaladoc)
      SparkUtil.ensureParallelism(docs(s, d))
        .select(col("doc_id"), explode(T.shingles(col("text"), 2)).as("shingle"))
        .groupBy("doc_id")
        .agg(graft.functions.MinHashAgg.minhashMd5Agg(col("shingle"), cfg16.numHash).as("sig"))
        .select(col("doc_id"), array_join(col("sig"), ",").as("signature_str"))
        .orderBy("doc_id")),
    "fn_minhash_weighted" -> ((s, d) =>
      // tf-WEIGHTED MinHash (integer-weight expansion): each occurrence of
      // a repeated shingle gets its own element "gram#occ", so signature
      // agreement estimates weighted Jaccard  sum(min tf)/sum(max tf) —
      // repetition-heavy near-dups that plain set MinHash under-scores.
      // ZERO-shuffle form: per-row hashmap occurrence tagging
      // (TagOccurrences) + the per-row signature kernel, all inside the
      // scan's projection — same signatures the (id,gram) window + MinHash
      // aggregate produced, without the two O(corpus-tokens) shuffles.
      // empty-doc filter ABOVE the persist as sig IS NULL (empty⇒null
      // kernel contract) — a size(tg) filter below it lands on the 1-task
      // scan re-running the tag tree per row (round-3 pushdown lesson)
      SparkUtil.ensureParallelism(docs(s, d))
        .select(col("doc_id"),
          graft.functions.ArrayKernels.tagOccurrences(
            T.kShinglesAll(T.tokenize(col("text")), 2)).as("tg"))
        .select(col("doc_id"),
          graft.functions.MinHashExpr.minhashMd5(col("tg"), cfg16.numHash).as("sig"))
        .transform(SparkUtil.scopedPersist)
        .where(col("sig").isNotNull)
        .select(col("doc_id"), array_join(col("sig"), ",").as("signature_str"))
        .orderBy("doc_id")),
    "fn_buckenize" -> ((s, d) => {
      val m = fitted(s, d, cfg16)
      m.indexDf.where(col(Cols.Signature).isNotNull)
        .select(col(Cols.Id).as("doc_id"),
          array_join(array_sort(col(Cols.BucketIds)), ",").as("bucket_ids_str"))
        .orderBy("doc_id")
    }),
    "fn_jaccard_approx" -> ((s, d) => {
      val m = fitted(s, d, cfg16)
      m.indexDf.where(col(Cols.Signature).isNotNull)
        .crossJoin(broadcast(m.queryFeatures(keyOf(s, d))))
        .select(col(Cols.Id).as("doc_id"),
          H.signatureJaccard(col(Cols.Signature), col("q_sig")).as("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_id").asc)
    }),
    "sort_vocab" -> ((s, d) =>
      fitted(s, d, cfg16Vocab).vocabulary.get.orderBy("shingle")),

    // --- the flagship ANN query (SURVEY §3.3), full reference config
    "ann_query" -> ((s, d) =>
      fitted(s, d, cfg100).approxNearestNeighbors(keyOf(s, d), 10)
        .withColumnRenamed(Cols.Id, "doc_id")),
    // the same flagship answered from the PERSISTED bucket-inverted index:
    // result-identical to ann_query (shared oracle), but the scan reads
    // ≤ numBands partition directories via PartitionFilters on the query's
    // bucket prefixes instead of arrays_overlap over the whole index — the
    // point-query serving path at 100 TB (plan asserted in
    // PlanPropertiesSpec)
    "ann_query_indexed" -> ((s, d) =>
      fitted(s, d, cfg100)
        .approxNearestNeighborsIndexed(invertedIndexFor(s, d), keyOf(s, d), 10)
        .withColumnRenamed(Cols.Id, "doc_id")),
    // the COLD-START form of the same query: no fitted model at all — a
    // fresh session featurizes only the key (stateless in direct mode) and
    // answers from the warehouse posting table + documents. Same
    // candidates, scoring, ties ⇒ shares ann_query's oracle verbatim.
    "ann_query_served" -> ((s, d) =>
      MinHashLSH.annFromInvertedIndex(s, invertedIndexFor(s, d), docs(s, d),
          "doc_id", "text", keyOf(s, d), 10, cfg100)
        .withColumnRenamed(Cols.Id, "doc_id")),
    "ann_query_sql" -> ((s, d) => {
      // the flagship ANN path through plain SQL text (fn_bpe_sql pattern):
      // the registered kernels compose the SAME expression trees as the
      // DataFrame ann_query — shingles → md5 minhash → band buckets →
      // 1-row-broadcast bucket-overlap candidates → signature agreement →
      // (jaccard desc, id) top-10 as TakeOrderedAndProject. Null
      // signatures self-eliminate (arrays_overlap(null, ·) is null) so no
      // IS NOT NULL predicate exists for pushdown to substitute the
      // minhash tree into a scan filter (the round-3 trap). Shares
      // ann_query's oracle.
      // escape backslashes BEFORE quotes: the default SQL parser processes
      // backslash escapes inside string literals, so an unescaped \t in the
      // corpus key would become a tab and diverge from the DataFrame path
      val q = keyOf(s, d).replace("\\", "\\\\").replace("'", "''")
      SparkUtil.ensureParallelism(docs(s, d))
        .createOrReplaceTempView("documents_ann_v")
      s.sql(s"""
        WITH fb AS (
          SELECT doc_id, text, sig,
            graft_band_buckets_md5(sig, 25, 4, 4) AS buckets
          FROM (SELECT doc_id, text,
                  graft_minhash_md5(graft_shingles(text, 2), 100) AS sig
                FROM documents_ann_v)),
        qb AS (
          SELECT q_sig, graft_band_buckets_md5(q_sig, 25, 4, 4) AS q_buckets
          FROM (SELECT graft_minhash_md5(graft_shingles('$q', 2), 100) AS q_sig)),
        cand AS (
          SELECT f.doc_id, f.text,
            graft_signature_agreement(f.sig, qb.q_sig) AS jaccard
          FROM fb f, qb
          -- coalesce(·, false): same drop-null semantics, but the
          -- null-tolerant form yields no isnotnull constraint, so
          -- InferFiltersFromConstraints cannot push an
          -- isnotnull(minhash(...)) tree into the parquet scan (the
          -- DataFrame path's persist() barrier, expressed in SQL)
          WHERE coalesce(arrays_overlap(f.buckets, qb.q_buckets), false))
        SELECT doc_id, text, jaccard FROM cand
        ORDER BY jaccard DESC, doc_id LIMIT 10""")
    }),
    "ann_query_thres" -> ((s, d) =>
      // the bucketThres variant (reference approxNearestNeighbors
      // bucket_thres arg): candidates pass the bucket-set-jaccard filter
      fitted(s, d, cfg16).approxNearestNeighbors(keyOf(s, d), 10, bucketThres = 0.2)
        .withColumnRenamed(Cols.Id, "doc_id")),
    "ann_query_fast" -> ((s, d) => // xxhash64 fast mode — no SQL oracle
      fitted(s, d, cfg100Fast).approxNearestNeighbors(keyOf(s, d), 10)
        .withColumnRenamed(Cols.Id, "doc_id")),
    "ann_query_xx128" -> ((s, d) =>
      // the reference's DEFAULT mode end-to-end (xxh128 family over vocab
      // indices, xxh32 band buckets) — no SQL oracle (DuckDB has no xxh128);
      // rows-only gate, structure mirrors the md5-parity ann_query twin
      fitted(s, d, cfg100Xx128).approxNearestNeighbors(keyOf(s, d), 10)
        .withColumnRenamed(Cols.Id, "doc_id")),
    "fn_minhash_xx128" -> ((s, d) => {
      // signature dump in the reference's default family: Python-hex()
      // strings over vocab indices — no SQL oracle; rows-only gate
      val m = fitted(s, d, cfg100Xx128)
      m.indexDf.where(col(Cols.Signature).isNotNull)
        .select(col(Cols.Id).as("doc_id"),
          array_join(col(Cols.Signature), ",").as("signature_str"))
        .orderBy("doc_id")
    }),
    "ann_mode_agreement" -> ((s, d) => {
      // the three hash families (md5 parity, xxhash64 fast, reference-
      // default xx128) answer the same query; they cross-check each other
      // end-to-end where DuckDB cannot follow (it has no xxh128).
      // Round-18 draw-robust form: the r17 contract keyed on the 120-char
      // flagship prefix and demanded the est ≥ 0.3 top-10 subsets be
      // EQUAL — one sf0.1 draw put the prefix's true self-similarity AT
      // 0.3, where candidate generation itself is probabilistic (a J=0.3
      // pair reaches ≥1 of 25 bands with only ~18% probability), so the
      // claim was a lottery over the draw. Now: (1) the query is doc 0's
      // FULL text — the self-match has identical shingle sets, hence an
      // identical signature and DETERMINISTIC banding in every family:
      // each family's top hit must be doc 0 at jaccard exactly 1.0, a
      // bit-level end-to-end check with zero draw luck; (2) strong-hit
      // agreement is one-sided with a 3σ band — every doc one family
      // rates ≥ 0.8 must appear ≥ 0.65 in the other (sd ≈ 0.04 at 100
      // hashes; banding at J ≥ 0.72 with 25 bands misses with p < 1e-5)
      // — instead of a knife-edge set equality.
      // Round-19 robustness (advisor): the one-sided check used to
      // resolve "≥ 0.65 in the other family" WITHIN that family's own
      // top-50 candidate list, so a strong hit ranked 51st there (or
      // missed by its banding) failed the gate spuriously. Now the
      // strong ids' estimates are looked up in the other family
      // DIRECTLY from its signatures (queryFeatures + the agreement
      // kernel — no candidate list, no banding probability in the claim
      // at all); and the self-match asserts MEMBERSHIP of (doc 0, 1.0)
      // rather than head position, so an improbable 1.0 tie cannot
      // break it either.
      val fullKey = docs(s, d).where(col("doc_id") === 0)
        .select(col("text")).collect()(0).getString(0)
      val cfgs = Seq(cfg100, cfg100Fast, cfg100Xx128)
      def hits(cfg: MinHashConfig): Seq[(Long, Float)] =
        fitted(s, d, cfg).approxNearestNeighbors(fullKey, 50)
          .select(col(Cols.Id), col(Cols.Jaccard)).collect()
          .map(r => (r.getLong(0), r.getFloat(1))).toSeq
      val all = cfgs.map(hits)
      def strong(h: Seq[(Long, Float)]) = h.filter(_._2 >= 0.8f).map(_._1).toSet
      // the named ids' signature-agreement estimates under `cfg`,
      // straight from the index signatures (bounded collect: ≤ 50 ids)
      def estIn(cfg: MinHashConfig, ids: Set[Long]): Map[Long, Float] =
        if (ids.isEmpty) Map.empty
        else {
          val m = fitted(s, d, cfg)
          m.indexDf.where(col(Cols.Id).isin(ids.toSeq: _*))
            .crossJoin(broadcast(m.queryFeatures(fullKey)
              .where(col("q_sig").isNotNull).select(col("q_sig"))))
            .select(col(Cols.Id), graft.functions.ArrayKernels
              .signatureAgreement(col(Cols.Signature), col("q_sig")).as("est"))
            .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
        }
      def agree(a: Int, b: Int): Boolean = {
        def oneWay(x: Int, y: Int) = {
          val st = strong(all(x))
          val est = estIn(cfgs(y), st)
          st.forall(id => est.get(id).exists(_ >= 0.65f))
        }
        oneWay(a, b) && oneWay(b, a)
      }
      val selfExact = all.forall(_.exists(t => t._1 == 0L && t._2 == 1.0f))
      import s.implicits._
      Seq((selfExact, agree(0, 1), agree(0, 2), agree(1, 2)))
        .toDF("self_exact", "agree_md5_fast", "agree_md5_xx128",
          "agree_fast_xx128")
    }),
    "ann_mllib_agreement" -> ((s, d) => {
      // graft's LSH vs Spark MLlib's INDEPENDENT MinHashLSH implementation
      // at matched params (16 hash tables, same 2-token shingle sets,
      // jaccard threshold 0.5): both are unbiased estimators of the same
      // similarity, so their pair sets must majority-overlap, both be
      // non-empty, and the planted near-dup family must sit in the
      // intersection. Guards against a systematic bias in our hashing /
      // banding that the DuckDB oracle (which replays OUR hash formulas)
      // could never catch. Boolean gate like ann_mode_agreement — DuckDB
      // cannot replay MLlib's hash family. The 0.9 overlap floor has
      // margin under the measured value (EXACTLY 1.0 at both sf0.001 —
      // 28 = 28 pairs — and sf0.01 — 25 = 25; both engines deterministic
      // at fixed seed); the top-scored pair must always be in the core.
      // The check runs on a fixed 1000-doc slice: MLlib's similarity join
      // blows up superlinearly with corpus size (72 s at sf0.1 full) and a
      // bias cross-check doesn't need the whole corpus to detect bias.
      import org.apache.spark.ml.feature.{HashingTF, MinHashLSH => MLMinHashLSH}
      val slice = docs(s, d).where(col("doc_id") < 1000)
      val sliceModel = new MinHashLSH(cfg16).fit(slice, "doc_id", "text")
      val scored = SparkUtil.scopedPersist(sliceModel.approxSimilarityJoin(0.5))
      val ours = scored.select(col("a_id"), col("b_id"))
      val sh = slice.select(col("doc_id"), T.shingles(col("text"), 2).as("sh"))
        .where(size(col("sh")) > 0)
      val feat = new HashingTF().setInputCol("sh").setOutputCol("features")
        .setNumFeatures(1 << 18).transform(sh)
      val ml = SparkUtil.scopedPersist(new MLMinHashLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(16).setSeed(1L).fit(feat)
        .approxSimilarityJoin(feat, feat, 0.5, "dist")
        .select(col("datasetA.doc_id").as("a_id"), col("datasetB.doc_id").as("b_id"))
        .where(col("a_id") < col("b_id")))
      val core = SparkUtil.scopedPersist(ours.join(ml, Seq("a_id", "b_id")))
      val (nOurs, nMl, nCore) = (ours.count(), ml.count(), core.count())
      // the strongest signal must never be disputed: our top-estimated
      // pair (ties broken by id) has to be in the agreement core
      val top = scored.orderBy(col(Cols.Jaccard).desc, col("a_id"), col("b_id"))
        .limit(1).select("a_id", "b_id")
      val topAgreed = top.join(ml, Seq("a_id", "b_id")).count() > 0
      sliceModel.unpersist() // every action above is eager; the fit cache is done
      import s.implicits._
      Seq((nOurs > 0 && nMl > 0,
          nCore.toDouble / math.max(nOurs, nMl) >= 0.9,
          topAgreed))
        .toDF("both_nonempty", "overlap_strong", "top_pair_agreed")
    }),
    "ann_batch" -> ((s, d) => { // multi-query scale path — no SQL oracle
      val m = fitted(s, d, cfg100Fast)
      val qs = docs(s, d).where(col("doc_id") < 50)
        .select(col("doc_id").as("qid"), col("text"))
      m.approxNearestNeighborsAll(qs, "qid", "text", 5)
    }),
    "ann_batch_indexed" -> ((s, d) => {
      // the batch-throughput SERVING path: the query workload's exploded
      // buckets equi-join the PERSISTED posting table directly — no
      // per-session corpus featurize, no bucket explode (paid once at
      // index-build time). Result-identical to the in-memory batch path,
      // so it shares ann_batch_md5's oracle.
      val m = fitted(s, d, cfg16)
      val qs = docs(s, d).where(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("text"))
      m.approxNearestNeighborsAllIndexed(invertedIndexFor(s, d, cfg16),
          qs, "qid", "text", 5)
        .select(col("qid"), col(Cols.Id).as("id"), col(Cols.Jaccard),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")
    }),
    "ann_batch_colocated" -> ((s, d) => {
      // batch serving against a posting table FILE-BUCKETED on the join
      // key: the scan's own hash partitioning satisfies the bucket
      // equi-join, so only the (small) query workload shuffles — no
      // Exchange over the posting side, which at 100 TB IS the index
      // (plan-asserted in PlanPropertiesSpec). Result-identical to the
      // unbucketed batch path ⇒ shares ann_batch_md5's oracle.
      val m = fitted(s, d, cfg16)
      val qs = docs(s, d).where(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("text"))
      m.approxNearestNeighborsAllIndexed(
          invertedIndexFor(s, d, cfg16, numBuckets = 32),
          qs, "qid", "text", 5)
        .select(col("qid"), col(Cols.Id).as("id"), col(Cols.Jaccard),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")
    }),
    "stream_inverted_ingest_real" -> ((s, d) => {
      // the STREAMING twin of ann_index_maintained: the same three ingest
      // slices (prelim corpus seq 1, correction re-ingest seq 2, duplicate
      // redelivery seq 3) arrive as a REAL file stream one file per
      // micro-batch; each batch featurizes statelessly and APPENDS to the
      // posting table (the seq rides in the data, so the final state is a
      // pure function of the corpus — batch boundaries can't affect it),
      // then compactInverted drops superseded postings and the flagship
      // query served from the maintained table must equal a fresh build
      // over the final corpus (SAME oracle as the batch gate).
      val table = "graft_stream_inverted_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(s, _))
      val tmp = stageOnce(s, d, "graft-stream-inverted") { t =>
        val dd = docs(s, d).select(col("doc_id").cast("long").as("id"), col("text"))
        val slices = Seq(
          dd.select(col("id"),
            when(col("id") % 5 === 0,
              concat(lit("preliminary draft "), col("text")))
              .otherwise(col("text")).as("text"), lit(1L).as("ingest_seq")),
          dd.where(col("id") % 5 === 0).withColumn("ingest_seq", lit(2L)),
          dd.where(col("id") % 7 === 3).withColumn("ingest_seq", lit(3L)))
        val dirF = new java.io.File(t)
        slices.zipWithIndex.foreach { case (sl, i) =>
          sl.coalesce(1).write
            .mode(if (i == 0) "overwrite" else "append").parquet(t)
          // pin trigger order to the ingest slices (FileStreamSource
          // orders new files by mtime) — fresh files carry a current
          // mtime; already-stamped ones must not be restamped
          dirF.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .filter(_.lastModified() > 1700000000000L)
            .foreach(_.setLastModified(1600000000000L + i * 60000L))
        }
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingInvertedIngest(
        s, tmp, schema, cfg16, table, prefixLen = 1)
      try q.processAllAvailable() finally q.stop()
      IndexStore.compactInverted(s, table)
      MinHashLSH.annFromInvertedIndex(s, table, docs(s, d), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "stream_index_debt_compact" -> ((s, d) => {
      // DEBT-TRIGGERED maintenance in the streaming sink: the same three
      // ingest slices arrive as a file stream, and compaction is NEVER
      // called by the harness — the sink's own debt poll
      // (compactAtDeadPostings = 1) must fire it mid-stream when the
      // correction slice creates reclaimable rows. The gate's result
      // carries the oracle-checkable claim: zero superseded rows remain
      // physically (only the trigger could have dropped them), and the
      // served flagship query equals a fresh build over the final corpus
      // (the shared maintained-index oracle).
      // PROTOCOL gate: corpus capped at the sf0.01 shape (doc_id < 500) —
      // the claim is the in-sink trigger firing and the fresh-build
      // equivalence, not ingest scale; the whole-corpus scale row stays
      // with stream_inverted_ingest_real (round-17 verdict task 7)
      val table = "graft_stream_debt_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(s, _))
      val tmp = stageOnce(s, d, "graft-stream-debt") { t =>
        val dd = docs(s, d).where(col("doc_id") < 500)
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val slices = Seq(
          dd.select(col("id"),
            when(col("id") % 5 === 0,
              concat(lit("preliminary draft "), col("text")))
              .otherwise(col("text")).as("text"), lit(1L).as("ingest_seq")),
          dd.where(col("id") % 5 === 0).withColumn("ingest_seq", lit(2L)),
          dd.where(col("id") % 7 === 3).withColumn("ingest_seq", lit(3L)))
        val dirF = new java.io.File(t)
        slices.zipWithIndex.foreach { case (sl, i) =>
          sl.coalesce(1).write
            .mode(if (i == 0) "overwrite" else "append").parquet(t)
          dirF.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .filter(_.lastModified() > 1700000000000L)
            .foreach(_.setLastModified(1600000000000L + i * 60000L))
        }
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingInvertedIngest(
        s, tmp, schema, cfg16, table, prefixLen = 1,
        compactAtDeadPostings = 1L)
      try q.processAllAvailable() finally q.stop()
      // NO manual compactInverted here — the claim below fails the gate
      // if the stream's debt trigger did not fire
      val t = s.table(table).where(col("bkt_pfx") =!= IndexStore.TombstonePrefix)
        .select(col(Cols.Id), col("ingest_seq"))
      val stale = t.join(
          t.groupBy(col(Cols.Id)).agg(max(col("ingest_seq")).as("__w")),
          Seq(Cols.Id))
        .where(col("ingest_seq") < col("__w")).count()
      MinHashLSH.annFromInvertedIndex(s, table,
          docs(s, d).where(col("doc_id") < 500), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
        .withColumn("compacted_by_debt", lit(stale == 0L))
    }),
    "stream_index_file_compact" -> ((s, d) => {
      // the PURE-APPEND path's physical debt on the TEXT index (the
      // stream_vec_gen_compact twin): an all-new-ids stream never creates
      // superseded rows, so the dead-postings trigger can never fire and
      // every micro-batch leaves one more parquet file in each touched
      // partition forever — reads pay one footer per append. The sink's
      // compactAtDataFiles knob (an opt-in one-listStatus-per-partition
      // poll) drives compactInverted's maxFilesPerDir rewrite: offending
      // partitions fold to ONE file each, rows passing through an absent
      // winner untouched. The harness NEVER compacts; files_bounded is
      // the claim only the in-sink trigger can satisfy, and the served
      // flagship query must equal a fresh build over the final corpus.
      // PROTOCOL gate: corpus capped at the sf0.01 shape — see
      // stream_index_debt_compact
      val table = "graft_stream_files_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(s, _))
      val tmp = stageOnce(s, d, "graft-stream-files") { t =>
        val dd = docs(s, d).where(col("doc_id") < 500)
          .select(col("doc_id").cast("long").as("id"),
            col("text"), lit(1L).as("ingest_seq"))
        val slices = Seq(
          dd.where(col("id") % 3 === 0),
          dd.where(col("id") % 3 === 1),
          dd.where(col("id") % 3 === 2))
        val dirF = new java.io.File(t)
        slices.zipWithIndex.foreach { case (sl, i) =>
          sl.coalesce(1).write
            .mode(if (i == 0) "overwrite" else "append").parquet(t)
          dirF.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .filter(_.lastModified() > 1700000000000L)
            .foreach(_.setLastModified(1600000000000L + i * 60000L))
        }
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingInvertedIngest(
        s, tmp, schema, cfg16, table, prefixLen = 1,
        compactAtDataFiles = 1)
      try q.processAllAvailable() finally q.stop()
      // physical claim, catalog-free (rename mode keeps partition dirs in
      // place): every partition folded to one file
      val base = IndexStore.warehouseLocation(s, table)
      val maxFiles = Option(base.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bkt_pfx="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
        .foldLeft(0)(math.max)
      MinHashLSH.annFromInvertedIndex(s, table,
          docs(s, d).where(col("doc_id") < 500), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
        .withColumn("files_bounded", lit(maxFiles == 1))
    }),
    "ann_index_maintained" -> ((s, d) => {
      // SERVING-INDEX MAINTENANCE end to end: three streaming-shaped
      // appends land in the inverted posting table — (1) the corpus with
      // PRELIMINARY text for the doc_id % 5 == 0 slice, (2) the correction
      // re-ingest of that slice (its signature CHANGES, so its old
      // postings sit in now-stale buckets), (3) a duplicate re-delivery of
      // doc_id % 7 == 3 (idempotency) — then compactInverted drops every
      // superseded posting and the flagship query served from the
      // maintained table must equal a fresh build over the FINAL corpus:
      // the oracle is the cfg16 ANN replay over `documents`.
      val table = "graft_ann_maintained_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0,
          concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      // prefixLen=1 (16 dirs): this gate tests SUPERSESSION semantics, not
      // pruning width — 3 writes x 256 dirs of file ops dominated the gate
      // at 17.5 s; the serve must pass the SAME prefixLen (partition values
      // are 1-char here, a 2-char prefix probe would match nothing)
      IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table, prefixLen = 1)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 7 === 3), 3), table, prefixLen = 1)
      IndexStore.compactInverted(s, table)
      MinHashLSH.annFromInvertedIndex(s, table, docs(s, d), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_index_manifest" -> ((s, d) => {
      // the MAINTAINED lifecycle under the OBJECT-STORE-SAFE swap mode:
      // same appends/supersession as ann_index_maintained, but the table
      // compacts via SwapManifest — data files never move, each dirty
      // partition flips by one catalog SET LOCATION, and the replaced
      // generation survives for in-flight readers until the next pass
      // GCs it. The served answer must be IDENTICAL to the rename-mode
      // twin: the swap strategy is a durability/atomicity choice, never
      // a semantics one (same fresh-build oracle).
      val table = "graft_ann_manifest_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0,
          concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1,
        swapMode = IndexStore.SwapManifest)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table)
      IndexStore.compactInverted(s, table)
      // a SECOND maintenance interval: another correction + compaction —
      // exercises generation GC (the _gen-0 dirs nothing references drop)
      // and the flip-over-flipped-partition path
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 10 === 0), 3), table)
      IndexStore.compactInverted(s, table)
      MinHashLSH.annFromInvertedIndex(s, table, docs(s, d), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_snapshot_pin" -> ((s, d) => {
      // NAMED SNAPSHOTS on the TEXT index — the sim_snapshot_pin twin
      // (IndexStore.pinInverted): the pin records the catalog's partition
      // locations (zero data copies — manifest mode never moves a file)
      // plus delta-sized copies of the dirty log and hot list, so a
      // pinned serve resolves the EXACT index state of its moment:
      // postings, supersession cutoffs, and hot-skip policy all frozen.
      // The pin lands ON AN UNCOMPACTED BACKLOG (the %5 correction is
      // appended but not compacted), so the pinned serve exercises the
      // pinned cutoffs for real: it must answer as a fresh build over the
      // pin-time corpus — the TRUE documents — while the live table takes
      // a post-pin revision (%3 docs), a compaction that flips the dirty
      // partitions to new generations (pinned ones retained by gc), and a
      // TAKEDOWN of doc 50 (a planted near-dup, a guaranteed top hit)
      // that must pierce BOTH serving states: tombstones alone read live.
      val table = annPinTableFor(s, d)
      def serve(t: String, pin: Option[String], stage: String): DataFrame =
        MinHashLSH.annFromInvertedIndex(s, t, docs(s, d), "doc_id",
            "text", keyOf(s, d), 10, cfg16, pin)
          .withColumnRenamed(Cols.Id, "doc_id")
          .withColumn("stage", lit(stage))
      // the export escape hatch: the pin materialized as a standalone
      // table (served state — pinned cutoffs + the live doc-50 takedown
      // applied) serves with NO pin and must answer exactly as the
      // pinned serve (same oracle rows) — an exported-then-unpinned
      // snapshot loses nothing
      serve(table, Some("train_v1"), "pinned")
        .unionByName(serve(table + "_exp", None, "exported"))
        .unionByName(serve(table, None, "live"))
        .orderBy(col("stage"), col(Cols.Jaccard).desc, col("doc_id"))
    }),
    "ann_snapshot_batch" -> ((s, d) => {
      // the BATCH path served at the pin: the 20-query workload joins the
      // pinned postings (pinned cutoffs applied — the %5 backlog
      // correction serves, the %3 post-pin revision is invisible) with
      // the live doc-50 takedown piercing the candidates; `live_differs`
      // is the engine-side claim that the pin actually diverges from the
      // live batch answer (the snapshot is doing work, not a no-op)
      val table = annPinTableFor(s, d)
      val m = fitted(s, d, cfg16)
      val qs = docs(s, d).where(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("text"))
      def batch(pin: Option[String]): DataFrame =
        m.approxNearestNeighborsAllIndexed(table, qs, "qid", "text", 5,
            skipHotBuckets = false, pin)
          .select(col("qid"), col(Cols.Id).as("id"), col(Cols.Jaccard),
            col("rank").cast("long").as("rank"))
      val pinned = batch(Some("train_v1")).localCheckpoint()
      val live = batch(None).localCheckpoint()
      val differs = pinned.exceptAll(live).count() > 0
      pinned.withColumn("live_differs", lit(differs)).orderBy("qid", "rank")
    }),
    "snapshot_pair_pin" -> ((s, d) => {
      // CROSS-INDEX consistent snapshot (Snapshots.pinTrainingSet): text
      // + vector pinned as ONE training set under claim-all → pin-all →
      // check-all. The fixture interleaves a RACING vector append into
      // the first pin window — the commit must refuse, roll back whole,
      // and the retry pins the post-append state on BOTH surfaces
      // (paired_attempts = 2). The served rows are the PINNED text serve
      // after post-pin churn on both sides — a fresh build over the
      // pin-time corpus (the capped TRUE documents); vec_pin_coherent /
      // vec_live_moved are the vector half's frozen-window claims (the
      // raced seq-2 rows are IN the pin — the retry resolved the newer
      // state — and the post-pin seq-3 ingest is NOT).
      val (table, vecDir, attempts) = pairPinSetupFor(s, d)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val nBase = emb.count()
      val nRaced = emb.where(col("vec_id") % 13 === 2).count()
      val pinnedVec = graft.sources.CellManifest
        .readTable(s, s"$vecDir/assigned", "pair_v1")
        .agg(count(lit(1)).as("n"), max(col("ingest_seq")).as("mx"))
        .collect()(0)
      val vecCoherent = pinnedVec.getLong(0) == nBase + nRaced &&
        pinnedVec.getLong(1) == 2L
      val liveMoved = graft.sources.CellManifest
        .readTable(s, s"$vecDir/assigned")
        .agg(max(col("ingest_seq"))).collect()(0).getLong(0) == 3L
      MinHashLSH.annFromInvertedIndex(s, table,
          docs(s, d).where(col("doc_id") < 500), "doc_id", "text",
          keyOf(s, d), 10, cfg16, Some("pair_v1"))
        .withColumnRenamed(Cols.Id, "doc_id")
        .withColumn("paired_attempts", lit(attempts))
        .withColumn("vec_pin_coherent", lit(vecCoherent))
        .withColumn("vec_live_moved", lit(liveMoved))
        .orderBy(col(Cols.Jaccard).desc, col("doc_id"))
    }),
    "ann_snapshot_debt" -> ((s, d) => {
      // PIN-RETENTION OBSERVABILITY (IndexStore.snapshotDebt): a stale
      // pin's cost — blocked whole-table writers, locations held out of
      // gc — must show up in a pollable signal and disappear on unpin,
      // the same way compaction debt shows in maintenanceDebt. The
      // lifecycle: pin, then two append+compact passes age the pin (its
      // age counts WRITER CLAIMS via the fence epoch, no wall clock) and
      // strand the pinned pre-churn locations; the signal must show
      // pins=1, a positive age, and retained locations; after unpin the
      // next maintenance head reclaims and the signal must read zero.
      // PROTOCOL gate — capped corpus (claims are about the signal, not
      // scale; pin cost scaling is pin_ladder's job).
      val table = "graft_ann_snapdebt_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).where(col("doc_id") < 500)
        .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      IndexStore.saveInverted(feat(dd, 1), table, prefixLen = 1,
        swapMode = IndexStore.SwapManifest)
      IndexStore.pinInverted(s, table, "stale_v1")
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0)
        .select(col(Cols.Id), concat(lit("revised "), col(Cols.Text))
          .as(Cols.Text)), 2), table)
      IndexStore.compactInverted(s, table)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 7 === 3), 3), table)
      IndexStore.compactInverted(s, table)
      val aged = IndexStore.snapshotDebt(s, table).collect()(0)
      val agedOk = aged.getInt(0) == 1 && aged.getString(1) == "stale_v1" &&
        aged.getLong(2) > 0L
      val retainedForPin = aged.getLong(3) > 0L
      IndexStore.unpinInverted(s, table, "stale_v1")
      IndexStore.compactInverted(s, table) // the head after the last unpin
      val after = IndexStore.snapshotDebt(s, table).collect()(0)
      val cleared = after.getInt(0) == 0 && after.getLong(2) == -1L &&
        after.getLong(3) == 0L
      import s.implicits._
      Seq((aged.getInt(0), agedOk, retainedForPin, cleared))
        .toDF("pins", "pin_aged", "retained_for_pin", "cleared_on_unpin")
    }),
    "sim_snapshot_debt" -> ((s, d) => {
      // the VECTOR twin (VectorAudit.snapshotDebt): pin age counts
      // MANIFEST COMMITS (newest manifest minus the pinned number);
      // retention shows generations only the pinned manifest references
      // AND takedown-marker files compactDeletes holds for the pin; both
      // must clear at the first maintenance pass after unpin. PROTOCOL
      // gate — capped corpus.
      val dir = roundTripDir(d, "graft-vec-snapdebt")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val m = SimSearch.trainIvf(emb, "vec_id", "embedding",
        nLists = 8, iters = 1)
      graft.operators.IvfModel(m.centroids,
          m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      graft.operators.IvfModel.pinSnapshot(s, dir, "stale_v1")
      graft.operators.IvfModel.appendVectors(s, dir,
        emb.where(col("vec_id") % 13 === 2), "vec_id", "embedding", seq = 2L)
      graft.operators.IvfModel.compactUpserts(s, dir)
      graft.operators.IvfModel.deleteVectors(s, dir,
        emb.where(col("vec_id") === 7).select("vec_id"), seq = 3L)
      graft.operators.IvfModel.compactDeletes(s, dir)
      val aged = graft.sources.VectorAudit.snapshotDebt(s, dir).collect()(0)
      val agedOk = aged.getInt(0) == 1 && aged.getString(1) == "stale_v1" &&
        aged.getLong(2) > 0L
      val retainedForPin = aged.getLong(3) > 0L
      val markersRetained = aged.getLong(4) > 0L
      graft.operators.IvfModel.unpinSnapshot(s, dir, "stale_v1")
      graft.operators.IvfModel.compactUpserts(s, dir) // post-unpin head: gc
      graft.operators.IvfModel.compactDeletes(s, dir) // marker clear pass
      val after = graft.sources.VectorAudit.snapshotDebt(s, dir).collect()(0)
      val cleared = after.getInt(0) == 0 && after.getLong(2) == -1L &&
        after.getLong(3) == 0L && after.getLong(4) == 0L
      import s.implicits._
      Seq((aged.getInt(0), agedOk, retainedForPin, markersRetained, cleared))
        .toDF("pins", "pin_aged", "retained_for_pin", "markers_retained",
          "cleared_on_unpin")
    }),
    "snapshot_pair_debt" -> ((s, d) => {
      // ONE-FRAME retention debt for a CROSS-INDEX training-set pin
      // (Snapshots.trainingSetDebt): pin a text table + a vector index as
      // one set, churn BOTH surfaces, and the union frame must show the
      // pin aging in each family's own writer-op unit (claims on text,
      // manifest commits on vector — never wall clock), with retention
      // held per surface (text markers are permanent by contract, −1;
      // vector takedown markers retained for the pin), then clear WHOLE
      // on unpinTrainingSet + the next maintenance heads. PROTOCOL gate —
      // capped corpus (pin cost scaling is pin_ladder's job).
      val table = "graft_pair_debt_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).where(col("doc_id") < 500)
        .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      IndexStore.saveInverted(feat(dd, 1), table, prefixLen = 1,
        swapMode = IndexStore.SwapManifest)
      val dir = roundTripDir(d, "graft-pair-debt-vec")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val m = SimSearch.trainIvf(emb, "vec_id", "embedding",
        nLists = 8, iters = 1)
      graft.operators.IvfModel(m.centroids,
          m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      val attempts = graft.sources.Snapshots.pinTrainingSet(s, "set_v1",
        Seq(table), Seq(dir))
      // churn BOTH surfaces past the pin
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0)
        .select(col(Cols.Id), concat(lit("revised "), col(Cols.Text))
          .as(Cols.Text)), 2), table)
      IndexStore.compactInverted(s, table)
      graft.operators.IvfModel.appendVectors(s, dir,
        emb.where(col("vec_id") % 13 === 2), "vec_id", "embedding", seq = 2L)
      graft.operators.IvfModel.compactUpserts(s, dir)
      graft.operators.IvfModel.deleteVectors(s, dir,
        emb.where(col("vec_id") === 7).select("vec_id"), seq = 3L)
      graft.operators.IvfModel.compactDeletes(s, dir)
      val aged = graft.sources.Snapshots.trainingSetDebt(s, Seq(table), Seq(dir))
        .orderBy("kind").collect()
      def agedRow(kind: String) = aged.find(_.getString(1) == kind).get
      def agedOk(r: org.apache.spark.sql.Row) =
        r.getInt(2) == 1 && r.getString(3) == "set_v1" && r.getLong(4) > 0L
      val (tA, vA) = (agedRow("text"), agedRow("vector"))
      graft.sources.Snapshots.unpinTrainingSet(s, "set_v1", Seq(table), Seq(dir))
      // post-unpin maintenance heads reclaim each surface's retention
      IndexStore.compactInverted(s, table)
      graft.operators.IvfModel.compactUpserts(s, dir)
      graft.operators.IvfModel.compactDeletes(s, dir)
      val after = graft.sources.Snapshots.trainingSetDebt(s, Seq(table), Seq(dir))
        .collect()
      def clearedOk(r: org.apache.spark.sql.Row) =
        r.getInt(2) == 0 && r.getLong(4) == -1L && r.getLong(5) == 0L
      import s.implicits._
      Seq(
        ("text", attempts, agedOk(tA), tA.getLong(5) > 0L,
          tA.getLong(6) == -1L,
          clearedOk(after.find(_.getString(1) == "text").get)),
        ("vector", attempts, agedOk(vA), vA.getLong(5) > 0L,
          vA.getLong(6) > 0L,
          clearedOk(after.find(_.getString(1) == "vector").get)))
        .toDF("kind", "pin_attempts", "pin_aged", "retained_for_pin",
          "markers_ok", "cleared_on_unpin")
        .orderBy("kind")
    }),
    "ann_index_fresh" -> ((s, d) => {
      // EXACT-ON-ARRIVAL maintenance: the same prelim-corpus + correction
      // appends as ann_index_maintained, but served WITHOUT any
      // compaction — the supersession cutoffs (the dirty log's newest
      // append seq per id) exclude every stale posting at the scan, so an
      // uncompacted backlog serves exactly as a fresh build over the
      // current corpus. This closes the round-14 "transient anomaly"
      // window (a doc whose newest version no longer shares a query
      // bucket could surface via a stale posting until compaction);
      // compaction is now purely a cost/space operation, never a
      // correctness event. Same oracle as the compacted twin.
      val table = "graft_ann_fresh_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0,
          concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table)
      // NO compactInverted — the point of the gate
      MinHashLSH.annFromInvertedIndex(s, table, docs(s, d), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_postings_audit" -> ((s, d) => {
      // the TAKEDOWN-VERIFICATION primitive: everything the index
      // physically stores about given ids — postings with their seqs and
      // the tombstone markers (null bucket). Served from the maintenance
      // id-map (partitioned by id HASH), so the lookup reads ≤ |ids|
      // partitions instead of scanning a prefix-partitioned 100 TB table;
      // the oracle replays the featurize pipeline for the audited ids
      // plus the marker row.
      // the audited table is BUILT once per process (tombstone included —
      // the gate only READS it afterwards, so the memo is sound like
      // invertedIndexFor's) and the lookup is the operator under test
      val table = auditIndexFor(s, d)
      IndexStore.postingsOf(s, table, Seq(0L, 50L, 82L))
        .select(col(Cols.Id).as("doc_id"), col("ingest_seq"), col("bucket"))
        .orderBy(col("doc_id"), col("ingest_seq"), col("bucket").asc_nulls_last)
    }),
    "ann_index_relayout" -> ((s, d) => {
      // LAYOUT MIGRATION: the prefix width / bucket spec that fits a small
      // index must be able to GROW with the corpus (PERF.md: "the knobs
      // move together" — prefixLen 2→4, wider file-bucketing at 100 TB).
      // A maintained table (prelim corpus seq 1, correction append seq 2,
      // a tombstone at seq 2) relayouts from the starter layout
      // (prefixLen=1, unbucketed) to the grown one (prefixLen=2,
      // numBuckets=16) through one offline rebuild; maintenance then
      // CONTINUES on the migrated table (compaction drops the superseded
      // postings the migration faithfully carried over, and the marker
      // still guards) and the flagship serve must equal a fresh build
      // over corpus-minus-deleted — the migration changed bytes-on-disk,
      // never answers.
      val table = "graft_ann_relayout_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0,
          concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1)
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table)
      IndexStore.appendTombstones(s, table,
        dd.where(col(Cols.Id) === 82L).select(col(Cols.Id)), seq = 2L)
      IndexStore.relayoutInverted(s, table,
        IndexStore.invertedMeta(s, table).copy(prefixLen = 2, numBuckets = 16))
      // maintenance CONTINUES on the migrated layout: a post-migration
      // re-ingest logs into the re-seeded maintenance state and the
      // compaction drops its superseded rows under the new bucket spec
      IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 7 === 3), 3), table)
      IndexStore.compactInverted(s, table)
      MinHashLSH.annFromInvertedIndex(s, table, docs(s, d), "doc_id", "text",
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_index_deleted" -> ((s, d) => {
      // the TAKEDOWN path end to end (copyright removal / opt-out /
      // contamination): build the serving index, then DELETE the planted
      // near-dup family members (50, 82 — both top hits of the flagship
      // key) plus the doc_id % 11 == 6 slice via tombstone markers. The
      // flagship query must equal a fresh build over corpus-minus-deleted
      // in BOTH serving states — the instant the markers land (NO
      // compaction yet: serving excludes any id whose newest tombstone
      // outranks its newest posting) and after compactInverted physically
      // drops the postings (markers survive as the at-least-once
      // redelivery guard). One oracle, two stage rows.
      val table = "graft_ann_deleted_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      val ix = new MinHashLSH(cfg16).featurize(dd, Cols.Id, Cols.Text, None)
        .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
        .withColumn("ingest_seq", lit(1L))
      IndexStore.saveInverted(ix, table, prefixLen = 1)
      val deleted = dd.where(col(Cols.Id) % 11 === 6 || col(Cols.Id).isin(50L, 82L))
        .select(col(Cols.Id))
      IndexStore.appendTombstones(s, table, deleted, seq = 2L)
      def serve(stage: String): DataFrame =
        MinHashLSH.annFromInvertedIndex(s, table, docs(s, d), "doc_id", "text",
            keyOf(s, d), 10, cfg16)
          .withColumn("stage", lit(stage))
      // materialize the pre-compaction answer BEFORE compaction rewrites
      // the files its lazy plan would read
      val pre = serve("pre_compact").localCheckpoint()
      IndexStore.compactInverted(s, table)
      pre.unionByName(serve("post_compact"))
        .withColumnRenamed(Cols.Id, "doc_id")
        .orderBy(col("stage"), col(Cols.Jaccard).desc, col("doc_id"))
    }),
    "pipeline_cdc_index" -> ((s, d) => {
      // CDC feed → serving index COMPOSITION: one change feed (upserts
      // re-writing the doc_id % 5 slice, deletes removing the
      // doc_id % 9 == 4 slice) drives BOTH halves of a deployment —
      // Cdc.applyChanges maintains the base snapshot, and the SAME feed
      // maintains the ANN index (upserts re-featurize through
      // appendInverted, deletes become tombstones) — then the flagship
      // query served from the maintained index against the maintained
      // snapshot must equal a fresh build over the applied snapshot.
      // PROTOCOL gate: corpus capped at the sf0.01 shape — the claim is
      // one feed maintaining both halves coherently, not CDC scale (the
      // cdc_* and stream_cdc_apply_real gates carry the scale rows)
      val table = "graft_cdc_index_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).where(col("doc_id") < 500)
        .select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Long): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq))
      IndexStore.saveInverted(feat(dd, 1L), table, prefixLen = 1)
      // the change feed (op/seq columns), disjoint upsert + delete slices
      val feed = dd.where(col(Cols.Id) % 5 === 0)
        .select(col(Cols.Id), concat(lit("revised "), col(Cols.Text)).as(Cols.Text),
          lit("U").as("__op"), lit(2L).as("__seq"))
        .unionByName(
          dd.where(col(Cols.Id) % 9 === 4 && col(Cols.Id) % 5 =!= 0)
            .select(col(Cols.Id), col(Cols.Text),
              lit("D").as("__op"), lit(2L).as("__seq")))
      // half 1: the base snapshot
      val snapshot = Cdc.applyChanges(dd, feed, Cols.Id, "__seq", "__op")
      // half 2: the serving index, from the SAME feed
      IndexStore.appendInverted(
        feat(feed.where(col("__op") === "U")
          .select(col(Cols.Id), col(Cols.Text)), 2L), table)
      IndexStore.appendTombstones(s, table,
        feed.where(col("__op") === "D").select(col(Cols.Id)), seq = 2L)
      IndexStore.compactInverted(s, table)
      MinHashLSH.annFromInvertedIndex(s, table, snapshot, Cols.Id, Cols.Text,
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_batch_pruned" -> ((s, d) => {
      // SMALL-batch serving: the workload's band buckets collect to the
      // driver (bounded: nQueries x numBands strings — the batch form of
      // the point path's query-key fetch) and prune the posting scan to
      // their partition directories; a 5-query batch reads ~20 dirs of
      // 256 instead of the whole index (PartitionFilters plan-asserted).
      val m = fitted(s, d, cfg16)
      val qs = docs(s, d).where(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("text"))
      m.approxNearestNeighborsAllIndexedPruned(invertedIndexFor(s, d, cfg16),
          qs, "qid", "text", 5)
        .select(col("qid"), col(Cols.Id).as("id"), col(Cols.Jaccard),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")
    }),
    "ann_batch_colocated_deleted" -> ((s, d) => {
      // the FULL maintenance lifecycle on the co-located (file-bucketed)
      // layout — the round-14 weak finding: tombstones and the compaction
      // rewrite must PRESERVE the bucket spec (spec-less files would fail
      // catalog reads or silently break the exchange-free join the layout
      // exists for). Build the numBuckets=32 posting table, delete the
      // planted near-dup family (50, 82) plus the %11==6 slice, then the
      // batch serve must equal a fresh build over corpus-minus-deleted in
      // BOTH serving states (markers-only and physically compacted); the
      // 0-Exchange posting-side plan surviving compaction is asserted in
      // PlanPropertiesSpec.
      val table = "graft_ann_colodel_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      val ix = new MinHashLSH(cfg16).featurize(dd, Cols.Id, Cols.Text, None)
        .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
        .withColumn("ingest_seq", lit(1L))
      IndexStore.saveInverted(ix, table, prefixLen = 1, numBuckets = 32)
      IndexStore.appendTombstones(s, table,
        dd.where(col(Cols.Id) % 11 === 6 || col(Cols.Id).isin(50L, 82L))
          .select(col(Cols.Id)), seq = 2L)
      val m = fitted(s, d, cfg16)
      val qs = docs(s, d).where(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("text"))
      def serve(stage: String): DataFrame =
        m.approxNearestNeighborsAllIndexed(table, qs, "qid", "text", 5)
          .select(col("qid"), col(Cols.Id).as("id"), col(Cols.Jaccard),
            col("rank").cast("long").as("rank"), lit(stage).as("stage"))
      val pre = serve("pre_compact").localCheckpoint()
      IndexStore.compactInverted(s, table)
      pre.unionByName(serve("post_compact"))
        .orderBy(col("stage"), col("qid"), col("rank"))
    }),
    "ann_batch_hotcap" -> ((s, d) => {
      // the batch-side hot-bucket occupancy cap (the point path's policy
      // extended to workloads, behind the skipHotBuckets knob): against
      // the planted boiler corpus the capped batch serve must keep the
      // recall floor vs its own uncapped twin — boiler queries (every
      // bucket hot) fall back to their full probe set, mixed queries
      // trade the stop-word bucket's candidates for bounded read cost
      // (bytes evidence: tools/hot_batch_ladder.scala). FLOOR = 0.8,
      // derived from the measured curve (tools/hotcap_floor_ladder.scala:
      // this exact configuration — unpruned path, this query set, k=5 —
      // measures min per-query recall 1.00 at thresholds n/20..n/5 at
      // BOTH sf0.01 and sf0.1; 0.8 allows one lost candidate of k=5
      // below the measured curve). The PRUNED path's mixed workload is
      // the lossy regime (min 0.20, hot_batch_ladder) — why the knob
      // ships default-OFF.
      val (table, planted) = hotskipIndexFor(s, d)
      val m = fitted(s, d, cfg16)
      val qs = planted.where(col(Cols.Id) < 20)
        .select(col(Cols.Id).as("qid"), col(Cols.Text).as("text"))
      val k = 5
      def topIds(skip: Boolean, outCol: String): DataFrame =
        m.approxNearestNeighborsAllIndexed(table, qs, "qid", "text", k,
            skipHotBuckets = skip)
          .groupBy("qid").agg(collect_list(col(Cols.Id)).as(outCol))
      topIds(skip = false, "full_ids")
        .join(topIds(skip = true, "cap_ids"), Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(size(array_intersect(col("cap_ids"), col("full_ids"))),
            lit(0)).cast("double") / k >= 0.8).as("recall_ok"))
        .orderBy("qid")
    }),
    "stream_takedown_real" -> ((s, d) => {
      // STREAMING twin of pipeline_cdc_index: the SAME change events —
      // full corpus (U seq 1), the %5 revision (U seq 2), the %9==4
      // deletes (D seq 2) — arrive as a REAL file stream, one file per
      // micro-batch; foreachBatch routes upserts to stateless featurize +
      // appendInverted and deletes to tombstone markers, seqs riding in
      // the data so the final state is a pure function of the event set.
      // After compaction the flagship query served from the maintained
      // index against the batch-CDC-applied snapshot must equal a fresh
      // build over that snapshot (pipeline_cdc_index's oracle verbatim).
      // PROTOCOL gate: corpus capped at the sf0.01 shape — the claims
      // are U/D routing and seq-in-data purity; the vector twin is
      // capped identically (round-17 task 7)
      val table = "graft_stream_takedown_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val dd = docs(s, d).where(col("doc_id") < 500)
        .select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      val tmp = stageOnce(s, d, "graft-stream-takedown") { t =>
        val slices = Seq(
          dd.select(col(Cols.Id), col(Cols.Text), lit("U").as("__op"),
            lit(1L).as("ingest_seq")),
          dd.where(col(Cols.Id) % 5 === 0)
            .select(col(Cols.Id),
              concat(lit("revised "), col(Cols.Text)).as(Cols.Text),
              lit("U").as("__op"), lit(2L).as("ingest_seq")),
          dd.where(col(Cols.Id) % 9 === 4 && col(Cols.Id) % 5 =!= 0)
            .select(col(Cols.Id), col(Cols.Text), lit("D").as("__op"),
              lit(2L).as("ingest_seq")))
        val dirF = new java.io.File(t)
        slices.zipWithIndex.foreach { case (sl, i) =>
          sl.coalesce(1).write
            .mode(if (i == 0) "overwrite" else "append").parquet(t)
          dirF.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .filter(_.lastModified() > 1700000000000L)
            .foreach(_.setLastModified(1600000000000L + i * 60000L))
        }
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingIndexMaintenance(
        s, tmp, schema, cfg16, table, idCol = Cols.Id, textCol = Cols.Text,
        opCol = "__op", prefixLen = 1)
      try q.processAllAvailable() finally q.stop()
      IndexStore.compactInverted(s, table)
      val feed = dd.where(col(Cols.Id) % 5 === 0)
        .select(col(Cols.Id), concat(lit("revised "), col(Cols.Text)).as(Cols.Text),
          lit("U").as("__op"), lit(2L).as("__seq"))
        .unionByName(
          dd.where(col(Cols.Id) % 9 === 4 && col(Cols.Id) % 5 =!= 0)
            .select(col(Cols.Id), col(Cols.Text),
              lit("D").as("__op"), lit(2L).as("__seq")))
      val snapshot = Cdc.applyChanges(dd, feed, Cols.Id, "__seq", "__op")
      MinHashLSH.annFromInvertedIndex(s, table, snapshot, Cols.Id, Cols.Text,
          keyOf(s, d), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_query_hotskip" -> ((s, d) => {
      // HOT-BUCKET adversarial serving: a third of the corpus is replaced
      // by one shared boilerplate paragraph, so its band buckets hold ~N/3
      // postings each — one point query touching them would read a third
      // of a 100 TB index. The table keeps occupancy stats
      // (hotBucketThreshold = N/10) and serving SKIPS query buckets on the
      // hot list (candidates keep only the rarer, more selective buckets).
      // The query is boiler + a 60-char doc-0 prefix: 2 of its 4 buckets
      // land on the hot list (measured at both test scales), so the gate
      // exercises a real skip WITH surviving live buckets. The oracle
      // mirrors the full policy in SQL — occupancy, threshold, skip, and
      // the all-hot fallback — over the same planted corpus. The planted
      // table is memoized per (session, dir) like invertedIndexFor: the
      // operator under test is the SERVE policy, not the index build.
      val (table, planted) = hotskipIndexFor(s, d)
      MinHashLSH.annFromInvertedIndex(s, table, planted, Cols.Id, Cols.Text,
          hotBoiler + " " + keyOf(s, d).take(60), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_query_hotskip_cms" -> ((s, d) => {
      // the hot-bucket policy under the SKETCH hot mode: the boiler
      // slice arrives as an append, the hot list comes from the
      // Count-Min merge (est ≥ true, one-sided), and serving skips the
      // estimated-hot query buckets. The oracle replays the ENGINE's
      // exact rule — base-save estimates over the base matrix, merge
      // estimates for the delta's buckets over the base+delta matrix
      // (CMS matrices are additive, so the split replays from the final
      // corpus alone), threshold, skip, all-hot fallback, scoring.
      val (table, planted) = hotskipCmsIndexFor(s, d)
      MinHashLSH.annFromInvertedIndex(s, table, planted, Cols.Id, Cols.Text,
          hotBoiler + " " + keyOf(s, d).take(60), 10, cfg16)
        .withColumnRenamed(Cols.Id, "doc_id")
    }),
    "ann_batch_md5" -> ((s, d) => { // md5 twin of the batch path — oracle-checked
      val m = fitted(s, d, cfg16)
      val qs = docs(s, d).where(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("text"))
      m.approxNearestNeighborsAll(qs, "qid", "text", 5)
        .select(col("qid"), col(Cols.Id).as("id"), col(Cols.Jaccard),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")
    }),

    // --- dedup family (training-pipeline extensions)
    "dedup_exact_keep" -> ((s, d) =>
      Dedup.dropExactDuplicates(docs(s, d), "doc_id", "text")
        .select("doc_id").orderBy("doc_id")),
    "dedup_exact_sql" -> ((s, d) => {
      // exact dedup through plain SQL text, in the SAME plan shape as
      // Dedup.dropExactDuplicates (hash-only decision: md5 per row,
      // min-id winner per hash, LEFT ANTI loser removal — no window, no
      // text in any decision exchange, no broadcast hint). Shares
      // dedup_exact_keep's oracle.
      docs(s, d).createOrReplaceTempView("documents_dedup_v")
      s.sql("""
        WITH h AS (SELECT doc_id, md5(text) AS th FROM documents_dedup_v),
        w AS (SELECT th, min(doc_id) AS keep FROM h GROUP BY th),
        losers AS (
          SELECT h.doc_id FROM h JOIN w ON h.th = w.th AND h.doc_id <> w.keep)
        SELECT d.doc_id FROM documents_dedup_v d
        LEFT ANTI JOIN losers l ON d.doc_id = l.doc_id
        ORDER BY d.doc_id""")
    }),
    "dedup_minhash_pairs" -> ((s, d) =>
      fitted(s, d, cfg16).approxSimilarityJoin(0.5)
        .orderBy("a_id", "b_id")),
    "dedup_bbit_pairs" -> ((s, d) =>
      // 1-bit minwise hashing (Li & König 2010): signatures collapse to
      // one packed long (8 bytes vs 16×32-char strings on the candidate
      // exchange), pairs from the same LSH bucket join, estimate
      // 2·matched/k − 1 thresholded at 0.5 (matched ≥ 12/16 — a random
      // pair survives with p≈0.04; at 0.25 the b=1 noise at k=16 passed
      // ~23% of all candidates, bloating the surviving-pair exchange)
      fitted(s, d, cfg16).bbitSimilarityJoin(0.5)
        .orderBy("a_id", "b_id")),
    "graph_pagerank" -> ((s, d) => {
      // link-graph PageRank (the Common Crawl host-rank quality signal):
      // deterministic 3-out-regular graph over the doc ids with node 0 a
      // GLOBAL HUB (in-degree N — the hot-key surface the map-side
      // partial sum must absorb); 3 exact-integer rounds, oracle replays
      // each round bit-for-bit in micro-units
      val dd = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"))
      val n = dd.count()
      val e = dd.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 3 + 1, lit(n)),
          pmod(col("doc_id") + 7, lit(n)), lit(0L))).as("dst"))
      Graphs.pageRank(e, "src", "dst", iterations = 3)
        .orderBy("node_id")
    }),
    "graph_node_jaccard" -> ((s, d) => {
      // link-prediction score over the planted hub graph: top-200 node
      // pairs by neighborhood Jaccard (exact integer counts, rounded-6
      // ratio, ties pinned). The in-degree-n hub (node 0) EXCEEDS the
      // super-node cap and is removed before the 2-path join — the
      // measured difference is 74 MB vs 1.3 MB of pair shuffle at sf0.1
      val dd = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"))
      val n = dd.count()
      val e = dd.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 3 + 1, lit(n)),
          pmod(col("doc_id") + 7, lit(n)), lit(0L))).as("dst"))
      Graphs.nodeJaccard(e, "src", "dst", topN = 200, maxHubDegree = 64)
    }),
    "graph_ppr" -> ((s, d) => {
      // personalized PageRank (TrustRank shape): teleport mass returns
      // only to the %50 seed docs over the planted hub graph; 2
      // exact-integer rounds, floor-division teleport split, oracle
      // replays bit-for-bit (node 0 is both a seed and the global hub —
      // the hot key rides the same map-side partial sum as pagerank)
      val dd = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"))
      val n = dd.count()
      val e = dd.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 3 + 1, lit(n)),
          pmod(col("doc_id") + 7, lit(n)), lit(0L))).as("dst"))
      Graphs.personalizedPageRank(e, "src", "dst",
          dd.where(col("doc_id") % 50 === 0), "doc_id", iterations = 2)
        .orderBy("node_id")
    }),
    "graph_lpa" -> ((s, d) => {
      // community detection by label propagation over the SAME planted
      // 3-out-regular graph as graph_pagerank (node 0 the global hub —
      // the hot key the per-node argmax AGGREGATE must absorb); 2
      // synchronous rounds, ties pinned to the smallest label, oracle
      // replays both rounds exactly
      val dd = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"))
      val n = dd.count()
      val e = dd.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 3 + 1, lit(n)),
          pmod(col("doc_id") + 7, lit(n)), lit(0L))).as("dst"))
      Graphs.labelPropagation(e, "src", "dst", iterations = 2)
        .orderBy("node_id")
    }),
    "graph_kcore" -> ((s, d) => {
      // k-core by 4 synchronous peeling rounds: the 3-out background graph
      // (degree ~5-7, peels round 1) + a 20-clique (the true 11-core) + a
      // FRAGILE circulant group whose round-1 degree ≥ 11 rests on
      // background support — it unravels in round 2, a genuine cascade
      // (40 → 30 → 20 survivors, converged by round 3 at every SF). The
      // converged flag asserts round 5 would remove nothing, so the gate
      // result IS the true 11-core — exactly the planted clique
      val dd = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"))
      val n = dd.count()
      val background = dd.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 3 + 1, lit(n)),
          pmod(col("doc_id") + 7, lit(n)), lit(0L))).as("dst"))
      val clique = dd.where(col("doc_id") < 19)
        .select(col("doc_id").as("src"),
          explode(sequence(col("doc_id") + 1, lit(19L))).as("dst"))
      val fragile = dd.where(col("doc_id") >= 200 && col("doc_id") < 220)
        .select((col("doc_id") - 200).as("i"))
        .select(explode(array(
          struct((col("i") + 200).as("src"),
            (pmod(col("i") + 1, lit(20L)) + 200).as("dst")),
          struct((col("i") + 200).as("src"),
            (pmod(col("i") + 2, lit(20L)) + 200).as("dst")),
          struct((col("i") + 200).as("src"),
            (pmod(col("i") + 3, lit(20L)) + 200).as("dst")),
          struct((col("i") + 200).as("src"),
            (pmod(col("i") + 4, lit(20L)) + 200).as("dst")),
          struct((col("i") + 200).as("src"),
            pmod(col("i") * 13 + 3, lit(n)).as("dst")),
          struct((col("i") + 200).as("src"),
            pmod(col("i") * 17 + 11, lit(n)).as("dst")))).as("e"))
        .select(col("e.src"), col("e.dst"))
      Graphs.kCore(background.unionByName(clique).unionByName(fragile),
          "src", "dst", k = 11, rounds = 4)
        .orderBy("node_id")
    }),
    "graph_hits" -> ((s, d) => {
      // HITS hubs/authorities over the same deterministic 3-out-regular
      // graph as graph_pagerank (node 0 the global authority hot key —
      // in-degree N); 2 exact-integer rounds with divisor normalization,
      // oracle replays every round bit-for-bit in micro-units
      val dd = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"))
      val n = dd.count()
      val e = dd.select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 3 + 1, lit(n)),
          pmod(col("doc_id") + 7, lit(n)), lit(0L))).as("dst"))
      Graphs.hits(e, "src", "dst", iterations = 2)
        .orderBy("node_id")
    }),
    "graph_link_extract" -> ((s, d) => {
      // anchor extraction over planted markup: per doc one external link
      // (host (2·rh+1)%10 — for rh=9 it resolves to the doc's OWN host,
      // exercising the internal flag on an absolute href), one relative
      // link, one absolute self-link with an explicit port and uppercase
      // scheme/HREF, plus fragment/mailto/javascript/empty/no-href
      // anchors that must all be dropped
      TextAnalysis.extractLinks(linkPages(s, d), "doc_id", "url", "html")
        .orderBy("doc_id", "dst_host", "internal")
    }),
    "graph_host_rank" -> ((s, d) => {
      // the Common Crawl host-rank shape end-to-end: planted pages →
      // extractLinks → weighted host graph (intra-host links dropped;
      // host h9's only candidate edge is a self-link, so it is DANGLING
      // and its mass leaks — the documented convention) → 2 exact-integer
      // PageRank rounds keyed on host STRINGS
      val links = TextAnalysis.extractLinks(linkPages(s, d),
        "doc_id", "url", "html")
      Graphs.pageRankKeyed(Graphs.hostEdges(links),
          "src_host", "dst_host", iterations = 2, weightCol = Some("n_links"))
        .orderBy("node_id")
    }),
    "pipeline_curate_v6" -> ((s, d) => {
      // round-10 session-2 composed pipeline stacking the session's new
      // operators: mojibake repair (cleanup — %3==0 docs double-encoded
      // in-flight, repair must restore them before anything downstream
      // sees the text) ∘ per-domain cap (≤30 per host, longest-text-wins)
      // ∘ interpolated-KN perplexity floor (keep docs scoring above the
      // capped-corpus mean in exact micro-nats; ONE bounded 1-row collect)
      val suffix = " café déjà’vu — æøå"
      val clean = docs(s, d).select(col("doc_id"),
        concat(col("text"), lit(suffix)).as("text"))
      val corrupted = clean.withColumn("text",
        when(col("doc_id") % 3 === 0,
          decode(encode(col("text"), "UTF-8"), "ISO-8859-1"))
          .otherwise(col("text")))
      val repaired = TextAnalysis.repairMojibake(corrupted, "text")
        .select(col("doc_id"), col("text_fixed").as("text"))
      val withUrl = plantedUrls(s, d).join(repaired, Seq("doc_id"))
        .withColumn("score", length(col("text")).cast("double"))
      val capped = TextAnalysis.capPerDomain(
        withUrl, "doc_id", "raw_url", "score", maxDocs = 30)
      val scored = TextAnalysis.withKneserNeyLogProb(capped, "doc_id", "text",
          col("doc_id") % 2 === 0, discount = 0.75)
        .where(col("n_bigrams") > 0)
        .withColumn("ls_micro", round(col("avg_logscore") * 1e6).cast("long"))
        .transform(SparkUtil.scopedPersist)
      val cutRow = scored.agg(avg(col("ls_micro"))).collect()(0)
      require(!cutRow.isNullAt(0),
        "pipeline_curate_v6: no scored docs survived the cap")
      scored.where(col("ls_micro").cast("double") > cutRow.getDouble(0))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logscore"), 6).as("avg_ls6"))
        .orderBy("doc_id")
    }),
    "layout_zorder" -> ((s, d) =>
      // 13-bit Morton z-value over (user, event) keys — the OPTIMIZE
      // ZORDER BY clustering key; pure builtin shift/mask projection,
      // oracle replays the identical bit arithmetic
      events(s, d).select(col("event_id"),
          Layout.zValue(expr("user_id % 8192"), expr("event_id % 8192"), 13)
            .as("zval"))
        .orderBy("event_id")),
    "layout_hilbert" -> ((s, d) =>
      // Hilbert clustering key over the SAME (user, event) grid as
      // layout_zorder — consecutive indices are always grid-adjacent, the
      // locality Z-order gives up at quadrant boundaries (HilbertSpec
      // pins the step-1 property); 13 unrolled bit levels as a chained
      // narrow projection, oracle replays every level
      Layout.withHilbertIndex(
          events(s, d).select(col("event_id"),
            expr("user_id % 8192").as("hx"), expr("event_id % 8192").as("hy")),
          col("hx"), col("hy"), 13, "hval")
        .select(col("event_id"), col("hval"))
        .orderBy("event_id")),
    "layout_compaction" -> ((s, d) => {
      // OPTIMIZE bin-packing over a synthesized file manifest (one row
      // per file — metadata, not data): every 5th order plays a file,
      // partitioned by priority, with a deterministic pseudo-size; 16 MB
      // target. Sequential-fill bins replay exactly in SQL (running-sum
      // start offset div target)
      val m = tbl(s, d, "orders").where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderpriority").as("part"),
          col("o_orderkey").as("file_id"),
          ((col("o_orderkey") % 997) * 16384 + 65536).as("size_bytes"))
      Layout.compactionPlan(m, "part", "file_id", "size_bytes",
          targetBytes = 16L * 1024 * 1024)
        .orderBy("part", "file_id")
    }),
    "layout_zorder_buckets" -> ((s, d) => {
      // the file-skipping evidence table: per-bucket (x,y) bounding boxes
      // under the z-order NEXT TO the same stats under a linear
      // single-key order — on a 5-bit grid the linear layout leaves x at
      // FULL span 31 in every bucket (zero pruning on x) while z holds
      // both spans near 8-13; bucket = floor(idx·16/n) over the
      // distributed sort+zipWithIndex rank (no global window)
      val e = SparkUtil.ensureParallelism(events(s, d))
        .select(expr("user_id % 32").as("x"),
          expr("event_id % 32").as("y"), col("event_id").as("t"))
      val zs = Layout.zOrderBucketStats(e, "x", "y", 5, 16, "t")
        .withColumn("layout", lit("z"))
      val ls = Layout.clusteredBucketStats(e, "x", "y", col("y"), 16, "t")
        .withColumn("layout", lit("linear"))
      zs.unionByName(ls)
        .select("layout", "bucket", "n_rows", "x_min", "x_max",
          "y_min", "y_max")
        .orderBy("layout", "bucket")
    }),
    "graph_triangles" -> ((s, d) =>
      // duplicate-family triangles over the near-dup pair graph (cyclic
      // 3-way self-join; Dedup.trianglePairs scaladoc)
      Dedup.trianglePairs(fitted(s, d, cfg16).approxSimilarityJoin(0.3))
        .orderBy("i", "j", "k")),
    "graph_clustering" -> ((s, d) =>
      // per-node local clustering over the same near-dup pair graph: a
      // coefficient of 1 marks a clique (true duplicate family), low
      // values mark accidental-pair hubs
      Graphs.localClustering(fitted(s, d, cfg16).approxSimilarityJoin(0.3))
        .orderBy("id")),
    "dedup_weighted_pairs" -> ((s, d) =>
      // end-to-end tf-WEIGHTED near-dup pairs (Dedup.weightedMinhashPairs)
      Dedup.weightedMinhashPairs(docs(s, d), "doc_id", "text", cfg16, 0.4)
        .orderBy("a_id", "b_id")),
    "dedup_minhash_pairs_fast" -> ((s, d) => {
      // xxhash64-mode near-dup pairs, oracle-paired on the EXACT-DUP CORE
      // (round 18 — made draw-robust): the r13 form compared the whole
      // admitted set to the md5 replay under a "corpus is bimodal"
      // premise, which one sf0.1 draw broke with pairs estimating exactly
      // at the 0.5 threshold (16-hash estimates straddle across hash
      // families there — a property of the draw, not of the mode). The
      // deterministic-by-construction subset is the EXACT-duplicate core:
      // identical shingle sets give identical signatures in ANY hash
      // family, so banding admits them with estimate 1.0 NON-probabilistically
      // — the gate emits the fast-admitted pairs whose shingle sets are
      // exactly equal, and the oracle brute-forces that pair set from the
      // text (no LSH luck anywhere). The statistical cross-family claim
      // on the fringe lives in dedup_mode_agreement.
      // the corpus gets PLANTED exact copies (the %10 slice re-ingested
      // under shifted ids, text byte-identical) so the core is non-empty
      // and exercised at every scale and every draw — a natural corpus
      // may hold near-dups only
      val dd = docs(s, d).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      val planted = dd.unionByName(dd.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val shingles = planted.select(col("doc_id"),
        array_sort(graft.functions.TextFunctions.kShingles(
          graft.functions.TextFunctions.tokenize(col("text")), 2)).as("sh"))
      val m = new MinHashLSH(cfg16.copy(mode = XxFast))
        .fit(planted, "doc_id", "text")
      val out = m.approxSimilarityJoin(0.5)
        .select(col("a_id"), col("b_id"))
        .join(shingles.select(col("doc_id").as("a_id"), col("sh").as("sa")), Seq("a_id"))
        .join(shingles.select(col("doc_id").as("b_id"), col("sh").as("sb")), Seq("b_id"))
        .where(col("sa") === col("sb"))
        .select(col("a_id"), col("b_id"))
        .orderBy("a_id", "b_id")
        .localCheckpoint()
      m.unpersist()
      out
    }),
    "dedup_mode_agreement" -> ((s, d) => {
      // the fast (xxhash64) near-dup pair set vs the oracle-checked md5
      // pair set at the same config and threshold: both families estimate
      // the same jaccard, so the admitted sets must AGREE — as an overlap
      // floor (|A∩B| / |A∪B| ≥ 0.95), not exact equality (round 18):
      // pairs whose true similarity sits at the admit threshold straddle
      // it across families (16-hash estimates, sd ≈ 0.125 — one sf0.1
      // draw planted 9 such boundary pairs, all estimating exactly 0.5),
      // and a banded join can miss a sub-exact pair with small
      // probability per family. Both effects are bounded noise on the
      // shared structure; a REAL mode divergence (broken seeding, wrong
      // banding) collapses the overlap toward zero. Measured: overlap
      // 1.0 at sf0.001/sf0.01, 0.966 on the adversarial sf0.1 draw.
      val md5P = SparkUtil.scopedPersist(fitted(s, d, cfg16)
        .approxSimilarityJoin(0.5).select(col("a_id"), col("b_id")))
      val fastP = SparkUtil.scopedPersist(fitted(s, d, cfg16.copy(mode = XxFast))
        .approxSimilarityJoin(0.5).select(col("a_id"), col("b_id")))
      val (nM, nF) = (md5P.count(), fastP.count())
      val nBoth = md5P.join(fastP, Seq("a_id", "b_id")).count()
      import s.implicits._
      Seq((nM > 0 && nF > 0,
          nBoth.toDouble / (nM + nF - nBoth) >= 0.95))
        .toDF("nonempty", "pair_sets_agree")
    }),
    "dedup_simhash_pairs" -> ((s, d) =>
      // md5-mode SimHash near-dup pairs — fully oracle-checkable since
      // round 13 (DuckDB rebuilds the fingerprint nibble-for-nibble and
      // brute-forces the Hamming pair set); the xx64 production variant
      // keeps its planted-duplicate OperatorSpec coverage
      Dedup.simhashPairsMd5(docs(s, d), "doc_id", "text", maxDist = 3)
        .orderBy("a_id", "b_id")),
    "dedup_image_phash" -> ((s, d) => {
      // perceptual IMAGE near-dup: real planted PNGs (9×8 gradient grids
      // whose dHash is the closed-form Multimodal.plantDhashBits(id) — 25
      // hash families ≥5 bits apart, member axis 0-3 bits) → real pixel
      // decode → dHash64 → Hamming-banded pair join at maxDist=2. The
      // oracle replays the bit formula and brute-forces the pair set in
      // SQL; the gate rolls pairs up per family so output stays 25 rows
      // at every scale while still pinning pair counts, exact-dup counts,
      // and the Hamming mass
      // scoped-persisted: the (id, 64-bit hash) frame feeds the pair
      // join's BOTH sides plus the per-family doc counts — left lazy,
      // each reference would re-run the PNG encode + pixel decode of the
      // whole corpus (measured 3x the gate cost at sf0.1)
      val hashes = SparkUtil.scopedPersist(Multimodal.imageDHashes(
        Multimodal.plantImagePayloads(docs(s, d), "doc_id", "dhash_png")))
      val pairs = Dedup.imagePhashPairs(hashes, "doc_id", "dhash", maxDist = 2)
      val perFam = pairs.withColumn("family", col("a_id") % 25)
        .groupBy("family")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("hamming") === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(col("hamming").cast("long")).as("sum_hamming"))
      hashes.groupBy((col("doc_id") % 25).as("family"))
        .agg(count(lit(1)).as("n_docs"))
        .join(perFam, Seq("family"), "left")
        .select(col("family"), col("n_docs"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("sum_hamming"), lit(0L)).as("sum_hamming"))
        .orderBy("family")
    }),
    "dedup_video_phash" -> ((s, d) => {
      // perceptual VIDEO near-dup: planted AVIs whose keyframes are
      // 90×80 block-gradient JPEGs carrying the closed-form
      // plantVideoDhashBits(id, scene) — 100 families, per-scene axis,
      // 0-2 bit member axis — on the plantSceneCut scene structure. The
      // REAL pipeline (frame decode → keyframe walk → dHash → Hamming
      // banding → matched-keyframe fraction) must reproduce the formula
      // end to end; the oracle replays it and brute-forces the pair set.
      // Family count is OCCUPANCY-DERIVED (nDocs/50, floor 100 — the
      // ivfListsFor convention): matched-frame candidate volume is
      // quadratic in family size, so fixed families under a growing corpus
      // exploded the sf1 shuffle 7.5×/unit (round-13 validation catch);
      // historic 100 at both oracle scales, so oracles are unchanged.
      val nFam = math.max(100L, docs(s, d).count() / 50)
      // the planted AVIs are a deterministic function of (corpus, nFam) —
      // stage them once per session (the stream-gate staging convention:
      // fixture synthesis is machinery, not the operator under test; the
      // REAL decode pipeline still runs on every execution)
      val staged = stageOnce(s, d, "graft-video-neardup") { t =>
        Multimodal.plantNearDupVideoPayloads(docs(s, d), "doc_id", nFam)
          .write.mode("overwrite").parquet(t)
      }
      val kh = SparkUtil.scopedPersist(Multimodal.videoKeyframeDHashes(
        s.read.parquet(staged), threshold = 10.0))
      val pairs = Dedup.videoPhashPairs(kh, "doc_id", "frame_idx", "dhash",
        maxDist = 2, bands = 4, minFracMicro = 500000L)
      val perFam = pairs.withColumn("family", col("a_id") % nFam)
        .groupBy("family")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("n_matched_a") + col("n_matched_b")).as("n_matched"),
          sum(col("frac_micro")).as("sum_frac_micro"))
      kh.groupBy((col("doc_id") % nFam).as("family"))
        .agg(countDistinct(col("doc_id")).as("n_videos"),
          count(lit(1)).as("n_keyframes"))
        .join(perFam, Seq("family"), "left")
        .select(col("family"), col("n_videos"), col("n_keyframes"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_matched"), lit(0L)).as("n_matched"),
          coalesce(col("sum_frac_micro"), lit(0L)).as("sum_frac_micro"))
        .orderBy("family")
    }),
    "dedup_audio_fingerprint" -> ((s, d) => {
      // AUDIO near-dup via Shazam-style constellation hashing: planted
      // 16-bit PCM tone WAVs (bin-aligned sines, 40 families, member axis
      // shifts segment 0's tone) → REAL per-frame FFT peak picking →
      // consecutive-triple hashes → exact set Jaccard per pair. The
      // oracle replays the tone formulas; the gate proves the real DSP
      // pipeline reproduces them end to end. Rolled per family (40 rows)
      val pk = SparkUtil.scopedPersist(Multimodal.audioPeakSequence(
        Multimodal.plantTonePayloads(docs(s, d), "doc_id")))
      val pairs = Dedup.audioFingerprintPairs(pk, "doc_id", "frame_idx",
        "peak_bin", minJacMicro = 250000L)
      val perFam = pairs.withColumn("family", col("a_id") % 40)
        .groupBy("family")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("n_inter")).as("n_inter_sum"),
          sum(col("jac_micro")).as("sum_jac_micro"))
      pk.groupBy((col("doc_id") % 40).as("family"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_frames"),
          sum(col("peak_bin").cast("long")).as("sum_bins"))
        .join(perFam, Seq("family"), "left")
        .select(col("family"), col("n_docs"), col("n_frames"), col("sum_bins"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_inter_sum"), lit(0L)).as("n_inter_sum"),
          coalesce(col("sum_jac_micro"), lit(0L)).as("sum_jac_micro"))
        .orderBy("family")
    }),
    "audio_match_offset" -> ((s, d) => {
      // the Wang 2003 MATCHER: every %10 doc queries the corpus
      // fingerprint table with a CLIP (its tone sequence minus segment 0)
      // — offset voting must recover the source family at dt = 4 frames,
      // ties across same-suffix members pinned to the smallest corpus id.
      // Both sides run the REAL WAV→FFT→peak pipeline; the oracle replays
      // the tone formulas through the same votes
      val corpus = SparkUtil.scopedPersist(Multimodal.audioPeakSequence(
        Multimodal.plantTonePayloads(docs(s, d), "doc_id")))
      val queries = Multimodal.audioPeakSequence(
        Multimodal.plantToneClipPayloads(
          docs(s, d).where(col("doc_id") % 10 === 0), "doc_id"))
      Dedup.audioMatchOffsets(queries, corpus, minVotes = 2)
        .orderBy("q_id")
    }),
    "dedup_cdc_chunks" -> ((s, d) => {
      // content-defined chunk dedup over a corpus with a planted shared
      // passage appended to every %3 doc AT DIFFERENT byte offsets — the
      // CDC property under test: boundaries are content-defined, so the
      // shared tail chunks identically everywhere and dedups against its
      // first occurrence, where fixed-size blocks would misalign
      val blurb = " the archive replicates shared passages verbatim across" +
        " documents and a content defined chunker must find every one of" +
        " them regardless of byte offset in the carrying document"
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(blurb)))
          .otherwise(col("text")).as("text"))
      Dedup.cdcChunkStats(planted, "doc_id", "text", k = 16, divisor = 64)
        .orderBy("doc_id")
    }),
    "dedup_ngram_pairs" -> ((s, d) =>
      Dedup.ngramJaccardPairs(fitted(s, d, cfg16), docs(s, d), "doc_id", "text",
        k = 3, threshold = 0.3).orderBy("a_id", "b_id")),
    // EXACT all-pairs Jaccard via prefix filtering (complete by theorem, no
    // recall floor) — oracle is the honest brute-force cross join; the Spark
    // plan shuffles only (shingle, id, size) prefixes, never all pairs
    "dedup_jaccard_exact" -> ((s, d) =>
      Dedup.jaccardPairsExact(docs(s, d), "doc_id", "text",
        k = 3, threshold = 0.3).orderBy("a_id", "b_id")),
    "dedup_substring_pairs" -> ((s, d) => {
      // exact CHARACTER-level duplication (winnowing blocking, the MOSS /
      // substring-dedup scheme; guarantee floor w+k-1 = 40 normalized
      // chars): plant a 111-char slogan in docs 0-5 — all 15 planted pairs
      // must surface with ≥ 2 shared fingerprints — alongside the corpus's
      // natural ≥ 40-char exact repeats
      val slogan = " colorless green ideas sleep furiously beside the quick" +
        " brown fox while the archive replicates itself verbatim"
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        when(col("doc_id") < 6, concat(col("text"), lit(slogan)))
          .otherwise(col("text")).as("text"))
      Dedup.sharedSubstringPairs(planted, "doc_id", "text",
        k = 16, w = 25, minShared = 2)
        .orderBy("a_id", "b_id")
    }),
    "dedup_novel_filter" -> ((s, d) => {
      // ingestion-time curation: keep docs >= 400 that near-dup nothing in
      // the index fitted on docs < 400
      val dd = docs(s, d)
      val m = new MinHashLSH(cfg16).fit(dd.where(col("doc_id") < 400), "doc_id", "text")
      m.filterNovel(dd.where(col("doc_id") >= 400), "doc_id", "text", 0.5)
        .select("doc_id").orderBy("doc_id")
    }),
    "dedup_cluster_keep" -> ((s, d) => {
      // cluster-level dedup: connected components of the near-dup pairs,
      // keep each cluster's min id + all unclustered docs
      val pairs = fitted(s, d, cfg16).approxSimilarityJoin(0.5)
      Dedup.dropNearDuplicateClusters(docs(s, d), "doc_id", pairs)
        .select("doc_id").orderBy("doc_id")
    }),
    "dedup_cluster_best" -> ((s, d) => {
      // cluster dedup keeping the LONGEST member per near-dup cluster
      // (score = n_chars, ties by min id) — the curation-grade variant
      val pairs = fitted(s, d, cfg16).approxSimilarityJoin(0.5)
      Dedup.keepBestPerCluster(docs(s, d), "doc_id", pairs, "n_chars")
        .select("doc_id").orderBy("doc_id")
    }),
    "dedup_cluster_sizes" -> ((s, d) => {
      // corpus-QA report: near-dup cluster size histogram (how much of the
      // corpus is mirrored, and in how big clumps) — unclustered docs are
      // size-1 singletons
      val pairs = fitted(s, d, cfg16).approxSimilarityJoin(0.5)
      Dedup.clusterSizeHistogram(docs(s, d), "doc_id", pairs)
        .orderBy("cluster_size")
    }),
    "dedup_snapshot_diff" -> ((s, d) => {
      // crawl-to-crawl delta: old = ids < 400, new = ids >= 100 with every
      // 7th doc's text mutated -> added/removed/changed/unchanged per id
      val dd = docs(s, d)
      val oldC = dd.where(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val newC = dd.where(col("doc_id") >= 100)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      Dedup.snapshotDiff(oldC, newC, "doc_id", "text").orderBy("id")
    }),
    "cdc_apply_changes" -> ((s, d) => {
      // lakehouse MERGE: a deterministic change feed planted over orders —
      // updates on every 10th key (two stacked versions on every 20th, so
      // latest-wins is exercised), deletes on keys ≡3 mod 7 (key 10 hits
      // both update AND delete: the higher seq, the delete, must win), and
      // inserts at key+10^9. The DEFAULT merge is the Bloom-pruned form
      // since round 13 (the round-12 sf1 bench measured the plain
      // anti-join flipping broadcast → SMJ and shuffling the whole base) —
      // base rows the changed-key filter proves untouched never enter an
      // exchange, so the shuffled slice stays feed-proportional in every
      // regime.
      val (o, changes) = cdcPlantedFeed(s, d)
      Cdc.applyChanges(o, changes, "o_orderkey", "seq", "op")
        .orderBy("o_orderkey")
    }),
    "cdc_apply_pruned" -> ((s, d) => {
      // the explicitly-parameterized Bloom-pruned MERGE — row-identical to
      // cdc_apply_changes (same planted feed, SAME oracle; since round 13
      // the default path above delegates here with default sizing)
      val (o, changes) = cdcPlantedFeed(s, d)
      Cdc.applyChangesPruned(o, changes, "o_orderkey", "seq", "op")
        .orderBy("o_orderkey")
    }),
    "cdc_maintain_agg" -> ((s, d) => {
      // incremental materialized-view maintenance: the stored per-group
      // (count, cents-sum) view absorbs the planted feed's delta
      // (feed-proportional work, one old-value semi-join) and must equal
      // the full recompute over the applied snapshot BIT-FOR-BIT — the
      // oracle IS that recompute
      val (o0, changes0) = cdcPlantedFeed(s, d)
      def enrich(df: DataFrame): DataFrame = df
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("grp", col("o_custkey") % 100)
      val base = enrich(o0)
      val changes = enrich(changes0)
      val view = base.groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_val"))
      Cdc.maintainGroupCounts(view, base, changes, "o_orderkey", "seq", "op",
          "grp", "cents")
        .select(col("grp"), col("n_rows"), col("sum_val").as("sum_cents"))
        .orderBy("grp")
    }),
    "cdc_pit_join" -> ((s, d) => {
      // point-in-time enrichment — the lakehouse query SCD2 history
      // exists FOR: each purchase event joined to the state version valid
      // at its instant. Contiguous [valid_from, valid_to) intervals make
      // this exactly asofJoinPrior on valid_from (an at-instant
      // transition applies to the fact — the half-open convention), so
      // the compose is one windowed union shuffle, no range join
      val ev = events(s, d)
      val hist = Cdc.scd2History(
          ev.select("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", Seq("event_type"))
        .select(col("user_id"), col("valid_from").as("ts"),
          col("event_id"), col("event_type"))
      val facts = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoinPrior(facts, hist, Seq("user_id"), "ts",
          payloadCols = Seq("event_type", "ts"), tieBreak = "event_id",
          outPrefix = "v_")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("v_event_type"),
          date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss").as("v_from"))
        .orderBy("event_id")
    }),
    "cdc_scd2" -> ((s, d) => {
      // type-2 history of each user's event_type over the event log:
      // consecutive equal types collapse, every transition opens a
      // validity interval closed by the next transition; event_id pins
      // same-timestamp order
      Cdc.scd2History(
          events(s, d).select("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", Seq("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    }),
    "split_stratified" -> ((s, d) =>
      // exact per-class quotas: within each label, md5(seed:id)-ranked
      // rows fill ceil(0.1·n) "val" slots — rare classes stay represented
      // where a plain hash split only hits the fraction in expectation
      Dedup.stratifiedSplit(tbl(s, d, "embeddings").select("vec_id", "label"),
          "vec_id", "label", valFraction = 0.1)
        .select(col("vec_id"), col("label"), col("split"))
        .orderBy("vec_id")),
    "split_leakage_safe" -> ((s, d) => {
      // leakage-safe train/val split: near-dup clusters move atomically,
      // so no val doc has a near-duplicate in train
      val pairs = fitted(s, d, cfg16).approxSimilarityJoin(0.5)
      Dedup.leakageSafeSplit(docs(s, d), "doc_id", pairs, valFraction = 0.1)
        .select(col("doc_id"), col("split")).orderBy("doc_id")
    }),
    "dedup_decontaminate" -> ((s, d) => {
      // benchmark decontamination: every 20th doc plays the eval set; flag
      // the rest of the corpus by distinct shared 2-shingles
      val dd = docs(s, d)
      Dedup.contaminationFlags(dd.where(col("doc_id") % 20 =!= 0), "doc_id", "text",
          bench = dd.where(col("doc_id") % 20 === 0), benchTextCol = "text")
        .select("doc_id", "n_overlap", "contaminated").orderBy("doc_id")
    }),
    "dedup_ngram_coverage" -> ((s, d) => {
      // Lee-et-al-style duplicated 10-gram coverage: a shared 11-token
      // boilerplate sentence planted on the mod-3 family (cross-doc dups)
      // and the mod-9==4 docs repeating their own body (within-doc and
      // cross-copy dups); the oracle recomputes occurrence counts and the
      // span union with an explode-distinct of covered token positions —
      // equivalent to the operator's interval-union window
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 1,
            lit(" the quick brown fox jumps over the lazy dog again today"))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 4, concat(lit(" "), col("text")))
            .otherwise(lit(""))).as("text"))
      Dedup.duplicatedNgramStats(planted, "doc_id", "text", n = 10)
        .select(col("doc_id"), col("n_tokens"), col("n_ngrams"),
          col("n_dup_ngrams"), col("dup_tokens"), col("dup_frac").as("dup6"))
        .orderBy("doc_id")
    }),
    "dedup_bench_leak" -> ((s, d) => {
      // the eval-owner view of decontamination: per benchmark item (the
      // %20==0 slice, as in dedup_decontaminate), how many of its
      // shingles are compromised and by how many corpus docs
      val all = docs(s, d)
      Dedup.benchLeakReport(
          all.where(col("doc_id") % 20 =!= 0), "doc_id", "text",
          all.where(col("doc_id") % 20 === 0), "doc_id", "text", k = 2)
        .orderBy("doc_id")
    }),
    "dedup_span_removal" -> ((s, d) => {
      // the APPLIED form of dedup_ngram_coverage (Lee et al. ExactSubstr):
      // same planted dup structure, but the duplicated spans are CUT and
      // the surviving token stream returned; the oracle re-derives the
      // covered-position set and rebuilds clean_text with an ordered
      // string_agg over the kept positions
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 1,
            lit(" the quick brown fox jumps over the lazy dog again today"))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 4, concat(lit(" "), col("text")))
            .otherwise(lit(""))).as("text"))
      Dedup.removeDuplicatedSpans(planted, "doc_id", "text", n = 10)
        .orderBy("doc_id")
    }),
    "dedup_span_keepfirst" -> ((s, d) => {
      // the KEEP-FIRST ExactSubstr semantics: the corpus-first occurrence
      // of each duplicated 10-gram survives (the planted boilerplate keeps
      // exactly one copy corpus-wide), every later occurrence is cut
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 1,
            lit(" the quick brown fox jumps over the lazy dog again today"))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 4, concat(lit(" "), col("text")))
            .otherwise(lit(""))).as("text"))
      Dedup.removeDuplicatedSpansKeepFirst(planted, "doc_id", "text", n = 10)
        .orderBy("doc_id")
    }),
    "dedup_bloom_decontam" -> ((s, d) => {
      // Bloom-sketch decontamination (the zero-join 100 TB path of
      // dedup_decontaminate): bench = every 20th doc with a 5-token canary
      // phrase appended, its distinct 5-shingles ORed into one bounded
      // BloomFilterAggregate bitset; the corpus pass is a narrow exists()
      // projection with the probe inside the lambda — no explode, no join,
      // no shuffle. k=5 makes exact contamination SELECTIVE: only the
      // mod-7 planted corpus docs carry a bench canary, so the no-FN
      // invariant is exercised by real positives AND the negatives leave
      // room to observe false positives (dedup_bloom_fp). The oracle
      // replays the exact 5-shingle join; no_false_neg is constant-true
      // because a Bloom filter never drops an inserted element.
      val (corpus, bench) = bloomGateTables(s, d)
      val bloom = Dedup.benchShingleBloom(bench, "text", k = 5)
      Dedup.bloomContaminationFlags(corpus, "doc_id", "text", bloom, k = 5)
        .join(Dedup.contaminationFlags(corpus, "doc_id", "text",
          bench = bench, benchTextCol = "text", k = 5)
          .select("doc_id", "contaminated"), Seq("doc_id"))
        .select(col("doc_id"), col("contaminated"),
          (col("bloom_hit") || !col("contaminated")).as("no_false_neg"))
        .orderBy("doc_id")
    }),
    "dedup_bloom_fp" -> ((s, d) => {
      // corpus-level FP discipline for the bloom path: at fpp=1e-6 the
      // expected per-doc any-shingle FP odds are ~n_shingles×1e-6, so the
      // bloom-only count over the genuine negatives must stay within a
      // generous 1% + slack envelope (empirically 0 at both gate scales);
      // n and n_exact are exact and oracle-replayed, fp_ok is the
      // tolerance boolean
      val (corpus, bench) = bloomGateTables(s, d)
      val bloom = Dedup.benchShingleBloom(bench, "text", k = 5)
      Dedup.bloomContaminationFlags(corpus, "doc_id", "text", bloom, k = 5)
        .join(Dedup.contaminationFlags(corpus, "doc_id", "text",
          bench = bench, benchTextCol = "text", k = 5)
          .select("doc_id", "contaminated"), Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("contaminated").cast("long")).as("n_exact"),
          sum((col("bloom_hit") && !col("contaminated")).cast("long")).as("__n_fp"))
        .select(col("n_docs"), col("n_exact"),
          (col("__n_fp") <= greatest(lit(5L), (col("n_docs") / 100L))).as("fp_ok"))
    }),
    "dedup_containment_pairs" -> ((s, d) =>
      // near-subset detection (containment ≥ 0.6 on 3-shingle sets)
      Dedup.containmentPairs(fitted(s, d, cfg16), docs(s, d), "doc_id", "text",
        k = 3, threshold = 0.6)
        .select(col("a_id"), col("b_id"), round(col("containment"), 6).as("cont6"))
        .orderBy("a_id", "b_id")),
    "dedup_containment_deep" -> ((s, d) => {
      // containment-NATIVE blocking (exact prefix filtering — no LSH
      // recall floor): the corpus plus PLANTED small-inside-large docs
      // (150-char prefixes of every 10th doc, ids +100000) whose symmetric
      // Jaccard vs their source is far below any LSH floor; the oracle is
      // a brute all-pairs containment over the same union
      val dd = docs(s, d)
      val planted = dd.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          substring(col("text"), 1, 150).as("text"))
      Dedup.containmentPairsDeep(
          dd.select(col("doc_id"), col("text")).unionByName(planted),
          "doc_id", "text", k = 3, threshold = 0.8)
        .select(col("a_id"), col("b_id"), round(col("containment"), 6).as("cont6"))
        .orderBy("a_id", "b_id")
    }),
    "dedup_embedding_pairs" -> ((s, d) =>
      Dedup.embeddingPairsBrute(tbl(s, d, "embeddings"), "vec_id", "embedding", 0.35)
        .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cos6"))
        .orderBy("a_id", "b_id")),
    "dedup_embedding_ivf" -> ((s, d) =>
      // trained-IVF cell-blocked near-dup pairs — the data-adaptive scale
      // path (Lloyd cells follow the corpus where fixed sign-planes skew).
      // Rows-only: the candidate set depends on engine-internal centroids
      // DuckDB cannot replay; the oracle-paired dedup_embedding_ivf_recall
      // twin floor-gates it against the exact brute pair set (the
      // sim_topk_ivf / sim_recall_ivf convention). nLists derives from the
      // corpus (occupancy-constant — 8 at every gate scale, more beyond)
      Dedup.embeddingPairsIvf(tbl(s, d, "embeddings"), "vec_id", "embedding",
          0.35, nLists = ivfListsFor(tbl(s, d, "embeddings").count()),
          probes = 3)
        .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cos6"))
        .orderBy("a_id", "b_id")),
    "dedup_embedding_ivf_recall" -> ((s, d) =>
      // floor 0.8 under measured 0.965 (sf0.001) / 0.974 (sf0.01) at
      // nLists=8, probes=3; n_brute_pairs is the exact oracle-replayable half
      Dedup.embeddingPairsIvfRecall(tbl(s, d, "embeddings"), "vec_id",
        "embedding", 0.35, nLists = 8, probes = 3, recallFloor = 0.8)),
    "dedup_embedding_bucketed" -> ((s, d) =>
      // sign-bucket blocked variant — the linear-ish scale path of the
      // brute pairs above (same scoring, bucket equi-join instead of ×).
      // nBits occupancy-derived (4 at every gate scale — the value the
      // oracle replays — more beyond)
      Dedup.embeddingPairsBucketed(tbl(s, d, "embeddings"), "vec_id", "embedding", 0.35,
        nBits = signBitsFor(tbl(s, d, "embeddings").count()))
        .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cos6"))
        .orderBy("a_id", "b_id")),
    "dedup_embedding_clusters" -> ((s, d) => {
      // SemDeDup-style semantic cluster dedup: embedding cosine near-dup
      // pairs → connected components → keep each cluster's min id plus all
      // singletons. The gate scores pairs with the brute generator (the
      // oracle's own formula); the sign-bucketed generator is the declared
      // 100 TB path (dedup_embedding_bucketed) and the component machinery
      // is shared with dedup_cluster_keep.
      val e = tbl(s, d, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val pairs = Dedup.embeddingPairsBrute(e, "vec_id", "embedding", 0.35)
      Dedup.dropNearDuplicateClusters(e, "vec_id", pairs)
        .select("vec_id").orderBy("vec_id")
    }),
    "dedup_semantic_cells" -> ((s, d) =>
      // SemDeDup cluster-granularity dedup, CLOSED-FORM path: iters=0
      // keeps the seed centroids (8 lowest-id vectors, normalized) so the
      // oracle replays cell assignment, ε-components, and the
      // keep-farthest-from-centroid decision exactly — argmax and keep
      // rank both pinned on micro-rounded scores with index/id ties
      Dedup.semanticDedupCells(tbl(s, d, "embeddings"), "vec_id", "embedding",
          minCosine = 0.35, nLists = 8, iters = 0)
        .select(col("id").as("vec_id"), col("cell"), col("c2c_micro"))
        .orderBy("vec_id")),
    "dedup_semantic_cells_trained" -> ((s, d) =>
      // the production path: 2 Lloyd rounds — centroids follow the corpus,
      // cells balance — with 3-probe candidate generation (single-probe
      // leaks ~40% of the 0.35-0.5 cosine pairs across cell boundaries).
      // Rows-only (Lloyd centroids are engine-internal); the oracle-paired
      // dedup_semantic_cells_leak twin bounds the cell-split duplicate
      // leakage against the exact brute pair graph. nLists occupancy-
      // derived (8 at every gate scale, more beyond)
      Dedup.semanticDedupCells(tbl(s, d, "embeddings"), "vec_id", "embedding",
          minCosine = 0.35,
          nLists = ivfListsFor(tbl(s, d, "embeddings").count()),
          iters = 2, probes = 3)
        .select(col("id").as("vec_id"), col("cell"), col("c2c_micro"))
        .orderBy("vec_id")),
    "dedup_semantic_cells_leak" -> ((s, d) =>
      // leak ceiling 0.1 sits well over measured 0.012 (sf0.001) / 0.007
      // (sf0.01) at nLists=8, iters=2, probes=3; n_vecs/n_brute_pairs are
      // the exact oracle-replayable half
      Dedup.semanticDedupLeakEval(tbl(s, d, "embeddings"), "vec_id",
        "embedding", minCosine = 0.35, nLists = 8, iters = 2, probes = 3,
        leakCeil = 0.1)),
    "dedup_exact_groups" -> ((s, d) => {
      // duplicate-group diagnostic over a corpus with planted exact copies
      // (the base corpus is dup-free at gate scale)
      val dd = docs(s, d).select(col("doc_id"), col("text"))
      Dedup.exactDuplicateGroups(dd.union(dd.where(col("doc_id") < 50)), "doc_id", "text")
        .orderBy("text_hash")
    }),

    // --- similarity search over embeddings
    "sim_topk_cosine" -> ((s, d) =>
      SimSearch.cosineTopK(tbl(s, d, "embeddings"), "vec_id", "embedding", 0L, 10)
        .select(col("id").as("vec_id"), round(col("cosine"), 6).as("cos6"))
        .orderBy(col("cos6").desc, col("vec_id").asc)),
    "sim_label_stats" -> ((s, d) =>
      // classifier-dataset QA: per-label centroid norm, intra-class
      // cohesion (mean/worst member-to-centroid cosine in exact micro
      // units) and the nearest confusable class by centroid cosine
      SimSearch.labelCentroidStats(tbl(s, d, "embeddings"),
          "vec_id", "embedding", "label")
        .orderBy("label")),
    "sim_label_outliers" -> ((s, d) =>
      // mislabeled-point detection over the natural label distribution
      // (17 members sit below mean − 2σ at sf0.001 — non-vacuous): the
      // exact-integer cross-multiplied decision must agree with the
      // oracle on every member flag without any sqrt or double division
      // entering the comparison; the tight-cluster flip semantics are
      // pinned by OperatorSpec
      SimSearch.labelCosineOutliers(tbl(s, d, "embeddings"),
          "vec_id", "embedding", "label", sigmas = 2)
        .orderBy("label", "vec_id")),
    "sim_topk_bucketed" -> ((s, d) =>
      SimSearch.cosineTopKBucketed(tbl(s, d, "embeddings"), "vec_id", "embedding", 0L, 10,
        nBits = 4)
        .select(col("id").as("vec_id"), col("bucket"),
          round(col("cosine"), 6).as("cos6"))
        .orderBy(col("cos6").desc, col("vec_id").asc)),
    "sim_topk_multiprobe" -> ((s, d) =>
      SimSearch.cosineTopKMultiProbe(tbl(s, d, "embeddings"), "vec_id", "embedding", 0L, 10,
        nBits = 4)
        .select(col("id").as("vec_id"), col("bucket"),
          round(col("cosine"), 6).as("cos6"))
        .orderBy(col("cos6").desc, col("vec_id").asc)),
    "fn_vector_stats" -> ((s, d) =>
      // per-embedding scalar stats via sequential-order HOF folds (both
      // engines fold the array left-to-right in double, so the rounded
      // results are bit-comparable)
      SparkUtil.ensureParallelism(tbl(s, d, "embeddings"))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .select(col("vec_id"),
          size(col("e")).as("dim"),
          round(aggregate(col("e"), lit(0.0), (a, x) => a + x) / size(col("e")), 6).as("mean6"),
          round(sqrt(aggregate(col("e"), lit(0.0), (a, x) => a + x * x)), 6).as("l2_6"))
        .orderBy("vec_id")),
    "sim_recall_eval" -> ((s, d) => {
      // ANN quality evaluation as a first-class operator: recall@10 of the
      // single-probe sign-bucket search against exact brute force, for 20
      // query vectors — the measurement a pipeline runs before trusting an
      // approximate index. Both rankings share the (cosine desc, id asc)
      // tie rule, so the whole evaluation is oracle-checkable.
      val e = SparkUtil.ensureParallelism(tbl(s, d, "embeddings"))
        .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"),
          V.signBucket(col("embedding"), 8).as("bucket"))
        .transform(SparkUtil.scopedPersist)
      val q = broadcast(e.where(col("id") < 20)
        .select(col("id").as("qid"), col("v").as("qv"), col("bucket").as("qb")))
      def top10(cands: DataFrame): DataFrame = cands
        .select(col("qid"), col("id"), V.cosine(col("v"), col("qv")).as("c"))
        .groupBy("qid")
        .agg(graft.functions.TopKAgg.topK(col("c"), col("id"), 10).as("tk"))
        .select(col("qid"), transform(col("tk"), x => x.getField("id")).as("ids"))
      val brute = top10(e.crossJoin(q).where(col("id") =!= col("qid")))
      val bucketed = top10(e.join(q, col("bucket") === col("qb"))
          .where(col("id") =!= col("qid")))
        .withColumnRenamed("ids", "b_ids")
      // multi-probe widens to the 8 hamming-1 cells (one sign-bit flip each)
      val probeCond = (col("bucket") === col("qb")) ||
        (0 until 8).map(d => col("bucket") === col("qb").bitwiseXOR(lit(1 << d)))
          .reduce(_ || _)
      val multi = top10(e.join(q, probeCond).where(col("id") =!= col("qid")))
        .withColumnRenamed("ids", "m_ids")
      brute.join(bucketed, Seq("qid"), "left").join(multi, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(size(array_intersect(col("b_ids"), col("ids"))), lit(0)).as("n_hit_single"),
          coalesce(size(array_intersect(col("m_ids"), col("ids"))), lit(0)).as("n_hit_multi"))
        .withColumn("recall_single", round(col("n_hit_single") / 10.0, 6))
        .withColumn("recall_multi", round(col("n_hit_multi") / 10.0, 6))
        .orderBy("qid")
    }),
    "sim_knn_graph" -> ((s, d) =>
      // top-5 neighbors of EVERY vector (similarity-graph construction),
      // sign-bucket blocked — deterministic, so fully oracle-checkable
      SimSearch.knnGraphBucketed(tbl(s, d, "embeddings"), "vec_id", "embedding",
        k = 5, nBits = 4)
        .select(col("a_id"), col("b_id"), col("rank").cast("long").as("rank"),
          round(col("cosine"), 6).as("cos6"))
        .orderBy("a_id", "rank")),
    "sim_knn_confusion" -> ((s, d) =>
      // leave-one-out kNN label eval over the same bucket-blocked graph
      // as sim_knn_graph: majority vote (ties → smallest label), isolated
      // vectors keep a null prediction
      SimSearch.knnLabelConfusion(tbl(s, d, "embeddings"), "vec_id",
          "embedding", "label", k = 5, nBits = 4)
        .orderBy("true_label", "pred_label")),
    "sim_knn_accuracy" -> ((s, d) =>
      // one-row accuracy + macro-F1 over the kNN confusion (null
      // predictions are errors; per-class F1 micro-quantized before the
      // macro average)
      SimSearch.knnEvalSummary(tbl(s, d, "embeddings"), "vec_id",
        "embedding", "label", k = 5, nBits = 4)),
    "sim_topk_ivf" -> ((s, d) => // trained inverted lists — no SQL oracle
      SimSearch.cosineTopKIvf(tbl(s, d, "embeddings"), "vec_id", "embedding", 0L, 10,
        nLists = 16, nProbe = 4, iters = 2)
        .select(col("id").as("vec_id"), col("cell"), round(col("cosine"), 6).as("cos6"))
        .orderBy(col("cos6").desc, col("vec_id").asc)),
    "sim_topk_filtered" -> ((s, d) =>
      // attribute-filtered ANN (predicate + top-k, the production vector-
      // search shape): label = 2 pushed INSIDE the probed cells before
      // distance ranking. nProbe = nLists makes this configuration exact,
      // so the DuckDB brute filtered top-k replays it bit-for-bit;
      // sim_recall_filtered gates the approximate nProbe < nLists path
      SimSearch.cosineTopKIvfFiltered(tbl(s, d, "embeddings"), "vec_id",
          "embedding", tbl(s, d, "embeddings").select("vec_id", "label"),
          "vec_id", col("label") === 2, queryId = 0L, k = 10,
          nLists = 16, nProbe = 16, iters = 2)
        .select(col("id").as("vec_id"), round(col("cosine"), 6).as("cos6"))
        .orderBy(col("cos6").desc, col("vec_id").asc)),
    "sim_recall_filtered" -> ((s, d) =>
      // recall floor of the FILTERED IVF probe vs exact FILTERED brute
      // force (the sim_recall_ivf pattern: the Lloyd centroids are
      // engine-internal, the tolerance boolean is the oracle-checkable
      // claim); denominator = min(|filtered truth|, k). nProbe = 12, not
      // the unfiltered gate's 8: a 10%-selectivity predicate thins each
      // cell's candidates, so matching the unfiltered recall needs more
      // cells (measured min 0.7 / avg 0.87-0.91 at both gate scales at
      // 12 vs min exactly 0.5 at 8 — floor 0.5 keeps the 0.2 margin
      // convention)
      SimSearch.ivfFilteredRecallEval(tbl(s, d, "embeddings"), "vec_id",
        "embedding", tbl(s, d, "embeddings").select("vec_id", "label"),
        "vec_id", col("label") === 2, nQueries = 20, k = 10, nLists = 16,
        nProbe = 12, iters = 2, recallFloor = 0.5)
        .orderBy("qid")),
    "sim_topk_filtered_batch" -> ((s, d) =>
      // attribute-filtered ANN over a query WORKLOAD (10 queries, one
      // shared cell scan — queries × corpus never materializes, the
      // text_phrase_batch convention). nProbe = nLists makes the batch
      // exact, so the DuckDB per-query filtered brute top-k replays it
      SimSearch.cosineTopKIvfFilteredBatch(tbl(s, d, "embeddings"), "vec_id",
          "embedding", tbl(s, d, "embeddings").select("vec_id", "label"),
          "vec_id", col("label") === 2, queryIds = (0L until 10L),
          k = 5, nLists = 16, nProbe = 16, iters = 2)
        .select(col("qid"), col("id").as("vec_id"),
          round(col("cosine"), 6).as("cos6"))
        .orderBy(col("qid"), col("cos6").desc, col("vec_id"))),
    "sim_topk_filtered_batch_fast" -> ((s, d) =>
      // the approximate scale path of the batch: nProbe = 12 of 16 cells.
      // Rows-only (Lloyd cells are engine-internal); sim_recall_filtered
      // is its PASSING oracle-paired twin — same index, same predicate,
      // same nProbe, per-query recall floor vs exact filtered brute force
      SimSearch.cosineTopKIvfFilteredBatch(tbl(s, d, "embeddings"), "vec_id",
          "embedding", tbl(s, d, "embeddings").select("vec_id", "label"),
          "vec_id", col("label") === 2, queryIds = (0L until 10L),
          k = 5, nLists = 16, nProbe = 12, iters = 2)
        .select(col("qid"), col("id").as("vec_id"),
          round(col("cosine"), 6).as("cos6"))
        .orderBy(col("qid"), col("cos6").desc, col("vec_id"))),
    "sim_topk_int8" -> ((s, d) => {
      // int8-quantized ANN (the 4× storage-reduction path of an embedding
      // pipeline): symmetric per-vector scale max|x|/127, round-half-away
      // codes, cosine over the DEQUANTIZED doubles — fully deterministic
      // arithmetic, so the whole quantize→search pipeline is oracle-checked
      val e = SparkUtil.ensureParallelism(tbl(s, d, "embeddings"))
        .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
        .withColumn("scale", V.int8Scale(col("v")))
        .withColumn("dq",
          V.dequantizeInt8(V.quantizeInt8(col("v"), col("scale")), col("scale")))
      val q = broadcast(e.where(col("id") === 0).select(col("dq").as("q_dq")))
      e.crossJoin(q).where(col("id") =!= 0)
        .select(col("id").as("vec_id"),
          round(V.cosine(col("dq"), col("q_dq")), 6).as("cos6"))
        .orderBy(col("cos6").desc, col("vec_id").asc)
        .limit(10)
    }),
    "sim_recall_int8" -> ((s, d) =>
      // int8 ranking fidelity: top-10 by dequantized-int8 cosine vs top-10
      // by full-precision cosine for 20 queries, as a tolerance boolean —
      // floor 0.7 with margin under the measured min recall of 0.90 at
      // both sf0.01 and sf0.1 (avg 0.98); fully deterministic tie rule
      SimSearch.int8RecallEval(tbl(s, d, "embeddings"), "vec_id", "embedding",
        nQueries = 20, k = 10, recallFloor = 0.7)
        .orderBy("qid")),
    "sim_recall_ivf" -> ((s, d) =>
      // IVF quality made oracle-checkable (the sim_recall_eval pattern):
      // recall@10 of the trained-IVF probe vs exact brute force for 20
      // queries, emitted as a tolerance boolean — the Lloyd centroids are
      // engine-internal doubles, so the VALUE is not oracle-expressible,
      // but "the approximate index reaches the recall floor" is
      SimSearch.ivfRecallEval(tbl(s, d, "embeddings"), "vec_id", "embedding",
        nQueries = 20, k = 10, nLists = 16, nProbe = 8, iters = 2,
        recallFloor = 0.5)
        .drop("min_recall", "mean_recall")
        .orderBy("qid")),
    "sim_recall_ivf_loaded" -> ((s, d) =>
      // the persisted coarse-quantizer replayed from disk (IvfModel
      // save/load): same parameters and SAME recall-floor oracle as
      // sim_recall_ivf; the loaded probe scans are partition-pruned
      // (OperatorSpec pins the plan and the bit-identity to the fitted run)
      SimSearch.ivfRecallEvalFromModel(
        IvfModel.load(s, ivfIndexFor(s, d)),
        nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5)
        .drop("min_recall", "mean_recall")
        .orderBy("qid")),
    "sim_recall_ivf_deleted" -> ((s, d) => {
      // VECTOR-side takedown, mirroring ann_index_deleted: delete markers
      // land beside the persisted IVF index ⇒ every loaded model excludes
      // the ids immediately (broadcast anti-join above the cell-pruned
      // scan); compactDeletes then physically drops their rows from ONLY
      // the dirty cell directories. Both serving states must keep the
      // recall floor vs brute-over-survivors AND return zero deleted ids
      // (the explicit `clean` column — recall alone can't catch a failed
      // exclusion since the brute baseline would include the ghosts too).
      val dir = ivfDelIndexFor(s, d)
      val del = tbl(s, d, "embeddings")
        .where(col("vec_id") % 17 === 3).select(col("vec_id").cast("long").as("id"))
      IvfModel.deleteVectors(s, dir, del)
      val delIds = del.collect().map(_.getLong(0)).toSeq.sorted
      def eval(stage: String): DataFrame =
        SimSearch.ivfRecallEvalFromModel(IvfModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5,
          mustExclude = delIds)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val pre = eval("pre_compact").localCheckpoint()
      IvfModel.compactDeletes(s, dir)
      pre.unionByName(eval("post_compact")).orderBy("stage", "qid")
    }),
    "sim_recall_ivf_upsert" -> ((s, d) => {
      // VECTOR UPSERT supersession, mirroring ann_index_maintained: the
      // %17==3 slice was indexed with a stale first-generation embedding
      // (seq 1); its RE-EMBEDDING appends at seq 2 via appendVectors
      // (frozen-centroid assignment — a new cell for most ids). Serving
      // resolves newest-per-id within the scanned cells immediately;
      // compactUpserts then physically drops the losers, cell-scoped.
      // Both serving states must keep the recall floor vs brute force
      // over the FINAL vectors (the oracle contract of sim_recall_ivf).
      val dir = ivfUpsertIndexFor(s, d)
      IvfModel.appendVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      def eval(stage: String): DataFrame =
        SimSearch.ivfRecallEvalFromModel(IvfModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val pre = eval("pre_compact").localCheckpoint()
      IvfModel.compactUpserts(s, dir)
      pre.unionByName(eval("post_compact")).orderBy("stage", "qid")
    }),
    "sim_postings_audit" -> ((s, d) => {
      // the VECTOR-SIDE takedown-verification primitive
      // (ann_postings_audit's twin): everything the IVF index physically
      // stores about the given ids — every stored version's (seq, cell)
      // plus live takedown markers — answered from the id-HASH-partitioned
      // audit id-map, so the lookup reads ≤ |ids| idh= partitions instead
      // of scanning the cell-partitioned table (VectorStoreSpec pins the
      // pruned plan). cell_ok is the featurize REPLAY: each stored
      // version's cell must equal the frozen-centroid assignment of that
      // version's vector through the write path's OWN expression
      // (SimSearch.assignedCellOf — reader and writer share it, so they
      // can never disagree); the oracle replays the event set: ids 3/4/5
      // stored at seq 1, id 3 re-embedded at seq 2, id 5 marked at seq 2.
      val dir = vecAuditIndexFor(s, d)
      val cents = IvfModel.load(s, dir).centroids
      val versions = tbl(s, d, "embeddings")
        .where(col("vec_id").isin(3L, 4L, 5L))
        .select(col("vec_id").as("id"), lit(1L).as("ingest_seq"),
          when(col("vec_id") % 17 === 3, transform(col("embedding"), x => -x))
            .otherwise(col("embedding")).as("v"))
        .unionByName(tbl(s, d, "embeddings").where(col("vec_id") === 3)
          .select(col("vec_id").as("id"), lit(2L).as("ingest_seq"),
            col("embedding").as("v")))
        .withColumn("__expected", SimSearch.assignedCellOf(col("v"), cents))
        .select("id", "ingest_seq", "__expected")
      graft.sources.VectorAudit.postingsOf(s, dir, Seq(3L, 4L, 5L))
        .join(versions, Seq("id", "ingest_seq"), "left_outer")
        .select(col("id").as("vec_id"), col("ingest_seq"), col("kind"),
          (col("kind") === "marker" || col("cell") === col("__expected"))
            .as("cell_ok"))
        .orderBy("vec_id", "ingest_seq", "kind")
    }),
    "sim_maintenance_debt" -> ((s, d) => {
      // the vector index's compaction-trigger signal (the text side's
      // maintenanceDebt twin): superseded versions counted from the
      // NARROW audit id-map (never the cell tables), pending takedown
      // markers, and the manifest generation fan-out. On the audit
      // index's deterministic event set (every %17==3 id re-embedded at
      // seq 2 over its seq-1 row; one marker) the debt is a pure function
      // of the corpus — the oracle derives it from the embeddings table.
      val dir = vecAuditIndexFor(s, d)
      graft.sources.VectorAudit.maintenanceDebt(s, dir)
        .select(col("superseded_rows"), col("markers_pending"),
          col("gen_lists_max"))
    }),
    "sim_recall_ivf_retrain" -> ((s, d) => {
      // OFFLINE RETRAIN — the vector relayoutInverted: a drifted index
      // (stale %17==3 embeddings at seq 1, re-embedded at seq 2, vec 5
      // takedown-marked) retrains fresh centroids over the CURRENT truth
      // through the flagged-stage swap (VectorStoreSpec pins the crash
      // windows), then maintenance CONTINUES on the rebuilt index (a
      // seq-3 takedown against the carried seqs, compactDeletes). Both
      // stages keep the recall floor vs brute over the final vectors and
      // the explicit clean column proves each takedown serves excluded.
      val dir = roundTripDir(d, "graft-ivf-retrain-index")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val staleCorpus = tbl(s, d, "embeddings").select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir)
      m.unpersist()
      IvfModel.appendVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      IvfModel.deleteVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") === 5).select("vec_id"),
        seq = 2L)
      IvfModel.retrain(s, dir, nLists = 16, iters = 2)
      def eval(stage: String, excl: Seq[Long]): DataFrame =
        SimSearch.ivfRecallEvalFromModel(IvfModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5,
          mustExclude = excl)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val post = eval("post_retrain", Seq(5L)).localCheckpoint()
      IvfModel.deleteVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") === 6).select("vec_id"),
        seq = 3L)
      IvfModel.compactDeletes(s, dir)
      post.unionByName(eval("post_delete", Seq(5L, 6L)))
        .orderBy("stage", "qid")
    }),
    "ann_maintenance_debt" -> ((s, d) => {
      // the TEXT index's compaction-trigger signal gated (the
      // sim_maintenance_debt twin; tools/debt_drive.scala is the
      // continuous-ingest recipe): on the read-only audit table's
      // deterministic event set — corpus at seq 1, one tombstone (doc
      // 82) at seq 2 — the debt is a pure function of the featurize
      // pipeline: one log file (the tombstone append's maint-log write),
      // one backlog id, and doc 82's bucket count of dead postings (its
      // seq-1 rows, outranked by the marker). log_bytes is parquet-
      // encoding-dependent and stays un-gated.
      val table = auditIndexFor(s, d)
      IndexStore.maintenanceDebt(s, table)
        .select(col("log_files"), col("backlog_ids"), col("dead_postings"))
    }),
    "sim_recall_pq_retrain" -> ((s, d) => {
      // PQ RETRAIN — sim_recall_ivf_retrain extended to the product
      // quantizer: the drifted index refits coarse centroids AND residual
      // codebooks over the current truth, all four components (ivf
      // subtree, codes, codebooks, meta) swapping at ONE commit point so
      // codes never pair with foreign codebooks; maintenance then
      // continues (a seq-3 takedown). Both stages keep the PQ recall
      // floor vs brute over the final vectors, takedowns serve excluded.
      val dir = roundTripDir(d, "graft-pq-retrain-index")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val staleCorpus = tbl(s, d, "embeddings").select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
        nLists = 16, m = 16, ks = 64)
      PqModel(IvfModel(m.ivf.centroids,
          m.ivf.assigned.withColumn("ingest_seq", lit(1L))),
        m.codebooks, m.subDim,
        m.encoded.withColumn("ingest_seq", lit(1L))).save(dir)
      m.unpersist()
      PqModel.appendVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      PqModel.deleteVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") === 5).select("vec_id"),
        seq = 2L)
      PqModel.retrain(s, dir, nLists = 16, m = 16, ks = 64)
      // nProbe 12 / floor 0.1 (vs sim_recall_pq's 8 / 0.4): a RETRAINED
      // quantizer legitimately differs from the fit-time one (Lloyd
      // means are float-summation-order sensitive) and the MEASURED
      // per-query recall@10 of the retrained model bottoms at 0.2
      // (sf0.1, qid 4 — the quantization tail of this synthetic corpus;
      // typical 0.3-0.6). This gate pins the retrain MECHANICS — swap
      // atomicity, seq continuity, takedown cleanliness, non-degenerate
      // recall in BOTH stages; quantization quality at the tight floor
      // is sim_recall_pq / sim_recall_pq_rerank's job.
      def eval(stage: String, excl: Seq[Long]): DataFrame =
        SimSearch.pqRecallEvalFromModel(PqModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 12, recallFloor = 0.1,
          mustExclude = excl)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val post = eval("post_retrain", Seq(5L)).localCheckpoint()
      PqModel.deleteVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") === 6).select("vec_id"),
        seq = 3L)
      PqModel.compactDeletes(s, dir)
      post.unionByName(eval("post_delete", Seq(5L, 6L)))
        .orderBy("stage", "qid")
    }),
    "sim_recall_ivf_manifest" -> ((s, d) => {
      // sim_recall_ivf_upsert's contract run under the OBJECT-STORE-SAFE
      // swap: the cell table is manifest-governed (CellManifest — appends
      // and the compaction rewrite stage as _gen-N generations and commit
      // by ONE manifest put; data files never move, replaced directories
      // are retained one maintenance pass for in-flight readers).
      // VectorStoreSpec pins the mid-flip crash contract; this gate pins
      // that the protocol never changes ANSWERS: both serving states keep
      // the recall floor vs brute force over the final vectors.
      val dir = ivfManifestIndexFor(s, d)
      IvfModel.appendVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      def eval(stage: String): DataFrame =
        SimSearch.ivfRecallEvalFromModel(IvfModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val pre = eval("pre_compact").localCheckpoint()
      IvfModel.compactUpserts(s, dir)
      pre.unionByName(eval("post_compact")).orderBy("stage", "qid")
    }),
    "sim_snapshot_pin" -> ((s, d) => {
      // NAMED SNAPSHOTS on a manifest vector table — the reproducible-
      // training-corpus primitive: a training run pins the snapshot it
      // reads (IvfModel.pinSnapshot — one tiny pin file; zero copies,
      // data files never move under the manifest protocol) and every
      // re-run resolves the same bytes while the LIVE index keeps
      // ingesting and compacting past it. The oracle-checkable claims:
      // `frozen` = after a post-pin upsert AND a physical compaction of
      // the live table, the pinned read is EXACTLY the pin-time multiset
      // (full corpus count, every row at seq 1, zero seq-2 leakage —
      // DuckDB replays the count); recall floors hold through the pin
      // (pinned model vs its own truth) and on the live index (final
      // vectors). VectorStoreSpec pins the gc-retention, unpin-reclaim,
      // and retrain/save-refusal corners.
      // PROTOCOL gate: corpus capped at the sf0.01 shape (vec_id < 500) —
      // the claims are pin freezing and the export escape hatch, not
      // index scale; the scale rows stay with the sim_recall_* lifecycle
      // gates (round-17 verdict task 7)
      val dir = roundTripDir(d, "graft-vec-pin-gate")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val staleCorpus = emb.select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      val nCorpus = emb.count()
      IvfModel.pinSnapshot(s, dir, "train_v1")
      IvfModel.appendVectors(s, dir,
        emb.where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      IvfModel.compactUpserts(s, dir)
      val pinnedNarrow = graft.sources.CellManifest
        .readTable(s, s"$dir/assigned", "train_v1")
        .agg(count(lit(1)), max(col("ingest_seq"))).collect()(0)
      val frozen = pinnedNarrow.getLong(0) == nCorpus &&
        pinnedNarrow.getLong(1) == 1L
      def eval(model: IvfModel, stage: String): DataFrame =
        SimSearch.ivfRecallEvalFromModel(model,
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      // the export escape hatch: the pin materializes as a standalone
      // rename-mode index (served state — one seq per id) that keeps the
      // recall floor with no pin attached
      val exp = dir + "-exp"
      val ep = new org.apache.hadoop.fs.Path(exp)
      ep.getFileSystem(s.sessionState.newHadoopConf()).delete(ep, true)
      IvfModel.exportSnapshot(s, dir, "train_v1", exp)
      eval(IvfModel.load(s, dir, "train_v1"), "pinned")
        .unionByName(eval(IvfModel.load(s, exp), "exported"))
        .unionByName(eval(IvfModel.load(s, dir), "live"))
        .withColumn("frozen", lit(frozen))
        .orderBy("stage", "qid")
    }),
    "sim_snapshot_takedown" -> ((s, d) => {
      // Takedown COMPLIANCE pierces the snapshot: a delete marker
      // excludes the id from PINNED reads the moment it lands (the
      // pinned generations are immutable — the marker does the work),
      // and compactDeletes RETAINS the marker files while any pin exists
      // (the live generations scrub physically; clearing the marker
      // would un-delete the id for snapshot readers) then clears them at
      // the first pass after the last unpin. Claims: `pinned_clean` /
      // `live_scrubbed` (id 5 invisible through the pin AND physically
      // gone from the live table), `marker_lifecycle` (retained while
      // pinned, cleared after unpin), recall floor over the surviving
      // corpus in both serving states.
      // PROTOCOL gate: capped corpus — see sim_snapshot_pin
      val dir = roundTripDir(d, "graft-vec-pin-takedown")
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(p, true)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val m = SimSearch.trainIvf(emb,
        "vec_id", "embedding", nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      IvfModel.pinSnapshot(s, dir, "audit_v1")
      IvfModel.deleteVectors(s, dir,
        emb.where(col("vec_id") === 5).select("vec_id"),
        seq = 2L)
      IvfModel.compactDeletes(s, dir)
      val delDir = new org.apache.hadoop.fs.Path(s"$dir/deleted")
      val retained = fs.exists(delDir)
      val pinnedClean = IvfModel.load(s, dir, "audit_v1").assigned
        .where(col("id") === 5).count() == 0L
      val liveScrubbed = graft.sources.CellManifest
        .readTable(s, s"$dir/assigned")
        .where(col("id") === 5).count() == 0L
      def eval(model: IvfModel, stage: String): DataFrame =
        // nProbe 12 (not the family's 8): on the capped sf0.1 corpus one
        // live-stage query sat a hair under the 0.5 floor at 8/16 lists —
        // the floor is the claim, the probe width is just the knob
        SimSearch.ivfRecallEvalFromModel(model,
          nQueries = 20, k = 10, nProbe = 12, recallFloor = 0.5,
          mustExclude = Seq(5L))
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val out = eval(IvfModel.load(s, dir, "audit_v1"), "pinned")
        .unionByName(eval(IvfModel.load(s, dir), "live"))
        .localCheckpoint()
      IvfModel.unpinSnapshot(s, dir, "audit_v1")
      IvfModel.compactDeletes(s, dir)
      val cleared = !fs.exists(delDir)
      out.withColumn("pinned_clean", lit(pinnedClean))
        .withColumn("live_scrubbed", lit(liveScrubbed))
        .withColumn("marker_lifecycle", lit(retained && cleared))
        .orderBy("stage", "qid")
    }),
    "stream_vec_debt_compact" -> ((s, d) => {
      // DEBT-TRIGGERED maintenance in the VECTOR streaming sink — the
      // stream_index_debt_compact twin, completing the text/vector
      // operational symmetry: the %17==3 re-embedding slice arrives as a
      // file stream (seq riding IN THE DATA) through
      // streamingVectorIngest, and compactUpserts is NEVER called by the
      // harness — the sink's own debt poll (compactAtSuperseded = 1, an
      // O(delta) read of the narrow audit id-map) must fire it mid-stream
      // when a micro-batch's upserts create superseded versions. The
      // result carries the oracle-checkable claim: zero superseded rows
      // remain PHYSICALLY in the cell table (only the in-sink trigger
      // could have dropped them), and the served recall keeps the
      // maintained-index floor over the final vectors.
      // PROTOCOL gate: capped corpus — the claim is the in-sink debt
      // trigger firing mid-stream, not ingest scale (round-17 task 7)
      val dir = roundTripDir(d, "graft-vec-stream-debt")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val staleCorpus = emb.select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      val tmp = stageOnce(s, d, "graft-vec-debt-feed") { t =>
        emb.where(col("vec_id") % 17 === 3)
          .select(col("vec_id"), col("embedding"), lit(2L).as("ingest_seq"))
          .repartition(2).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingVectorIngest(
        s, tmp, schema, dir, compactAtSuperseded = 1L)
      try q.processAllAvailable() finally q.stop()
      // NO manual compactUpserts here — the claim below fails the gate
      // if the stream's debt trigger did not fire
      val narrow = graft.sources.CellManifest.readTable(s, s"$dir/assigned")
        .select(col("id"), col("ingest_seq"))
      val stale = narrow.join(
          narrow.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w")),
          Seq("id"))
        .where(col("ingest_seq") < col("__w")).count()
      SimSearch.ivfRecallEvalFromModel(IvfModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5)
        .drop("min_recall", "mean_recall")
        .withColumn("compacted_by_debt", lit(stale == 0L))
        .orderBy("qid")
    }),
    "stream_vec_takedown_real" -> ((s, d) => {
      // CHANGE-FEED maintenance of the vector index as a STREAM (the
      // stream_takedown_real twin): one feed carries upserts AND
      // takedowns, each row its own seq, routed per micro-batch by
      // streamingVectorMaintenance. Events: the %17==3 slice re-embeds
      // at seq 2 (U), vec 5 is taken down at seq 2 (D), vec 6 is taken
      // down at seq 2 (D) and RE-INGESTED at seq 3 (U) — the marker
      // contract: 5 serves excluded, 6 resurrects at its newest version.
      // Both serving states (marker-applied and physically compacted)
      // keep the recall floor vs brute over the final vectors with the
      // explicit clean column, and `resurrected` pins vec 6's comeback.
      val dir = roundTripDir(d, "graft-vec-stream-takedown")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      // PROTOCOL gate: capped corpus — the claims are marker routing and
      // resurrection through the change feed (round-17 task 7)
      val staleCorpus = emb.select(col("vec_id"),
        when(col("vec_id") % 17 === 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      val m = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
        nLists = 16, iters = 2)
      IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
        .save(dir, IndexStore.SwapManifest)
      m.unpersist()
      val zeroVec = transform(col("embedding"), x => x * 0.0f)
      val slices = Seq(
        emb.where(col("vec_id") % 17 === 3)
          .select(col("vec_id"), col("embedding"),
            lit(2L).as("ingest_seq"), lit("U").as("op")),
        emb.where(col("vec_id").isin(5L, 6L))
          .select(col("vec_id"), zeroVec.as("embedding"),
            lit(2L).as("ingest_seq"), lit("D").as("op")),
        emb.where(col("vec_id") === 6)
          .select(col("vec_id"), col("embedding"),
            lit(3L).as("ingest_seq"), lit("U").as("op")))
      val tmp = stageOnce(s, d, "graft-vec-takedown-feed") { t =>
        val dirF = new java.io.File(t)
        slices.zipWithIndex.foreach { case (sl, i) =>
          sl.coalesce(1).write
            .mode(if (i == 0) "overwrite" else "append").parquet(t)
          dirF.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .filter(_.lastModified() > 1700000000000L)
            .foreach(_.setLastModified(1600000000000L + i * 60000L))
        }
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingVectorMaintenance(
        s, tmp, schema, dir)
      try q.processAllAvailable() finally q.stop()
      def resurrected: Boolean = {
        val m6 = IvfModel.load(s, dir).assigned.where(col("id") === 6)
          .agg(max(col("ingest_seq"))).collect()(0)
        !m6.isNullAt(0) && m6.getLong(0) == 3L
      }
      def eval(stage: String): DataFrame =
        SimSearch.ivfRecallEvalFromModel(IvfModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 8, recallFloor = 0.5,
          mustExclude = Seq(5L))
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
          .withColumn("resurrected", lit(resurrected))
      val pre = eval("served").localCheckpoint()
      IvfModel.compactUpserts(s, dir)
      IvfModel.compactDeletes(s, dir)
      pre.unionByName(eval("compacted")).orderBy("stage", "qid")
    }),
    "stream_vec_gen_compact" -> ((s, d) => {
      // the PURE-APPEND path's physical debt: every micro-batch append
      // to a manifest vector table commits as its own generation, and
      // upsert compaction only rewrites cells holding SUPERSEDED rows —
      // an all-new-ids stream (nothing to supersede) grows every cell's
      // generation list by one per batch forever, so each cell read
      // unions one directory per surviving append. The sink's
      // compactAtGenLists knob drives IvfModel.compactGenerations (a
      // purely physical fold: rows pass through untouched, one staged
      // write + one manifest put) from the O(1) gen_lists_max debt
      // signal. Claims: the fan-out stays bounded at the knob
      // (gen_bounded — without the fold it would be base + one per
      // batch), the fold FIRED (a folded cell's list no longer holds
      // base generation 0; the harness never compacts), and the folded
      // state equals the never-folded one-batch twin EXACTLY
      // (state_equal) with the oracle-computable row count (n_rows).
      val dir = roundTripDir(d, "graft-vec-stream-gen")
      val twin = roundTripDir(d, "graft-vec-stream-gen-twin")
      Seq(dir, twin).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      }
      // PROTOCOL gate: capped corpus — the claim is the in-sink
      // generation fold firing at the knob (round-17 task 7)
      val emb = tbl(s, d, "embeddings").where(col("vec_id") < 500)
      val m = SimSearch.trainIvf(emb, "vec_id",
        "embedding", nLists = 16, iters = 2)
      val seeded = IvfModel(m.centroids,
        m.assigned.withColumn("ingest_seq", lit(1L)))
      // two independent model saves to disjoint dirs — overlap (guide §2.6)
      SparkUtil.inParallel(
        () => seeded.save(dir, IndexStore.SwapManifest),
        () => seeded.save(twin, IndexStore.SwapManifest))
      m.unpersist()
      // the arrivals are NEW documents (disjoint ids; negated vectors so
      // the corpus geometry is new content, not duplicates), four files
      // so the stream commits four generations before folding
      val newDocs = emb
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"),
          lit(1L).as("ingest_seq"))
      val tmp = stageOnce(s, d, "graft-vec-gen-feed") { t =>
        newDocs.repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = graft.streaming.StreamingIndex.streamingVectorIngest(
        s, tmp, schema, dir, compactAtGenLists = 2)
      try q.processAllAvailable() finally q.stop()
      // never-folded twin: the same arrivals in ONE append
      IvfModel.appendVectors(s, twin, newDocs, "vec_id", "embedding",
        "ingest_seq")
      val cells = graft.sources.CellManifest
        .read(s, s"$dir/assigned")._2.values
      val genMax = cells.map(_.length).foldLeft(0)(math.max)
      val foldFired = cells.exists(l => !l.contains(0L))
      def narrow(t: String) = graft.sources.CellManifest
        .readTable(s, t)
        .select(col("id"), col("ingest_seq"), col("cell").cast("int").as("cell"))
      val a = narrow(s"$dir/assigned")
      val b = narrow(s"$twin/assigned")
      val mismatches = a.groupBy("id", "ingest_seq", "cell")
        .agg(count(lit(1)).as("na"))
        .join(b.groupBy("id", "ingest_seq", "cell")
          .agg(count(lit(1)).as("nb")),
          Seq("id", "ingest_seq", "cell"), "full_outer")
        .where(col("na").isNull || col("nb").isNull || col("na") =!= col("nb"))
        .count()
      import s.implicits._
      Seq((a.count(), genMax <= 2, foldFired, mismatches == 0L))
        .toDF("n_rows", "gen_bounded", "fold_fired", "state_equal")
    }),
    "sim_recall_pq" -> ((s, d) =>
      // IVF-PQ (Jégou et al. 2011 IVFADC) quality gate, sim_recall_ivf
      // pattern: asymmetric-distance recall@10 vs exact brute force for 20
      // queries as tolerance booleans (codebooks are engine-internal
      // doubles; the recall FLOOR is the oracle-checkable claim).
      // m=16 subquantizers × 64 codewords over dim-64 residuals — 16
      // byte-codes per vector vs 256 fp32 bytes (16× compression);
      // measured: 20/20 queries clear 0.3 at both gate scales (at ks=32
      // one sf0.01 query fell below — the codebook resolution matters)
      SimSearch.pqRecallEval(tbl(s, d, "embeddings"), "vec_id", "embedding",
        nQueries = 20, k = 10, nLists = 16, nProbe = 12, m = 16, ks = 64,
        recallFloor = 0.3)
        .drop("min_recall", "mean_recall")
        .orderBy("qid")),
    "sim_recall_pq_deleted" -> ((s, d) => {
      // PQ takedown: ONE marker beside the coarse quantizer governs both
      // persisted tables (assigned + encoded) — load excludes immediately,
      // compactDeletes scrubs only the dirty cell directories of EACH.
      // Same contract as sim_recall_ivf_deleted: recall floor vs
      // brute-over-survivors + explicit clean, in both serving states.
      val dir = pqDelIndexFor(s, d)
      val del = tbl(s, d, "embeddings")
        .where(col("vec_id") % 17 === 3).select(col("vec_id").cast("long").as("id"))
      PqModel.deleteVectors(s, dir, del)
      val delIds = del.collect().map(_.getLong(0)).toSeq.sorted
      def eval(stage: String): DataFrame =
        SimSearch.pqRecallEvalFromModel(PqModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 12, recallFloor = 0.3,
          mustExclude = delIds)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val pre = eval("pre_compact").localCheckpoint()
      PqModel.compactDeletes(s, dir)
      pre.unionByName(eval("post_compact")).orderBy("stage", "qid")
    }),
    "sim_recall_pq_upsert" -> ((s, d) => {
      // PQ upsert: ONE appendVectors call maintains BOTH persisted tables
      // (coarse-assigned raw vectors + frozen-codebook codes), mirroring
      // sim_recall_ivf_upsert's contract — recall floor vs brute over the
      // FINAL vectors in both serving states; compactUpserts drops the
      // superseded versions from both tables, cell-scoped.
      val dir = pqUpsertIndexFor(s, d)
      PqModel.appendVectors(s, dir,
        tbl(s, d, "embeddings").where(col("vec_id") % 17 === 3),
        "vec_id", "embedding", seq = 2L)
      def eval(stage: String): DataFrame =
        SimSearch.pqRecallEvalFromModel(PqModel.load(s, dir),
          nQueries = 20, k = 10, nProbe = 12, recallFloor = 0.3)
          .drop("min_recall", "mean_recall")
          .withColumn("stage", lit(stage))
      val pre = eval("pre_compact").localCheckpoint()
      PqModel.compactUpserts(s, dir)
      pre.unionByName(eval("post_compact")).orderBy("stage", "qid")
    }),
    "sim_recall_pq_loaded" -> ((s, d) => {
      // the PERSISTED IVF-PQ index replayed from disk (PqModel.save/load):
      // a trained product quantizer is rebuild-hostile at exactly the scale
      // where training is most expensive, so the serving path must answer
      // from the stored codebooks/codes bit-identically to the fitted
      // session — same parameters and SAME oracle as sim_recall_pq; the
      // bit-identity (not just recall-floor) claim is asserted in
      // OperatorSpec against the in-session model
      val dir = pqIndexFor(s, d)
      SimSearch.pqRecallEvalFromModel(PqModel.load(s, dir),
        nQueries = 20, k = 10, nProbe = 12, recallFloor = 0.3)
        .drop("min_recall", "mean_recall")
        .orderBy("qid")
    }),
    "sim_recall_telemetry" -> ((s, d) => {
      // the DRAW-DEPENDENT recall distribution behind the two-tier recall
      // gates, exposed ROWS-ONLY: the workload's min/mean per-query
      // recall are exactly the quantities a hash-pinned oracle would turn
      // back into a corpus-draw lottery (the round-18 restatement's
      // lesson), so they ride a rows-only gate instead — one row per
      // family with the raw min/mean and the tiers cleared. A
      // single-query mode regression hiding under a healthy workload
      // mean is VISIBLE here as a sagging min_recall even while every
      // boolean gate passes (round-18 verdict, What's wrong #3). Watch
      // value (COVERAGE.md): min_recall ≥ floor/3 always; healthy draws
      // sit at or above the floor itself.
      def oneRow(df: DataFrame, family: String, floor: Double): DataFrame =
        df.agg(
            first(col("min_recall")).as("min_recall"),
            first(col("mean_recall")).as("mean_recall"),
            (min(col("sane_ok").cast("int")) === 1).as("all_sane"),
            first(col("mean_recall_ok")).as("mean_ok"))
          .select(lit(family).as("family"), lit(floor).as("floor"),
            col("min_recall"), col("mean_recall"), col("all_sane"),
            col("mean_ok"))
      oneRow(SimSearch.ivfRecallEval(tbl(s, d, "embeddings"), "vec_id",
          "embedding", nQueries = 20, k = 10, nLists = 16, nProbe = 8,
          iters = 2, recallFloor = 0.5), "ivf", 0.5)
        .unionByName(oneRow(SimSearch.pqRecallEval(tbl(s, d, "embeddings"),
          "vec_id", "embedding", nQueries = 20, k = 10, nLists = 16,
          nProbe = 12, m = 16, ks = 64, recallFloor = 0.3), "pq", 0.3))
        .orderBy("family")
    }),
    "sim_recall_pq_rerank" -> ((s, d) =>
      // IVFADC+R (exact re-rank of the PQ top-C, the production shape):
      // same parameters as sim_recall_pq, candidate depth C=50, and a
      // STRICTLY HIGHER floor (0.5 vs 0.3) — the re-rank recall dominates
      // plain PQ by construction; measured min 0.7 / avg 0.96 at both
      // gate scales, so 0.5 keeps 0.2 margin
      SimSearch.pqRerankRecallEval(tbl(s, d, "embeddings"), "vec_id",
        "embedding", nQueries = 20, k = 10, rerankC = 50, nLists = 16,
        nProbe = 12, m = 16, ks = 64, recallFloor = 0.5)
        .drop("min_recall", "mean_recall")
        .orderBy("qid")),

    // --- text analysis
    "text_langid" -> ((s, d) =>
      TextAnalysis.withLangId(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select("doc_id", "de_hits", "en_hits", "es_hits", "fr_hits", "lang_pred")
        .orderBy("doc_id")),
    "text_langid_v2" -> ((s, d) =>
      // classifier-grade language ID: hashed char-trigram linear model
      // (fastText shape) with the stopword-trained deterministic weight
      // table; docs get a planted language prefix by doc_id % 5 (the 5th
      // residue stays unplanted) so every class and the und path execute.
      // Exact integer micro-logit sums — the oracle replays hash, weight
      // VALUES literal, and argmax chain bit-for-bit
      TextAnalysis.langIdClassifierScore(langIdPlanted(s, d), "doc_id", "text",
          langIdWeights, LangIdBuckets)
        .select("doc_id", "n_feats", "de_micro", "en_micro", "es_micro",
          "fr_micro", "lang_pred_v2")
        .orderBy("doc_id")),
    "text_langid_v2_agree" -> ((s, d) => {
      // heuristic-vs-classifier agreement on the easy slice (the planted
      // docs, where the language signal is explicit): per planted language,
      // how often each path recovers the plant and how often they agree
      val planted = langIdPlanted(s, d).where(col("doc_id") % 5 <= 3)
        .withColumn("planted_lang",
          when(col("doc_id") % 5 === 0, "de").when(col("doc_id") % 5 === 1, "en")
            .when(col("doc_id") % 5 === 2, "es").otherwise("fr"))
      val h = TextAnalysis.withLangId(planted, "text")
        .select(col("doc_id"), col("planted_lang"), col("lang_pred"))
      val c = TextAnalysis.langIdClassifierScore(planted, "doc_id", "text",
          langIdWeights, LangIdBuckets)
        .select(col("doc_id"), col("lang_pred_v2"))
      h.join(c, Seq("doc_id"))
        .groupBy("planted_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang_pred") === col("planted_lang"), 1L).otherwise(0L))
            .as("n_heur_match"),
          sum(when(col("lang_pred_v2") === col("planted_lang"), 1L).otherwise(0L))
            .as("n_clf_match"),
          sum(when(col("lang_pred") === col("lang_pred_v2"), 1L).otherwise(0L))
            .as("n_agree"))
        .orderBy("planted_lang")
    }),
    "text_quality" -> ((s, d) =>
      TextAnalysis.withQualityScore(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select("doc_id", "n_tokens", "mean_token_len", "stopword_ratio",
          "digit_ratio", "quality_score").orderBy("doc_id")),
    "text_token_counts" -> ((s, d) =>
      TextAnalysis.withTokenCounts(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select("doc_id", "ws_tokens", "bpe_ish_tokens").orderBy("doc_id")),
    "text_token_counts_bpe" -> ((s, d) =>
      // REAL subword tokenization: the Sennrich/GPT-2 merge-loop BPE with
      // a planted hierarchical merge table (plan-literal, the same
      // bounded-broadcast convention as the PQ codebooks) — training
      // pipelines budget in subword tokens, not whitespace words. The
      // oracle replays the merges exactly as a replace() chain over
      // bracket-delimited symbols (exact for a hierarchical table)
      SparkUtil.ensureParallelism(docs(s, d))
        .select(col("doc_id"),
          size(T.tokenize(col("text"))).cast("long").as("n_words"),
          graft.functions.Bpe.countTokens(T.tokenize(col("text")))
            .as("n_bpe_tokens"))
        .orderBy("doc_id")),
    "text_bpe_fertility" -> ((s, d) =>
      // tokenizer fertility (chars per subword) — the standard measure of
      // how well a vocab fits a corpus (high fertility = over-segmented):
      // per doc, total word chars / BPE token count under the planted
      // merge table
      SparkUtil.ensureParallelism(docs(s, d))
        .select(col("doc_id"),
          aggregate(T.tokenize(col("text")), lit(0L),
            (a, w) => a + length(w)).as("n_chars"),
          graft.functions.Bpe.countTokens(T.tokenize(col("text")))
            .as("n_bpe_tokens"))
        .withColumn("fertility6", when(col("n_bpe_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)))
        .orderBy("doc_id")),
    "text_bpe_learn" -> ((s, d) => {
      // distributed BPE merge LEARNING (Sennrich learn_bpe): 6 greedy
      // rounds over the corpus token occurrences — encode under the
      // merges so far, count adjacent symbol pairs (one map-side-combined
      // aggregate/round), adopt the most frequent (count desc, then
      // lexicographic). The oracle replays the identical rounds over a
      // bracketed-symbol representation
      import s.implicits._
      graft.functions.Bpe.learnMerges(docs(s, d), "text", k = 6)
        .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
        .toDF("rank", "left", "right", "pair_count")
        .orderBy("rank")
    }),
    "text_unigram_learn" -> ((s, d) => {
      // unigram-LM tokenizer learning (Kudo 2018, the SentencePiece
      // algorithm — completes the tokenizer-family pair with
      // text_bpe_learn): 2 hard-EM rounds over the distinct-word
      // histogram, seeded with corpus chars + the BPE merge outputs,
      // exact integer micro-nat costs, ties pinned (longest piece), non-
      // char pieces pruned under 2 uses. The oracle replays the Viterbi
      // DP + EM rounds as generated unrolled SQL
      import s.implicits._
      graft.functions.Unigram.learnUnigram(docs(s, d), "text",
          emRounds = 2, minCount = 2)
        .toDF("piece", "count", "cost_micro")
        .orderBy("piece")
    }),
    "text_unigram_fertility" -> ((s, d) => {
      // fertility under the LEARNED unigram vocabulary (the
      // text_bpe_fertility twin with learning in the loop): 2 EM rounds,
      // then per-doc chars / Viterbi piece count under the final costs.
      // The oracle extends the learning replay with a third unrolled DP
      // round and per-word backtrack counts
      val learned = graft.functions.Unigram.learnUnigram(docs(s, d), "text",
        emRounds = 2, minCount = 2)
      val table = new graft.functions.UnigramTable(
        learned.map { case (p, _, cm) => p -> cm }.toMap, 4)
      SparkUtil.ensureParallelism(docs(s, d))
        .select(col("doc_id"),
          aggregate(T.tokenize(col("text")), lit(0L),
            (a, w) => a + length(w)).as("n_chars"),
          graft.functions.Unigram.countTokens(T.tokenize(col("text")), table)
            .as("n_uni_tokens"))
        .withColumn("fertility6", when(col("n_uni_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_uni_tokens"), 6)))
        .orderBy("doc_id")
    }),
    "text_pack_sequences_bpe" -> ((s, d) =>
      // sequence packing in the unit that matters — BPE subwords: same
      // distributed two-pass cumsum, the per-doc count comes from the
      // merge-loop kernel instead of the whitespace tokenizer
      TextAnalysis.packSequencesCounted(SparkUtil.ensureParallelism(docs(s, d)),
          "doc_id", graft.functions.Bpe.countTokens(T.tokenize(col("text"))),
          maxTokens = 512)
        .orderBy("doc_id")),
    "text_token_budget_bpe" -> ((s, d) =>
      // token-budget selection budgeted in BPE subwords (n_chars score,
      // same distributed cumsum as text_token_budget)
      TextAnalysis.selectWithinTokenBudgetCounted(docs(s, d), "doc_id",
          graft.functions.Bpe.countTokens(T.tokenize(col("text"))),
          "n_chars", budget = 15000L)
        .orderBy("doc_id")),
    "text_pii_scrub" -> ((s, d) => {
      // PII redaction over a corpus with deterministically planted PII
      // (the base corpus is synthetic and PII-free, so plant one email /
      // IPv4 / phone per doc and prove the scrubber removes them)
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"), lit("@example.com via 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 tel 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-4829")).as("text"))
      TextAnalysis.scrubPii(planted, "text")
        .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
          md5(col("text_scrubbed")).as("scrubbed_md5"))
        .orderBy("doc_id")
    }),
    "text_dedup_within" -> ((s, d) => {
      // intra-doc segment dedup over a corpus with a planted repeated
      // opener (two identical 4-token phrases, boundary-aligned at the
      // front) — every doc drops >= 1 segment; natural repeats add more
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(lit("end of section marker end of section marker "),
          col("text")).as("text"))
      TextAnalysis.dedupSegmentsWithin(planted, "doc_id", "text", segTokens = 4)
        .select(col("doc_id"), col("n_segs"), col("n_dropped"),
          md5(col("text_deduped")).as("dedup_md5"))
        .orderBy("doc_id")
    }),
    "text_c4_line_filter" -> ((s, d) => {
      // C4 line filtering (Raffel et al. 2020): plant 4 lines per doc —
      // a proper sentence (kept), a short punctuated line (fails the
      // word floor), an unpunctuated long line (fails the terminal
      // mark), and the doc's own text with a period appended (kept when
      // it reaches 5 words — short docs genuinely drop it)
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(
          lit("this line is a proper sentence with terminal punctuation.\n"),
          lit("too short.\n"),
          lit("this longer line has no terminal punctuation at all\n"),
          col("text"), lit(".")).as("text"))
      TextAnalysis.c4LineFilter(planted, "doc_id", "text", minWords = 5)
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("text_clean")).as("clean_md5"))
        .orderBy("doc_id")
    }),
    "text_para_dedup_global" -> ((s, d) => {
      // CORPUS-WIDE paragraph dedup (the CCNet preprocessing step; the
      // within-doc twin is text_dedup_within): plant a global boilerplate
      // paragraph and a mod-10 family paragraph in front of every doc's
      // own text — the global para survives only in doc 0, each family
      // para only in its lowest-id doc, and natural exact-dup doc texts
      // drop their copies too; the oracle replays the same
      // first-occurrence rule with a window
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(lit("subscribe to our newsletter for daily updates\n\n"),
          lit("shared section "), (col("doc_id") % 10).cast("string"),
          lit(" standard terms apply\n\n"), col("text")).as("text"))
      TextAnalysis.dedupParagraphsGlobal(planted, "doc_id", "text")
        .select(col("doc_id"), col("n_paras"), col("n_dropped"),
          md5(col("text_deduped")).as("dedup_md5"))
        .orderBy("doc_id")
    }),
    "text_url_extract" -> ((s, d) => {
      // URL metadata over deterministically planted URLs (base corpus has
      // none); the regexes are RE2-safe so DuckDB computes the same fields
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(lit("see https://sub"), (col("doc_id") % 10).cast("string"),
          lit(".example"), (col("doc_id") % 7).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string"), lit(" then "),
          col("text"), lit(" and http://mirror.test.net/x")).as("text"))
      TextAnalysis.withUrlMetadata(planted, "text")
        .select("doc_id", "n_urls", "first_url", "first_host")
        .orderBy("doc_id")
    }),
    "text_html_extract" -> ((s, d) => {
      // HTML-to-text over planted markup wrapping each doc's text: a
      // script block whose body contains raw < > && (must be removed as a
      // BLOCK before tag stripping), a style block, a comment, entities
      // (&amp; decoded last), and an anchor counted by n_links; the
      // oracle replays the identical RE2-safe chain
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(lit("<html><head><title>t"), col("doc_id").cast("string"),
          lit("</title><style>p {color: red}</style></head><body><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><!-- hidden --><p>"), col("text"),
          lit("</p><script>var x = 1 < 2 && y > 0;</script>" +
            "<p>tail &amp; fin &lt;ok&gt;</p>" +
            "<a href=\"/x\">link</a></body></html>")).as("html"))
      TextAnalysis.htmlToText(planted, "html")
        .select(col("doc_id"), col("n_links"),
          md5(col("text_extracted")).as("extract_md5"))
        .orderBy("doc_id")
    }),
    "text_oov_rate" -> ((s, d) => {
      // vocab-coverage measurement: top-100 corpus vocabulary (count desc,
      // term asc tiebreak), then per-doc OOV counts/rate against it — the
      // oracle recomputes the identical vocab and coverage
      val dd = SparkUtil.ensureParallelism(docs(s, d))
      TextAnalysis.oovStats(dd, "doc_id", "text",
          TextAnalysis.topFrequencyVocab(dd, "text", 100), "term")
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          col("oov_rate").as("oov6"))
        .orderBy("doc_id")
    }),
    "text_shuffle_shards" -> ((s, d) =>
      // deterministic shuffle-and-shard (the final training-order stage):
      // every doc's shard and in-shard position replay from
      // md5(seed:id) alone, so the oracle recomputes the full assignment
      // with the same hex-prefix key
      TextAnalysis.shuffleShards(SparkUtil.ensureParallelism(docs(s, d)),
          "doc_id", seed = "42", nShards = 8)
        .select(col("doc_id"), col("shard"), col("shard_pos"))
        .orderBy("doc_id")),
    "text_url_blocklist" -> ((s, d) => {
      // UT1-shaped domain blocklist filtering over planted hosts: four
      // domain families — blocked-by-suffix (malware.bad.example under
      // bad.example), the LOOK-ALIKE that must survive (notbad.example is
      // not label-aligned under bad.example), a clean family, and an
      // exact-domain block (blog.test)
      import s.implicits._
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        concat(lit("https://sub"), (col("doc_id") % 10).cast("string"), lit("."),
          element_at(array(lit("malware.bad.example"), lit("notbad.example"),
            lit("shop.example"), lit("blog.test")),
            (col("doc_id") % 4 + 1).cast("int")),
          lit("/p/"), col("doc_id").cast("string")).as("raw_url"))
      val blocklist = Seq("bad.example", "blog.test").toDF("domain")
      TextAnalysis.urlBlocklistFlags(planted, "doc_id", "raw_url", blocklist)
        .select(col("doc_id"), col("host"), col("blocked"))
        .orderBy("doc_id")
    }),
    "text_url_canonical" -> ((s, d) =>
      // crawl-frontier URL dedup: messy raw forms per doc family
      // (uppercase scheme/host + default port + fragment vs tracking
      // params) must collapse to the same canonical URL, while the
      // adversarial family (mod-4 == 2) proves look-alikes survive:
      // 'gclid=' in a path segment, '?gclid=' inside a param VALUE, and
      // 'myfbclid' (tracking name as a suffix) are all NOT tracking params
      plantedUrls(s, d).select(col("doc_id"), col("raw_url"),
          TextAnalysis.canonicalizeUrl(col("raw_url")).as("url_canon"))
        .orderBy("doc_id")),
    "dedup_url_keyed" -> ((s, d) =>
      // canonical-URL keep-min dedup — the crawl step BEFORE content
      // dedup: docs whose messy raw forms collapse to one canonical URL
      // keep only the min doc_id. Every planted family exercises the
      // decision: mod-4==0 and the odd family collapse within mod-20
      // congruence classes (fragment/port/tracking variants of the same
      // page), and mod-4==2 collapses by host once its per-doc
      // utm_medium value is stripped
      Dedup.dropUrlDuplicates(plantedUrls(s, d), "doc_id", "raw_url")
        .select(col("doc_id"),
          TextAnalysis.canonicalizeUrl(col("raw_url")).as("url_canon"))
        .orderBy("doc_id")),
    "text_domain_stats" -> ((s, d) =>
      // per-host doc/token counts over the planted crawl URLs — the
      // provenance table that feeds the domain mixture sampler
      TextAnalysis.domainStats(
          plantedUrls(s, d).join(docs(s, d).select("doc_id", "text"), Seq("doc_id")),
          "raw_url", "text")
        .select(col("host"), col("n_docs"), col("n_tokens"))
        .orderBy("host")),
    "text_mojibake_repair" -> ((s, d) => {
      // mojibake roundtrip gate: every doc gets a non-ASCII suffix (the
      // U+2019 guarantees CLEAN text can never look like valid-UTF-8-in-
      // latin1, so detection cannot false-fire); the %3==0 sliver is then
      // double-encoded in-flight (utf8 bytes re-read as latin1 — exactly
      // the upstream corruption), and repair must restore the clean text
      // bit-for-bit: the oracle just recomputes md5(text || suffix)
      val suffix = " café déjà’vu — æøå"
      val clean = docs(s, d).select(col("doc_id"),
        concat(col("text"), lit(suffix)).as("text"))
      val corrupted = clean.withColumn("text",
        when(col("doc_id") % 3 === 0,
          decode(encode(col("text"), "UTF-8"), "ISO-8859-1"))
          .otherwise(col("text")))
      TextAnalysis.repairMojibake(corrupted, "text")
        .select(col("doc_id"), col("was_repaired"),
          length(col("text_fixed")).cast("long").as("fixed_len"),
          md5(col("text_fixed")).as("fixed_md5"))
        .orderBy("doc_id")
    }),
    "text_domain_cap" -> ((s, d) => {
      // anti-monoculture cap: ≤ 20 docs per host (longest text wins, id
      // tie-break) over the planted crawl URLs — ~50 docs/host at sf0.001
      // so the cap genuinely cuts; the %25==7 sliver gets an unparseable
      // URL and must be kept unconditionally (dead-letter semantics)
      val withUrl = plantedUrls(s, d)
        .withColumn("raw_url", when(col("doc_id") % 25 === 7,
          lit("no-scheme-here")).otherwise(col("raw_url")))
        .join(docs(s, d).select("doc_id", "text"), Seq("doc_id"))
        .withColumn("score", length(col("text")).cast("double"))
      TextAnalysis.capPerDomain(withUrl, "doc_id", "raw_url", "score", maxDocs = 20)
        .select("doc_id").orderBy("doc_id")
    }),
    "text_chunk_bpe" -> ((s, d) =>
      // context-window chunking at SUBWORD granularity: boundaries every
      // 64 BPE tokens of the planted merge table; words assigned by their
      // starting subword offset (closed-form cumsum, no greedy resets)
      TextAnalysis.chunkByBpeBudget(docs(s, d), "doc_id", "text", budget = 64)
        .orderBy("doc_id", "chunk_idx")),
    "text_chunk" -> ((s, d) =>
      // context-window chunking: 50-token windows, 10-token overlap; chunk
      // text emitted as md5 (comparator-friendly cell size)
      TextAnalysis.chunk(SparkUtil.ensureParallelism(docs(s, d)), "doc_id", "text",
        chunkTokens = 50, overlapTokens = 10)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          md5(col("chunk_text")).as("chunk_md5"), col("chunk_tokens"))
        .orderBy("doc_id", "chunk_idx")),
    "text_pack_sequences" -> ((s, d) =>
      // pretraining sequence packing: concatenate in id order, cut every
      // 512 tokens; each doc -> (sequence of its first token, offset,
      // crosses-boundary flag)
      TextAnalysis.packSequences(SparkUtil.ensureParallelism(docs(s, d)),
          "doc_id", "text", maxTokens = 512)
        .orderBy("doc_id")),
    "text_normalize" -> ((s, d) =>
      TextAnalysis.withNormalizedText(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select("doc_id", "text_norm").orderBy("doc_id")),
    "text_token_budget" -> ((s, d) =>
      // token-budget subset selection: best docs by n_chars (any numeric
      // score works — the operator is score-generic) within 50k tokens;
      // distributed two-pass cumsum, no global single-task window
      TextAnalysis.selectWithinTokenBudget(docs(s, d), "doc_id", "text",
        "n_chars", budget = 15000L)
        .orderBy("doc_id")),
    "text_unigram_logprob" -> ((s, d) =>
      // self-trained unigram-LM quality score (the cheap perplexity
      // filter); micro-nat integer quantization makes the per-doc sum
      // exact and order-independent — plain partial-aggregable sum/count
      TextAnalysis.withUnigramLogProb(docs(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 6).as("avg_logprob6"))
        .orderBy("doc_id")),
    "text_ccnet_buckets" -> ((s, d) =>
      // CCNet perplexity bucketing at fixed micro-nat cutoffs (head ≥
      // -3.40 nats, tail < -3.404 — calibrated to admit all three buckets
      // at both gate scales); integer comparisons, no quantile window
      TextAnalysis.ccnetBuckets(docs(s, d), "doc_id", "text",
        headCutMicro = -3400000L, tailCutMicro = -3404000L)
        .select(col("doc_id"), col("n_tokens"), col("ppl_bucket"))
        .orderBy("doc_id")),
    "text_ccnet_calibrated" -> ((s, d) => {
      // CCNet as published: derive the cutoffs from a CALIBRATION slice
      // (held-out even ids; top/bottom 30% of its scored docs), then
      // bucket the FULL corpus at those cutoffs. The gate also asserts
      // the k = ceil(q*n) rank rule agrees with DuckDB's own
      // quantile_disc (tolerance booleans, lit(true) on the Spark side)
      val corpus = docs(s, d)
      val cal = TextAnalysis.calibrateCcnetCutoffs(
        corpus.where(col("doc_id") % 2 === 0), "doc_id", "text",
        headFrac = 0.3, tailFrac = 0.3)
      TextAnalysis.ccnetBuckets(corpus, "doc_id", "text",
          cal.headCutMicro, cal.tailCutMicro)
        .select(col("doc_id"), col("n_tokens"), col("ppl_bucket"),
          lit(cal.nScored).as("n_cal"),
          lit(cal.headCutMicro).as("head_cut"),
          lit(cal.tailCutMicro).as("tail_cut"),
          lit(true).as("head_matches_disc"),
          lit(true).as("tail_matches_disc"))
        .orderBy("doc_id")
    }),
    "text_compression_signal" -> ((s, d) => {
      // DEFLATE-ratio gibberish signal (custom codegen'd kernel). DuckDB
      // has no deflate, so the gate is the tolerance-boolean pattern:
      // corpus-level bounds (measured 0.38-1.0, avg 0.527 at sf0.001 AND
      // sf0.01) + the planted slogan-vs-prose ordering the signal exists
      // to detect (0.05 vs 0.77 — LZ77 sees repeated substrings that
      // char-entropy cannot)
      val slogan = "buy now limited offer " * 30
      val prose = "the quick brown fox jumps over the lazy dog while " +
        "carefully composing varied and informative sentences about " +
        "science history art and engineering"
      docs(s, d).select(T.deflateRatio(col("text")).as("r"))
        .agg(count(lit(1)).as("n_docs"), min("r").as("__mn"),
          avg("r").as("__av"), max("r").as("__mx"))
        .select(col("n_docs"),
          (col("__mn") > 0.2 && col("__mx") <= 1.1).as("ratios_bounded"),
          col("__av").between(0.35, 0.7).as("avg_in_band"),
          (T.deflateRatio(lit(slogan)) < 0.15 &&
            T.deflateRatio(lit(prose)) > 0.5).as("probe_ordering"))
    }),
    "text_char_entropy" -> ((s, d) =>
      // char-distribution Shannon entropy (gibberish signal); micro-nat
      // quantized so the zero-shuffle fold hash-matches the oracle's
      // group-and-sum form
      TextAnalysis.withCharEntropy(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select(col("doc_id"), col("n_distinct_chars"),
          round(col("char_entropy"), 6).as("entropy6"))
        .orderBy("doc_id")),
    "text_bigram_backoff" -> ((s, d) =>
      // held-out bigram LM with stupid backoff: counts trained on even
      // doc_ids, scored over every doc (unseen bigrams exercise backoff)
      TextAnalysis.withBigramLogProb(docs(s, d), "doc_id", "text",
        col("doc_id") % 2 === 0, alpha = 0.4)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logscore"), 6).as("avg_ls6"))
        .orderBy("doc_id")),
    "text_zipf_fit" -> ((s, d) =>
      // corpus-health statistic: OLS of ln(freq) on ln(rank) over the
      // top-500 tokens in exact integer micro arithmetic
      TextAnalysis.zipfFit(docs(s, d), "text", topV = 500)),
    "text_sentence_split" -> ((s, d) => {
      // sentence segmentation over planted punctuation (the raw corpus
      // has none): three sentences per doc with ./!/? terminators; the
      // RE2-safe pattern replays identically in DuckDB, per-sentence
      // digests pin content and order
      val planted = docs(s, d).select(col("doc_id"),
        concat(col("text"), lit(". "),
          substring(col("text"), 1, 40), lit("! "),
          substring(col("text"), 1, 20), lit("?")).as("text"))
      TextAnalysis.sentenceSplit(planted, "doc_id", "text")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sentences"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("sent_idx"), col("sentence")))),
            x => x.getField("sentence")), "|")).as("digest"))
        .orderBy("doc_id")
    }),
    "text_rake_keywords" -> ((s, d) =>
      // RAKE keyword extraction over the English slice: stopword-split
      // candidate phrases scored by Σ deg(w)/freq(w) in exact integer
      // micro-units, top-100 by (score desc, phrase) — fully pinned
      TextAnalysis.rakeKeywords(docs(s, d).where(col("lang") === "en"),
        "doc_id", "text", "en", topN = 100)),
    "text_js_div" -> ((s, d) =>
      // domain-drift measure: Jensen-Shannon divergence between the en
      // and de token distributions in exact micro-nat terms (per-token
      // rounding then integer sum — order-invariant)
      TextAnalysis.jsDivergence(
        docs(s, d).where(col("lang") === "en"),
        docs(s, d).where(col("lang") === "de"), "text")),
    "text_pmi_colloc" -> ((s, d) =>
      // PMI collocation mining (Church & Hanks 1990): top-100 adjacent
      // token pairs by ln(c_ab·N/(c_a·c_b)) in integer micro-nats, exact
      // counts, minCount=5 pruning before the vocab joins, ties pinned
      TextAnalysis.pmiCollocations(docs(s, d), "text", minCount = 5,
        topN = 100)),
    "text_report_card" -> ((s, d) =>
      // corpus report card: language × readability-band crosstab with doc
      // and token totals — the one-page QA summary a curation run emits;
      // bands cut on the ROUNDED grade so the crosstab is bit-stable. The
      // raw corpus has no terminal punctuation (every doc would land in
      // the null band), so sentence structure is PLANTED: the %3==0
      // sliver gets ten short sentences (low grade), %3==1 one run-on
      // sentence (high grade), %3==2 stays unpunctuated (null band)
      TextAnalysis.withLangId(
          TextAnalysis.withReadability(
            docs(s, d).select(col("doc_id"),
              concat(col("text"),
                when(col("doc_id") % 3 === 0,
                  lit(" one. two. three. four. five. six. seven. eight. nine. ten."))
                  .when(col("doc_id") % 3 === 1, lit("."))
                  .otherwise(lit(""))).as("text")), "text"), "text")
        .withColumn("fk_band",
          when(col("fk_grade6").isNull, "none")
            .when(col("fk_grade6") < 5.0, "easy")
            .when(col("fk_grade6") <= 10.0, "mid")
            .otherwise("hard"))
        .groupBy("lang_pred", "fk_band")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
        .orderBy("lang_pred", "fk_band")),
    "text_readability" -> ((s, d) =>
      // Flesch-Kincaid grade with vowel-group syllables and terminal-
      // punctuation sentences; exact integer signals, 6-dp grade
      TextAnalysis.withReadability(docs(s, d), "text")
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"), col("fk_grade6"))
        .orderBy("doc_id")),
    "text_kn_bigram" -> ((s, d) =>
      // held-out bigram LM with INTERPOLATED KNESER-NEY (the KenLM/CCNet
      // smoothing): same train split as the stupid-backoff gate so the two
      // scores are directly comparable; unseen histories exercise the
      // continuation-only backoff path
      TextAnalysis.withKneserNeyLogProb(docs(s, d), "doc_id", "text",
        col("doc_id") % 2 === 0, discount = 0.75)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logscore"), 6).as("avg_ls6"))
        .orderBy("doc_id")),
    "text_kn_trigram" -> ((s, d) =>
      // order-3 interpolated Kneser-Ney (the KenLM shape: raw counts at
      // the top, CONTINUATION type counts below); same train split as the
      // bigram gates so the three LM scores are directly comparable
      TextAnalysis.withKneserNeyTrigramLogProb(docs(s, d), "doc_id", "text",
        col("doc_id") % 2 === 0, discount = 0.75)
        .select(col("doc_id"), col("n_trigrams"),
          round(col("avg_logscore"), 6).as("avg_ls6"))
        .orderBy("doc_id")),
    "text_gopher_rules" -> ((s, d) =>
      // the published Gopher rule set (Rae et al. 2021 A1.1) as per-rule
      // booleans + conjunction; every signal an exact int or int-ratio
      TextAnalysis.withGopherRules(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select(col("doc_id"), col("n_words"),
          round(col("mean_word_len"), 6).as("mwl6"),
          round(col("symbol_ratio"), 6).as("sym6"),
          round(col("alpha_word_frac"), 6).as("alpha6"), col("stop_hits"),
          col("r_word_count"), col("r_mean_word_len"), col("r_symbol_ratio"),
          col("r_bullet_lines"), col("r_ellipsis_lines"), col("r_alpha_words"),
          col("r_stopwords"), col("gopher_pass"))
        .orderBy("doc_id")),
    "text_gopher_full" -> ((s, d) => {
      // the COMPLETE Gopher rule set incl. the A1.2 repetition rules, over
      // a corpus with planted violations per rule family (base corpus has
      // no newlines, so line/para rules would be vacuous without them):
      // mod-7 family 0 = duplicate lines, 1 = duplicate paragraphs,
      // 2 = dominant bigram, 3 = dominant trigram; sizes chosen to trip
      // the thresholds at every doc length in the corpus (max ~100 tokens)
      val planted = SparkUtil.ensureParallelism(docs(s, d)).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            lit("\nrepeat line\nrepeat line\nrepeat line\nrepeat line")))
          .when(col("doc_id") % 7 === 1,
            concat(col("text"), lit("\n\ndup para\n\ndup para")))
          .when(col("doc_id") % 7 === 2,
            concat(col("text"), lit(" "), repeat(lit("buy now "), 40)))
          .when(col("doc_id") % 7 === 3,
            concat(col("text"), lit(" "), repeat(lit("one two three "), 60)))
          .otherwise(col("text")).as("text"))
      TextAnalysis.withGopherRulesFull(planted, "text")
        .select(col("doc_id"),
          round(col("dup_line_frac"), 6).as("dupline6"),
          round(col("dup_para_frac"), 6).as("duppara6"),
          round(col("top_bigram_frac2"), 6).as("topbi6"),
          round(col("top_trigram_frac"), 6).as("toptri6"),
          col("r_dup_lines"), col("r_dup_paras"), col("r_top_bigram"),
          col("r_top_trigram"), col("gopher_pass"), col("gopher_full_pass"))
        .orderBy("doc_id")
    }),
    "text_quality_classifier" -> ((s, d) =>
      // fastText-shape linear quality classifier (Joulin et al. 2016):
      // hashed unigram+bigram features (md5-prefix mod 4096), planted
      // weight table w[b] = (((b*37+11) mod 2001) - 1000) milli-logits,
      // bias +0.02 (chosen from the measured logit distribution so the
      // threshold actually discriminates: 310/500 pass at sf0.01) —
      // integer micro-logit sums, exact replay in DuckDB
      TextAnalysis.qualityClassifierScore(SparkUtil.ensureParallelism(docs(s, d)),
          "doc_id", "text", qualityWeights, biasMicro = 20000L)
        .select(col("doc_id"), col("n_feats"),
          round(col("logit"), 6).as("logit6"), col("quality_pass"))
        .orderBy("doc_id")),
    "pipeline_ingest_warc" -> ((s, d) => {
      // the INGESTION pipeline upstream of every curation pipeline:
      // WARC record walk → keep HTTP-200 responses → HTML-to-text
      // extraction → domain-blocklist filter on the target URI. One lazy
      // plan, every stage individually gated (src_warc_scan,
      // text_html_extract, text_url_blocklist); the oracle recomputes
      // all surviving pages in closed form from the (id, j) plant
      import s.implicits._
      val pages = graft.sources.WarcSource.extractWarcRecords(
          graft.sources.WarcSource.plantWarcPayloads(
            SparkUtil.ensureParallelism(docs(s, d)), "doc_id"))
        .where(col("rec_type") === "response" && col("http_status") === 200)
        .select((col("doc_id") * 10 + col("rec_seq") - 1).as("page_id"),
          col("target_uri"), col("body"))
      val blocklist = Seq("host3.example").toDF("domain")
      TextAnalysis.urlBlocklistFlags(
          TextAnalysis.htmlToText(pages, "body"), "page_id", "target_uri",
          blocklist)
        .where(!col("blocked"))
        .select(col("page_id"), col("host"),
          md5(col("text_extracted")).as("page_md5"),
          size(T.tokenize(col("text_extracted"))).cast("long").as("n_tokens"))
        .orderBy("page_id")
    }),
    "pipeline_ingest_warc_v2" -> ((s, d) => {
      // crawl-COMPLIANCE ingestion: v1 plus an RFC 9309 robots verdict
      // between the record walk and the blocklist — odd-indexed hosts
      // disallow /p/ for everyone, so their pages drop on robots grounds;
      // host4 then drops on blocklist grounds; survivors are hosts
      // {0, 2, 6}. Closed-form oracle over the same (id, j) plant
      import s.implicits._
      val robots = (0 until 7).map { k =>
        ("host" + k + ".example",
          if (k % 2 == 1) "User-agent: *\nDisallow: /p/\n"
          else "# open\nUser-agent: *\nDisallow:\n")
      }.toDF("rhost", "rcontent")
      val pages = graft.sources.WarcSource.extractWarcRecords(
          graft.sources.WarcSource.plantWarcPayloads(
            SparkUtil.ensureParallelism(docs(s, d)), "doc_id"))
        .where(col("rec_type") === "response" && col("http_status") === 200)
        .select((col("doc_id") * 10 + col("rec_seq") - 1).as("page_id"),
          col("target_uri"), col("body"))
      val polite = graft.sources.RobotsTxt.robotsFlags(pages, "page_id",
          "target_uri", robots, "rhost", "rcontent", userAgent = "graftbot")
        .where(col("allowed")).drop("host", "path", "allowed")
      val blocklist = Seq("host4.example").toDF("domain")
      TextAnalysis.urlBlocklistFlags(
          TextAnalysis.htmlToText(polite, "body"), "page_id", "target_uri",
          blocklist)
        .where(!col("blocked"))
        .select(col("page_id"), col("host"),
          md5(col("text_extracted")).as("page_md5"),
          size(T.tokenize(col("text_extracted"))).cast("long").as("n_tokens"))
        .orderBy("page_id")
    }),
    "pipeline_warc_index" -> ((s, d) => {
      // END-TO-END COMPOSITION (round-12 verdict task 8): the ingestion
      // stage (WARC record walk → robots verdict → blocklist → HTML
      // extraction), a curation floor (thin pages drop: last token < 3
      // chars), and the INDEX stage (MinHash fit → the round-13 persisted
      // bucket-inverted layout) chained on one staged corpus, verified at
      // the only place a user cares about — the final queryable index's
      // top-k answers, replayed end-to-end in the oracle from the closed-
      // form plant. Each execution rebuilds the chain (that IS the gate).
      import s.implicits._
      val robots = (0 until 7).map { k =>
        ("host" + k + ".example",
          if (k % 2 == 1) "User-agent: *\nDisallow: /p/\n"
          else "# open\nUser-agent: *\nDisallow:\n")
      }.toDF("rhost", "rcontent")
      val pages = graft.sources.WarcSource.extractWarcRecords(
          graft.sources.WarcSource.plantWarcPayloads(
            SparkUtil.ensureParallelism(docs(s, d)), "doc_id"))
        .where(col("rec_type") === "response" && col("http_status") === 200)
        .select((col("doc_id") * 10 + col("rec_seq") - 1).as("page_id"),
          col("target_uri"), col("body"))
      val polite = graft.sources.RobotsTxt.robotsFlags(pages, "page_id",
          "target_uri", robots, "rhost", "rcontent", userAgent = "graftbot")
        .where(col("allowed")).drop("host", "path", "allowed")
      val ingested = TextAnalysis.urlBlocklistFlags(
          TextAnalysis.htmlToText(polite, "body"), "page_id", "target_uri",
          Seq("host4.example").toDF("domain"))
        .where(!col("blocked"))
        .select(col("page_id"), col("text_extracted").as("text"))
      val curated = ingested
        .where(length(element_at(T.tokenize(col("text")), -1)) >= 3)
      val table = "graft_warc_index_" + d.replaceAll("[^A-Za-z0-9]", "_")
        .toLowerCase(java.util.Locale.ROOT)
      IndexStore.reset(s, table)
      val model = new MinHashLSH(cfg16).fit(curated, "page_id", "text")
      model.saveInvertedIndex(table)
      val out = model
        .approxNearestNeighborsIndexed(table, "page 2 section 0 xxx", 5)
        .withColumnRenamed(Cols.Id, "page_id")
      out
    }),
    "text_dsir_weights" -> ((s, d) =>
      // DSIR importance weights toward the English slice: hashed-unigram
      // (md5-prefix mod 1024) target/source log-ratio, micro-nat exact sum
      TextAnalysis.dsirImportanceWeights(docs(s, d), "doc_id", "text",
        col("lang") === "en", buckets = 1024)
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_weight"), 6).as("log_w6"),
          round(col("avg_log_weight"), 6).as("avg_log_w6"))
        .orderBy("doc_id")),
    "text_mix_weights" -> ((s, d) =>
      // temperature-scaled domain sampling weights (alpha = 0.5 upsamples
      // small domains) over the corpus `source` column
      TextAnalysis.domainMixWeights(docs(s, d), "source", alpha = 0.5)
        .select(col("domain"), col("n"), round(col("p"), 6).as("p6"),
          round(col("weight"), 6).as("w6"))
        .orderBy("domain")),
    "text_mix_sample" -> ((s, d) =>
      // APPLY the domain mixture: deterministic hash-threshold sampling at
      // rate min(1, w_d*N/n_d) per domain — per-domain kept counts + rates
      TextAnalysis.sampleToMixture(docs(s, d), "doc_id", "source", alpha = 0.5)
        .groupBy(col("source").as("domain"))
        .agg(count(lit(1)).as("n_kept"),
          round(first(col("sample_rate")), 6).as("rate6"))
        .orderBy("domain")),
    "text_repetition" -> ((s, d) =>
      // Gopher-style repetition signals; exact small-int ratios, rounded
      TextAnalysis.withRepetitionMetrics(
          SparkUtil.ensureParallelism(docs(s, d)), "doc_id", "text")
        .select(col("doc_id"),
          round(col("top_unigram_frac"), 6).as("top_unigram_frac"),
          round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
          round(col("dup_bigram_frac"), 6).as("dup_bigram_frac"))
        .orderBy("doc_id")),
    "text_boilerplate" -> ((s, d) =>
      // cross-document segment dedup (line-dedup with fixed token windows
      // standing in for lines); cleaned text emitted as md5
      TextAnalysis.removeBoilerplate(SparkUtil.ensureParallelism(docs(s, d)),
          "doc_id", "text", segTokens = 10, minDocs = 2)
        .select(col("doc_id"), col("n_segs"), col("n_dropped"),
          md5(col("text_clean")).as("clean_md5"))
        .orderBy("doc_id")),
    "text_bm25_scores" -> ((s, d) =>
      // full-text BM25 relevance of every matching doc against the query
      // key; rounded scores, doc_id order (a top-k cut on unrounded doubles
      // could flip near-ties between engines)
      TextSearch.bm25Scores(docs(s, d), "doc_id", "text", keyOf(s, d))
        .select(col("id").as("doc_id"), round(col("score"), 6).as("score6"))
        .orderBy("doc_id")),
    "text_phrase_search" -> ((s, d) => {
      // positional phrase query over planted suffixes: the %10==4 sliver
      // carries TWO occurrences, %5==2 one, %5==3 a near-miss prefix that
      // must NOT match; mixed-case query exercises the shared tokenizer
      val planted = docs(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 10 === 4, lit(" alpha beta gamma alpha beta gamma"))
            .when(col("doc_id") % 5 === 2, lit(" zeta alpha beta gamma"))
            .when(col("doc_id") % 5 === 3, lit(" alpha beta delta"))
            .otherwise(lit(""))).as("text"))
      TextSearch.phraseMatches(planted, "doc_id", "text", "Alpha BETA gamma")
        .select(col("id").as("doc_id"), col("n_matches"), col("first_pos"))
        .orderBy("doc_id")
    }),
    "text_phrase_batch" -> ((s, d) => {
      // a query WORKLOAD in one postings pass: three phrases of mixed
      // length over the same planted suffixes as text_phrase_search —
      // per-phrase semantics must equal the single-query operator
      val planted = docs(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 10 === 4, lit(" alpha beta gamma alpha beta gamma"))
            .when(col("doc_id") % 5 === 2, lit(" zeta alpha beta gamma"))
            .when(col("doc_id") % 5 === 3, lit(" alpha beta delta"))
            .otherwise(lit(""))).as("text"))
      TextSearch.phraseMatchesBatch(planted, "doc_id", "text",
          Seq("alpha beta gamma", "zeta alpha beta", "gamma alpha"))
        .select(col("phrase_id"), col("id").as("doc_id"), col("n_matches"),
          col("first_pos"))
        .orderBy("phrase_id", "doc_id")
    }),
    "text_hybrid_rrf" -> ((s, d) =>
      // hybrid lexical+vector retrieval: BM25 over the flagship query key
      // fused with embedding-cosine ranks (vec_id ≡ doc_id — the two
      // modalities of one corpus) by reciprocal rank fusion at k=60
      TextSearch.hybridRrfTopK(docs(s, d), "doc_id", "text", keyOf(s, d),
          tbl(s, d, "embeddings"), "vec_id", "embedding", queryId = 0L,
          k = 10, perList = 50)
        .select(col("id").as("doc_id"), col("rank_text"), col("rank_vec"),
          col("rrf"))
        .orderBy("doc_id")),
    "text_fingerprint" -> ((s, d) =>
      TextAnalysis.withFingerprints(SparkUtil.ensureParallelism(docs(s, d)), "text")
        .select("doc_id", "bag_fingerprint", "seq_fingerprint").orderBy("doc_id")),

    // --- the composed curation pipeline: what a training-data run does
    "pipeline_curate" -> ((s, d) => {
      val dd = docs(s, d)
      val exact = Dedup.dropExactDuplicates(dd, "doc_id", "text").select("doc_id")
      val q = TextAnalysis.withQualityScore(TextAnalysis.withLangId(dd, "text"), "text")
        .where(col("quality_score") >= 0.75 && col("lang_pred") =!= "und")
        .select("doc_id")
      val nearDupLosers = fitted(s, d, cfg16).approxSimilarityJoin(0.5)
        .select(col("b_id").as("doc_id")).distinct()
      q.join(exact, Seq("doc_id"))
        .join(nearDupLosers, Seq("doc_id"), "left_anti")
        .orderBy("doc_id")
    }),

    "pipeline_curate_incremental" -> ((s, d) => {
      // incremental curation maintenance: when a change feed hits a
      // curated corpus, quality re-scoring touches ONLY the feed's
      // winners — carried-over rows are decided by key alone (valid
      // because the quality rubric is a pure per-row function). The
      // oracle recomputes the FULL pipeline over the applied snapshot;
      // agreement is exactly the incremental-maintenance correctness
      // claim. At scale, re-scoring cost ∝ feed, not corpus.
      val dd = docs(s, d).select(col("doc_id"), col("text"))
      def chg(pred: org.apache.spark.sql.Column, seq: Int, op: String,
          key: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column): DataFrame =
        dd.where(pred).select(key.as("doc_id"), lit(seq.toLong).as("seq"),
          lit(op).as("op"), text.as("text"))
      val changes =
        chg(col("doc_id") % 10 === 0, 1, "U", col("doc_id"),
            concat(col("text"), lit(" update v2")))
          .unionByName(chg(col("doc_id") % 20 === 0, 2, "U", col("doc_id"),
            concat(col("text"), lit(" update v3"))))
          .unionByName(chg(col("doc_id") % 7 === 3, 3, "D", col("doc_id"),
            col("text")))
          .unionByName(chg(col("doc_id") % 13 === 1, 1, "I",
            col("doc_id") + 1000000000L,
            concat(col("text"), lit(" inserted fresh sample"))))
      val latest = changes.groupBy(col("doc_id"))
        .agg(max_by(struct(col("op"), col("text")),
          struct(col("seq"), col("op"))).as("__l"))
        .select(col("doc_id"), col("__l.op").as("op"), col("__l.text").as("text"))
        .transform(SparkUtil.scopedPersist)
      val curatedBase = TextAnalysis.withQualityScore(dd, "text")
        .where(col("quality_score") >= 0.75).select("doc_id")
      val scoredWinners = TextAnalysis
        .withQualityScore(latest.where(col("op") =!= "D"), "text")
        .where(col("quality_score") >= 0.75).select("doc_id")
      curatedBase.join(latest.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(scoredWinners)
        .orderBy("doc_id")
    }),
    // --- streaming twin + multimodal plumbing
    // Engine API emits (timestamp, decimal); the gate queries normalize to
    // (UTC string, double) — DuckDB timestamps are naive while Spark's are
    // UTC-adjusted instants, and the comparator hashes the rendered value.
    "stream_tumbling_agg" -> ((s, d) =>
      EventStream.tumblingCounts(events(s, d))
        .orderBy("window_start", "event_type")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value").cast("double").as("total_value"))),
    "stream_session_agg" -> ((s, d) =>
      EventStream.sessionCounts(events(s, d))
        .orderBy("user_id", "session_start")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n"), col("total_value").cast("double").as("total_value"))),
    "stream_sliding_agg" -> ((s, d) =>
      EventStream.slidingCounts(events(s, d))
        .orderBy("window_start", "event_type")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value").cast("double").as("total_value"))),
    "stream_join" -> ((s, d) =>
      // batch twin of the stream-stream interaction join
      EventStream.purchasesNearErrors(events(s, d))
        .orderBy("err_id", "p_id")),
    "stream_join_real" -> ((s, d) => {
      // REAL stream-stream inner join: two watermarked file-source streams
      // joined on user_id + event-time bounds, drained to a memory sink
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stagedEventsRaw(s, d)
      val raw = s.read.parquet(tmp)
      // a stream-stream join materializes one state store per shuffle
      // partition per side per micro-batch — size the partition count to
      // the stream (the filtered error/purchase rows), not the session
      // default; the setting is pinned at query START
      val query = withStatePartitions(s) {
        EventStream.streamingPurchasesNearErrors(s, tmp, raw.schema)
          .writeStream.format("memory").queryName("graft_stream_join_gate")
          .outputMode("append").start()
      }
      try query.processAllAvailable() finally query.stop()
      s.table("graft_stream_join_gate").orderBy("err_id", "p_id")
    }),
    "stream_topk" -> ((s, d) =>
      // per-type running top-5 events by value — the custom bounded-heap
      // aggregate in a plain batch aggregation (twin of stream_topk_real)
      events(s, d)
        .groupBy("event_type")
        .agg(graft.functions.TopKAgg.topK(col("value"), col("event_id"), 5).as("__tk"))
        .select(col("event_type"), posexplode(col("__tk")).as(Seq("__r0", "__e")))
        .select(col("event_type"), (col("__r0") + 1).cast("long").as("rank"),
          col("__e.id").as("event_id"), round(col("__e.score"), 6).as("value6"))
        .orderBy("event_type", "rank")),
    "stream_topk_real" -> ((s, d) => {
      // the SAME top-k aggregation through real Structured Streaming in
      // complete mode — the TypedImperativeAggregate's serialize/merge path
      // IS the streaming state round-trip, exercised by the state store
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stagedEventsRaw(s, d)
      val raw = s.read.parquet(tmp)
      val stream = s.readStream.schema(raw.schema).parquet(tmp)
        .select(col("event_type"), col("event_id"), col("value"))
      val query = withStatePartitions(s) {
        stream
          .groupBy("event_type")
          .agg(graft.functions.TopKAgg.topK(col("value"), col("event_id"), 5).as("__tk"))
          .writeStream.format("memory").queryName("graft_stream_topk_gate")
          .outputMode("complete").start()
      }
      try query.processAllAvailable() finally query.stop()
      s.table("graft_stream_topk_gate")
        .select(col("event_type"), posexplode(col("__tk")).as(Seq("__r0", "__e")))
        .select(col("event_type"), (col("__r0") + 1).cast("long").as("rank"),
          col("__e.id").as("event_id"), round(col("__e.score"), 6).as("value6"))
        .orderBy("event_type", "rank")
    }),
    "stream_tumbling_real" -> ((s, d) => {
      // the SAME aggregation as stream_tumbling_agg, but executed through
      // the real Structured Streaming machinery: file source → watermark →
      // windowed agg → memory sink, drained with processAllAvailable. The
      // gate thereby checks actual micro-batch execution, not just the
      // batch twin's expressions.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stagedEventsRaw(s, d)
      val raw = s.read.parquet(tmp)
      val query = withStatePartitions(s) {
        EventStream.streamingTumblingCounts(s, tmp, raw.schema)
          .writeStream.format("memory").queryName("graft_tumbling_gate")
          .outputMode("complete").start()
      }
      try query.processAllAvailable() finally query.stop()
      s.table("graft_tumbling_gate")
        .orderBy("window_start", "event_type")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value").cast("double").as("total_value"))
    }),
    "stream_sessionize" -> ((s, d) => {
      // flatMapGroupsWithState sessionizer (per-event session numbers —
      // what session_window cannot emit), batch mode; micros units so the
      // strict-gap boundary matches the oracle exactly
      import s.implicits._
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMillis"))
        .as[graft.streaming.SessionEvent]
      graft.streaming.Sessionizer.assignSessions(ev, 30L * 60 * 1000000L).toDF()
        .select(col("user_id"), col("event_id"),
          col("session_seq").cast("long").as("session_seq"))
        .orderBy("user_id", "event_id")
    }),
    "stream_dedup_real" -> ((s, d) => {
      // the stateful dropDuplicates path through REAL streaming execution
      // (file source → state store → append-mode memory sink). Input is
      // pre-sorted by event time into one file so first-ARRIVAL semantics
      // coincide with the deterministic first-event-time oracle — which
      // requires the file to stay ONE input split (a split boundary would
      // race same-key rows through the shuffle); maxPartitionBytes is
      // raised so the property holds at any driver scale factor.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the one-split override is scoped to THIS gate's streaming read and
      // restored after the query drains — a session-level leak would bleed
      // into every later gate/bench query in the same session
      val prevMpb = s.conf.getOption("spark.sql.files.maxPartitionBytes")
      s.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
      val tmp = stageOnce(s, d, "graft-stream-dedup") { t =>
        events(s, d).orderBy("ts", "event_id").coalesce(1)
          .write.mode("overwrite").parquet(t)
      }
      val sorted = s.read.parquet(tmp)
      val query = withStatePartitions(s) {
        s.readStream.schema(sorted.schema).parquet(tmp)
          .dropDuplicates("user_id", "event_type")
          .writeStream.format("memory").queryName("graft_dedup_gate")
          .outputMode("append").start()
      }
      try query.processAllAvailable() finally {
        query.stop()
        prevMpb match {
          case Some(v) => s.conf.set("spark.sql.files.maxPartitionBytes", v)
          case None => s.conf.unset("spark.sql.files.maxPartitionBytes")
        }
      }
      s.table("graft_dedup_gate")
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value").cast("double").as("value"))
        .orderBy("user_id", "event_type")
    }),
    "stream_url_dedup_real" -> ((s, d) => {
      // the crawl frontier as a STREAM: canonical-URL dedup through real
      // streaming execution — stateful dropDuplicates keyed on the md5 of
      // the canonicalized URL (the state store holds 16-byte keys, never
      // URL text). Input is pre-sorted by doc_id into ONE split so
      // first-arrival coincides with keep-min, making the batch
      // dedup_url_keyed oracle replay exactly.
      // scoped override, restored after the query drains (see
      // stream_dedup_real) — never leaked into later queries
      val prevMpb = s.conf.getOption("spark.sql.files.maxPartitionBytes")
      s.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
      val tmp = stageOnce(s, d, "graft-stream-urldedup") { t =>
        plantedUrls(s, d).orderBy("doc_id").coalesce(1)
          .write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = withStatePartitions(s) {
        s.readStream.schema(schema).parquet(tmp)
          .withColumn("url_canon", TextAnalysis.canonicalizeUrl(col("raw_url")))
          .withColumn("__k", md5(col("url_canon")))
          .dropDuplicates("__k")
          .select(col("doc_id"), col("url_canon"))
          .writeStream.format("memory").queryName("graft_url_dedup_gate")
          .outputMode("append").start()
      }
      try q.processAllAvailable() finally {
        q.stop()
        prevMpb match {
          case Some(v) => s.conf.set("spark.sql.files.maxPartitionBytes", v)
          case None => s.conf.unset("spark.sql.files.maxPartitionBytes")
        }
      }
      s.table("graft_url_dedup_gate").orderBy("doc_id")
    }),
    "stream_semantic_dedup_real" -> ((s, d) => {
      // ingest-time SEMANTIC dedup as a stream (the online half of the
      // SemDeDup family): arrivals carry the pinned closed-form seed-cell
      // assignment (plan-literal centroids, stateless projection), and a
      // per-cell flatMapGroupsWithState drops any vector within cosine
      // 0.35 of a SMALLER-ID vector already seen in its cell. The
      // smaller-id rule (not arrival order) + an id-ordered staged log (4
      // range files, trigger order pinned by modification time) make the
      // decision a pure function of the corpus — the oracle replays it as
      // one NOT EXISTS
      import s.implicits._
      val emb = tbl(s, d, "embeddings")
      val model = SimSearch.trainIvf(emb, "vec_id", "embedding",
        nLists = 8, iters = 0)
      val cents = typedlit(model.centroids)
      val n = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      val tmp = stageOnce(s, d, "graft-stream-semdedup") { t =>
        val dir = new java.io.File(t)
        (0 until 4).foreach { i =>
          emb.where(col("vec_id") >= i * n / 4 && col("vec_id") < (i + 1) * n / 4)
            .orderBy("vec_id").coalesce(1)
            .write.mode(if (i == 0) "overwrite" else "append").parquet(t)
          // pin trigger order to the id ranges: FileStreamSource orders
          // new files by modification time. Fresh files carry a current
          // (≫ 2023) mtime; already-stamped ones sit at the 2020-epoch
          // base and must not be restamped
          dir.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .filter(_.lastModified() > 1700000000000L)
            .foreach(_.setLastModified(1600000000000L + i * 60000L))
        }
      }
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val arrivals = src.select(col("vec_id").cast("long").as("vec_id"),
          SimSearch.pinnedCellsExpr(col("embedding"), cents, 8, 1)
            .getItem(0).as("cell"),
          col("embedding").as("vec"))
        .as[graft.streaming.EmbeddingArrival]
      val q = withStatePartitions(s) {
        graft.streaming.SemanticDedupStream.dedupArrivals(arrivals, 0.35)
          .toDF().writeStream.format("memory")
          .queryName("graft_sem_dedup").outputMode("append").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.table("graft_sem_dedup")
        .select(col("vec_id"), col("cell"), col("kept"))
        .orderBy("vec_id")
    }),
    "stream_ivf_update_real" -> ((s, d) => {
      // embedding-index maintenance as a STREAM: train IVF-PQ in batch
      // (the offline fit), then stream the corpus back one file per
      // micro-batch and encode each arrival with the FROZEN model —
      // cell assignment + PQ codes are plan-literal expressions, a
      // stateless narrow projection (no state store; the bounded
      // codebook rides in the plan), so the appended index must equal
      // the batch encode EXACTLY regardless of micro-batch boundaries.
      // Codebooks are engine-internal doubles, so the gate contract is
      // the per-id agreement boolean (the ann_mode_agreement pattern).
      // Small model on purpose: the claim is frozen-model AGREEMENT
      // (any codebook exercises it identically); recall quality is
      // sim_recall_pq/_rerank's job with the production-sized model
      val emb = tbl(s, d, "embeddings")
      val model = SimSearch.trainIvfPq(emb, "vec_id", "embedding",
        nLists = 8, m = 8, ks = 16)
      val tmp = stageOnce(s, d, "graft-stream-ivf") { t =>
        emb.select("vec_id", "embedding").repartition(4)
          .write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = SimSearch.pqEncodeNew(model, src, "vec_id", "embedding")
        .writeStream.format("memory").queryName("graft_ivf_update")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = s.table("graft_ivf_update")
        .select(col("id"), col("cell").as("s_cell"), col("codes").as("s_codes"))
      model.encoded.join(streamed, Seq("id"))
        .select(col("id").as("vec_id"),
          (col("cell") === col("s_cell")).as("cell_matches"),
          (col("codes") === col("s_codes")).as("codes_match"))
        .orderBy("vec_id")
    }),
    "stream_html_extract_real" -> ((s, d) => {
      // WARC-era ingestion lifts to streams unchanged: HTML-to-text is a
      // STATELESS narrow projection, so real micro-batch execution
      // (4 files → 4 triggers, append-mode memory sink) must equal the
      // batch text_html_extract gate regardless of batch boundaries —
      // the oracle is the identical regex-chain replay
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stagedDocs4(s, d)
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val planted = src.select(col("doc_id"),
        concat(lit("<html><head><title>t"), col("doc_id").cast("string"),
          lit("</title><style>p {color: red}</style></head><body><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><!-- hidden --><p>"), col("text"),
          lit("</p><script>var x = 1 < 2 && y > 0;</script>" +
            "<p>tail &amp; fin &lt;ok&gt;</p>" +
            "<a href=\"/x\">link</a></body></html>")).as("html"))
      val q = TextAnalysis.htmlToText(planted, "html")
        .select(col("doc_id"), col("n_links"),
          md5(col("text_extracted")).as("extract_md5"))
        .writeStream.format("memory").queryName("graft_html_gate")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_html_gate").orderBy("doc_id")
    }),
    "stream_gopher_real" -> ((s, d) => {
      // quality filtering lifts to streams unchanged: the Gopher rules are
      // a STATELESS narrow projection, so real micro-batch execution
      // (4 files → 4 triggers, append-mode memory sink) must equal the
      // batch computation regardless of micro-batch boundaries
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stagedDocs4(s, d)
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = TextAnalysis.withGopherRules(src, "text")
        .select(col("doc_id"), col("n_words"), col("r_word_count"),
          col("stop_hits"))
        .writeStream.format("memory").queryName("graft_gopher_gate")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_gopher_gate").orderBy("doc_id")
    }),
    "stream_mojibake_real" -> ((s, d) => {
      // crawl cleanup lifts to streams unchanged: mojibake repair is a
      // STATELESS narrow projection, so real micro-batch execution
      // (4 files → 4 triggers, append-mode memory sink) must equal the
      // batch text_mojibake_repair gate — the same planted corruption is
      // baked into the staged files and the oracle recomputes the same
      // clean-text md5
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val suffix = " café déjà’vu — æøå"
      val tmp = stageOnce(s, d, "graft-stream-mojibake") { t =>
        docs(s, d).select(col("doc_id"),
            concat(col("text"), lit(suffix)).as("text"))
          .withColumn("text",
            when(col("doc_id") % 3 === 0,
              decode(encode(col("text"), "UTF-8"), "ISO-8859-1"))
              .otherwise(col("text")))
          .repartition(4)
          .write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = TextAnalysis.repairMojibake(src, "text")
        .select(col("doc_id"), col("was_repaired"),
          md5(col("text_fixed")).as("fixed_md5"))
        .writeStream.format("memory").queryName("graft_mojibake_gate")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_mojibake_gate").orderBy("doc_id")
    }),
    "stream_cms_real" -> ((s, d) => {
      // sketch maintenance lifts to streams: COMPLETE-mode aggregation
      // keeps one 32 KB matrix in the state store and merges each
      // micro-batch's partial by elementwise addition (associative +
      // commutative), so the final streamed sketch must equal the batch
      // sketch EXACTLY regardless of micro-batch boundaries — same
      // estimates, same oracle as `agg_cms_heavy`
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stagedDocs4(s, d)
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = withStatePartitions(s) {
        src.select(explode(T.tokenize(col("text"))).as("token"))
          .agg(graft.functions.Sketches.countMinAgg(col("token"), 4, 1024)
            .as("sk"))
          .writeStream.format("memory").queryName("graft_cms_gate")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      val toks = docs(s, d)
        .select(explode(T.tokenize(col("text"))).as("token"))
        .transform(SparkUtil.scopedPersist)
      cmsHeavyHitters(toks, s.table("graft_cms_gate"), depth = 4, width = 1024)
    }),
    "stream_psi_real" -> ((s, d) => {
      // drift monitoring as a STREAM: the shifted snapshot arrives as a
      // file stream, complete-mode bucket counts (state = 6 cells) are
      // fused batch-side with the static reference distribution into the
      // same PSI terms as agg_psi_drift — the oracle is shared verbatim
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stageOnce(s, d, "graft-stream-psi") { t =>
        docs(s, d).select(col("doc_id"),
            when(col("doc_id") % 3 === 0, concat(col("text"), lit(" "), col("text")))
              .otherwise(col("text")).as("text"))
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      def bucketOf(v: org.apache.spark.sql.Column) =
        when(v < 20.0, 0).when(v < 40.0, 1).when(v < 60.0, 2)
          .when(v < 80.0, 3).when(v < 120.0, 4).otherwise(5)
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = withStatePartitions(s) {
        src
          .select(bucketOf(size(T.tokenize(col("text"))).cast("double")).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_b"))
          .writeStream.format("memory").queryName("graft_psi_gate")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      val aCounts = docs(s, d)
        .select(bucketOf(size(T.tokenize(col("text"))).cast("double")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_a"))
      val spine = s.range(0, 6).select(col("id").cast("int").as("bucket"))
      val w1 = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      spine.join(aCounts, Seq("bucket"), "left")
        .join(s.table("graft_psi_gate"), Seq("bucket"), "left")
        .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
        .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
        .withColumn("__pa", (col("n_a") + 1).cast("double") /
          (sum(col("n_a")).over(w1) + 6))
        .withColumn("__pb", (col("n_b") + 1).cast("double") /
          (sum(col("n_b")).over(w1) + 6))
        .select(col("bucket"), col("n_a"), col("n_b"),
          round((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")), 6)
            .as("term6"))
        .orderBy("bucket")
    }),
    "stream_centroid_real" -> ((s, d) => {
      // feature-store maintenance as a STREAM: per-(label, dim) running
      // sums in complete mode (state = labels × dims cells, the bounded
      // sketch shape) rebuilt into micro-quantized centroids batch-side —
      // must equal the batch centroid stats exactly because the
      // micro-rounding absorbs partial-order double noise (the
      // sim_label_stats determinism convention)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stageOnce(s, d, "graft-stream-centroid") { t =>
        tbl(s, d, "embeddings").select("vec_id", "label", "embedding")
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = withStatePartitions(s) {
        src.select(col("label").cast("long").as("l"),
            posexplode(transform(col("embedding"), x => x.cast("double")))
              .as(Seq("d0", "x")))
          .groupBy("l", "d0")
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
          .writeStream.format("memory").queryName("graft_centroid_gate")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.table("graft_centroid_gate")
        .withColumn("sm", round(col("sx") * 1e6).cast("long"))
        .groupBy("l")
        .agg(max(col("n")).as("n_vecs"),
          array_sort(collect_list(struct(col("d0").as("d"), col("sm").as("sm"))))
            .as("pairs"))
        .withColumn("c", transform(col("pairs"),
          s0 => s0.getField("sm").cast("double") / 1e6 / col("n_vecs")))
        .select(col("l").as("label"), col("n_vecs"),
          round(sqrt(aggregate(col("c"), lit(0.0), (a, x) => a + x * x)), 6)
            .as("centroid_norm6"))
        .orderBy("label")
    }),
    "stream_constraint_real" -> ((s, d) => {
      // data contracts on STREAMS: the same planted violations as
      // agg_constraint_report monitored by three streaming queries —
      // (a) complete-mode conditional counts (not-null + predicate, one
      //     agg row of state), (b) complete-mode per-key counts whose
      //     batch rollup is the unique-violation total (state = one long
      //     per distinct key, the dedup-state shape), (c) stream-static
      //     LEFT OUTER against the customer dim + null-probe count
      //     (referential; stream-static anti joins are unsupported, the
      //     outer+filter form is the documented equivalent). Together
      //     they replay the batch oracle exactly.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = stageOnce(s, d, "graft-stream-dq") { t =>
        val base = tbl(s, d, "orders")
        val mutated = base.select(
          col("o_orderkey"),
          when(col("o_orderkey") % 41 === 0, col("o_custkey") + 900000000L)
            .otherwise(col("o_custkey")).as("o_custkey"),
          when(col("o_orderkey") % 89 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 73 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        mutated.unionAll(mutated.where(col("o_orderkey") % 97 === 0))
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      def src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val (q1, q2, q3) = withStatePartitions(s) {
        val a = src.agg(
            count(when(col("o_orderstatus").isNull, 1)).as("nn"),
            count(when(!coalesce(col("o_totalprice") > 0, lit(false)), 1)).as("pp"))
          .writeStream.format("memory").queryName("graft_dq_counts")
          .outputMode("complete").start()
        val b = src.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .writeStream.format("memory").queryName("graft_dq_keys")
          .outputMode("complete").start()
        val c = src.select(col("o_custkey").as("__k")).where(col("__k").isNotNull)
          .join(tbl(s, d, "customer").select(col("c_custkey").as("__k"))
            .distinct().withColumn("__hit", lit(1)), Seq("__k"), "left_outer")
          .where(col("__hit").isNull)
          .agg(count(lit(1)).as("orphans"))
          .writeStream.format("memory").queryName("graft_dq_ref")
          .outputMode("complete").start()
        (a, b, c)
      }
      try {
        q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
      } finally { q1.stop(); q2.stop(); q3.stop() }
      val cnts = s.table("graft_dq_counts")
      val uniq = s.table("graft_dq_keys")
        .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n"))
      val ref = s.table("graft_dq_ref")
      cnts.select(lit("check:totalprice_positive").as("check_name"),
          col("pp").as("n_violations"))
        .unionAll(cnts.select(lit("not_null:o_orderstatus"), col("nn")))
        .unionAll(ref.select(lit("ref:o_custkey->c_custkey"), col("orphans")))
        .unionAll(uniq.select(lit("unique:o_orderkey"), col("n")))
        .orderBy("check_name")
    }),
    "stream_decontam_real" -> ((s, d) => {
      // train-test overlap scrubbing on a LIVE ingest stream: the corpus
      // slice streams in one file per trigger, each micro-batch runs the
      // stream-static decontamination against the broadcast benchmark
      // (no state store — the bench side is static), per-batch results
      // are eagerly materialized (localCheckpoint) and unioned. k=4
      // shingles (the realistic n-gram size): on this corpus 2-shingles
      // contaminate everything (vacuous scrub), 4-shingles leave a real
      // two-sided split (49 contaminated / 426 surviving at sf0.01)
      val tmp = stageOnce(s, d, "graft-stream-decon") { t =>
        docs(s, d).where(col("doc_id") % 20 =!= 0).select("doc_id", "text")
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val bench = docs(s, d).where(col("doc_id") % 20 === 0)
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val acc = new java.util.concurrent.atomic.AtomicReference[Option[DataFrame]](None)
      val q = graft.streaming.StreamingIndex.streamingDecontaminate(
          src, "doc_id", "text", bench, "text", k = 4) { survivors =>
        val m = survivors
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .localCheckpoint(true)
        acc.updateAndGet(p => Some(p.map(_.unionAll(m)).getOrElse(m)))
        ()
      }
      try q.processAllAvailable() finally q.stop()
      acc.get.getOrElse(s.emptyDataFrame).orderBy("doc_id")
    }),
    "stream_retention_real" -> ((s, d) => {
      // cohort retention maintained on a STREAM: complete-mode
      // (user, week) counts — state = one long per active cell, the
      // distinct-activity frame itself — then the batch-side cohort
      // join/rollup over the final state table (cohort = min active week,
      // identical to first-event week); shares the batch oracle verbatim
      val tmp = stageOnce(s, d, "graft-stream-retention") { t =>
        events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = withStatePartitions(s) {
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(tmp)
          .groupBy("user_id", "week").agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName("graft_retention_state")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      val active = s.table("graft_retention_state").select("user_id", "week")
      // rebind one side: MemoryPlan self-joins carry conflicting attribute
      // ids (the per-round rebind convention from Graphs)
      val activeR = s.createDataFrame(active.rdd, active.schema)
      val firsts = activeR.groupBy("user_id").agg(min(col("week")).as("cohort"))
      active.join(firsts, Seq("user_id"))
        .withColumn("offset_weeks",
          (datediff(col("week"), col("cohort")) / 7).cast("long"))
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    }),
    "stream_exif_real" -> ((s, d) => {
      // EXIF extraction on a STREAM of media payloads: the byte walk is a
      // stateless narrow mapPartitions, so real micro-batch execution
      // (append-mode memory sink, one file per trigger) must reproduce
      // the batch mm_exif_parse rows regardless of batch boundaries
      val tmp = stageOnce(s, d, "graft-stream-exif") { t =>
        Multimodal.plantExifPayloads(docs(s, d), "doc_id")
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val q = Multimodal.extractExif(src).toDF()
        .writeStream.format("memory").queryName("graft_exif_stream")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_exif_stream").orderBy("doc_id")
    }),
    "stream_cusum_real" -> ((s, d) => {
      // CUSUM burst monitoring on a STREAM: complete-mode (user, bucket)
      // counts — state = one long per active (key, bucket) cell, the
      // PSI-monitor shape — then the batch-side closed-form CUSUM walk
      // over the final counts table; replays the ts_cusum_alarms oracle
      // verbatim (same planted burst)
      val tmp = stageOnce(s, d, "graft-stream-cusum") { t =>
        val ev = events(s, d)
        val burst = ev.where(col("event_id") % 7 === 0)
          .select(col("event_id"), lit(99999L).as("user_id"),
            expr("timestamp '2024-01-05 00:00:00' + " +
              "make_interval(0, 0, 0, 0, cast(event_id % 3 as int), 0, 0)").as("ts"))
        ev.select("event_id", "user_id", "ts").unionByName(burst)
          .select(col("user_id"),
            expr("unix_timestamp(ts) div 21600").as("bucket"))
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = withStatePartitions(s) {
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(tmp)
          .groupBy("user_id", "bucket").agg(count(lit(1)).as("cnt"))
          .writeStream.format("memory").queryName("graft_cusum_counts")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      val w = Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.table("graft_cusum_counts")
        .withColumn("__p", sum(col("cnt") - 3L).over(w))
        .withColumn("cusum", col("__p") - least(lit(0L), min(col("__p")).over(w)))
        .where(col("cusum") > 8L)
        .select(col("user_id"), col("bucket"), col("cnt"), col("cusum"))
        .orderBy("user_id", "bucket")
    }),
    "stream_k_anonymity_real" -> ((s, d) => {
      // k-anonymity monitored on a STREAM: one complete-mode count per
      // quasi-identifier class (state = one long per class, the bounded
      // dedup-state shape), batch rollup = the dq_k_anonymity summary —
      // shares that gate's oracle verbatim
      val tmp = stageOnce(s, d, "graft-stream-kanon") { t =>
        tbl(s, d, "customer").select("c_nationkey", "c_mktsegment")
          .repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = withStatePartitions(s) {
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(tmp)
          .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName("graft_kanon_classes")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.table("graft_kanon_classes")
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("violating_classes"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).as("rows_at_risk"),
          min(col("n")).as("min_class_size"),
          max(col("n")).as("max_class_size"))
        .select(lit(5L).as("k"), col("n_classes"), col("violating_classes"),
          col("rows_at_risk"), col("min_class_size"), col("max_class_size"))
    }),
    "stream_scd2_real" -> ((s, d) => {
      // type-2 history maintenance as a STREAM: flatMapGroupsWithState
      // detects attribute transitions with one string of state per key
      // (never buffering events); interval closing is retrospective, so
      // the batch step closes the streamed transition log with a lead
      // window — together they replay the cdc_scd2 oracle exactly. Input
      // is pre-sorted by event time into ONE split (the append-log
      // contract; a split boundary would race same-key rows).
      import s.implicits._
      val prevMpb = s.conf.getOption("spark.sql.files.maxPartitionBytes")
      s.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
      val tmp = stageOnce(s, d, "graft-stream-scd2") { t =>
        events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tsMicros"), col("event_type").as("attr"))
          .orderBy("tsMicros", "event_id").coalesce(1)
          .write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = withStatePartitions(s) {
        graft.streaming.ScdStream.transitions(
            s.readStream.schema(schema).parquet(tmp).as[graft.streaming.AttrEvent])
          .toDF()
          .writeStream.format("memory").queryName("graft_scd2_gate")
          .outputMode("append").start()
      }
      try q.processAllAvailable() finally {
        q.stop()
        prevMpb match {
          case Some(v) => s.conf.set("spark.sql.files.maxPartitionBytes", v)
          case None => s.conf.unset("spark.sql.files.maxPartitionBytes")
        }
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("valid_from", "event_id")
      s.table("graft_scd2_gate")
        .select(col("user_id"), col("event_id"), col("attr").as("event_type"),
          timestamp_micros(col("tsMicros")).as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "valid_from", "event_id")
    }),
    "stream_cdc_apply_real" -> ((s, d) => {
      // CDC apply lifts to streams (materialized-view maintenance): the
      // cdc_apply_changes feed round-trips into 4 parquet files and
      // streams back one file per micro-batch; a COMPLETE-mode
      // groupBy(key).max_by aggregation keeps exactly one (key, winner)
      // row per changed key in the state store — max over (seq, op) is
      // associative+commutative, so the final state is invariant to
      // micro-batch boundaries and the batch oracle replays exactly.
      // The base snapshot never enters the stream: it joins the final
      // state in one batch step, as an incremental pipeline would.
      val o = tbl(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      def ch(pred: org.apache.spark.sql.Column, seq: Int, op: String,
          key: org.apache.spark.sql.Column,
          status: org.apache.spark.sql.Column,
          price: org.apache.spark.sql.Column): DataFrame =
        o.where(pred).select(key.as("o_orderkey"),
          lit(seq.toLong).as("seq"), lit(op).as("op"), col("o_custkey"),
          status.as("o_orderstatus"), price.as("o_totalprice"))
      val changes =
        ch(col("o_orderkey") % 10 === 0, 1, "U", col("o_orderkey"),
            lit("U1"), col("o_totalprice") + 1.5)
          .unionByName(ch(col("o_orderkey") % 20 === 0, 2, "U",
            col("o_orderkey"), lit("U2"), col("o_totalprice") + 2.5))
          .unionByName(ch(col("o_orderkey") % 7 === 3, 3, "D",
            col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
          .unionByName(ch(col("o_orderkey") % 13 === 1, 1, "I",
            col("o_orderkey") + 1000000000L, col("o_orderstatus"),
            col("o_totalprice")))
      val tmp = stageOnce(s, d, "graft-stream-cdc") { t =>
        changes.repartition(4).write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val payload = Seq("o_custkey", "o_orderstatus", "o_totalprice")
      val q = withStatePartitions(s) {
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp)
          .groupBy(col("o_orderkey"))
          .agg(max_by(struct(("op" +: payload).map(col): _*),
            struct(col("seq"), col("op"))).as("__latest"))
          .writeStream.format("memory").queryName("graft_cdc_apply_gate")
          .outputMode("complete").start()
      }
      try q.processAllAvailable() finally q.stop()
      val latest = s.table("graft_cdc_apply_gate")
        .select(col("o_orderkey") +: ("op" +: payload).map(c =>
          col(s"__latest.$c").as(c)): _*)
      o.join(latest.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .unionByName(latest.where(col("op") =!= "D").drop("op"))
        .orderBy("o_orderkey")
    }),
    "stream_index_update" -> ((s, d) => {
      // SURVEY §7.6 north star — incremental corpus ingestion: the corpus
      // round-trips into 4 parquet files and streams back ONE FILE PER
      // MICRO-BATCH; each batch runs the same per-row direct-mode
      // featurize pipeline and appends to the index sink. The pipeline is
      // narrow (no global state), so the final appended index state must
      // equal a batch-built index EXACTLY — the oracle recomputes every
      // signature and bucket set from the documents.
      val tmp = stagedDocs4(s, d)
      val schema = s.read.parquet(tmp).schema
      val stream = graft.streaming.StreamingIndex.incrementalIndex(
        s, tmp, schema, cfg16, maxFilesPerTrigger = Some(1))
      val q = stream.writeStream.format("memory").queryName("graft_index_update")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_index_update")
        .where(col(Cols.Signature).isNotNull)
        .select(col(Cols.Id).as("doc_id"),
          array_join(col(Cols.Signature), ",").as("signature_str"),
          array_join(array_sort(col(Cols.BucketIds)), ",").as("bucket_ids_str"))
        .orderBy("doc_id")
    }),
    "stream_phash_real" -> ((s, d) => {
      // perceptual image dedup as a STREAM (the crawl-frontier image
      // filter): planted PNG payloads arrive via a file stream, each
      // micro-batch runs the REAL pixel decode → dHash64 (stateless
      // mapPartitions — the same kernel as dedup_image_phash), then
      // stateful dropDuplicates on the 64-bit hash: the state store holds
      // one long per distinct perceptual hash, never pixels or payloads.
      // Input pre-sorted by doc_id into ONE split so first-arrival
      // coincides with keep-min and the closed-form planted-bits oracle
      // replays exactly (the stream_dedup_real contract).
      val prevMpb = s.conf.getOption("spark.sql.files.maxPartitionBytes")
      s.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
      val tmp = stageOnce(s, d, "graft-stream-phash") { t =>
        Multimodal.plantImagePayloads(docs(s, d), "doc_id", "dhash_png")
          .select(col("doc_id"), col("payload"))
          .orderBy("doc_id").coalesce(1)
          .write.mode("overwrite").parquet(t)
      }
      val schema = s.read.parquet(tmp).schema
      val q = withStatePartitions(s) {
        Multimodal.imageDHashes(s.readStream.schema(schema).parquet(tmp))
          .dropDuplicates("dhash")
          .writeStream.format("memory").queryName("graft_phash_gate")
          .outputMode("append").start()
      }
      try q.processAllAvailable() finally {
        q.stop()
        prevMpb match {
          case Some(v) => s.conf.set("spark.sql.files.maxPartitionBytes", v)
          case None => s.conf.unset("spark.sql.files.maxPartitionBytes")
        }
      }
      s.table("graft_phash_gate").orderBy("doc_id")
    }),
    "stream_index_compact" -> ((s, d) => {
      // index MAINTENANCE for the incremental-ingestion path: three
      // streaming-shaped appends land in the bucketed store — (1) the full
      // corpus with PRELIMINARY text for the doc_id % 5 == 0 slice, (2) the
      // correction re-ingest of that slice with final text, (3) a duplicate
      // re-delivery of doc_id % 7 == 3 (idempotency) — then compact merges
      // each bucket's small append files into one and keeps only the
      // max-ingest_seq signature per id. The compacted index must equal a
      // batch build over the final corpus: the oracle is the same
      // signature/bucket recomputation as stream_index_update.
      val table = "graft_stream_index_compact"
      Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(s, _))
      val dd = docs(s, d).select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0,
          concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      IndexStore.saveBucketed(feat(prelim, 1), table, 8)
      IndexStore.appendBucketed(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table, 8)
      IndexStore.appendBucketed(feat(dd.where(col(Cols.Id) % 7 === 3), 3), table, 8)
      IndexStore.compact(s, table)
      IndexStore.load(s, table)
        .where(col(Cols.Signature).isNotNull)
        .select(col(Cols.Id).as("doc_id"),
          array_join(col(Cols.Signature), ",").as("signature_str"),
          array_join(array_sort(col(Cols.BucketIds)), ",").as("bucket_ids_str"))
        .orderBy("doc_id")
    }),
    "stream_dedup" -> ((s, d) =>
      // batch twin of streaming dropDuplicates("user_id","event_type"):
      // first event per key in event-time order (EventStream.firstEventPerKey)
      EventStream.firstEventPerKey(events(s, d))
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value").cast("double").as("value"))
        .orderBy("user_id", "event_type")),
    "mm_decode_meta" -> ((s, d) =>
      Multimodal.decodeMeta(Multimodal.asBinaryPayloads(docs(s, d), "doc_id", "text"))
        .toDF().select("doc_id", "byte_len", "format", "width", "height", "frame_count")
        .orderBy("doc_id")),
    "mm_decode_png" -> ((s, d) =>
      // REAL decode path: plant spec-valid PNG bytes (signature + IHDR with
      // correct CRC32) with dims derived from doc_id, parse them back with
      // the real header parser; the oracle recomputes the planted dims
      Multimodal.decodeMeta(Multimodal.plantImagePayloads(docs(s, d), "doc_id", "png"))
        .toDF().select("doc_id", "byte_len", "format", "width", "height", "frame_count")
        .orderBy("doc_id")),
    "mm_decode_jpeg" -> ((s, d) =>
      // REAL decode path, JPEG: SOI + APP0 (exercises the marker skip loop)
      // + SOF0 carrying the planted dims + EOI
      Multimodal.decodeMeta(Multimodal.plantImagePayloads(docs(s, d), "doc_id", "jpeg"))
        .toDF().select("doc_id", "byte_len", "format", "width", "height", "frame_count")
        .orderBy("doc_id")),
    "mm_decode_gif" -> ((s, d) =>
      // REAL decode path, GIF: multi-frame GIF89a (1-5 planted 1×1 frames
      // with local color tables and spec-valid LZW streams) — frame_count
      // comes from the image-descriptor walk, not the payload length
      Multimodal.decodeMeta(Multimodal.plantImagePayloads(docs(s, d), "doc_id", "gif"))
        .toDF().select("doc_id", "byte_len", "format", "width", "height", "frame_count")
        .orderBy("doc_id")),
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(Multimodal.asBinaryPayloads(docs(s, d), "doc_id", "text"))
        .toDF().orderBy("doc_id")),
    "mm_decode_bmp" -> ((s, d) =>
      // REAL decode path, BMP: 'BM' + BITMAPINFOHEADER little-endian walk
      // over complete planted 24-bpp DIBs; byte_len is the closed-form
      // 54 + padded-row-bytes × height
      Multimodal.decodeMeta(Multimodal.plantImagePayloads(docs(s, d), "doc_id", "bmp_solid"))
        .toDF().select("doc_id", "byte_len", "format", "width", "height", "frame_count")
        .orderBy("doc_id")),
    "mm_features_real_bmp" -> ((s, d) =>
      // REAL pixel path through javax.imageio's BMP reader: solid 24-bpp
      // DIBs reproduce the planted color exactly, std exactly zero
      Multimodal.extractFeatures(
          Multimodal.plantImagePayloads(docs(s, d), "doc_id", "bmp_solid"))
        .toDF()
        .select(col("doc_id"),
          round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"),
          round(col("f2"), 6).as("f2"), round(col("f3"), 6).as("f3"),
          round(col("f4"), 6).as("f4"), round(col("f5"), 6).as("f5"),
          round(col("f6"), 6).as("f6"), round(col("f7"), 6).as("f7"))
        .orderBy("doc_id")),
    "mm_features_real" -> ((s, d) =>
      // REAL pixel path: complete solid-color PNGs (deflate-compressed
      // IDAT) decoded with javax.imageio; per-channel mean reproduces the
      // planted color formula exactly, std is exactly zero
      Multimodal.extractFeatures(
          Multimodal.plantImagePayloads(docs(s, d), "doc_id", "png_solid"))
        .toDF()
        .select(col("doc_id"),
          round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"),
          round(col("f2"), 6).as("f2"), round(col("f3"), 6).as("f3"),
          round(col("f4"), 6).as("f4"), round(col("f5"), 6).as("f5"),
          round(col("f6"), 6).as("f6"), round(col("f7"), 6).as("f7"))
        .orderBy("doc_id")),
    "mm_frame_sample" -> ((s, d) =>
      // frame sampling re-gated on REAL frame counts: every 2nd frame of
      // the planted multi-frame GIFs (descriptor-walk counts, not stubs)
      Multimodal.sampleFrames(
          Multimodal.decodeMeta(Multimodal.plantImagePayloads(docs(s, d), "doc_id", "gif")),
          everyK = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")),
    "mm_resize" -> ((s, d) =>
      Multimodal.planResize(
          Multimodal.decodeMeta(Multimodal.asBinaryPayloads(docs(s, d), "doc_id", "text")),
          maxSide = 256)
        .orderBy("doc_id")),
    "mm_features_real_gif" -> ((s, d) =>
      // REAL pixel path, GIF: the JDK-encoded solid-color GIF is a lossless
      // palette container, so decode returns the exact planted color — the
      // oracle recomputes the channel means from the color formula, like PNG
      Multimodal.extractFeatures(
          Multimodal.plantImagePayloads(docs(s, d), "doc_id", "gif_solid"))
        .toDF()
        .select(col("doc_id"),
          round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"),
          round(col("f2"), 6).as("f2"), round(col("f3"), 6).as("f3"),
          round(col("f4"), 6).as("f4"), round(col("f5"), 6).as("f5"),
          round(col("f6"), 6).as("f6"), round(col("f7"), 6).as("f7"))
        .orderBy("doc_id")),
    "mm_features_real_jpeg" -> ((s, d) =>
      // REAL pixel path, JPEG: a solid image has only DC coefficients, so
      // the decoded image stays perfectly uniform (std exactly 0) while DC
      // quantization shifts the color — gate = uniformity + mean within
      // 5/255 of the planted formula, dims exact. The planted encode pins
      // quality=0.9 via ImageWriteParam MODE_EXPLICIT (measured max
      // deviation 3/255 over ids 0-499; an unpinned default quality was a
      // JDK-upgrade flake risk)
      Multimodal.extractFeatures(
          Multimodal.plantImagePayloads(docs(s, d), "doc_id", "jpeg_solid"))
        .toDF()
        .select(col("doc_id"),
          (col("f3") === 0.0 && col("f4") === 0.0 && col("f5") === 0.0)
            .as("is_uniform"),
          (abs(col("f0") * 255 - (col("doc_id") % 256)) <= 5.0 &&
           abs(col("f1") * 255 - (col("doc_id") * 3 % 256)) <= 5.0 &&
           abs(col("f2") * 255 - (col("doc_id") * 7 % 256)) <= 5.0)
            .as("mean_close"),
          round(col("f6"), 6).as("f6"), round(col("f7"), 6).as("f7"))
        .orderBy("doc_id")),
    "mm_features_real_wav" -> ((s, d) =>
      // REAL audio path: complete RIFF/PCM WAVs (16-bit, mono/stereo,
      // period-4 square waves) parsed by the pure-JVM chunk walker; header
      // fields replay from the id formulas and per-channel RMS/peak have
      // closed forms (RMS = A*sqrt(5/8)/32768, peak = A/32768) the oracle
      // recomputes exactly
      Multimodal.extractWavFeatures(
          Multimodal.plantAudioPayloads(docs(s, d), "doc_id"))
        .toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bit_depth").cast("long").as("bit_depth"),
          col("n_frames"),
          round(col("rms_ch0"), 6).as("rms_ch0"),
          round(col("peak_ch0"), 6).as("peak_ch0"),
          round(col("rms_ch1"), 6).as("rms_ch1"),
          round(col("peak_ch1"), 6).as("peak_ch1"))
        .orderBy("doc_id")),
    "mm_features_real_mp3" -> ((s, d) =>
      // REAL compressed-audio metadata: spec-valid MPEG-1 Layer III
      // streams (ID3v2 tag + planted frame count, each frame a real
      // header + declared-length payload) walked by the pure-JVM
      // frame-header parser — every emitted field replays from the id
      // formulas in closed form
      Multimodal.extractMp3Features(
          Multimodal.plantMp3Payloads(docs(s, d), "doc_id"))
        .select(col("doc_id"), col("version"),
          col("layer").cast("long").as("layer"),
          col("bitrate_kbps").cast("long").as("bitrate_kbps"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"),
          col("n_samples"))
        .orderBy("doc_id")),
    "mm_features_real_flac" -> ((s, d) =>
      // REAL lossless-audio metadata: spec-valid FLAC streams (fLaC +
      // bit-packed STREAMINFO + a last-flagged PADDING block + fake
      // trailing frame bytes the walk must not read) parsed by the
      // pure-JVM block walker; every field replays from the id formulas
      Multimodal.extractFlacFeatures(
          Multimodal.plantFlacPayloads(docs(s, d), "doc_id"))
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("total_samples"),
          col("min_block").cast("long").as("min_block"),
          col("max_block").cast("long").as("max_block"))
        .orderBy("doc_id")),
    "mm_features_real_avi" -> ((s, d) => {
      // REAL video path: complete AVI/MJPEG containers (RIFF AVI: avih
      // header + vids/MJPG stream + movi with 1-4 planted solid-JPEG
      // frames) parsed by the pure-JVM chunk walker. Header dims and the
      // COUNTED movi frame chunks replay from the id formulas; the first
      // frame decodes through the image pixel path (each 00dc chunk is a
      // complete JPEG), so like mm_features_real_jpeg the gate asserts
      // decoded uniformity (exact) + mean within 5/255 of the planted
      // color formula + exact frame dims
      val payloads = SparkUtil.scopedPersist(
        Multimodal.plantVideoPayloads(docs(s, d), "doc_id"))
      Multimodal.decodeMeta(payloads).toDF()
        .select(col("doc_id"), col("format"),
          col("width"), col("height"), col("frame_count"))
        .join(Multimodal.extractFeatures(payloads).toDF()
          .select(col("doc_id"),
            (col("f3") === 0.0 && col("f4") === 0.0 && col("f5") === 0.0)
              .as("is_uniform"),
            (abs(col("f0") * 255 - (col("doc_id") % 256)) <= 5.0 &&
             abs(col("f1") * 255 - (col("doc_id") * 3 % 256)) <= 5.0 &&
             abs(col("f2") * 255 - (col("doc_id") * 7 % 256)) <= 5.0)
              .as("mean_close")),
          Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "mm_frame_sample_real" -> ((s, d) =>
      // REAL frame sampling: every 2nd ACTUAL frame chunk extracted from
      // the planted AVI movi lists and pixel-decoded (MJPEG = complete
      // JPEGs) — frame indices replay from the planted count formula,
      // dims from the planted solid dims, uniformity is exact
      Multimodal.sampleVideoFrames(
          Multimodal.plantVideoPayloads(docs(s, d), "doc_id"), everyK = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("width"), col("height"),
          (col("std_r") === 0.0 && col("std_g") === 0.0 && col("std_b") === 0.0)
            .as("is_uniform"),
          (abs(col("mean_r") * 255 - (col("doc_id") % 256)) <= 5.0 &&
           abs(col("mean_g") * 255 - (col("doc_id") * 3 % 256)) <= 5.0 &&
           abs(col("mean_b") * 255 - (col("doc_id") * 7 % 256)) <= 5.0)
            .as("mean_close"))
        .orderBy("doc_id", "frame_idx")),
    "mm_silence_real" -> ((s, d) =>
      // REAL energy-gate VAD: planted PCM alternates loud (±1000+) and
      // near-silent (±(id%3)) blocks; the byte-walk segmentation must
      // recover exactly the odd blocks — start offsets and lengths in
      // closed form, trailing-run flush included (even block counts end
      // on a silent block)
      Multimodal.detectSilence(
          Multimodal.plantSilencePayloads(docs(s, d), "doc_id"),
          ampThreshold = 8, minRun = 4)
        .toDF()
        .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"),
          col("start_frame").cast("long").as("start_frame"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id", "seg_idx")),
    "mm_gps_parse" -> ((s, d) =>
      // GPS sub-IFD walk — the TIFF RATIONAL type (the one value type
      // the main EXIF fields never exercise): planted deg/min rationals
      // with denominator 1 and seconds with denominator 100, both byte
      // orders; every field replays from the doc_id formulas as exact
      // integers (centiseconds — no float degree conversion anywhere)
      Multimodal.extractGps(
          Multimodal.plantGpsPayloads(docs(s, d), "doc_id"))
        .toDF()
        .orderBy("doc_id")),
    "mm_keyframes_real" -> ((s, d) =>
      // REAL shot-boundary keyframe selection: planted multi-scene AVIs
      // (solid MJPEG frames whose color jumps ≥40/channel at the planted
      // cut positions, byte-identical within a scene) decoded frame by
      // frame; the mean-RGB diff walk must recover exactly frame 0 plus
      // every cut — the threshold sits far under the planted jump and far
      // above the zero within-scene diff
      Multimodal.selectKeyframes(
          s.read.parquet(stageOnce(s, d, "graft-video-scenes") { t =>
            Multimodal.plantSceneVideoPayloads(docs(s, d), "doc_id")
              .write.mode("overwrite").parquet(t)
          }),
          threshold = 10.0)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id", "frame_idx")),
    "mm_exif_parse" -> ((s, d) =>
      // REAL EXIF/TIFF walk (TIFF 6.0 + EXIF 2.3): planted JPEG APP1
      // segments carrying both byte orders (id parity), inline SHORT and
      // indirect ASCII storage, and the 0x8769 sub-IFD for pixel dims —
      // every field replays from the doc_id formulas
      Multimodal.extractExif(
          Multimodal.plantExifPayloads(docs(s, d), "doc_id"))
        .toDF()
        .orderBy("doc_id")),
    "mm_resize_real_avi" -> ((s, d) => {
      // REAL resize through the VIDEO path (keyframe-thumbnail
      // semantics): the planted AVI's first MJPEG frame decodes through
      // the image pixel path, aspect-fits into an 8px box, re-encodes
      // as PNG, and is decoded AGAIN — output dims replay from the
      // planted solid dims; the JPEG DC shift survives bilinear
      // interpolation uniformly, so the re-decoded thumbnail stays
      // uniform and its mean stays within the 5/255 JPEG tolerance
      val resized = Multimodal.resizePixels(
        Multimodal.plantVideoPayloads(docs(s, d), "doc_id"), maxSide = 8)
      val back = SparkUtil.scopedPersist(
        resized.select(col("doc_id"), col("payload_out").as("payload")))
      Multimodal.decodeMeta(back).toDF()
        .select(col("doc_id"), col("format"),
          col("width").as("out_width"), col("height").as("out_height"))
        .join(Multimodal.extractFeatures(back).toDF()
          .select(col("doc_id"),
            (col("f3") === 0.0 && col("f4") === 0.0 && col("f5") === 0.0)
              .as("is_uniform"),
            (abs(col("f0") * 255 - (col("doc_id") % 256)) <= 5.0 &&
             abs(col("f1") * 255 - (col("doc_id") * 3 % 256)) <= 5.0 &&
             abs(col("f2") * 255 - (col("doc_id") * 7 % 256)) <= 5.0)
              .as("mean_close")),
          Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "mm_resize_real_gif" -> ((s, d) => {
      // REAL resize through the GIF decoder: solid GIFs aspect-fit into an
      // 8px box, re-encoded as PNG (resize normalizes the container),
      // re-decoded — lossless in, uniform through bilinear, so dims AND
      // exact channel means replay from the planted formulas
      val resized = Multimodal.resizePixels(
        Multimodal.plantImagePayloads(docs(s, d), "doc_id", "gif_solid"), maxSide = 8)
      val back = SparkUtil.scopedPersist(
        resized.select(col("doc_id"), col("payload_out").as("payload")))
      Multimodal.decodeMeta(back).toDF()
        .select(col("doc_id"), col("format"),
          col("width").as("out_width"), col("height").as("out_height"))
        .join(Multimodal.extractFeatures(back).toDF()
          .select(col("doc_id"), round(col("f0"), 6).as("mean_r6"),
            round(col("f1"), 6).as("mean_g6"), round(col("f2"), 6).as("mean_b6")),
          Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "mm_resize_real" -> ((s, d) => {
      // REAL pixel resize: solid PNGs aspect-fit into an 8px box
      // (bilinear), re-encoded as PNG, then DECODED AGAIN — the output
      // dims come from the resized container's own header and the solid
      // color survives interpolation exactly (every source pixel is
      // identical), so the oracle recomputes dims AND channel means
      val resized = Multimodal.resizePixels(
        Multimodal.plantImagePayloads(docs(s, d), "doc_id", "png_solid"), maxSide = 8)
      // both the meta and the feature branch read the resized payloads:
      // scoped persist so the resize runs once, released by the harness
      val back = SparkUtil.scopedPersist(
        resized.select(col("doc_id"), col("payload_out").as("payload")))
      Multimodal.decodeMeta(back).toDF()
        .select(col("doc_id"), col("format"),
          col("width").as("out_width"), col("height").as("out_height"))
        .join(Multimodal.extractFeatures(back).toDF()
          .select(col("doc_id"), round(col("f0"), 6).as("mean_r6"),
            round(col("f1"), 6).as("mean_g6"), round(col("f2"), 6).as("mean_b6")),
          Seq("doc_id"))
        .orderBy("doc_id")
    }))

  // ------------------------------------------------------------ oracle SQL

  /** DuckDB CTE chain for the md5-mode doc pipeline at (h, bands, rows,
    * hexLen) — the SQL twin of TextFunctions/HashFunctions on `documents`.
    */
  private def docCtes(cfg: MinHashConfig): String = docCtesFrom(cfg, "documents")

  /** [[docCtes]] over an arbitrary corpus relation (`src` must be
    * FROM-able: a table name or an aliased subquery) — the maintenance
    * oracles replay the MinHash pipeline over corpus-minus-deleted or a
    * CDC-applied snapshot instead of the raw `documents` table.
    */
  private def docCtesFrom(cfg: MinHashConfig, src: String): String = {
    val (h, bands, rows, hexLen) = (cfg.numHash, cfg.numBands, cfg.numRows, cfg.bucketHexLen)
    s"""
    toks AS (
      SELECT doc_id, $tokenizeSql AS tokens
      FROM $src),
    shing AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles
      FROM toks),
    expl AS (SELECT doc_id, unnest(shingles) AS s FROM shing),
    hashed AS (
      SELECT doc_id, r.h, min(md5(r.h::VARCHAR || s)) AS m
      FROM expl CROSS JOIN range($h) r(h) GROUP BY doc_id, r.h),
    sig AS (SELECT doc_id, list(m ORDER BY h) AS signature FROM hashed GROUP BY doc_id),
    buck AS (
      SELECT doc_id, list_distinct(list_transform(range(0, $bands), b ->
        substr(md5(array_to_string(signature[(b*$rows+1):(b*$rows+$rows)], '|')), 1, $hexLen))) AS bucket_ids
      FROM sig)"""
  }

  /** Same pipeline for the query key (120-char prefix of doc 0). */
  private def queryCtes(cfg: MinHashConfig): String =
    queryCtesExpr(cfg, "substr(text, 1, 120)")

  /** [[queryCtes]] with an arbitrary key expression over doc 0's row —
    * the hot-bucket oracle queries a boilerplate-bearing composite key.
    */
  private def queryCtesExpr(cfg: MinHashConfig, keyExpr: String): String = {
    val (h, bands, rows, hexLen) = (cfg.numHash, cfg.numBands, cfg.numRows, cfg.bucketHexLen)
    s"""
    qdoc AS (SELECT $keyExpr AS text FROM documents WHERE doc_id = 0),
    qtoks AS (
      SELECT $tokenizeSql AS tokens
      FROM qdoc),
    qshing AS (
      SELECT list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles
      FROM qtoks),
    qexpl AS (SELECT unnest(shingles) AS s FROM qshing),
    qhashed AS (
      SELECT r.h, min(md5(r.h::VARCHAR || s)) AS m
      FROM qexpl CROSS JOIN range($h) r(h) GROUP BY r.h),
    qsig AS (SELECT list(m ORDER BY h) AS signature FROM qhashed),
    qbuck AS (
      SELECT list_distinct(list_transform(range(0, $bands), b ->
        substr(md5(array_to_string(signature[(b*$rows+1):(b*$rows+$rows)], '|')), 1, $hexLen))) AS bucket_ids
      FROM qsig)"""
  }

  // list_filter drops the lone '' that string_split yields on empty input —
  // the twin of TextFunctions.tokenize's array_remove (reference .split()
  // returns [] on empty, /root/reference/src/utils.py:41).
  /** DuckDB twin of [[plantedUrls]] — a parenthesized subquery. */
  private val plantedUrlSql = """(SELECT doc_id,
          CASE WHEN doc_id % 4 = 0
            THEN 'HTTPS://Sub' || (doc_id % 10) || '.Example.ORG:443/P/' ||
                 (doc_id % 20) || '?id=' || (doc_id % 20) || '#sec' || doc_id
            WHEN doc_id % 4 = 2
            THEN 'https://sub' || (doc_id % 10) ||
                 '.example.org/p/gclid=x?next=/a?gclid=1&myfbclid=keep' ||
                 '&utm_medium=z' || doc_id
            ELSE 'https://sub' || (doc_id % 10) || '.example.org/P/' ||
                 (doc_id % 20) || '?utm_source=feed&id=' || (doc_id % 20) ||
                 '&fbclid=x' || doc_id
          END AS raw_url FROM documents)"""

  /** DuckDB replay of `TextAnalysis.canonicalizeUrl` over [[plantedUrlSql]]
    * — CTE body ending in `canon(doc_id, raw_url, url_canon)`, shared by
    * the URL gate family.
    */
  private val urlCanonCtes = s"""planted AS $plantedUrlSql,
      s1 AS (SELECT doc_id, raw_url,
               regexp_replace(raw_url, '#.*$$', '') AS nofrag FROM planted),
      p AS (SELECT doc_id, raw_url,
          lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
          regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$$', 1) AS rest
        FROM s1),
      p2 AS (SELECT doc_id, raw_url, scheme, rest,
          regexp_extract(auth, '^([^@]*@)', 1) AS userinfo,
          lower(regexp_replace(auth, '^[^@]*@', '')) AS host
        FROM p),
      c AS (SELECT doc_id, raw_url, scheme, host, userinfo,
          CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$$', '')
               WHEN scheme = 'https' THEN regexp_replace(host, ':443$$', '')
               ELSE host END AS host2,
          regexp_extract(rest, '^([^?]*)', 1) ||
          regexp_replace(regexp_replace(regexp_replace(
            regexp_extract(rest, '^[^?]*(\\?.*)$$', 1),
            '(^\\?|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\\1', 'g'),
            '([?&])&+', '\\1', 'g'), '[?&]+$$', '') AS rest2
        FROM p2),
      canon AS (SELECT doc_id, raw_url,
        CASE WHEN scheme = '' OR host = '' THEN raw_url
             ELSE scheme || '://' || userinfo || host2 || rest2 END AS url_canon
      FROM c)"""

  /** Shared by `ann_index_maintained` and `stream_inverted_ingest_real`:
    * both maintenance paths (batch appends and the file-stream twin) must
    * leave the posting table answering EXACTLY as a fresh cfg16 build over
    * the final corpus — so one fresh-build replay serves both.
    */
  /** Shared by the three result-identical batch serving forms
    * (`ann_batch_md5`, `ann_batch_indexed`, `ann_batch_colocated`): the
    * in-memory, persisted, and file-bucketed paths differ only in plan
    * shape.
    */
  private lazy val annBatchMd5Oracle: String = s"""
      WITH ${docCtes(cfg16)},
      qf AS (SELECT s.doc_id AS qid, s.signature AS q_sig, b.bucket_ids AS q_buckets
             FROM sig s JOIN buck b USING (doc_id) WHERE s.doc_id < 20),
      pairs AS (
        SELECT q.qid, s.doc_id AS id, q.q_sig, s.signature
        FROM qf q, buck b JOIN sig s USING (doc_id)
        WHERE list_has_any(b.bucket_ids, q.q_buckets)),
      scored AS (
        SELECT qid, id,
          CAST(CAST(len(list_filter(range(1, 17), i -> signature[i] = q_sig[i])) AS DOUBLE)
            / least(len(signature), len(q_sig)) AS FLOAT4) AS jaccard
        FROM pairs),
      ranked AS (
        SELECT qid, id, jaccard,
          row_number() OVER (PARTITION BY qid ORDER BY jaccard DESC, id) AS rank
        FROM scored)
      SELECT qid, id, jaccard, rank FROM ranked WHERE rank <= 5 ORDER BY qid, rank"""

  /** Shared by `pipeline_cdc_index` and its streaming twin
    * `stream_takedown_real` — both must reproduce the flagship ANN over
    * the CDC-applied snapshot (upserts rewritten, deletes gone).
    */
  private lazy val cdcIndexOracle: String = s"""
      WITH corpus AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN 'revised ' || text ELSE text END AS text
        FROM documents
        WHERE doc_id < 500 AND NOT (doc_id % 9 = 4 AND doc_id % 5 <> 0)),
      ${docCtesFrom(cfg16, "corpus")}, ${queryCtes(cfg16)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN corpus d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10"""

  private lazy val annMaintainedOracle: String = s"""
      WITH ${docCtes(cfg16)}, ${queryCtes(cfg16)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN documents d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10"""

  /** [[annMaintainedOracle]] over the PROTOCOL-gate corpus cap (doc_id <
    * 500 — the sf0.01 shape): the stream-sink gates' claims are about
    * in-sink trigger firing and fresh-build equivalence, never ingest
    * scale, so they stage the protocol on the capped corpus at every sf
    * while the whole-corpus scale rows stay with
    * `stream_inverted_ingest_real` (round-17 verdict task 7).
    */
  private lazy val annMaintainedOracle500: String = s"""
      WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      ${docCtesFrom(cfg16, "corpus")}, ${queryCtes(cfg16)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN corpus d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10"""

  private val tokenizeSql =
    "list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '), t -> t <> '')"

  /** Shared oracle of the CMS gate pair (`agg_cms_heavy` and its
    * streaming twin — both produce the identical sketch, so one replay
    * serves both): rebuild the 4×1024 counter matrix cell-for-cell from
    * exact token counts, then take the same min-over-rows estimates.
    */
  /** Shared by `cdc_apply_changes` and its streaming twin
    * `stream_cdc_apply_real` — the twin must reproduce the batch MERGE
    * exactly, so both keys replay the same feed in DuckDB.
    */
  private lazy val cdcApplyOracle: String = """
      WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                    FROM orders),
      ch AS (
        SELECT o_orderkey, 1 AS seq, 'U' AS op, o_custkey,
               'U1' AS o_orderstatus, o_totalprice + 1.5 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, 2, 'U', o_custkey, 'U2', o_totalprice + 2.5
        FROM orders WHERE o_orderkey % 20 = 0
        UNION ALL
        SELECT o_orderkey, 3, 'D', o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey + 1000000000, 1, 'I', o_custkey, o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 13 = 1),
      latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY seq DESC, op DESC) AS rn
          FROM ch) WHERE rn = 1)
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM latest l
                        WHERE l.o_orderkey = b.o_orderkey)
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM latest
      WHERE op <> 'D'
      ORDER BY o_orderkey"""

  /** Shared by `cdc_scd2` and its streaming twin `stream_scd2_real` — the
    * streamed transition log, closed with a lead window, must equal the
    * batch type-2 history exactly.
    */
  private lazy val cdcScd2Oracle: String = """
      WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                    event_type FROM events),
      chg AS (
        SELECT user_id, ts, event_id, event_type FROM (
          SELECT *, lag(event_type) OVER w AS prev FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_id, event_type, ts AS valid_from,
        lead(ts) OVER w AS valid_to,
        (lead(ts) OVER w IS NULL) AS is_current
      FROM chg
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, valid_from, event_id"""

  private lazy val cmsHeavyOracle: String = s"""
      WITH toks AS (SELECT unnest($tokenizeSql) AS token FROM documents),
      tc AS (SELECT token, CAST(count(*) AS BIGINT) AS true_count
             FROM toks GROUP BY 1),
      rr AS (SELECT unnest(range(4)) AS r),
      hr AS (SELECT token, true_count, r,
               (CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token),
                  1, 8) AS UBIGINT) % 1024) + r * 1024 AS cell
             FROM tc CROSS JOIN rr),
      cellc AS (SELECT cell, CAST(sum(true_count) AS BIGINT) AS cnt
                FROM hr GROUP BY 1),
      est AS (SELECT token, any_value(true_count) AS true_count,
                min(cnt) AS est_count
              FROM hr JOIN cellc USING (cell) GROUP BY token)
      SELECT token, true_count, est_count FROM est
      ORDER BY est_count DESC, token LIMIT 25"""

  /** Shared tail of the CMS gate pair: point-query estimates (min over
    * the depth rows of the one-row sketch `sk`) next to exact counts for
    * every distinct token, top-25 by estimate. The hash expression is the
    * byte-exact DataFrame twin of [[graft.functions.CountMinAgg]]'s
    * update rule.
    */
  private def cmsHeavyHitters(toks: DataFrame, sk: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val tc = toks.groupBy("token").agg(count(lit(1)).as("true_count"))
    tc.crossJoin(sk).select(col("token"), col("true_count"),
        least((0 until depth).map(r =>
          element_at(col("sk"),
            ((conv(substring(md5(concat(lit(s"$r:"), col("token"))), 1, 8),
                16, 10).cast("long") % width) + r * width + 1).cast("int"))
        ): _*).as("est_count"))
      .orderBy(col("est_count").desc, col("token")).limit(25)
  }

  /** The `bits`-bit Morton interleave of [[Layout.zValue]] as DuckDB
    * shift arithmetic (x on even bit positions, y on odd) — shared by
    * both layout oracles.
    */
  private def zTermsSql(bits: Int): String = (0 until bits).flatMap(i => Seq(
    s"(((x >> $i) & 1) << ${2 * i})",
    s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  /** Shared closed-form CTEs of the link-graph gate family: the weighted
    * host edges implied by [[linkPages]]'s planted anchors (only the
    * external anchor survives `hostEdges` — and not for rh=9, whose
    * "external" target is itself), then two exact-integer PageRank rounds
    * replayed bit-for-bit in micro-units (`//` = the engine's `div`).
    */
  private lazy val hostRankCtes = """
      k AS (SELECT (doc_id // 2) % 10 AS rh FROM documents),
      we AS (SELECT 'h' || rh || '.example' AS src,
               'h' || ((2 * rh + 1) % 10) || '.example' AS dst,
               CAST(count(*) AS BIGINT) AS w
             FROM k WHERE ((2 * rh + 1) % 10) <> rh GROUP BY 1, 2),
      nodes AS (SELECT src AS v FROM we UNION SELECT dst AS v FROM we),
      deg AS (SELECT src, sum(w) AS deg FROM we GROUP BY 1),
      r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM nodes),
      c1 AS (SELECT we.dst AS v, sum(we.w * (r0.r // deg.deg)) AS c
             FROM we JOIN r0 ON we.src = r0.v JOIN deg ON we.src = deg.src
             GROUP BY 1),
      r1 AS (SELECT nodes.v,
               CAST(150000 + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM nodes LEFT JOIN c1 USING (v)),
      c2 AS (SELECT we.dst AS v, sum(we.w * (r1.r // deg.deg)) AS c
             FROM we JOIN r1 ON we.src = r1.v JOIN deg ON we.src = deg.src
             GROUP BY 1),
      r2 AS (SELECT nodes.v,
               CAST(150000 + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM nodes LEFT JOIN c2 USING (v))"""

  /** Shared oracle of `text_html_extract` and its streaming twin — the
    * verbatim DuckDB replay of [[TextAnalysis.htmlToText]]'s regex chain
    * over the planted markup (both gates plant identically).
    */
  private lazy val htmlExtractOracle = """
      WITH planted AS (SELECT doc_id,
          '<html><head><title>t' || CAST(doc_id AS VARCHAR) ||
          '</title><style>p {color: red}</style></head><body><h1>Doc ' ||
          CAST(doc_id AS VARCHAR) || '</h1><!-- hidden --><p>' || text ||
          '</p><script>var x = 1 < 2 && y > 0;</script>' ||
          '<p>tail &amp; fin &lt;ok&gt;</p>' ||
          '<a href="/x">link</a></body></html>' AS html
        FROM documents),
      s1 AS (SELECT doc_id, html,
          regexp_replace(html, '(?i)<script[^>]*>[\s\S]*?</script>', ' ', 'g') AS t
        FROM planted),
      s2 AS (SELECT doc_id, html,
          regexp_replace(t, '(?i)<style[^>]*>[\s\S]*?</style>', ' ', 'g') AS t FROM s1),
      s3 AS (SELECT doc_id, html,
          regexp_replace(t, '<!--[\s\S]*?-->', ' ', 'g') AS t FROM s2),
      s4 AS (SELECT doc_id, html,
          regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s3),
      s5 AS (SELECT doc_id, html,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(t,
            '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
            '&quot;', '"', 'g'), '&#39;', chr(39), 'g'), '&amp;', '&', 'g') AS t
        FROM s4)
      SELECT doc_id,
        CAST(len(regexp_extract_all(html, '(?i)<a[\s>]')) AS BIGINT) AS n_links,
        md5(trim(regexp_replace(t, '\s+', ' ', 'g'))) AS extract_md5
      FROM s5 ORDER BY doc_id"""

  /** Shared CTE chain of the bloom-decontamination gate pair — replays
    * [[bloomGateTables]]'s canary planting and the exact 5-shingle
    * contamination join (`hits` = corpus doc_ids sharing any distinct
    * 5-shingle with the bench set).
    */
  private lazy val bloomGateCtes = s"""
      bench_docs AS (
        SELECT doc_id, text || ' benchmark canary sequence number ' ||
          CAST((doc_id // 20) % 5 AS VARCHAR) AS text
        FROM documents WHERE doc_id % 20 = 0),
      corpus_docs AS (
        SELECT doc_id, CASE WHEN doc_id % 7 = 3
            THEN text || ' benchmark canary sequence number ' ||
              CAST(doc_id % 5 AS VARCHAR)
            ELSE text END AS text
        FROM documents WHERE doc_id % 20 <> 0),
      btoks AS (SELECT doc_id, $tokenizeSql AS tokens FROM bench_docs),
      ctoks AS (SELECT doc_id, $tokenizeSql AS tokens FROM corpus_docs),
      bsh AS (SELECT DISTINCT unnest(list_transform(range(1, len(tokens) - 3),
        i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] || ' ' ||
             tokens[i+3] || ' ' || tokens[i+4])) AS shingle FROM btoks),
      csh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tokens) - 3),
        i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] || ' ' ||
             tokens[i+3] || ' ' || tokens[i+4]))) AS shingle FROM ctoks),
      hits AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (shingle))"""

  /** Shared oracle: the batch PSI drift gate and its streaming twin
    * replay the identical planted length shift.
    */
  private lazy val psiDriftOracle: String = s"""
      WITH la AS (SELECT len($tokenizeSql) AS v FROM documents),
      lb AS (SELECT len(CASE WHEN doc_id % 3 = 0
               THEN list_concat($tokenizeSql, $tokenizeSql)
               ELSE $tokenizeSql END) AS v FROM documents),
      ba AS (SELECT CASE WHEN v < 20 THEN 0 WHEN v < 40 THEN 1
               WHEN v < 60 THEN 2 WHEN v < 80 THEN 3 WHEN v < 120 THEN 4
               ELSE 5 END AS bucket, count(*) AS n_a FROM la GROUP BY 1),
      bb AS (SELECT CASE WHEN v < 20 THEN 0 WHEN v < 40 THEN 1
               WHEN v < 60 THEN 2 WHEN v < 80 THEN 3 WHEN v < 120 THEN 4
               ELSE 5 END AS bucket, count(*) AS n_b FROM lb GROUP BY 1),
      sp AS (SELECT unnest(range(0, 6)) AS bucket),
      j AS (SELECT sp.bucket, coalesce(ba.n_a, 0) AS n_a,
              coalesce(bb.n_b, 0) AS n_b
            FROM sp LEFT JOIN ba ON sp.bucket = ba.bucket
            LEFT JOIN bb ON sp.bucket = bb.bucket),
      t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j)
      SELECT bucket, n_a, n_b,
        round((CAST(n_a + 1 AS DOUBLE) / (t.ta + 6)
             - CAST(n_b + 1 AS DOUBLE) / (t.tb + 6))
          * ln((CAST(n_a + 1 AS DOUBLE) / (t.ta + 6))
             / (CAST(n_b + 1 AS DOUBLE) / (t.tb + 6))), 6) AS term6
      FROM j, t ORDER BY bucket"""

  /** Shared oracle: batch cohort retention and the streaming monitor
    * (complete-mode distinct-activity state + batch rollup) produce the
    * identical cohort table.
    */
  private lazy val retentionOracle: String = """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
            FROM e GROUP BY 1),
      a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM e)
      SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
        CAST(date_diff('day', f.cohort, a.week) // 7 AS BIGINT) AS offset_weeks,
        count(*) AS n_users
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Shared oracle: batch EXIF extraction and its streaming twin replay
    * the identical planted-field formulas.
    */
  private lazy val exifOracle: String = """
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
        'CAM-' || CAST(doc_id % 5 AS VARCHAR) AS make,
        '2024:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || ' ' ||
          lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':00:00' AS datetime,
        CAST(4 + doc_id % 13 AS INTEGER) AS px_width,
        CAST(4 + (doc_id * 5) % 11 AS INTEGER) AS px_height
      FROM documents ORDER BY doc_id"""

  /** Shared oracle: the batch CUSUM alarms and the streaming monitor
    * (complete-mode bucket counts + batch-side closed-form walk) replay
    * the identical planted-burst alarm rows.
    */
  private lazy val cusumOracle: String = """
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      burst AS (SELECT event_id, 99999 AS user_id,
          TIMESTAMP '2024-01-05 00:00:00'
            + (event_id % 3) * INTERVAL 1 HOUR AS ts
        FROM e WHERE event_id % 7 = 0),
      u AS (SELECT * FROM e UNION ALL SELECT * FROM burst),
      c AS (SELECT user_id,
          date_diff('second', TIMESTAMP '1970-01-01', ts) // 21600 AS bucket,
          count(*) AS cnt
        FROM u GROUP BY 1, 2),
      p AS (SELECT user_id, bucket, cnt,
          CAST(sum(cnt - 3) OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp
        FROM c),
      s AS (SELECT user_id, bucket, cnt,
          CAST(pp - least(0, min(pp) OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS cusum
        FROM p)
      SELECT user_id, bucket, cnt, cusum FROM s WHERE cusum > 8
      ORDER BY user_id, bucket"""

  /** Shared oracle: the batch k-anonymity audit and its streaming twin
    * (complete-mode class counts) produce the identical summary row.
    */
  private lazy val kAnonymityOracle: String = """
      WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
                 FROM customer GROUP BY 1, 2)
      SELECT CAST(5 AS BIGINT) AS k, count(*) AS n_classes,
        CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes,
        CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        min(n) AS min_class_size, max(n) AS max_class_size
      FROM c"""

  /** Shared oracle: the batch constraint report and its streaming twin
    * replay the identical planted-violation counts.
    */
  private lazy val constraintReportOracle: String = """
      WITH m AS (SELECT o_orderkey,
          CASE WHEN o_orderkey % 41 = 0 THEN o_custkey + 900000000
               ELSE o_custkey END AS o_custkey,
          CASE WHEN o_orderkey % 89 = 0 THEN NULL
               ELSE o_orderstatus END AS o_orderstatus,
          CASE WHEN o_orderkey % 73 = 0 THEN -o_totalprice
               ELSE o_totalprice END AS o_totalprice
        FROM orders),
      p AS (SELECT * FROM m
            UNION ALL SELECT * FROM m WHERE o_orderkey % 97 = 0),
      r AS (
        SELECT 'check:totalprice_positive' AS check_name,
          count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE))
            AS n_violations FROM p
        UNION ALL
        SELECT 'not_null:o_orderstatus',
          count(*) FILTER (WHERE o_orderstatus IS NULL) FROM p
        UNION ALL
        SELECT 'ref:o_custkey->c_custkey', count(*) FROM p
          WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'unique:o_orderkey', count(*) - count(DISTINCT o_orderkey)
          FROM p WHERE o_orderkey IS NOT NULL)
      SELECT check_name, n_violations FROM r ORDER BY check_name"""

  /** Shared CTE chain: per-doc BPE subword count (bigint, 0 for empty
    * docs) as `__bpe_c(doc_id, nb)` — the DuckDB replay of the planted
    * hierarchical merge table (see [[graft.functions.Bpe.duckdbCountSql]]).
    */
  private lazy val bpeDocCountCtes = s"""
      __bpe_toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      __bpe_w AS (SELECT doc_id, unnest(tokens) AS w FROM __bpe_toks),
      __bpe_c AS (SELECT doc_id,
          CAST(sum(${graft.functions.Bpe.duckdbCountSql("w")}) AS BIGINT) AS nb
        FROM __bpe_w GROUP BY doc_id)"""

  private def stopwordList(lang: String): String =
    TextAnalysis.Stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** The [[langIdWeights]] sparse table as a DuckDB VALUES literal — the
    * training is deterministic Scala, so the oracle replays scoring against
    * the exact same integers (~120 rows: stopword trigram buckets only).
    */
  private lazy val langIdWeightValues: String =
    langIdWeights.map { case (b, m) =>
      s"($b, ${m.getOrElse("de", 0L)}, ${m.getOrElse("en", 0L)}, " +
        s"${m.getOrElse("es", 0L)}, ${m.getOrElse("fr", 0L)})"
    }.mkString("VALUES ", ", ", "")

  private lazy val langIdPlantedSql: String = s"""
      SELECT doc_id, CASE
        WHEN doc_id % 5 = 0 THEN '${langIdPrefix("de")}' || text
        WHEN doc_id % 5 = 1 THEN '${langIdPrefix("en")}' || text
        WHEN doc_id % 5 = 2 THEN '${langIdPrefix("es")}' || text
        WHEN doc_id % 5 = 3 THEN '${langIdPrefix("fr")}' || text
        ELSE text END AS text FROM documents"""

  /** Shared classifier-scoring CTE chain of the langid-v2 oracles: planted
    * text → tokens → boundary-padded join → char trigrams (multiset) →
    * md5-prefix buckets → LEFT JOIN the weight VALUES → exact integer sums
    * + the argmax chain. Expects a CTE `planted(doc_id, text)` upstream.
    */
  private lazy val langIdScoreCtes: String = s"""
      ltoks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      ln0 AS (SELECT doc_id, ' ' || array_to_string(tokens, ' ') || ' ' AS t
              FROM ltoks),
      lg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1), i -> t[i:i+2])
               ELSE [] END) AS g FROM ln0),
      lb AS (SELECT doc_id,
               CAST(CAST('0x' || substr(md5(g), 1, 8) AS UBIGINT)
                 % $LangIdBuckets AS BIGINT) AS b FROM lg),
      lw(b, wde, wen, wes, wfr) AS ($langIdWeightValues),
      lper AS (SELECT doc_id, count(*) AS n_feats,
          CAST(sum(coalesce(wde, 0)) AS BIGINT) AS de_micro,
          CAST(sum(coalesce(wen, 0)) AS BIGINT) AS en_micro,
          CAST(sum(coalesce(wes, 0)) AS BIGINT) AS es_micro,
          CAST(sum(coalesce(wfr, 0)) AS BIGINT) AS fr_micro
        FROM lb LEFT JOIN lw USING (b) GROUP BY 1),
      lpred AS (SELECT doc_id, n_feats, de_micro, en_micro, es_micro, fr_micro,
          CASE
            WHEN de_micro >= en_micro AND de_micro >= es_micro
              AND de_micro >= fr_micro AND de_micro > 0 THEN 'de'
            WHEN en_micro >= es_micro AND en_micro >= fr_micro
              AND en_micro > 0 THEN 'en'
            WHEN es_micro >= fr_micro AND es_micro > 0 THEN 'es'
            WHEN fr_micro > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred_v2
        FROM lper)"""

  /** Generated k-round replay of [[graft.functions.Bpe.learnMerges]]:
    * round i = extract bracketed symbols, count adjacent pairs, pick the
    * (count desc, l, r) argmax, apply it as one replace() — exact because
    * the learned table is hierarchical by construction.
    */
  private lazy val bpeLearnOracle: String = {
    val rounds = 6
    val header =
      s"""WITH toks AS (SELECT $tokenizeSql AS tokens FROM documents),
      w0 AS (SELECT regexp_replace(unnest(tokens), '(.)', '[\\1]', 'g') AS s
             FROM toks),"""
    val body = (1 to rounds).map { i =>
      val prev = s"w${i - 1}"
      s"""
      s$i AS (SELECT regexp_extract_all(s, '\\[([^\\]]*)\\]', 1) AS sym FROM $prev),
      p$i AS (SELECT p[1] AS l, p[2] AS r FROM (
          SELECT unnest(list_transform(range(1, len(sym)),
            j -> [sym[j], sym[j + 1]])) AS p FROM s$i)),
      c$i AS (SELECT l, r, count(*) AS c FROM p$i GROUP BY 1, 2),
      b$i AS (SELECT l, r, c FROM c$i ORDER BY c DESC, l, r LIMIT 1),
      w$i AS (SELECT replace($prev.s, '[' || b$i.l || '][' || b$i.r || ']',
          '[' || b$i.l || b$i.r || ']') AS s FROM $prev, b$i),"""
    }.mkString
    val unions = (1 to rounds).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, l AS "left", r AS "right",
          c AS pair_count FROM b$i""").mkString("\n      UNION ALL ")
    header + body.stripSuffix(",") + "\n      " + unions + "\n      ORDER BY rank"
  }

  /** Generated replay of [[graft.functions.Unigram.learnUnigram]]: per EM
    * round, an UNROLLED Viterbi DP (forward stages 1..maxLen: per (word,
    * position) keep the min-(cost, −k) candidate over piece lengths
    * 1..4; backward stages peel the chosen pieces), weighted piece
    * counts over the word histogram, then the prune + add-one re-cost.
    * maxLen = 12 comfortably covers the corpus (max token length 8 at
    * every SF — the engine DP itself has no length cap).
    */
  private def unigramOracle(withRound3: Boolean, tail: String): String = {
    val maxLen = 12
    val maxPiece = 4
    val seeds = graft.functions.Bpe.PlantedMerges
      .map { case (l, r) => s"'$l$r'" }.mkString(", ")
    def dpStages(r: Int, vc: String): String = {
      val stages = (1 to maxLen).map { p =>
        val branches = (1 to math.min(maxPiece, p)).map { k =>
          s"""SELECT d.w AS w, d.cost + v.cost AS cost, $k AS k
          FROM d${r}_${p - k} d JOIN $vc v ON v.p = substr(d.w, ${p - k + 1}, $k)
          WHERE len(d.w) >= $p"""
        }.mkString("\n          UNION ALL ")
        s"""
      d${r}_$p AS MATERIALIZED (SELECT w, cost, k FROM (
        SELECT cand.*, row_number() OVER (PARTITION BY w
          ORDER BY cost ASC, k DESC) AS rn FROM ($branches) cand)
        WHERE rn = 1),"""
      }.mkString
      val dpUnion = (1 to maxLen)
        .map(p => s"SELECT w, $p AS pos, k FROM d${r}_$p")
        .mkString("\n        UNION ALL ")
      val btStages = (1 to maxLen).map { i =>
        s"""
      b${r}_$i AS MATERIALIZED (SELECT b.w, b.pos - d.k AS pos,
          substr(b.w, b.pos - d.k + 1, d.k) AS piece
        FROM b${r}_${i - 1} b JOIN dp$r d ON d.w = b.w AND d.pos = b.pos
        WHERE b.pos > 0),"""
      }.mkString
      val pcUnion = (1 to maxLen)
        .map(i => s"SELECT w, piece FROM b${r}_$i")
        .mkString("\n        UNION ALL ")
      s"""
      d${r}_0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS cost, 0 AS k FROM w),$stages
      dp$r AS MATERIALIZED ($dpUnion),
      b${r}_0 AS MATERIALIZED (SELECT w, len(w) AS pos FROM w),$btStages
      pieces$r AS MATERIALIZED ($pcUnion),
      cnt$r AS MATERIALIZED (SELECT pc.piece AS p, CAST(sum(wc.c) AS BIGINT) AS n
        FROM pieces$r pc JOIN w wc ON wc.w = pc.w GROUP BY 1),"""
    }
    def mStep(r: Int, prevVocab: String): String = s"""
      ret$r AS MATERIALIZED (SELECT s.p, coalesce(c.n, CAST(0 AS BIGINT)) AS n
        FROM (SELECT p FROM $prevVocab) s LEFT JOIN cnt$r c ON c.p = s.p
        WHERE len(s.p) = 1 OR coalesce(c.n, 0) >= 2),
      tv$r AS MATERIALIZED (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS v FROM ret$r),
      vc${r + 1} AS MATERIALIZED (SELECT r.p,
          CAST(round(-ln((r.n + 1.0) / (t.t + t.v)) * 1e6) AS BIGINT) AS cost
        FROM ret$r r, tv$r t),"""
    s"""WITH toks AS MATERIALIZED (SELECT $tokenizeSql AS tokens FROM documents),
      w AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(tokens) AS w FROM toks) GROUP BY 1),
      chars AS MATERIALIZED (SELECT DISTINCT unnest(list_transform(range(1, len(w) + 1),
          j -> w[j])) AS p FROM w),
      seed AS MATERIALIZED (SELECT p FROM chars UNION SELECT unnest([$seeds])),
      vc1 AS MATERIALIZED (SELECT p, CAST(round(-ln((0 + 1.0) /
          (0 + sv.v)) * 1e6) AS BIGINT) AS cost
        FROM seed, (SELECT count(*) AS v FROM seed) sv),
      ${dpStages(1, "vc1")}
      ${mStep(1, "seed")}
      ${dpStages(2, "vc2")}
      ${mStep(2, "ret1")}
      ${if (withRound3) dpStages(3, "vc3") else ""}
      $tail"""
  }

  private lazy val unigramLearnOracle: String = unigramOracle(withRound3 = false, """
      __tail AS MATERIALIZED (SELECT 1)
      SELECT r.p AS piece, r.n AS "count",
        CAST(round(-ln((r.n + 1.0) / (t.t + t.v)) * 1e6) AS BIGINT)
          AS cost_micro
      FROM ret2 r, tv2 t ORDER BY piece""")

  /** Per-doc fertility under the LEARNED unigram vocabulary: a THIRD
    * Viterbi pass (under the final vc3 costs) yields each distinct word's
    * piece count via its backtrack rows; docs sum their tokens' counts.
    * Mirrors `text_bpe_fertility` with the learned table in place of the
    * planted merges.
    */
  private lazy val unigramFertilityOracle: String = unigramOracle(
    withRound3 = true, s"""
      wcount AS MATERIALIZED (SELECT w, count(*) AS np FROM pieces3 GROUP BY w),
      dtok AS MATERIALIZED (
        SELECT doc_id, unnest($tokenizeSql) AS w FROM documents),
      dsum AS MATERIALIZED (
        SELECT d.doc_id, CAST(sum(len(d.w)) AS BIGINT) AS n_chars,
          CAST(sum(wc.np) AS BIGINT) AS n_uni_tokens
        FROM dtok d JOIN wcount wc ON wc.w = d.w GROUP BY 1)
      SELECT doc_id, coalesce(n_chars, 0) AS n_chars,
        coalesce(n_uni_tokens, 0) AS n_uni_tokens,
        CASE WHEN n_uni_tokens > 0
          THEN round(CAST(n_chars AS DOUBLE) / n_uni_tokens, 6) END AS fertility6
      FROM (SELECT dd.doc_id, ds.n_chars, ds.n_uni_tokens
            FROM documents dd LEFT JOIN dsum ds ON ds.doc_id = dd.doc_id)
      ORDER BY doc_id""")


  /** Generated 13-level replay of [[graft.operators.Layout
    * .withHilbertIndex]]: each CTE stage applies one bit level's
    * flip-then-swap rotation and distance term — the engine's chained
    * projection, unrolled.
    */
  private lazy val layoutHilbertOracle: String = {
    val bits = 13
    val stages = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      s"""
      h${i + 1} AS (SELECT event_id,
          CASE WHEN (y & $s) > 0 THEN x
               WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END AS x,
          CASE WHEN (y & $s) > 0 THEN y
               WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END AS y,
          d + ${s * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
            CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
        FROM h$i),"""
    }.mkString
    s"""WITH h0 AS (SELECT event_id, CAST(user_id % 8192 AS BIGINT) AS x,
        CAST(event_id % 8192 AS BIGINT) AS y, CAST(0 AS BIGINT) AS d
      FROM events),${stages.stripSuffix(",")}
      SELECT event_id, d AS hval FROM h$bits ORDER BY event_id"""
  }

  /** Curate-pipeline compositions retired from the driver gate suite
    * (round-10 verdict task 2): six versions each re-ran full index/LM
    * machinery per bench execution, so the suite's cost grew linearly with
    * its own history and started masking operator regressions. The retained
    * driver gates are `pipeline_curate` (the original composition),
    * `pipeline_curate_incremental` (distinct capability: incremental
    * maintenance) and `pipeline_curate_v6` (the most comprehensive stack).
    * The retired versions stay correctness-covered: every stage keeps its
    * own oracle-paired gate, and the compositions themselves replay in
    * OperatorSpec against row counts pinned from their last DuckDB-validated
    * run (hash-matched at sf0.01 in CORRECTNESS_r10).
    */
  def retiredQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate_v2" -> ((s, d) => {
      // the round-7 composed pipeline: exact dedup (hash-only decision) →
      // exact-substring near-dup pruning (winnowing blocking, higher id of
      // each pair loses) → token-budget selection
      val dd = docs(s, d)
      val exact = Dedup.dropExactDuplicates(dd, "doc_id", "text")
      val losers = Dedup.sharedSubstringPairs(exact, "doc_id", "text",
          k = 16, w = 25, minShared = 2)
        .select(col("b_id").as("doc_id")).distinct()
      val kept = exact.join(losers, Seq("doc_id"), "left_anti")
      TextAnalysis.selectWithinTokenBudget(kept, "doc_id", "text", "n_chars", 15000L)
        .orderBy("doc_id")
    }),
    "pipeline_curate_v3" -> ((s, d) => {
      // the round-8 composed pipeline: exact dedup → Gopher word-count rule
      // → CCNet perplexity tail cut
      val dd = docs(s, d)
      val exact = Dedup.dropExactDuplicates(dd, "doc_id", "text")
      val gophered = TextAnalysis.withGopherRules(exact, "text")
        .where(col("r_word_count"))
      TextAnalysis.ccnetBuckets(gophered, "doc_id", "text",
          headCutMicro = -3400000L, tailCutMicro = -3404000L)
        .where(col("ppl_bucket") =!= "tail")
        .select(col("doc_id"), col("n_words"), col("ppl_bucket"))
        .orderBy("doc_id")
    }),
    "pipeline_curate_v4" -> ((s, d) => {
      // the round-10 composed pipeline — the full public-curation shape:
      // canonical-URL dedup → exact content dedup → FULL Gopher rule
      // conjunction → CCNet bucketing at CALIBRATED cutoffs →
      // linear-classifier threshold (planted stopword prefix: the
      // synthetic corpus has no English stopwords)
      val dd = docs(s, d).select(col("doc_id"),
        concat(lit("the of and that have with be to "), col("text")).as("text"))
      val urls = dd.select(col("doc_id"),
        concat(lit("HTTPS://Site.Example.ORG:443/page/"),
          (col("doc_id") - col("doc_id") % 2).cast("string"),
          lit("?utm_source=feed&fbclid=x"), col("doc_id").cast("string"))
          .as("raw_url"))
      val urlKept = Dedup.dropUrlDuplicates(urls, "doc_id", "raw_url")
        .select("doc_id")
      val d1 = dd.join(urlKept, Seq("doc_id"))
      val d2 = Dedup.dropExactDuplicates(d1, "doc_id", "text")
      val d3 = SparkUtil.scopedPersist(
        TextAnalysis.withGopherRulesFull(d2, "text")
          .where(col("gopher_full_pass")).select("doc_id", "text"))
      val cal = TextAnalysis.calibrateCcnetCutoffs(
        d3.where(col("doc_id") % 4 === 0), "doc_id", "text",
        headFrac = 0.3, tailFrac = 0.3)
      val d4 = SparkUtil.scopedPersist(
        TextAnalysis.ccnetBuckets(d3, "doc_id", "text",
            cal.headCutMicro, cal.tailCutMicro)
          .where(col("ppl_bucket") =!= "tail")
          .select("doc_id", "text", "n_tokens", "ppl_bucket"))
      TextAnalysis.qualityClassifierScore(d4, "doc_id", "text",
          qualityWeights, biasMicro = 20000L)
        .where(col("quality_pass"))
        .select(col("doc_id"), col("n_tokens"), col("ppl_bucket"),
          col("n_feats"), round(col("logit"), 6).as("logit6"))
        .orderBy("doc_id")
    }),
    "pipeline_curate_v5" -> ((s, d) => {
      // round-10 composed pipeline: link-graph host rank as the quality
      // signal ∘ exact content dedup over pair-shared text
      val dd = SparkUtil.ensureParallelism(docs(s, d))
      val pages = linkPages(s, d)
      val links = TextAnalysis.extractLinks(pages, "doc_id", "url", "html")
      val ranks = Graphs.pageRankKeyed(Graphs.hostEdges(links),
        "src_host", "dst_host", iterations = 2, weightCol = Some("n_links"))
      val ranked = links.select(col("doc_id"), col("src_host")).distinct()
        .join(ranks, col("src_host") === col("node_id"))
        .where(col("rank_micro") >= 1000000L)
        .select(col("doc_id"), col("src_host").as("host"), col("rank_micro"))
      val evens = dd.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("__pair"), col("text").as("pair_text"))
      val paired = dd.select(col("doc_id"),
          (col("doc_id") - col("doc_id") % 2).as("__pair"))
        .join(evens, Seq("__pair"))
      val cand = paired.join(ranked, Seq("doc_id"))
      Dedup.dropExactDuplicates(cand, "doc_id", "pair_text")
        .select("doc_id", "host", "rank_micro")
        .orderBy("doc_id")
    }))

  def oracleSql: Map[String, String] = Map(
    "text_bpe_learn" -> bpeLearnOracle,
    "text_unigram_learn" -> unigramLearnOracle,
    "text_unigram_fertility" -> unigramFertilityOracle,
    "src_scan_documents" ->
      "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id",
    "src_orc_scan" ->
      "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id",
    "src_scan_limit" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 100",
    "prj_select" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
    "prj_derived_tokens" ->
      s"SELECT doc_id, len($tokenizeSql) AS n_tokens FROM documents ORDER BY doc_id",
    "flt_predicate" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
      WHERE l_quantity >= 45 AND l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1997-01-01'
      ORDER BY l_orderkey, l_linenumber""",
    "flt_sample_hash" -> """
      SELECT doc_id, lang, n_chars FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      ORDER BY doc_id""",
    "flt_sample_stratified" -> """
      SELECT lang, count(*) AS n_kept FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        CASE WHEN lang = 'en' THEN '1a' ELSE '80' END
      GROUP BY 1 ORDER BY 1""",
    "flt_subquery" -> """
      SELECT o_orderkey, o_orderpriority
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey""",
    "flt_bucket_overlap" -> s"""
      WITH ${docCtes(cfg16)}, ${queryCtes(cfg16)}
      SELECT b.doc_id FROM buck b, qbuck q
      WHERE list_has_any(b.bucket_ids, q.bucket_ids) ORDER BY b.doc_id""",
    "flt_bucket_thres" -> s"""
      WITH ${docCtes(cfg16)}, ${queryCtes(cfg16)}
      SELECT b.doc_id,
        round(CAST(len(list_intersect(b.bucket_ids, q.bucket_ids)) AS DOUBLE)
          / len(list_distinct(list_concat(b.bucket_ids, q.bucket_ids))), 6) AS bucket_sim6
      FROM buck b, qbuck q
      WHERE CAST(len(list_intersect(b.bucket_ids, q.bucket_ids)) AS DOUBLE)
          / len(list_distinct(list_concat(b.bucket_ids, q.bucket_ids))) >= 0.1
      ORDER BY b.doc_id""",
    "join_inner_agg" -> """
      SELECT c.c_nationkey AS nationkey, count(*) AS n_orders,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1 ORDER BY 1""",
    "join_semi" -> """
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
      ORDER BY o_orderkey""",
    "join_anti" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      ORDER BY c_custkey""",
    "join_docs_topk" -> """
      WITH topk AS (SELECT doc_id, n_chars FROM documents
                    ORDER BY n_chars DESC, doc_id LIMIT 10)
      SELECT d.doc_id, d.text, t.n_chars FROM documents d JOIN topk t USING (doc_id)
      ORDER BY t.n_chars DESC, d.doc_id""",
    "agg_shingle_count" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      shing AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles FROM toks)
      SELECT s AS shingle, count(*) AS cnt
      FROM (SELECT unnest(shingles) AS s FROM shing) GROUP BY 1 ORDER BY 1""",
    "agg_psi_drift" -> psiDriftOracle,
    "stream_psi_real" -> psiDriftOracle,
    "agg_column_profile" -> """
      WITH m AS (SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 89 = 0 THEN NULL ELSE o_orderstatus END
            AS o_orderstatus,
          o_totalprice, o_orderdate, o_orderpriority
        FROM orders),
      r AS (
        SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
          count(*) FILTER (WHERE o_custkey IS NULL) AS n_nulls,
          count(DISTINCT o_custkey) AS n_distinct FROM m
        UNION ALL SELECT 'o_orderdate', count(*),
          count(*) FILTER (WHERE o_orderdate IS NULL),
          count(DISTINCT o_orderdate) FROM m
        UNION ALL SELECT 'o_orderkey', count(*),
          count(*) FILTER (WHERE o_orderkey IS NULL),
          count(DISTINCT o_orderkey) FROM m
        UNION ALL SELECT 'o_orderpriority', count(*),
          count(*) FILTER (WHERE o_orderpriority IS NULL),
          count(DISTINCT o_orderpriority) FROM m
        UNION ALL SELECT 'o_orderstatus', count(*),
          count(*) FILTER (WHERE o_orderstatus IS NULL),
          count(DISTINCT o_orderstatus) FROM m
        UNION ALL SELECT 'o_totalprice', count(*),
          count(*) FILTER (WHERE o_totalprice IS NULL),
          count(DISTINCT o_totalprice) FROM m)
      SELECT column_name, n_rows, n_nulls, n_distinct FROM r
      ORDER BY column_name""",
    "agg_constraint_report" -> constraintReportOracle,
    "stream_constraint_real" -> constraintReportOracle,
    "agg_cms_heavy" -> cmsHeavyOracle,
    "stream_cms_real" -> cmsHeavyOracle,
    "agg_group_stats" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(min(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS min_price,
        CAST(max(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "agg_distinct" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_corr_stats" -> """
      SELECT l_returnflag,
        round(corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 6) AS qty_price_corr,
        round(covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 3) AS qty_price_covar,
        round(stddev_samp(CAST(l_quantity AS DOUBLE)), 6) AS qty_sd,
        round(var_samp(CAST(l_quantity AS DOUBLE)), 4) AS qty_var
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "window_lag" -> """
      SELECT user_id, event_id, value,
        lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
      ORDER BY user_id, ts, event_id""",
    "window_rank" -> """
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey, row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_dist" -> """
      WITH r AS (SELECT o_orderkey, o_orderpriority,
          percent_rank() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey) AS pr,
          cume_dist() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey) AS cd
        FROM orders)
      SELECT o_orderkey, o_orderpriority, round(pr, 6) AS pr6,
        round(cd, 6) AS cd6
      FROM r WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""",
    "window_cumsum" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
      SELECT user_id, event_id,
        CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_value
      FROM e ORDER BY user_id, ts, event_id""",
    "agg_cube" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_percentiles" -> """
      SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_median" -> """
      SELECT l_returnflag, median(l_quantity) AS med_qty, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_approx_percentile" -> """
      SELECT l_returnflag,
        round(median(CAST(l_extendedprice AS DOUBLE)), 4) AS exact_median,
        TRUE AS approx_within_1pct
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "text_dedup_within" -> s"""
      WITH planted AS (
        SELECT doc_id, 'end of section marker end of section marker ' || text AS text
        FROM documents),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      nz AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) > 0),
      segs AS (SELECT doc_id, unnest(range(0, ((n - 1) // 4) + 1)) AS i, tokens FROM nz),
      st AS (SELECT doc_id, i,
               array_to_string(tokens[(i*4+1):(i*4+4)], ' ') AS s FROM segs),
      k AS (SELECT doc_id, i, s,
              row_number() OVER (PARTITION BY doc_id, s ORDER BY i) AS rn FROM st)
      SELECT doc_id, count(*) AS n_segs,
        count(*) FILTER (WHERE rn > 1) AS n_dropped,
        md5(array_to_string(list(s ORDER BY i) FILTER (WHERE rn = 1), ' ')) AS dedup_md5
      FROM k GROUP BY 1 ORDER BY 1""",
    "text_c4_line_filter" -> """
      WITH planted AS (SELECT doc_id,
          'this line is a proper sentence with terminal punctuation.' || chr(10) ||
          'too short.' || chr(10) ||
          'this longer line has no terminal punctuation at all' || chr(10) ||
          text || '.' AS text
        FROM documents),
      l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM planted),
      k AS (SELECT doc_id, lines,
              list_filter(lines, x ->
                substr(trim(x), -1, 1) IN ('.', '!', '?', '"') AND
                len(list_filter(string_split_regex(trim(x), '\s+'),
                  w -> w <> '')) >= 5) AS kept
            FROM l)
      SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(kept) AS BIGINT) AS n_kept,
        md5(array_to_string(kept, chr(10))) AS clean_md5
      FROM k ORDER BY doc_id""",
    "text_para_dedup_global" -> """
      WITH planted AS (
        SELECT doc_id,
          'subscribe to our newsletter for daily updates' || chr(10) || chr(10) ||
          'shared section ' || CAST(doc_id % 10 AS VARCHAR) ||
          ' standard terms apply' || chr(10) || chr(10) || text AS text
        FROM documents),
      d AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM planted),
      e AS (SELECT doc_id, unnest(ps) AS p,
              generate_subscripts(ps, 1) - 1 AS pi FROM d),
      k AS (SELECT doc_id, pi, p,
              row_number() OVER (PARTITION BY md5(p) ORDER BY doc_id, pi) AS rn
            FROM e)
      SELECT doc_id, count(*) AS n_paras,
        count(*) FILTER (WHERE rn > 1) AS n_dropped,
        md5(coalesce(string_agg(CASE WHEN rn = 1 THEN p END,
          chr(10) || chr(10) ORDER BY pi), '')) AS dedup_md5
      FROM k GROUP BY 1 ORDER BY 1""",
    "text_html_extract" -> htmlExtractOracle,
    "stream_html_extract_real" -> htmlExtractOracle,
    "text_oov_rate" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      e AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
      v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM e
            GROUP BY 1 ORDER BY c DESC, tok ASC LIMIT 100)),
      cnt AS (SELECT e.doc_id, count(*) AS n_tokens,
              count(*) FILTER (WHERE v.tok IS NULL) AS n_oov
              FROM e LEFT JOIN v ON e.tok = v.tok GROUP BY 1)
      SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        coalesce(n_oov, 0) AS n_oov,
        CASE WHEN coalesce(n_tokens, 0) > 0
          THEN round(CAST(n_oov AS DOUBLE) / n_tokens, 6) END AS oov6
      FROM documents d LEFT JOIN cnt USING (doc_id)
      ORDER BY d.doc_id""",
    "text_shuffle_shards" -> """
      WITH k AS (SELECT doc_id,
          CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS hk
        FROM documents)
      SELECT doc_id, CAST(hk % 8 AS BIGINT) AS shard,
        CAST(row_number() OVER (PARTITION BY hk % 8 ORDER BY hk, doc_id) AS BIGINT) AS shard_pos
      FROM k ORDER BY doc_id""",
    "text_url_blocklist" -> """
      WITH planted AS (SELECT doc_id,
          'sub' || CAST(doc_id % 10 AS VARCHAR) || '.' ||
          list_extract(['malware.bad.example','notbad.example','shop.example','blog.test'],
            CAST(doc_id % 4 + 1 AS INTEGER)) AS host
        FROM documents),
      sfx AS (SELECT doc_id, host, string_split(host, '.') AS parts FROM planted)
      SELECT doc_id, host,
        len(list_filter(list_transform(range(1, len(parts) + 1),
          i -> array_to_string(parts[i:], '.')),
          sx -> sx IN ('bad.example', 'blog.test'))) > 0 AS blocked
      FROM sfx ORDER BY doc_id""",
    "text_url_extract" -> """
      WITH planted AS (
        SELECT doc_id,
          'see https://sub' || CAST(doc_id % 10 AS VARCHAR) ||
          '.example' || CAST(doc_id % 7 AS VARCHAR) ||
          '.org/p/' || CAST(doc_id AS VARCHAR) || ' then ' || text ||
          ' and http://mirror.test.net/x' AS text
        FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._/%-]*)?')) AS n_urls,
        regexp_extract(text, 'https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._/%-]*)?', 0) AS first_url,
        regexp_extract(text, 'https?://([A-Za-z0-9.-]+)', 1) AS first_host
      FROM planted ORDER BY doc_id""",
    "agg_pivot" -> """
      SELECT l_returnflag,
        count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "gen_posexplode" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens
                    FROM documents WHERE doc_id < 50)
      SELECT doc_id, generate_subscripts(tokens, 1) - 1 AS pos, unnest(tokens) AS token
      FROM toks ORDER BY doc_id, pos""",
    "fn_json_extract" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events ORDER BY event_id""",
    "fn_datetime" -> """
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      SELECT event_id,
        strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        hour(ts) AS hh,
        dayofweek(ts) AS dow,
        strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
        date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
      FROM e ORDER BY event_id""",
    "join_range" -> """
      WITH er AS (SELECT event_id AS err_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'error'),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase')
      SELECT er.err_id, er.user_id, strftime(er.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        count(p.ts) AS n_purchases
      FROM er LEFT JOIN p ON er.user_id = p.user_id
        AND p.ts >= er.ts AND p.ts < er.ts + INTERVAL '5 minutes'
      GROUP BY 1, 2, 3 ORDER BY 1""",
    "join_interval_overlap" -> """
      WITH er AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS s,
                    CAST(ts AS TIMESTAMP) + INTERVAL '10 minutes' AS e
                  FROM events WHERE event_type = 'error'),
      p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS s,
              CAST(ts AS TIMESTAMP) + INTERVAL '10 minutes' AS e
            FROM events WHERE event_type = 'purchase')
      SELECT er.user_id, er.err_id, p.p_id
      FROM er JOIN p ON er.user_id = p.user_id AND er.s < p.e AND p.s < er.e
      ORDER BY er.err_id, p.p_id""",
    "join_skew_salted" -> """
      SELECT o_orderpriority,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1""",
    "agg_approx_distinct" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_nd,
        TRUE AS approx_within_5pct
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "setop_intersect" -> """
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY c_custkey""",
    "fn_vector_stats" -> """
      SELECT vec_id, len(embedding) AS dim,
        round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
              / len(embedding), 6) AS mean6,
        round(sqrt(list_aggregate(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_6
      FROM embeddings ORDER BY vec_id""",
    "agg_histogram" -> """
      SELECT event_type, CAST(floor(value / 25) AS BIGINT) AS bin, count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "agg_mode" -> """
      WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
                 FROM orders GROUP BY 1, 2),
      r AS (SELECT o_orderstatus, o_orderpriority, n, row_number() OVER (
              PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) AS rn
            FROM c)
      SELECT o_orderstatus, o_orderpriority AS mode_priority, n
      FROM r WHERE rn = 1 ORDER BY o_orderstatus""",
    "agg_funnel" -> """
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      v AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT v.user_id, v.t1,
              min(CASE WHEN ec.ts >= v.t1 AND ec.ts < v.t1 + INTERVAL '6 hours'
                       THEN ec.ts END) AS t2
            FROM v LEFT JOIN e ec
              ON ec.user_id = v.user_id AND ec.event_type = 'click'
            GROUP BY 1, 2),
      p AS (SELECT c.user_id, c.t1, c.t2,
              min(CASE WHEN ep.ts >= c.t2 AND ep.ts < c.t2 + INTERVAL '6 hours'
                       THEN ep.ts END) AS t3
            FROM c LEFT JOIN e ep
              ON ep.user_id = c.user_id AND ep.event_type = 'purchase'
            GROUP BY 1, 2, 3)
      SELECT user_id,
        strftime(t1, '%Y-%m-%d %H:%M:%S') AS t_view,
        strftime(t2, '%Y-%m-%d %H:%M:%S') AS t_click,
        strftime(t3, '%Y-%m-%d %H:%M:%S') AS t_purchase
      FROM p ORDER BY user_id""",
    "window_wow_growth" -> """
      WITH w AS (SELECT event_type,
          strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      l AS (SELECT event_type, week, n,
          lag(n, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev
        FROM w)
      SELECT event_type, week, n,
        CAST(((n - prev) * 1000000) // prev AS BIGINT) AS wow_micro
      FROM l ORDER BY event_type, week""",
    "window_longest_streak" -> """
      WITH days AS (SELECT DISTINCT user_id,
          CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
      a AS (SELECT user_id, day,
          day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
            AS INTEGER) AS anchor
        FROM days),
      runs AS (SELECT user_id, anchor, count(*) AS len
               FROM a GROUP BY 1, 2)
      SELECT user_id, max(len) AS longest_streak,
        CAST(sum(len) AS BIGINT) AS n_active_days
      FROM runs GROUP BY 1 ORDER BY 1""",
    "agg_gini" -> """
      WITH r AS (SELECT c.c_nationkey, o.o_orderkey,
          CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      rk AS (SELECT c_nationkey, cents,
          CAST(row_number() OVER (PARTITION BY c_nationkey
            ORDER BY cents, o_orderkey) AS BIGINT) AS i
        FROM r),
      s AS (SELECT c_nationkey, count(*) AS n,
          CAST(sum(cents) AS BIGINT) AS sx,
          CAST(sum(i * cents) AS BIGINT) AS six
        FROM rk GROUP BY 1)
      SELECT c_nationkey, n,
        round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
          / CAST(n * sx AS DOUBLE), 6) AS gini6
      FROM s ORDER BY c_nationkey""",
    "agg_contribution" -> """
      WITH n AS (SELECT c.c_nationkey, count(*) AS n_orders,
          CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1)
      SELECT c_nationkey, n_orders, cents,
        CAST((cents * 1000000) // (SELECT CAST(sum(cents) AS BIGINT) FROM n)
          AS BIGINT) AS share_micro
      FROM n ORDER BY c_nationkey""",
    "agg_kmv_reagg" -> """
      SELECT count(DISTINCT user_id) AS n_exact, true AS reagg_identical,
        true AS kmv_ok FROM events""",
    "agg_kmv_distinct" -> """
      SELECT count(DISTINCT o_custkey) AS n_exact, true AS kmv_ok FROM orders""",
    "agg_kmv_intersect" -> """
      SELECT count(*) AS n_exact, true AS kmv_ok FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')""",
    "fn_json_props" -> """
      WITH e AS (SELECT event_type,
          CASE WHEN event_id % 113 = 0 THEN '{not json' ELSE props END AS props
        FROM events),
      x AS (SELECT event_type,
          CASE WHEN json_valid(props)
            THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
        FROM e)
      SELECT event_type, count(*) AS n,
        CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
      FROM x GROUP BY 1 ORDER BY 1""",
    "agg_event_transitions" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
          CAST(ts AS TIMESTAMP) AS ts FROM events),
      seq AS (SELECT event_type AS a,
          lead(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS b
        FROM e),
      cab AS (SELECT a, b, count(*) AS n_ab FROM seq
              WHERE b IS NOT NULL GROUP BY 1, 2),
      ca AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM cab GROUP BY 1)
      SELECT cab.a, cab.b, cab.n_ab, ca.n_a,
        (cab.n_ab * 1000000) // ca.n_a AS p_micro
      FROM cab JOIN ca USING (a) ORDER BY a, b""",
    "ts_cusum_alarms" -> cusumOracle,
    "stream_cusum_real" -> cusumOracle,
    "agg_retention_cohort" -> retentionOracle,
    "stream_retention_real" -> retentionOracle,
    "ts_seasonal_decompose" -> """
      WITH c AS (SELECT event_type AS k,
          date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      sp AS (SELECT k, min(h) AS lo, max(h) AS hi FROM c GROUP BY 1),
      g AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM sp),
      d0 AS (SELECT g.k, g.h, coalesce(c.n, 0) AS n
             FROM g LEFT JOIN c ON c.k = g.k AND c.h = g.h),
      t AS (SELECT k, h, n,
          CASE WHEN count(*) OVER w = 25
            THEN CAST(sum(n * 1000000) OVER w AS BIGINT) // 25 END AS trend_micro
        FROM d0 WINDOW w AS (PARTITION BY k ORDER BY h
          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      t2 AS (SELECT k, h, n, trend_micro,
          n * 1000000 - trend_micro AS det,
          EXTRACT(hour FROM h) AS hod FROM t),
      sr AS (SELECT k, hod, CAST(sum(det) AS BIGINT) // count(*) AS s_raw
             FROM t2 WHERE det IS NOT NULL GROUP BY 1, 2),
      se AS (SELECT k, hod,
          s_raw - CAST(sum(s_raw) OVER (PARTITION BY k) AS BIGINT)
            // (count(*) OVER (PARTITION BY k)) AS seasonal_micro
        FROM sr)
      SELECT t2.k AS event_type, strftime(t2.h, '%Y-%m-%d %H:%M:%S') AS h,
        t2.n, t2.trend_micro, se.seasonal_micro,
        t2.n * 1000000 - t2.trend_micro - se.seasonal_micro AS resid_micro
      FROM t2 LEFT JOIN se ON se.k = t2.k AND se.hod = t2.hod
      ORDER BY event_type, h""",
    "ts_resample_ffill" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events),
      s AS (SELECT user_id, date_trunc('day', min(ts)) AS start, max(ts) AS fin
            FROM e GROUP BY 1),
      g AS (SELECT user_id, unnest(generate_series(start, fin, INTERVAL 6 HOUR)) AS ts
            FROM s),
      u AS (SELECT user_id, ts, NULL::BIGINT AS event_id, NULL::DOUBLE AS value,
              1 AS is_grid FROM g
            UNION ALL
            SELECT user_id, ts, event_id, value, 0 AS is_grid FROM e),
      w AS (SELECT user_id, ts, is_grid,
              last_value(value IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, is_grid, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
            FROM u)
      SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS grid_ts, ffill
      FROM w WHERE is_grid = 1 ORDER BY user_id, grid_ts""",
    "join_bloom_pruned" -> """
      SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey < 3 ORDER BY o.o_orderkey""",
    "er_sorted_neighborhood" -> """
      WITH dirty AS (SELECT c_custkey + 1000000 AS rid,
          CASE WHEN c_custkey % 3 = 0 THEN c_name || 'Q'
               WHEN c_custkey % 3 = 1 THEN substr(c_name, 1, length(c_name) - 1)
               ELSE substr(c_name, 1, length(c_name) - 1) || 'X' END AS rname
        FROM customer),
      allr AS (SELECT c_custkey AS rid, c_name AS rname FROM customer
               UNION ALL SELECT rid, rname FROM dirty),
      rk AS (SELECT rid, rname,
               row_number() OVER (ORDER BY rname, rid) - 1 AS rank FROM allr),
      cand AS (SELECT a.rid AS a_id, a.rname AS a_name,
          b.rid AS b_id, b.rname AS b_name,
          levenshtein(a.rname, b.rname) AS dist
        FROM rk a JOIN rk b ON b.rank BETWEEN a.rank + 1 AND a.rank + 3)
      SELECT a_id, a_name, b_id, b_name, CAST(dist AS BIGINT) AS dist
      FROM cand WHERE dist <= 1 ORDER BY a_id, b_id""",
    "er_blocked_match" -> """
      WITH dirty AS (SELECT c_custkey + 1000000 AS d_id,
          CASE WHEN c_custkey % 3 = 0 THEN c_name || 'Q'
               WHEN c_custkey % 3 = 1 THEN substr(c_name, 1, length(c_name) - 1)
               ELSE substr(c_name, 1, length(c_name) - 1) || 'X' END AS d_name
        FROM customer),
      cand AS (SELECT d.d_id AS q_id, d.d_name AS q_name,
          c.c_custkey AS r_id, c.c_name AS r_name,
          levenshtein(d.d_name, c.c_name) AS dist
        FROM dirty d JOIN customer c
          ON substr(d.d_name, 1, 17) = substr(c.c_name, 1, 17)
        WHERE levenshtein(d.d_name, c.c_name) <= 2),
      best AS (SELECT *, row_number() OVER (
          PARTITION BY q_id ORDER BY dist, r_id) AS rn FROM cand)
      SELECT q_id, q_name, r_id, r_name, CAST(dist AS BIGINT) AS dist
      FROM best WHERE rn = 1 ORDER BY q_id""",
    "dq_winsorize" -> """
      WITH r AS (SELECT event_type AS k,
          CAST(round(value * 1e6) AS BIGINT) AS m,
          row_number() OVER (PARTITION BY event_type
            ORDER BY CAST(round(value * 1e6) AS BIGINT), event_id) AS rn
        FROM events),
      n0 AS (SELECT k, count(*) AS n FROM r GROUP BY 1),
      kk AS (SELECT k, n,
          greatest(1, (n * 50000 + 999999) // 1000000) AS klo,
          least(n, greatest(1, (n * 950000) // 1000000)) AS khi
        FROM n0),
      cuts AS (SELECT r.k, max(kk.n) AS n,
          max(CASE WHEN r.rn = kk.klo THEN r.m END) AS lo_cut_micro,
          max(CASE WHEN r.rn = kk.khi THEN r.m END) AS hi_cut_micro
        FROM r JOIN kk ON kk.k = r.k GROUP BY 1)
      SELECT r.k AS event_type, max(c.n) AS n,
        max(c.lo_cut_micro) AS lo_cut_micro,
        max(c.hi_cut_micro) AS hi_cut_micro,
        CAST(sum(greatest(c.lo_cut_micro, least(c.hi_cut_micro, r.m)))
          AS BIGINT) AS sum_winsorized_micro,
        CAST(sum(CASE WHEN r.m < c.lo_cut_micro THEN 1 ELSE 0 END)
          AS BIGINT) AS n_clamped_lo,
        CAST(sum(CASE WHEN r.m > c.hi_cut_micro THEN 1 ELSE 0 END)
          AS BIGINT) AS n_clamped_hi
      FROM r JOIN cuts c ON c.k = r.k GROUP BY 1 ORDER BY event_type""",
    "dq_cardinality_drift" -> """
      WITH a AS (SELECT event_type AS grp,
          count(DISTINCT user_id) AS est_a FROM events GROUP BY 1),
      b AS (SELECT event_type AS grp,
          count(DISTINCT user_id) AS est_b FROM events
        WHERE NOT (event_type = 'view' AND user_id % 5 = 0) GROUP BY 1)
      SELECT a.grp, CAST(a.est_a AS BIGINT) AS est_a,
        CAST(b.est_b AS BIGINT) AS est_b,
        abs(b.est_b - a.est_a) * 1000000 // greatest(a.est_a, 1) AS drift_micro,
        (abs(b.est_b - a.est_a) * 1000000 // greatest(a.est_a, 1)) >= 100000
          AS drifted
      FROM a JOIN b USING (grp) ORDER BY grp""",
    "dq_schema_drift" -> """
      WITH nn AS (SELECT CAST(sum(CASE WHEN o_orderkey % 89 = 0 THEN 1
          ELSE 0 END) AS BIGINT) AS nulled FROM orders)
      SELECT 'o_channel' AS column_name, 'added' AS status,
        CAST(NULL AS VARCHAR) AS type_a, 'string' AS type_b,
        CAST(NULL AS BIGINT) AS nulls_a, CAST(0 AS BIGINT) AS nulls_b,
        CAST(0 AS BIGINT) AS null_delta
      UNION ALL SELECT 'o_orderkey', 'kept', 'bigint', 'bigint', 0, 0, 0
      UNION ALL SELECT 'o_orderpriority', 'dropped', 'string',
        CAST(NULL AS VARCHAR), 0, CAST(NULL AS BIGINT), 0
      UNION ALL SELECT 'o_orderstatus', 'kept', 'string', 'string', 0,
        (SELECT nulled FROM nn), (SELECT nulled FROM nn)
      UNION ALL SELECT 'o_totalprice', 'type_changed', 'double', 'string',
        0, 0, 0
      ORDER BY column_name""",
    "dq_mad_outliers" -> """
      WITH e AS (SELECT event_type,
          CASE WHEN event_id % 131 = 0 THEN value * 50 ELSE value END AS value
        FROM events),
      m AS (SELECT event_type, median(value) AS med FROM e GROUP BY 1),
      d AS (SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
            FROM e JOIN m USING (event_type)),
      md AS (SELECT event_type, median(dev) AS mad FROM d GROUP BY 1)
      SELECT d.event_type, count(*) AS n,
        round(any_value(d.med), 6) AS med6,
        round(any_value(md.mad), 6) AS mad6,
        CAST(sum(CASE WHEN d.dev > md.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers
      FROM d JOIN md USING (event_type) GROUP BY 1 ORDER BY 1""",
    "dq_k_anonymity" -> kAnonymityOracle,
    "stream_k_anonymity_real" -> kAnonymityOracle,
    "agg_collect_ordered" -> """
      SELECT user_id,
        string_agg(event_type, ',' ORDER BY CAST(ts AS TIMESTAMP), event_id) AS event_seq,
        count(*) AS n_events
      FROM events GROUP BY 1 ORDER BY 1""",
    "join_asof" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_event_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        c.click_event_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",
    "join_asof_tolerance" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_event_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        CASE WHEN date_diff('microsecond', c.ts, p.ts) > 3600000000
             THEN NULL ELSE c.click_event_id END AS click_event_id,
        CASE WHEN date_diff('microsecond', c.ts, p.ts) > 3600000000
             THEN NULL ELSE strftime(c.ts, '%Y-%m-%d %H:%M:%S') END AS click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",
    "join_asof_next" -> """
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_event_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        c.click_event_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.event_id""",
    "src_json_scan" -> """
      SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id""",
    "src_partitioned_scan" -> """
      SELECT doc_id, source, n_chars FROM documents
      WHERE lang = 'en' ORDER BY doc_id""",
    "src_csv_scan" -> """
      SELECT doc_id, text FROM documents
      WHERE NOT regexp_matches(text, '[\n\r]') ORDER BY doc_id""",
    "src_text_scan" -> """
      SELECT text, length(text) AS n_chars FROM documents
      WHERE NOT regexp_matches(text, '[\n\r]') ORDER BY text""",
    "src_robots_eval" -> """
      SELECT doc_id,
        'host' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN '/private' || CAST(doc_id % 7 AS VARCHAR) || '/secret'
          WHEN 1 THEN '/private' || CAST(doc_id % 7 AS VARCHAR) || '/pub/x'
          WHEN 2 THEN '/all/y' || CAST(doc_id AS VARCHAR)
          ELSE '/dl/a' || CAST(doc_id AS VARCHAR) || '.zip' END AS path,
        (doc_id % 4 = 1 OR doc_id % 4 = 2) AS allowed
      FROM documents ORDER BY doc_id""",
    "src_warc_scan" -> """
      WITH recs AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS rec_idx
                    FROM documents),
      r AS (SELECT doc_id, rec_idx,
          CASE WHEN doc_id % 5 = 0 AND rec_idx = 1
            THEN 'HTTP/1.1 404 Not Found' ELSE 'HTTP/1.1 200 OK' END AS status_line,
          CASE WHEN doc_id % 5 = 0 AND rec_idx = 1 THEN 404 ELSE 200 END AS http_status,
          '<html><body>page ' || CAST(doc_id AS VARCHAR) || ' section ' ||
            CAST(rec_idx AS VARCHAR) || ' ' ||
            repeat('x', CAST(doc_id % 5 + rec_idx + 1 AS INTEGER)) ||
            '</body></html>' AS body,
          'http://host' || CAST((doc_id + rec_idx) % 7 AS VARCHAR) || '.example/p/' ||
            CAST(doc_id AS VARCHAR) || '/' || CAST(rec_idx AS VARCHAR) AS target_uri
        FROM recs)
      SELECT doc_id, CAST(rec_idx AS BIGINT) AS rec_idx, target_uri,
        CAST(len(status_line || chr(13) || chr(10) || 'Content-Type: text/html' ||
          chr(13) || chr(10) || chr(13) || chr(10) || body) AS BIGINT) AS content_length,
        CAST(http_status AS BIGINT) AS http_status,
        CAST(len(body) AS BIGINT) AS body_len, md5(body) AS body_md5
      FROM r ORDER BY doc_id, rec_idx""",
    "agg_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "stream_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      m AS (
        SELECT user_id, event_id, ts,
          -- strict > gap starts a new session (exact-gap events merge),
          -- matching the Sessionizer/session_window boundary
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id,
        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM m ORDER BY user_id, event_id""",
    "join_left_outer" -> """
      WITH big AS (
        SELECT o_custkey, count(*) AS n_big, max(o_totalprice) AS max_big
        FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
      SELECT c.c_custkey, coalesce(b.n_big, 0) AS n_big,
        coalesce(b.max_big, -1.0) AS max_big
      FROM customer c LEFT JOIN big b ON c.c_custkey = b.o_custkey
      ORDER BY c.c_custkey""",
    "join_full_outer" -> """
      WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                 FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
            FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
      SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      ORDER BY nationkey""",
    "join_3way_agg" -> """
      SELECT o.o_orderkey,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-06-01'
        AND l.l_shipdate > TIMESTAMP '1997-06-01'
      GROUP BY 1 ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "window_ntile" -> """
      SELECT o_orderkey, o_orderpriority, drk, quartile FROM (
        SELECT o_orderkey, o_orderpriority,
          dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE drk <= 100 ORDER BY o_orderpriority, drk""",
    "window_range_frame" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      SELECT user_id, event_id,
        count(*) OVER (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW) AS n_last_hour
      FROM e ORDER BY user_id, ts, event_id""",
    "window_first_last" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      SELECT user_id, event_id,
        first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_eid,
        last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_eid,
        nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_eid
      FROM e ORDER BY user_id, event_id""",
    "dedup_embedding_bucketed" -> """
      WITH eb AS (
        SELECT vec_id, embedding,
          CAST(list_sum(list_transform(range(0, 4),
            d -> CASE WHEN embedding[d+1] > 0 THEN CAST(pow(2, d) AS INTEGER) ELSE 0 END)) AS INTEGER) AS bucket
        FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT a_id, b_id, round(cosine, 6) AS cos6 FROM pairs
      WHERE cosine >= 0.35 ORDER BY a_id, b_id""",
    "dedup_exact_groups" -> """
      WITH u AS (SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id, text FROM documents WHERE doc_id < 50)
      SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        count(*) AS dup_count
      FROM u GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""",
    "stream_url_dedup_real" -> s"""
      WITH $urlCanonCtes
      SELECT doc_id, url_canon FROM (
        SELECT doc_id, url_canon,
          min(doc_id) OVER (PARTITION BY url_canon) AS keep
        FROM canon)
      WHERE doc_id = keep ORDER BY doc_id""",
    "stream_gopher_real" -> s"""
      WITH base AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      sig AS (SELECT doc_id, len(tokens) AS n_words,
          len(list_filter(['the','be','to','of','and','that','have','with'],
            w -> list_contains(tokens, w))) AS stop_hits
        FROM base)
      SELECT doc_id, n_words,
        (n_words BETWEEN 50 AND 100000) AS r_word_count, stop_hits
      FROM sig ORDER BY doc_id""",
    "stream_centroid_real" -> """
      WITH v AS (SELECT CAST(label AS BIGINT) AS label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
      e AS (SELECT label, i, v[i] AS x FROM (
              SELECT label, v, unnest(range(1, 65)) AS i FROM v)),
      cs AS (SELECT label, i, CAST(round(sum(x) * 1e6) AS BIGINT) AS sm,
               count(*) AS nd FROM e GROUP BY 1, 2),
      cent0 AS (SELECT label, max(nd) AS n_vecs, list(sm ORDER BY i) AS sml
                FROM cs GROUP BY 1)
      SELECT label, n_vecs,
        round(sqrt(list_sum(list_transform(sml,
          s -> (CAST(s AS DOUBLE) / 1e6 / n_vecs) * (CAST(s AS DOUBLE) / 1e6 / n_vecs)))), 6)
          AS centroid_norm6
      FROM cent0 ORDER BY label""",
    "stream_mojibake_real" -> """
      WITH clean AS (SELECT doc_id,
          text || ' caf' || chr(233) || ' d' || chr(233) || 'j' || chr(224) ||
          chr(8217) || 'vu ' || chr(8212) || ' ' || chr(230) || chr(248) ||
          chr(229) AS text
        FROM documents)
      SELECT doc_id, (doc_id % 3 = 0) AS was_repaired, md5(text) AS fixed_md5
      FROM clean ORDER BY doc_id""",
    "stream_dedup_real" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                   CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      r AS (SELECT user_id, event_type, event_id, ts, value,
              row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS rn
            FROM e)
      SELECT user_id, event_type, event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, CAST(value AS DOUBLE) AS value
      FROM r WHERE rn = 1 ORDER BY user_id, event_type""",
    "stream_dedup" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                   CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      r AS (SELECT user_id, event_type, event_id, ts, value,
              row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS rn
            FROM e)
      SELECT user_id, event_type, event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, CAST(value AS DOUBLE) AS value
      FROM r WHERE rn = 1 ORDER BY user_id, event_type""",
    "set_array_ops" -> s"""
      WITH toks AS (SELECT doc_id, list_distinct($tokenizeSql) AS tokens FROM documents),
      q AS (SELECT tokens AS q_toks FROM toks WHERE doc_id = 0)
      SELECT t.doc_id, len(list_intersect(t.tokens, q.q_toks)) AS n_common,
        len(list_distinct(list_concat(t.tokens, q.q_toks))) AS n_union,
        list_has_any(t.tokens, q.q_toks) AS overlaps
      FROM toks t, q ORDER BY t.doc_id""",
    "setop_union" -> """
      SELECT doc_id FROM documents WHERE lang = 'en'
      UNION SELECT doc_id FROM documents WHERE source = 'src1' ORDER BY doc_id""",
    "setop_except" -> """
      SELECT doc_id FROM documents WHERE lang = 'en'
      EXCEPT SELECT doc_id FROM documents WHERE source = 'src1' ORDER BY doc_id""",
    "fn_tokenize" ->
      s"SELECT doc_id, array_to_string($tokenizeSql, ' ') AS tokens_str FROM documents ORDER BY doc_id",
    "fn_tokenize_sql" ->
      s"SELECT doc_id, array_to_string($tokenizeSql, ' ') AS tokens_str FROM documents ORDER BY doc_id",
    "fn_bpe_sql" -> s"""
      WITH $bpeDocCountCtes
      SELECT d.doc_id, coalesce(c.nb, 0) AS n_bpe_tokens,
        'w|e|a|ther|ing' AS probe
      FROM documents d LEFT JOIN __bpe_c c USING (doc_id) ORDER BY d.doc_id""",
    "text_bpe_fertility" -> s"""
      WITH $bpeDocCountCtes,
      __bpe_nc AS (SELECT doc_id, CAST(sum(len(w)) AS BIGINT) AS nc
                   FROM __bpe_w GROUP BY 1)
      SELECT d.doc_id, coalesce(nc, 0) AS n_chars,
        coalesce(nb, 0) AS n_bpe_tokens,
        CASE WHEN coalesce(nb, 0) > 0
          THEN round(CAST(nc AS DOUBLE) / nb, 6) END AS fertility6
      FROM documents d LEFT JOIN __bpe_c c USING (doc_id)
      LEFT JOIN __bpe_nc USING (doc_id)
      ORDER BY d.doc_id""",
    "fn_k_shingles" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents)
      SELECT doc_id, array_to_string(list_sort(list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1]))), '|') AS shingles_str
      FROM toks ORDER BY doc_id""",
    "fn_levenshtein" -> """
      WITH q AS (SELECT substr(substr(text, 1, 120), 1, 40) AS qk
                 FROM documents WHERE doc_id = 0)
      SELECT d.doc_id, levenshtein(substr(d.text, 1, 40), q.qk) AS edit_dist
      FROM documents d, q ORDER BY d.doc_id""",
    "fn_char_ngrams" -> """
      WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents)
      SELECT doc_id,
        CASE WHEN len(t) >= 3
             THEN array_to_string(list_sort(list_distinct(list_transform(range(1, len(t) - 1), i -> t[i:i+2]))), '')
             ELSE '' END AS ngrams_str
      FROM n ORDER BY doc_id""",
    "fn_bool_vectorizer" -> s"""
      WITH ${docCtes(cfg16)},
      vocab AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS idx
                FROM (SELECT DISTINCT s FROM expl))
      SELECT e.doc_id, array_to_string(list_sort(list(v.idx)), ',') AS bool_vec_str
      FROM expl e JOIN vocab v ON e.s = v.s GROUP BY e.doc_id ORDER BY e.doc_id""",
    "fn_minhash_sig" -> s"""
      WITH ${docCtes(cfg16)}
      SELECT doc_id, array_to_string(signature, ',') AS signature_str FROM sig ORDER BY doc_id""",
    "fn_minhash_agg" -> s"""
      WITH ${docCtes(cfg16)}
      SELECT doc_id, array_to_string(signature, ',') AS signature_str FROM sig ORDER BY doc_id""",
    "fn_minhash_weighted" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      gr AS (SELECT doc_id, list_transform(range(1, len(tokens)),
               i -> tokens[i] || ' ' || tokens[i+1]) AS grams
             FROM toks WHERE len(tokens) >= 2),
      expl AS (SELECT doc_id, unnest(grams) AS g,
                 generate_subscripts(grams, 1) AS pos FROM gr),
      tagged AS (SELECT doc_id,
                   g || '#' || CAST(row_number() OVER (
                     PARTITION BY doc_id, g ORDER BY pos) - 1 AS VARCHAR) AS tg
                 FROM expl),
      hashed AS (SELECT doc_id, r.h, min(md5(r.h::VARCHAR || tg)) AS m
                 FROM tagged CROSS JOIN range(${cfg16.numHash}) r(h)
                 GROUP BY doc_id, r.h),
      sig AS (SELECT doc_id, list(m ORDER BY h) AS signature FROM hashed GROUP BY doc_id)
      SELECT doc_id, array_to_string(signature, ',') AS signature_str
      FROM sig ORDER BY doc_id""",
    "dedup_weighted_pairs" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      gr AS (SELECT doc_id, list_transform(range(1, len(tokens)),
               i -> tokens[i] || ' ' || tokens[i+1]) AS grams
             FROM toks WHERE len(tokens) >= 2),
      expl AS (SELECT doc_id, unnest(grams) AS g,
                 generate_subscripts(grams, 1) AS pos FROM gr),
      tagged AS (SELECT doc_id,
                   g || '#' || CAST(row_number() OVER (
                     PARTITION BY doc_id, g ORDER BY pos) - 1 AS VARCHAR) AS tg
                 FROM expl),
      hashed AS (SELECT doc_id, r.h, min(md5(r.h::VARCHAR || tg)) AS m
                 FROM tagged CROSS JOIN range(${cfg16.numHash}) r(h)
                 GROUP BY doc_id, r.h),
      sig AS (SELECT doc_id, list(m ORDER BY h) AS signature FROM hashed GROUP BY doc_id),
      buck AS (
        SELECT doc_id, list_distinct(list_transform(range(0, ${cfg16.numBands}), b ->
          substr(md5(array_to_string(signature[(b*${cfg16.numRows}+1):(b*${cfg16.numRows}+${cfg16.numRows})], '|')), 1, ${cfg16.bucketHexLen}))) AS bucket_ids
        FROM sig),
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(CAST(len(list_filter(range(1, ${cfg16.numHash + 1}), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
            / least(len(sa.signature), len(sb.signature)) AS FLOAT4) AS w_jaccard
        FROM pairs p JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id)
      SELECT a_id, b_id, w_jaccard FROM scored WHERE w_jaccard >= 0.4
      ORDER BY a_id, b_id""",
    "fn_simhash_md5" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
      hx AS (SELECT doc_id, substr(md5(t), 1, 16) AS h FROM tok),
      bits AS (
        SELECT doc_id, i.i, b.b,
          CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST(i.i AS INT), 1)) - 1)
                     & (1 << CAST(b.b AS INT))) > 0 THEN 1 ELSE -1 END AS w
        FROM hx, range(1, 17) i(i), range(0, 4) b(b)),
      maj AS (SELECT doc_id, i, b, CASE WHEN sum(w) >= 0 THEN 1 ELSE 0 END AS bit
              FROM bits GROUP BY 1, 2, 3),
      nib AS (SELECT doc_id, i, sum(bit * (1 << CAST(b AS INT))) AS v
              FROM maj GROUP BY 1, 2),
      sh AS (SELECT doc_id,
               string_agg(substr('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY i) AS simhash
             FROM nib GROUP BY 1)
      SELECT doc_id, simhash FROM sh ORDER BY doc_id""",
    // md5-mode SimHash pair dedup: rebuild each fingerprint's 32-bit halves
    // from the majority nibbles (hi = nibbles 1-8, lo = 9-16), then the
    // brute Hamming pair set — the banded Spark plan must find EXACTLY the
    // pairs within maxDist 3 (pigeonhole: complete for <= 3 over 4 bands)
    "dedup_simhash_pairs" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
      hx AS (SELECT doc_id, substr(md5(t), 1, 16) AS h FROM tok),
      bits AS (
        SELECT doc_id, i.i, b.b,
          CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST(i.i AS INT), 1)) - 1)
                     & (1 << CAST(b.b AS INT))) > 0 THEN 1 ELSE -1 END AS w
        FROM hx, range(1, 17) i(i), range(0, 4) b(b)),
      maj AS (SELECT doc_id, i, b, CASE WHEN sum(w) >= 0 THEN 1 ELSE 0 END AS bit
              FROM bits GROUP BY 1, 2, 3),
      nib AS (SELECT doc_id, i, sum(bit * (1 << CAST(b AS INT))) AS v
              FROM maj GROUP BY 1, 2),
      halves AS (SELECT doc_id,
               sum(CASE WHEN i <= 8 THEN v * power(16, 8 - i) ELSE 0 END)::BIGINT AS hi,
               sum(CASE WHEN i > 8 THEN v * power(16, 16 - i) ELSE 0 END)::BIGINT AS lo
             FROM nib GROUP BY 1)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
      FROM halves a JOIN halves b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
      ORDER BY a_id, b_id""",
    "fn_buckenize" -> s"""
      WITH ${docCtes(cfg16)}
      SELECT doc_id, array_to_string(list_sort(bucket_ids), ',') AS bucket_ids_str
      FROM buck ORDER BY doc_id""",
    "stream_index_update" -> s"""
      WITH ${docCtes(cfg16)}
      SELECT s.doc_id, array_to_string(s.signature, ',') AS signature_str,
        array_to_string(list_sort(b.bucket_ids), ',') AS bucket_ids_str
      FROM sig s JOIN buck b USING (doc_id) ORDER BY s.doc_id""",
    // compaction must land exactly where a fresh batch build would: the
    // superseded preliminary signatures are gone, so the recomputation over
    // the final corpus (the stream_index_update oracle) replays verbatim
    "stream_index_compact" -> s"""
      WITH ${docCtes(cfg16)}
      SELECT s.doc_id, array_to_string(s.signature, ',') AS signature_str,
        array_to_string(list_sort(b.bucket_ids), ',') AS bucket_ids_str
      FROM sig s JOIN buck b USING (doc_id) ORDER BY s.doc_id""",
    "sim_recall_ivf" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    "sim_recall_filtered" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    "sim_topk_filtered" -> """
      WITH q AS (SELECT embedding AS q_v FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.q_v[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings e, q WHERE e.vec_id <> 0 AND e.label = 2)
      SELECT vec_id, round(cosine, 6) AS cos6 FROM scored
      ORDER BY cos6 DESC, vec_id LIMIT 10""",
    "sim_topk_filtered_batch" -> """
      WITH q AS (SELECT vec_id AS qid, embedding AS q_v FROM embeddings
                 WHERE vec_id < 10),
      scored AS (
        SELECT q.qid, e.vec_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.q_v[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.qid AND e.label = 2),
      r AS (SELECT qid, vec_id, cosine,
              row_number() OVER (PARTITION BY qid
                ORDER BY cosine DESC, vec_id) AS rn
            FROM scored)
      SELECT qid, vec_id, round(cosine, 6) AS cos6 FROM r WHERE rn <= 5
      ORDER BY qid, cos6 DESC, vec_id""",
    // the loaded coarse-quantizer replay shares sim_recall_ivf's floor
    "sim_recall_ivf_loaded" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    // vector takedown: deleted queries vanish from the eval set, every
    // surviving query keeps the floor and returns no deleted id, in both
    // serving states (markers-only and compacted)
    "sim_recall_ivf_deleted" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, true AS clean,
             st.stage
      FROM embeddings CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      WHERE vec_id < 20 AND vec_id % 17 <> 3
      ORDER BY st.stage, qid""",
    // vector upsert: every query keeps the floor vs brute-over-FINAL
    // vectors in both serving states (pre-compaction winner resolution
    // and post-compaction physical supersession)
    "sim_recall_ivf_upsert" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, st.stage
      FROM embeddings CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      WHERE vec_id < 20
      ORDER BY st.stage, qid""",
    // vector takedown audit: the expected physical rows replay the event
    // set (every audited id stored at seq 1; id 3 re-embedded at seq 2;
    // id 5 marked at seq 2) — cell correctness is the engine-side
    // featurize replay through the shared write-path expression
    "sim_postings_audit" -> """
      WITH a AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(1 AS BIGINT) AS ingest_seq,
               'vector' AS kind, true AS cell_ok
        FROM embeddings WHERE vec_id IN (3, 4, 5)
        UNION ALL SELECT CAST(3 AS BIGINT), CAST(2 AS BIGINT), 'vector', true
        UNION ALL SELECT CAST(5 AS BIGINT), CAST(2 AS BIGINT), 'marker', true)
      SELECT vec_id, ingest_seq, kind, cell_ok FROM a
      ORDER BY vec_id, ingest_seq, kind""",
    // vector maintenance debt is a pure function of the audit index's
    // event set: one superseded row per re-embedded id, one pending
    // marker, no generations (rename-mode table => -1)
    "sim_maintenance_debt" -> """
      SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 17 = 3)
               AS superseded_rows,
             CAST(1 AS BIGINT) AS markers_pending,
             CAST(-1 AS BIGINT) AS gen_lists_max""",
    // retrain rebuilds the index over the current truth: the takedowns
    // stay excluded (clean) and recall holds vs brute over the final
    // vectors, in the retrained state and after continued maintenance
    "sim_recall_ivf_retrain" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, true AS clean,
             'post_retrain' AS stage
      FROM embeddings WHERE vec_id < 20 AND vec_id <> 5
      UNION ALL
      SELECT CAST(vec_id AS BIGINT), true, true, true, true, 'post_delete'
      FROM embeddings WHERE vec_id < 20 AND vec_id NOT IN (5, 6)
      ORDER BY stage, qid""",
    // text-side maintenance debt replays the featurize pipeline: the one
    // tombstoned doc's bucket count IS the dead-posting count
    "ann_maintenance_debt" -> s"""
      WITH ${docCtes(cfg16)}
      SELECT 1 AS log_files, CAST(1 AS BIGINT) AS backlog_ids,
             (SELECT CAST(len(bucket_ids) AS BIGINT) FROM buck
              WHERE doc_id = 82) AS dead_postings""",
    // PQ retrain shares the retrain contract verbatim
    "sim_recall_pq_retrain" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, true AS clean,
             'post_retrain' AS stage
      FROM embeddings WHERE vec_id < 20 AND vec_id <> 5
      UNION ALL
      SELECT CAST(vec_id AS BIGINT), true, true, true, true, 'post_delete'
      FROM embeddings WHERE vec_id < 20 AND vec_id NOT IN (5, 6)
      ORDER BY stage, qid""",
    // the object-store-safe manifest swap changes the commit protocol,
    // never answers — the upsert contract verbatim
    "sim_recall_ivf_manifest" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, st.stage
      FROM embeddings CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      WHERE vec_id < 20
      ORDER BY st.stage, qid""",
    // named snapshots: `frozen` replays in DuckDB as "the pinned read is
    // the full pin-time corpus at seq 1" — the engine computes it from
    // the pinned manifest AFTER a live upsert + physical compaction
    "sim_snapshot_pin" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, st.stage,
             true AS frozen
      FROM embeddings
           CROSS JOIN (VALUES ('pinned'), ('exported'), ('live')) st(stage)
      WHERE vec_id < 20
      ORDER BY st.stage, qid""",
    // takedown pierces the pin: id 5 invisible in BOTH serving states,
    // markers retained-while-pinned then cleared after the unpin
    "sim_snapshot_takedown" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, true AS clean,
             st.stage, true AS pinned_clean, true AS live_scrubbed,
             true AS marker_lifecycle
      FROM embeddings CROSS JOIN (VALUES ('pinned'), ('live')) st(stage)
      WHERE vec_id < 20 AND vec_id <> 5
      ORDER BY st.stage, qid""",
    // the vector streaming sink's debt trigger: recall floor over the
    // final vectors + the compacted-by-debt physical claim (the harness
    // never compacts — only the in-sink trigger can zero the superseded
    // rows, so `true` here IS the mid-stream-firing oracle)
    "stream_vec_debt_compact" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok,
             true AS compacted_by_debt
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    // the pure-append fan-out fold: the row count is the replayable
    // number (seed corpus + the streamed new-document copy); the
    // booleans are claims only the in-sink fold can satisfy
    "stream_vec_gen_compact" -> """
      SELECT 2 * count(*) AS n_rows, true AS gen_bounded,
             true AS fold_fired, true AS state_equal
      FROM embeddings WHERE vec_id < 500""",
    // the vector change feed: vec 5 taken down (never a query, serves
    // excluded — the clean column), vec 6 resurrected at its newest
    // version, recall floor in both serving states
    "stream_vec_takedown_real" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok,
             true AS clean, st.stage, true AS resurrected
      FROM embeddings CROSS JOIN (VALUES ('served'), ('compacted')) st(stage)
      WHERE vec_id < 20 AND vec_id <> 5
      ORDER BY st.stage, qid""",
    // the PQ family shares the takedown contract verbatim
    "sim_recall_pq_deleted" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, true AS clean,
             st.stage
      FROM embeddings CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      WHERE vec_id < 20 AND vec_id % 17 <> 3
      ORDER BY st.stage, qid""",
    "sim_recall_pq" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    // PQ upsert shares the vector-upsert contract verbatim
    "sim_recall_pq_upsert" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok, st.stage
      FROM embeddings CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      WHERE vec_id < 20
      ORDER BY st.stage, qid""",
    // the loaded-model replay answers bit-identically to the fitted run
    // (OperatorSpec asserts the stronger equality) — same floor oracle
    "sim_recall_pq_loaded" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    "sim_recall_pq_rerank" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok,
             true AS sane_ok, true AS mean_recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    "stream_semantic_dedup_real" -> """
      WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings),
      seeds AS (SELECT id, embedding FROM v ORDER BY id LIMIT 8),
      cents AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS j,
          list_transform(embedding, x -> CAST(x AS DOUBLE) /
            sqrt(list_sum(list_transform(embedding,
              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS c
        FROM seeds),
      dots AS (SELECT v.id, cents.j,
          CAST(round(list_sum(list_transform(range(1, 65),
            i -> CAST(v.embedding[i] AS DOUBLE) * cents.c[i])) * 1e6) AS BIGINT) AS dotr
        FROM v CROSS JOIN cents),
      asg AS (SELECT id, j AS cell FROM (
          SELECT id, j,
            row_number() OVER (PARTITION BY id ORDER BY dotr DESC, j ASC) AS rn
          FROM dots) WHERE rn = 1),
      vv AS (SELECT v.id, aa.cell, v.embedding
             FROM v JOIN asg aa ON aa.id = v.id),
      hit AS (SELECT DISTINCT a.id
        FROM vv a JOIN vv b ON b.cell = a.cell AND b.id < a.id
        WHERE list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0)
          >= 0.35)
      SELECT vv.id AS vec_id, vv.cell, hit.id IS NULL AS kept
      FROM vv LEFT JOIN hit ON hit.id = vv.id ORDER BY vec_id""",
    "stream_ivf_update_real" -> """
      SELECT CAST(vec_id AS BIGINT) AS vec_id, true AS cell_matches,
        true AS codes_match
      FROM embeddings ORDER BY vec_id""",
    "sim_recall_int8" -> """
      SELECT CAST(vec_id AS BIGINT) AS qid, true AS recall_ok
      FROM embeddings WHERE vec_id < 20 ORDER BY qid""",
    "sim_topk_int8" -> """
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      s AS (SELECT vec_id,
              greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS sc, v
            FROM e),
      dq AS (SELECT vec_id,
               list_transform(v, x -> CAST(round(x / sc) AS INTEGER) * sc) AS dv
             FROM s),
      q AS (SELECT dv AS q_v FROM dq WHERE vec_id = 0),
      scored AS (
        SELECT d.vec_id,
          list_sum(list_transform(range(1, 65), i -> d.dv[i] * q.q_v[i]))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> d.dv[i] * d.dv[i]))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> q.q_v[i] * q.q_v[i]))), 0.0) AS cosine
        FROM dq d, q WHERE d.vec_id <> 0)
      SELECT CAST(vec_id AS BIGINT) AS vec_id, round(cosine, 6) AS cos6 FROM scored
      ORDER BY cos6 DESC, vec_id LIMIT 10""",
    "text_token_budget" -> s"""
      WITH toks AS (SELECT doc_id, n_chars, $tokenizeSql AS tokens FROM documents),
      t AS (SELECT doc_id, n_chars, len(tokens) AS nt FROM toks),
      c AS (SELECT doc_id, nt,
              sum(nt) OVER (ORDER BY n_chars DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
      SELECT doc_id, nt AS n_tokens, CAST(cum AS BIGINT) AS cum_tokens
      FROM c WHERE cum <= 15000 ORDER BY doc_id""",
    "text_unigram_logprob" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      p AS (SELECT doc_id, unnest(tokens) AS token FROM toks),
      f AS (SELECT token, count(*) AS c FROM p GROUP BY 1),
      t AS (SELECT sum(c) AS total FROM f),
      lp AS (SELECT token,
               CAST(round(ln(CAST(c AS DOUBLE) / total) * 1e6) AS BIGINT) AS lpi
             FROM f, t),
      per AS (SELECT doc_id, count(*) AS n_tokens, sum(lpi) AS s
              FROM p JOIN lp USING (token) GROUP BY 1)
      SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens,
        round(CAST(round(CAST(per.s AS DOUBLE) / per.n_tokens) AS BIGINT) / 1e6, 6) AS avg_logprob6
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "text_ccnet_buckets" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      p AS (SELECT doc_id, unnest(tokens) AS token FROM toks),
      f AS (SELECT token, count(*) AS c FROM p GROUP BY 1),
      t AS (SELECT sum(c) AS total FROM f),
      lp AS (SELECT token,
               CAST(round(ln(CAST(c AS DOUBLE) / total) * 1e6) AS BIGINT) AS lpi
             FROM f, t),
      per AS (SELECT doc_id, count(*) AS n_tokens, sum(lpi) AS s
              FROM p JOIN lp USING (token) GROUP BY 1),
      am AS (SELECT doc_id, n_tokens,
               CAST(round(CAST(s AS DOUBLE) / n_tokens) AS BIGINT) AS avg_micro
             FROM per)
      SELECT d.doc_id, coalesce(am.n_tokens, 0) AS n_tokens,
        CASE WHEN am.avg_micro IS NULL THEN 'unscored'
             WHEN am.avg_micro >= -3400000 THEN 'head'
             WHEN am.avg_micro < -3404000 THEN 'tail'
             ELSE 'middle' END AS ppl_bucket
      FROM documents d LEFT JOIN am USING (doc_id) ORDER BY d.doc_id""",
    "text_ccnet_calibrated" -> s"""
      WITH ttoks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents
                     WHERE doc_id % 2 = 0),
      tp AS (SELECT doc_id, unnest(tokens) AS token FROM ttoks),
      tf AS (SELECT token, count(*) AS c FROM tp GROUP BY 1),
      tt AS (SELECT sum(c) AS total FROM tf),
      tlp AS (SELECT token,
                CAST(round(ln(CAST(c AS DOUBLE) / total) * 1e6) AS BIGINT) AS lpi
              FROM tf, tt),
      tper AS (SELECT doc_id, count(*) AS n, sum(lpi) AS s
               FROM tp JOIN tlp USING (token) GROUP BY 1),
      tavg AS (SELECT CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS avg FROM tper),
      tot AS (SELECT count(*) AS n FROM tavg),
      ks AS (SELECT CAST(greatest(1, ceil(0.7 * n)) AS BIGINT) AS kh,
                    CAST(greatest(1, ceil(0.3 * n)) AS BIGINT) AS kt, n FROM tot),
      cum AS (SELECT avg, sum(count(*)) OVER (ORDER BY avg) AS cumc
              FROM tavg GROUP BY avg),
      hc AS (SELECT min(avg) AS v FROM cum, ks WHERE cumc >= kh),
      tc AS (SELECT min(avg) AS v FROM cum, ks WHERE cumc >= kt),
      disc AS (SELECT quantile_disc(avg, 0.7) AS dh,
                      quantile_disc(avg, 0.3) AS dt FROM tavg),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      p AS (SELECT doc_id, unnest(tokens) AS token FROM toks),
      f AS (SELECT token, count(*) AS c FROM p GROUP BY 1),
      t AS (SELECT sum(c) AS total FROM f),
      lp AS (SELECT token,
               CAST(round(ln(CAST(c AS DOUBLE) / total) * 1e6) AS BIGINT) AS lpi
             FROM f, t),
      per AS (SELECT doc_id, count(*) AS n_tokens, sum(lpi) AS s
              FROM p JOIN lp USING (token) GROUP BY 1),
      am AS (SELECT doc_id, n_tokens,
               CAST(round(CAST(s AS DOUBLE) / n_tokens) AS BIGINT) AS avg_micro
             FROM per)
      SELECT d.doc_id, coalesce(am.n_tokens, 0) AS n_tokens,
        CASE WHEN am.avg_micro IS NULL THEN 'unscored'
             WHEN am.avg_micro >= hc.v THEN 'head'
             WHEN am.avg_micro < tc.v THEN 'tail'
             ELSE 'middle' END AS ppl_bucket,
        ks.n AS n_cal, hc.v AS head_cut, tc.v AS tail_cut,
        (hc.v = disc.dh) AS head_matches_disc,
        (tc.v = disc.dt) AS tail_matches_disc
      FROM documents d LEFT JOIN am USING (doc_id)
      CROSS JOIN hc CROSS JOIN tc CROSS JOIN disc CROSS JOIN ks
      ORDER BY d.doc_id""",
    "text_compression_signal" -> """
      SELECT count(*) AS n_docs, true AS ratios_bounded, true AS avg_in_band,
        true AS probe_ordering FROM documents""",
    "text_char_entropy" -> """
      WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
                  FROM documents),
      cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
      per AS (SELECT doc_id, count(*) AS nd, sum(n) AS total,
                sum(CAST(round(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1e6)
                  AS BIGINT)) AS s
              FROM cc GROUP BY 1)
      SELECT d.doc_id, coalesce(per.nd, 0) AS n_distinct_chars,
        round(CAST(round((CAST(round(CAST(per.total AS DOUBLE)
              * ln(CAST(per.total AS DOUBLE)) * 1e6) AS BIGINT) - per.s)
            / CAST(per.total AS DOUBLE)) AS BIGINT) / 1e6, 6) AS entropy6
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "text_bigram_backoff" -> s"""
      WITH toks AS (SELECT doc_id, (doc_id % 2 = 0) AS is_train,
          $tokenizeSql AS tokens FROM documents),
      occ AS (SELECT doc_id, is_train, unnest(tokens) AS token FROM toks),
      bg AS (SELECT doc_id, is_train,
               unnest(list_transform(range(1, len(tokens)),
                 i -> tokens[i] || ' ' || tokens[i + 1])) AS bigram
             FROM toks),
      c2 AS (SELECT bigram, count(*) AS c2 FROM bg WHERE is_train GROUP BY 1),
      c1 AS (SELECT token, count(*) AS c1 FROM occ WHERE is_train GROUP BY 1),
      t AS (SELECT sum(c1) AS n, count(*) AS v FROM c1),
      sc AS (SELECT b.doc_id,
               CAST(round(ln(CASE WHEN c2.c2 IS NOT NULL
                   THEN CAST(c2.c2 AS DOUBLE) / w1.c1
                   ELSE 0.4 * CAST(coalesce(w2.c1, 0) + 1 AS DOUBLE)
                        / CAST(t.n + t.v AS DOUBLE) END) * 1e6) AS BIGINT) AS lsi
             FROM bg b
             LEFT JOIN c2 ON b.bigram = c2.bigram
             LEFT JOIN c1 w1 ON string_split(b.bigram, ' ')[1] = w1.token
             LEFT JOIN c1 w2 ON string_split(b.bigram, ' ')[-1] = w2.token
             CROSS JOIN t),
      per AS (SELECT doc_id, count(*) AS n_bigrams, sum(lsi) AS s
              FROM sc GROUP BY 1)
      SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
        round(CAST(round(CAST(per.s AS DOUBLE) / per.n_bigrams) AS BIGINT)
          / 1e6, 6) AS avg_ls6
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "text_zipf_fit" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      occ AS (SELECT unnest(tokens) AS t FROM toks),
      cnt AS (SELECT t, count(*) AS c FROM occ GROUP BY 1),
      top AS (SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS r
              FROM cnt QUALIFY r <= 500),
      m AS (SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                   CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
            FROM top),
      s AS (SELECT count(*) AS n,
              sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM m)
      SELECT n AS v_fit,
        round(CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope6,
        round((CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
          / n / 1e6, 6) AS intercept6,
        round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
          / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
          AS r2_6
      FROM s""",
    "flt_sample_weighted" -> """
      WITH s AS (SELECT doc_id, n_chars,
          (CAST(CAST('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS UBIGINT) AS DOUBLE) + 1) / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0)
      SELECT doc_id, n_chars,
        CAST(round(ln(u) / CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS key_micro
      FROM s ORDER BY key_micro DESC, doc_id LIMIT 100""",
    "text_sentence_split" -> """
      WITH planted AS (SELECT doc_id,
          text || '. ' || substr(text, 1, 40) || '! '
            || substr(text, 1, 20) || '?' AS text
        FROM documents),
      s AS (SELECT doc_id,
          list_filter(list_transform(
            regexp_extract_all(text, '[^.!?]+[.!?]*', 0), x -> trim(x)),
            x -> x <> '') AS sents
        FROM planted)
      SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sentences,
        md5(array_to_string(sents, '|')) AS digest
      FROM s ORDER BY doc_id""",
    "text_rake_keywords" -> s"""
      WITH de AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
      tk AS (SELECT doc_id, $tokenizeSql AS tokens FROM de),
      tok AS (SELECT doc_id,
          unnest(range(1, len(tokens) + 1)) - 1 AS pos,
          unnest(tokens) AS w
        FROM tk),
      ns AS (SELECT doc_id, pos, w FROM tok
             WHERE NOT list_contains(${stopwordList("en")}, w)),
      ph AS (SELECT doc_id, pos, w,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS anchor
        FROM ns),
      wl AS (SELECT doc_id, anchor, pos, w,
          count(*) OVER (PARTITION BY doc_id, anchor) AS plen FROM ph),
      ws AS (SELECT w,
          (CAST(sum(plen) AS BIGINT) * 1000000) // count(*) AS wscore
        FROM wl GROUP BY 1),
      pr AS (SELECT wl.doc_id, wl.anchor,
          string_agg(wl.w, ' ' ORDER BY wl.pos) AS phrase,
          CAST(sum(ws.wscore) AS BIGINT) AS pscore
        FROM wl JOIN ws USING (w) GROUP BY 1, 2)
      SELECT phrase, count(*) AS n_occurrences, min(pscore) AS score_micro
      FROM pr GROUP BY 1 ORDER BY score_micro DESC, phrase LIMIT 100""",
    "text_js_div" -> s"""
      WITH ta AS (SELECT $tokenizeSql AS tokens FROM documents WHERE lang = 'en'),
      tb AS (SELECT $tokenizeSql AS tokens FROM documents WHERE lang = 'de'),
      oa AS (SELECT unnest(tokens) AS w FROM ta),
      ob AS (SELECT unnest(tokens) AS w FROM tb),
      ca AS (SELECT w, count(*) AS ca FROM oa GROUP BY 1),
      cb AS (SELECT w, count(*) AS cb FROM ob GROUP BY 1),
      tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM oa) AS na,
                     (SELECT CAST(count(*) AS BIGINT) FROM ob) AS nb),
      j AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
            FROM ca FULL OUTER JOIN cb USING (w)),
      t AS (SELECT ca, cb,
              CAST(ca AS DOUBLE) / na AS p, CAST(cb AS DOUBLE) / nb AS q
            FROM j CROSS JOIN tot),
      terms AS (SELECT ca, cb,
          CAST(round((CASE WHEN ca > 0
              THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0.0 END +
            CASE WHEN cb > 0
              THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0.0 END) * 1e6)
            AS BIGINT) AS term_micro
        FROM t)
      SELECT CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab_a,
        CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab_b,
        CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        CAST(sum(term_micro) AS BIGINT) AS jsd_micro
      FROM terms""",
    "text_pmi_colloc" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      occ AS (SELECT unnest(tokens) AS w FROM toks),
      uc AS (SELECT w, count(*) AS c FROM occ GROUP BY 1),
      tot AS (SELECT count(*) AS n FROM occ),
      bg AS (SELECT unnest(list_transform(range(1, len(tokens)),
                      i -> tokens[i])) AS w1,
                    unnest(list_transform(range(1, len(tokens)),
                      i -> tokens[i + 1])) AS w2
             FROM toks WHERE len(tokens) >= 2),
      bc AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2
             HAVING count(*) >= 5),
      p AS (SELECT b.w1, b.w2, b.c_ab, ua.c AS c_a, ub.c AS c_b,
              CAST(round(ln(CAST(b.c_ab AS DOUBLE) * CAST(tot.n AS DOUBLE)
                  / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))) * 1e6)
                AS BIGINT) AS pmi_micro
            FROM bc b JOIN uc ua ON b.w1 = ua.w
              JOIN uc ub ON b.w2 = ub.w CROSS JOIN tot)
      SELECT w1, w2, c_ab, c_a, c_b, pmi_micro
      FROM p ORDER BY pmi_micro DESC, w1, w2 LIMIT 100""",
    "text_report_card" -> s"""
      WITH planted AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 0
            THEN ' one. two. three. four. five. six. seven. eight. nine. ten.'
            WHEN doc_id % 3 = 1 THEN '.'
            ELSE '' END AS text
        FROM documents),
      toks AS (SELECT doc_id, text, $tokenizeSql AS tokens FROM planted),
      sig AS (SELECT doc_id, tokens,
          CAST(len(tokens) AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        FROM toks),
      fk AS (SELECT doc_id, tokens, n_words,
          CASE WHEN n_words > 0 AND n_sentences > 0
            THEN round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
              + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6)
          END AS g
        FROM sig),
      lang AS (SELECT doc_id,
          len(list_filter(tokens, t -> list_contains(${stopwordList("de")}, t))) AS de_hits,
          len(list_filter(tokens, t -> list_contains(${stopwordList("en")}, t))) AS en_hits,
          len(list_filter(tokens, t -> list_contains(${stopwordList("es")}, t))) AS es_hits,
          len(list_filter(tokens, t -> list_contains(${stopwordList("fr")}, t))) AS fr_hits
        FROM fk),
      j AS (SELECT f.doc_id, f.n_words,
          CASE
            WHEN l.de_hits >= l.en_hits AND l.de_hits >= l.es_hits AND l.de_hits >= l.fr_hits AND l.de_hits > 0 THEN 'de'
            WHEN l.en_hits >= l.es_hits AND l.en_hits >= l.fr_hits AND l.en_hits > 0 THEN 'en'
            WHEN l.es_hits >= l.fr_hits AND l.es_hits > 0 THEN 'es'
            WHEN l.fr_hits > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred,
          CASE WHEN f.g IS NULL THEN 'none'
               WHEN f.g < 5.0 THEN 'easy'
               WHEN f.g <= 10.0 THEN 'mid'
               ELSE 'hard' END AS fk_band
        FROM fk f JOIN lang l USING (doc_id))
      SELECT lang_pred, fk_band, count(*) AS n_docs,
        CAST(sum(n_words) AS BIGINT) AS n_tokens
      FROM j GROUP BY 1, 2 ORDER BY lang_pred, fk_band""",
    "text_readability" -> s"""
      WITH sig AS (SELECT doc_id,
          CAST(len($tokenizeSql) AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        CASE WHEN n_words > 0 AND n_sentences > 0
          THEN round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
            + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6)
        END AS fk_grade6
      FROM sig ORDER BY doc_id""",
    "text_kn_bigram" -> s"""
      WITH toks AS (SELECT doc_id, (doc_id % 2 = 0) AS is_train,
          $tokenizeSql AS tokens FROM documents),
      occ AS (SELECT doc_id, is_train, unnest(tokens) AS token FROM toks),
      bg AS (SELECT doc_id, is_train,
               unnest(list_transform(range(1, len(tokens)),
                 i -> tokens[i] || ' ' || tokens[i + 1])) AS bigram
             FROM toks),
      c2 AS (SELECT bigram, count(*) AS c2,
               string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[-1] AS w2
             FROM bg WHERE is_train GROUP BY 1),
      hist AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY 1),
      cont AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY 1),
      t AS (SELECT (SELECT count(*) FROM c2) AS tt,
                   (SELECT count(DISTINCT token) FROM occ WHERE is_train) AS v),
      sc AS (SELECT b.doc_id,
               CAST(round(ln(CASE WHEN h.c1 IS NOT NULL
                   THEN greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE) - 0.75, 0.0)
                          / h.c1
                        + 0.75 * CAST(h.n1f AS DOUBLE) / h.c1
                          * (CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                             / CAST(t.tt + t.v AS DOUBLE))
                   ELSE CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                          / CAST(t.tt + t.v AS DOUBLE) END) * 1e6) AS BIGINT) AS lsi
             FROM bg b
             LEFT JOIN c2 ON b.bigram = c2.bigram
             LEFT JOIN hist h ON string_split(b.bigram, ' ')[1] = h.w1
             LEFT JOIN cont ct ON string_split(b.bigram, ' ')[-1] = ct.w2
             CROSS JOIN t),
      per AS (SELECT doc_id, count(*) AS n_bigrams, sum(lsi) AS s
              FROM sc GROUP BY 1)
      SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
        round(CAST(round(CAST(per.s AS DOUBLE) / per.n_bigrams) AS BIGINT)
          / 1e6, 6) AS avg_ls6
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "text_kn_trigram" -> s"""
      WITH toks AS (SELECT doc_id, (doc_id % 2 = 0) AS is_train,
          $tokenizeSql AS tokens FROM documents),
      occ AS (SELECT doc_id, is_train, unnest(tokens) AS token FROM toks),
      tg AS (SELECT doc_id, is_train,
               unnest(list_transform(range(1, len(tokens) - 1),
                 i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2])) AS trigram
             FROM toks),
      c3 AS (SELECT trigram, count(*) AS c3,
               string_split(trigram, ' ')[1] AS w1,
               string_split(trigram, ' ')[2] AS w2,
               string_split(trigram, ' ')[3] AS w3
             FROM tg WHERE is_train GROUP BY 1),
      h12 AS (SELECT w1, w2, sum(c3) AS c12, count(*) AS n1f12
              FROM c3 GROUP BY 1, 2),
      cc2 AS (SELECT w2, w3, count(*) AS cc2 FROM c3 GROUP BY 1, 2),
      midh AS (SELECT w2, sum(cc2) AS cc2h, count(*) AS n1fm FROM cc2 GROUP BY 1),
      cont AS (SELECT w3, count(*) AS n1b FROM cc2 GROUP BY 1),
      t AS (SELECT (SELECT count(*) FROM cc2) AS t2,
                   (SELECT count(DISTINCT token) FROM occ WHERE is_train) AS v),
      sc AS (SELECT b.doc_id,
               CAST(round(ln(
                 CASE WHEN h.c12 IS NOT NULL
                   THEN greatest(CAST(coalesce(c3.c3, 0) AS DOUBLE) - 0.75, 0.0)
                          / h.c12
                      + 0.75 * CAST(h.n1f12 AS DOUBLE) / h.c12 *
                        (CASE WHEN m.cc2h IS NOT NULL
                           THEN greatest(CAST(coalesce(cc.cc2, 0) AS DOUBLE) - 0.75, 0.0)
                                  / m.cc2h
                              + 0.75 * CAST(m.n1fm AS DOUBLE) / m.cc2h *
                                (CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                                 / CAST(t.t2 + t.v AS DOUBLE))
                           ELSE CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                                  / CAST(t.t2 + t.v AS DOUBLE) END)
                   ELSE (CASE WHEN m.cc2h IS NOT NULL
                           THEN greatest(CAST(coalesce(cc.cc2, 0) AS DOUBLE) - 0.75, 0.0)
                                  / m.cc2h
                              + 0.75 * CAST(m.n1fm AS DOUBLE) / m.cc2h *
                                (CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                                 / CAST(t.t2 + t.v AS DOUBLE))
                           ELSE CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                                  / CAST(t.t2 + t.v AS DOUBLE) END)
                 END) * 1e6) AS BIGINT) AS lsi
             FROM tg b
             LEFT JOIN c3 ON b.trigram = c3.trigram
             LEFT JOIN h12 h ON string_split(b.trigram, ' ')[1] = h.w1
               AND string_split(b.trigram, ' ')[2] = h.w2
             LEFT JOIN cc2 cc ON string_split(b.trigram, ' ')[2] = cc.w2
               AND string_split(b.trigram, ' ')[3] = cc.w3
             LEFT JOIN midh m ON string_split(b.trigram, ' ')[2] = m.w2
             LEFT JOIN cont ct ON string_split(b.trigram, ' ')[3] = ct.w3
             CROSS JOIN t),
      per AS (SELECT doc_id, count(*) AS n_trigrams, sum(lsi) AS s
              FROM sc GROUP BY 1)
      SELECT d.doc_id, coalesce(per.n_trigrams, 0) AS n_trigrams,
        round(CAST(round(CAST(per.s AS DOUBLE) / per.n_trigrams) AS BIGINT)
          / 1e6, 6) AS avg_ls6
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "text_gopher_rules" -> s"""
      WITH base AS (SELECT doc_id, text, $tokenizeSql AS tokens,
          string_split(text, chr(10)) AS lines FROM documents),
      sig AS (SELECT doc_id,
          len(tokens) AS n_words,
          CAST(coalesce(list_sum(list_transform(tokens, t -> len(t))), 0) AS DOUBLE)
            / greatest(len(tokens), 1) AS mwl,
          (len(text) - len(replace(text, '#', ''))) +
            ((len(text) - len(replace(text, '...', ''))) // 3) AS n_sym,
          len(list_filter(lines, l ->
            list_contains(['-', '*', '•'], substr(trim(l), 1, 1)))) AS n_bullet,
          len(list_filter(lines, l ->
            (len(l) >= 3 AND substr(l, len(l) - 2, 3) = '...')
            OR (len(l) >= 1 AND substr(l, len(l), 1) = '…'))) AS n_ell,
          len(list_filter(tokens, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
          len(list_filter(['the','be','to','of','and','that','have','with'],
            w -> list_contains(tokens, w))) AS stop_hits,
          greatest(len(lines), 1) AS n_lines,
          greatest(len(tokens), 1) AS dw
        FROM base)
      SELECT doc_id, n_words, round(mwl, 6) AS mwl6,
        round(CAST(n_sym AS DOUBLE) / dw, 6) AS sym6,
        round(CAST(n_alpha AS DOUBLE) / dw, 6) AS alpha6, stop_hits,
        (n_words BETWEEN 50 AND 100000) AS r_word_count,
        (mwl BETWEEN 3.0 AND 10.0) AS r_mean_word_len,
        (CAST(n_sym AS DOUBLE) / dw <= 0.1) AS r_symbol_ratio,
        (CAST(n_bullet AS DOUBLE) / n_lines <= 0.9) AS r_bullet_lines,
        (CAST(n_ell AS DOUBLE) / n_lines <= 0.3) AS r_ellipsis_lines,
        (CAST(n_alpha AS DOUBLE) / dw >= 0.8) AS r_alpha_words,
        (stop_hits >= 2) AS r_stopwords,
        ((n_words BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
          AND (CAST(n_sym AS DOUBLE) / dw <= 0.1)
          AND (CAST(n_bullet AS DOUBLE) / n_lines <= 0.9)
          AND (CAST(n_ell AS DOUBLE) / n_lines <= 0.3)
          AND (CAST(n_alpha AS DOUBLE) / dw >= 0.8)
          AND (stop_hits >= 2)) AS gopher_pass
      FROM sig ORDER BY doc_id""",
    "text_gopher_full" -> s"""
      WITH planted AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || 'repeat line' ||
                 chr(10) || 'repeat line' || chr(10) || 'repeat line' ||
                 chr(10) || 'repeat line'
               WHEN doc_id % 7 = 1 THEN text || chr(10) || chr(10) ||
                 'dup para' || chr(10) || chr(10) || 'dup para'
               WHEN doc_id % 7 = 2 THEN text || ' ' || repeat('buy now ', 40)
               WHEN doc_id % 7 = 3 THEN text || ' ' || repeat('one two three ', 60)
               ELSE text END AS text FROM documents),
      base AS (SELECT doc_id, text, $tokenizeSql AS tokens,
          string_split(text, chr(10)) AS lines FROM planted),
      sig AS (SELECT doc_id,
          len(tokens) AS n_words,
          CAST(coalesce(list_sum(list_transform(tokens, t -> len(t))), 0) AS DOUBLE)
            / greatest(len(tokens), 1) AS mwl,
          (len(text) - len(replace(text, '#', ''))) +
            ((len(text) - len(replace(text, '...', ''))) // 3) AS n_sym,
          len(list_filter(lines, l ->
            list_contains(['-', '*', '•'], substr(trim(l), 1, 1)))) AS n_bullet,
          len(list_filter(lines, l ->
            (len(l) >= 3 AND substr(l, len(l) - 2, 3) = '...')
            OR (len(l) >= 1 AND substr(l, len(l), 1) = '…'))) AS n_ell,
          len(list_filter(tokens, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
          len(list_filter(['the','be','to','of','and','that','have','with'],
            w -> list_contains(tokens, w))) AS stop_hits,
          greatest(len(lines), 1) AS n_lines,
          greatest(len(tokens), 1) AS dw
        FROM base),
      gp AS (SELECT doc_id,
          ((n_words BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
            AND (CAST(n_sym AS DOUBLE) / dw <= 0.1)
            AND (CAST(n_bullet AS DOUBLE) / n_lines <= 0.9)
            AND (CAST(n_ell AS DOUBLE) / n_lines <= 0.3)
            AND (CAST(n_alpha AS DOUBLE) / dw >= 0.8)
            AND (stop_hits >= 2)) AS gopher_pass
        FROM sig),
      lgrp AS (SELECT doc_id, l, count(*) AS c FROM
          (SELECT doc_id, unnest(lines) AS l FROM base) GROUP BY 1, 2),
      lstat AS (SELECT doc_id, CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
            / sum(c) AS dup_line_frac FROM lgrp GROUP BY 1),
      pgrp AS (SELECT doc_id, p, count(*) AS c FROM
          (SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS p
           FROM planted) GROUP BY 1, 2),
      pstat AS (SELECT doc_id, CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
            / sum(c) AS dup_para_frac FROM pgrp GROUP BY 1),
      bgrp AS (SELECT doc_id, g, count(*) AS c FROM
          (SELECT doc_id, unnest(list_transform(range(1, len(tokens)),
             i -> tokens[i] || ' ' || tokens[i + 1])) AS g FROM base) GROUP BY 1, 2),
      bstat AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
                FROM bgrp GROUP BY 1),
      tgrp AS (SELECT doc_id, g, count(*) AS c FROM
          (SELECT doc_id, unnest(list_transform(range(1, len(tokens) - 1),
             i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2])) AS g
           FROM base) GROUP BY 1, 2),
      tstat AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_trigram_frac
                FROM tgrp GROUP BY 1)
      SELECT b.doc_id,
        round(l.dup_line_frac, 6) AS dupline6,
        round(p.dup_para_frac, 6) AS duppara6,
        round(bs.top_bigram_frac, 6) AS topbi6,
        round(ts.top_trigram_frac, 6) AS toptri6,
        coalesce(l.dup_line_frac <= 0.30, true) AS r_dup_lines,
        coalesce(p.dup_para_frac <= 0.30, true) AS r_dup_paras,
        coalesce(bs.top_bigram_frac <= 0.20, true) AS r_top_bigram,
        coalesce(ts.top_trigram_frac <= 0.18, true) AS r_top_trigram,
        gp.gopher_pass,
        (gp.gopher_pass AND coalesce(l.dup_line_frac <= 0.30, true)
          AND coalesce(p.dup_para_frac <= 0.30, true)
          AND coalesce(bs.top_bigram_frac <= 0.20, true)
          AND coalesce(ts.top_trigram_frac <= 0.18, true)) AS gopher_full_pass
      FROM base b
      JOIN gp ON b.doc_id = gp.doc_id
      LEFT JOIN lstat l ON b.doc_id = l.doc_id
      LEFT JOIN pstat p ON b.doc_id = p.doc_id
      LEFT JOIN bstat bs ON b.doc_id = bs.doc_id
      LEFT JOIN tstat ts ON b.doc_id = ts.doc_id
      ORDER BY b.doc_id""",
    "text_quality_classifier" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      uni AS (SELECT doc_id, unnest(tokens) AS f FROM toks),
      bi AS (SELECT doc_id, unnest(list_transform(range(1, len(tokens)),
               i -> tokens[i] || ' ' || tokens[i + 1])) AS f FROM toks),
      occ AS (SELECT doc_id,
          CAST(CAST('0x' || substr(md5(f), 1, 8) AS UBIGINT) % 4096 AS BIGINT) AS b
        FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      per AS (SELECT doc_id, count(*) AS n_feats,
          sum((((b * 37 + 11) % 2001) - 1000) * 1000) AS s
        FROM occ GROUP BY 1),
      sc AS (SELECT doc_id, n_feats,
          CAST(round(CAST(s AS DOUBLE) / n_feats) AS BIGINT) + 20000 AS lm
        FROM per)
      SELECT d.doc_id, coalesce(sc.n_feats, 0) AS n_feats,
        round(CAST(sc.lm AS DOUBLE) / 1e6, 6) AS logit6,
        sc.lm >= 0 AS quality_pass
      FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""",
    "pipeline_ingest_warc_v2" -> """
      WITH recs AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j
                    FROM documents),
      ok AS (SELECT doc_id, j FROM recs WHERE NOT (doc_id % 5 = 0 AND j = 1)),
      p AS (SELECT doc_id * 10 + j AS page_id,
          CAST((doc_id + j) % 7 AS INTEGER) AS k,
          'host' || CAST((doc_id + j) % 7 AS VARCHAR) || '.example' AS host,
          'page ' || CAST(doc_id AS VARCHAR) || ' section ' ||
            CAST(j AS VARCHAR) || ' ' ||
            repeat('x', CAST(doc_id % 5 + j + 1 AS INTEGER)) AS body_text
        FROM ok)
      SELECT page_id, host, md5(body_text) AS page_md5,
        CAST(5 AS BIGINT) AS n_tokens
      FROM p WHERE k % 2 = 0 AND k <> 4 ORDER BY page_id""",
    // the composed pipeline's oracle replays every stage closed-form:
    // plant → robots (odd hosts drop) → blocklist (host4) → curation floor
    // (last token ≥ 3 chars) → cfg16 md5 minhash/bucket pipeline over the
    // survivors → bucket-overlap candidates → top-5 for the planted query
    "pipeline_warc_index" -> s"""
      WITH recs AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j
                    FROM documents),
      ok AS (SELECT doc_id, j FROM recs WHERE NOT (doc_id % 5 = 0 AND j = 1)),
      p AS (SELECT doc_id, j, doc_id * 10 + j AS page_id,
          CAST((doc_id + j) % 7 AS INTEGER) AS k,
          'page ' || CAST(doc_id AS VARCHAR) || ' section ' ||
            CAST(j AS VARCHAR) || ' ' ||
            repeat('x', CAST(doc_id % 5 + j + 1 AS INTEGER)) AS body
        FROM ok),
      surv AS (SELECT page_id, body FROM p
               WHERE k % 2 = 0 AND k <> 4 AND doc_id % 5 + j + 1 >= 3),
      toksw AS (SELECT page_id, string_split(body, ' ') AS tokens FROM surv),
      shingw AS (SELECT page_id, list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles FROM toksw),
      explw AS (SELECT page_id, unnest(shingles) AS s FROM shingw),
      hashedw AS (SELECT page_id, r.h, min(md5(r.h::VARCHAR || s)) AS m
                  FROM explw CROSS JOIN range(16) r(h) GROUP BY page_id, r.h),
      sigw AS (SELECT page_id, list(m ORDER BY h) AS signature FROM hashedw GROUP BY page_id),
      buckw AS (SELECT page_id, list_distinct(list_transform(range(0, 4), b ->
          substr(md5(array_to_string(signature[(b*4+1):(b*4+4)], '|')), 1, 2))) AS bucket_ids
        FROM sigw),
      qtoks AS (SELECT string_split('page 2 section 0 xxx', ' ') AS tokens),
      qshing AS (SELECT list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles FROM qtoks),
      qexpl AS (SELECT unnest(shingles) AS s FROM qshing),
      qhashed AS (SELECT r.h, min(md5(r.h::VARCHAR || s)) AS m
                  FROM qexpl CROSS JOIN range(16) r(h) GROUP BY r.h),
      qsig AS (SELECT list(m ORDER BY h) AS signature FROM qhashed),
      qbuck AS (SELECT list_distinct(list_transform(range(0, 4), b ->
          substr(md5(array_to_string(signature[(b*4+1):(b*4+4)], '|')), 1, 2))) AS bucket_ids
        FROM qsig),
      cand AS (SELECT s.page_id, s.signature
               FROM sigw s JOIN buckw b USING (page_id), qbuck q
               WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (SELECT c.page_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.page_id, s2.body AS text, sc.jaccard
      FROM scored sc JOIN surv s2 USING (page_id)
      ORDER BY sc.jaccard DESC, sc.page_id LIMIT 5""",
    "pipeline_ingest_warc" -> """
      WITH recs AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j
                    FROM documents),
      ok AS (SELECT doc_id, j FROM recs WHERE NOT (doc_id % 5 = 0 AND j = 1)),
      p AS (SELECT doc_id * 10 + j AS page_id,
          'host' || CAST((doc_id + j) % 7 AS VARCHAR) || '.example' AS host,
          'page ' || CAST(doc_id AS VARCHAR) || ' section ' ||
            CAST(j AS VARCHAR) || ' ' ||
            repeat('x', CAST(doc_id % 5 + j + 1 AS INTEGER)) AS body_text
        FROM ok)
      SELECT page_id, host, md5(body_text) AS page_md5,
        CAST(5 AS BIGINT) AS n_tokens
      FROM p WHERE host <> 'host3.example' ORDER BY page_id""",
    "text_dsir_weights" -> s"""
      WITH toks AS (SELECT doc_id, lang, $tokenizeSql AS tokens FROM documents),
      occ AS (SELECT doc_id, (lang = 'en') AS is_t,
          CAST('0x' || substr(md5(token), 1, 8) AS UBIGINT) % 1024 AS b
        FROM (SELECT doc_id, lang, unnest(tokens) AS token FROM toks)),
      c AS (SELECT b, count(*) AS cs,
              sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
            FROM occ GROUP BY 1),
      t AS (SELECT sum(cs) AS s_tot, sum(ct) AS t_tot FROM c),
      lr AS (SELECT b,
               CAST(round((ln(CAST(ct + 1 AS DOUBLE) / CAST(t_tot + 1024 AS DOUBLE))
                         - ln(CAST(cs + 1 AS DOUBLE) / CAST(s_tot + 1024 AS DOUBLE)))
                 * 1e6) AS BIGINT) AS lri
             FROM c, t),
      per AS (SELECT doc_id, count(*) AS n_tokens, sum(lri) AS s
              FROM occ JOIN lr USING (b) GROUP BY 1)
      SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens,
        round(CAST(per.s AS DOUBLE) / 1e6, 6) AS log_w6,
        round(CAST(round(CAST(per.s AS DOUBLE) / per.n_tokens) AS BIGINT)
          / 1e6, 6) AS avg_log_w6
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "text_mix_weights" -> """
      WITH c AS (SELECT source AS domain, count(*) AS n FROM documents GROUP BY 1),
      t AS (SELECT sum(n) AS total FROM c),
      r AS (SELECT domain, n, CAST(n AS DOUBLE) / total AS p FROM c, t),
      z AS (SELECT sum(pow(p, 0.5)) AS z FROM r)
      SELECT r.domain, r.n, round(r.p, 6) AS p6, round(pow(r.p, 0.5) / z.z, 6) AS w6
      FROM r, z ORDER BY r.domain""",
    "text_mix_sample" -> """
      WITH c AS (SELECT source AS domain, count(*) AS n FROM documents GROUP BY 1),
      t AS (SELECT sum(n) AS total FROM c),
      r AS (SELECT domain, n, CAST(n AS DOUBLE) / total AS p FROM c, t),
      z AS (SELECT sum(pow(p, 0.5)) AS z FROM r),
      rate AS (SELECT domain,
                 least(1.0, (pow(p, 0.5) / z.z) * total / n) AS sample_rate
               FROM r, z, t),
      kept AS (SELECT d.source AS domain, rate.sample_rate FROM documents d
               JOIN rate ON d.source = rate.domain
               WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                     / 4294967296.0 < rate.sample_rate)
      SELECT domain, count(*) AS n_kept, round(any_value(sample_rate), 6) AS rate6
      FROM kept GROUP BY domain ORDER BY domain""",
    "dedup_substring_pairs" -> """
      WITH p AS (SELECT doc_id,
          CASE WHEN doc_id < 6 THEN text || ' colorless green ideas sleep furiously beside the quick brown fox while the archive replicates itself verbatim'
               ELSE text END AS text
        FROM documents),
      n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM p),
      h AS (SELECT doc_id, list_transform(range(1, len(t) - 14), i -> md5(substr(t, i, 16))) AS hs
            FROM n WHERE len(t) >= 40),
      f AS (SELECT doc_id,
              unnest(list_distinct(list_transform(range(0, len(hs) - 24),
                j -> list_min(hs[(j+1):(j+25)])))) AS fp
            FROM h),
      pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
             FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
      SELECT a_id, b_id, n_shared FROM pr WHERE n_shared >= 2 ORDER BY a_id, b_id""",
    "mm_resize_real" -> """
      WITH m AS (SELECT doc_id,
          CAST(4 + doc_id % 13 AS DOUBLE) AS w,
          CAST(4 + (doc_id * 5) % 11 AS DOUBLE) AS h
        FROM documents),
      s AS (SELECT doc_id, w, h, least(8.0 / w, 8.0 / h, 1.0) AS sc FROM m)
      SELECT doc_id, 'png' AS format,
        CAST(greatest(floor(w * sc), 1) AS INTEGER) AS out_width,
        CAST(greatest(floor(h * sc), 1) AS INTEGER) AS out_height,
        round((doc_id % 256) / 255.0, 6) AS mean_r6,
        round(((doc_id * 3) % 256) / 255.0, 6) AS mean_g6,
        round(((doc_id * 7) % 256) / 255.0, 6) AS mean_b6
      FROM s ORDER BY doc_id""",
    "ann_mode_agreement" -> """
      SELECT true AS self_exact, true AS agree_md5_fast,
        true AS agree_md5_xx128, true AS agree_fast_xx128""",
    "ann_mllib_agreement" -> """
      SELECT true AS both_nonempty, true AS overlap_strong,
        true AS top_pair_agreed""",
    "dedup_mode_agreement" -> """
      SELECT true AS nonempty, true AS pair_sets_agree""",
    "fn_tokenize_unicode_agree" -> """
      SELECT doc_id, true AS ascii_and_equal FROM documents
      WHERE NOT regexp_matches(text, '[^\x00-\x7F]') ORDER BY doc_id""",
    // planted fixture: expected tokens derived BY HAND from Unicode-\w
    // semantics (RE2 can't recompute them; it can compare literals)
    "fn_tokenize_unicode" -> """
      SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), 'héllo wörld ça va'),
        (1, 'naïve café déjà vu'),
        (2, '中文 分词 test123'),
        (3, 'москва 2026 αβγ αβγ'),
        (4, 'under_score stays ١٢٣'),
        (5, 'nbsp separated ok'),
        (6, ''),
        (7, 'emoji splits'),
        (8, 'mixed ünïcôde ascii_42')
      ) AS t(case_id, tokens_str) ORDER BY case_id""",
    "fn_jaccard_approx" -> s"""
      WITH ${docCtes(cfg16)}, ${queryCtes(cfg16)}
      SELECT c.doc_id,
        CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
          / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
      FROM sig c, qsig q ORDER BY jaccard DESC, c.doc_id""",
    "sort_vocab" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      shing AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles FROM toks)
      SELECT s AS shingle, row_number() OVER (ORDER BY s) - 1 AS idx
      FROM (SELECT DISTINCT unnest(shingles) AS s FROM shing) ORDER BY shingle""",
    "ann_query" -> s"""
      WITH ${docCtes(cfg100)}, ${queryCtes(cfg100)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 101), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN documents d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // the inverted-index serving path answers the IDENTICAL query — same
    // candidates (shares-a-bucket ⇔ posting row exists), same scoring, same
    // tie order — so its oracle is ann_query's verbatim
    "ann_query_indexed" -> s"""
      WITH ${docCtes(cfg100)}, ${queryCtes(cfg100)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 101), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN documents d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // the cold-start serving path answers the identical query fit-free
    "ann_query_served" -> s"""
      WITH ${docCtes(cfg100)}, ${queryCtes(cfg100)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 101), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN documents d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // the SQL-frontend twin computes the identical pipeline from SQL text,
    // so the ann_query replay serves it verbatim
    "ann_query_sql" -> s"""
      WITH ${docCtes(cfg100)}, ${queryCtes(cfg100)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 101), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN documents d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    "ann_query_thres" -> s"""
      WITH ${docCtes(cfg16)}, ${queryCtes(cfg16)},
      strict AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE CAST(len(list_intersect(b.bucket_ids, q.bucket_ids)) AS DOUBLE)
            / len(list_distinct(list_concat(b.bucket_ids, q.bucket_ids))) >= 0.2),
      fallb AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      -- the reference's zero-result fallback: use strict if nonempty, else overlap
      cand AS (SELECT * FROM strict UNION ALL
               SELECT * FROM fallb WHERE NOT EXISTS (SELECT 1 FROM strict)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN documents d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    "stream_topk" -> """
      WITH r AS (SELECT event_type, event_id, value, row_number() OVER (
                   PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
                 FROM events)
      SELECT event_type, rank, event_id, round(value, 6) AS value6
      FROM r WHERE rank <= 5 ORDER BY event_type, rank""",
    "stream_topk_real" -> """
      WITH r AS (SELECT event_type, event_id, value, row_number() OVER (
                   PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
                 FROM events)
      SELECT event_type, rank, event_id, round(value, 6) AS value6
      FROM r WHERE rank <= 5 ORDER BY event_type, rank""",
    "stream_join" -> """
      WITH er AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'error'),
      p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase')
      SELECT er.err_id, p.p_id, er.user_id
      FROM er JOIN p ON er.user_id = p.user_id
        AND p.ts >= er.ts AND p.ts < er.ts + INTERVAL '2 hours'
      ORDER BY er.err_id, p.p_id""",
    "stream_join_real" -> """
      WITH er AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'error'),
      p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase')
      SELECT er.err_id, p.p_id, er.user_id
      FROM er JOIN p ON er.user_id = p.user_id
        AND p.ts >= er.ts AND p.ts < er.ts + INTERVAL '2 hours'
      ORDER BY er.err_id, p.p_id""",
    "stream_tumbling_real" -> """
      SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
               '%Y-%m-%d %H:%M:%S') AS window_start,
        event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // the posting-table batch path answers identically — shared replay
    "ann_batch_indexed" -> annBatchMd5Oracle,
    // the file-bucketed layout changes the PLAN (no posting-side
    // Exchange), never the rows — same oracle
    "ann_batch_colocated" -> annBatchMd5Oracle,
    // the pruned small-batch form answers the qid < 5 slice of the same
    // workload — same pipeline, tighter qf filter
    "ann_batch_pruned" -> annBatchMd5Oracle.replace(
      "WHERE s.doc_id < 20", "WHERE s.doc_id < 5"),
    // the maintained (append + compact) posting table must answer as a
    // fresh build over the FINAL corpus — the oracle IS that fresh build;
    // the streaming twin replays the identical final state
    "ann_index_maintained" -> annMaintainedOracle,
    "stream_inverted_ingest_real" -> annMaintainedOracle,
    // same truth + the trigger claim: the sink's own debt poll must have
    // compacted (zero superseded rows remain — nothing else could drop
    // them, the harness never calls compactInverted)
    "stream_index_debt_compact" ->
      s"SELECT o.*, true AS compacted_by_debt FROM ($annMaintainedOracle500) o",
    // pure-append twin: the final corpus is the whole documents table
    // (three disjoint slices at one seq), so the same fresh-build replay
    // holds; files_bounded is the in-sink file-fold firing claim
    "stream_index_file_compact" ->
      s"SELECT o.*, true AS files_bounded FROM ($annMaintainedOracle500) o",
    // the UNCOMPACTED twin must answer identically — supersession cutoffs
    // make serving exact between compactions
    "ann_index_fresh" -> annMaintainedOracle,
    // the manifest-swap twin answers identically — the swap strategy is a
    // durability choice, never a semantics one
    "ann_index_manifest" -> annMaintainedOracle,
    // named snapshot: the pinned serve (frozen postings + pinned cutoffs
    // over the pin-time backlog) answers as a fresh build over the
    // pin-time corpus — the TRUE documents — while the live serve answers
    // over the post-pin revision; the doc-50 takedown pierces BOTH (the
    // tombstone reads live under a pin)
    "ann_snapshot_pin" -> s"""
      SELECT * FROM (
        WITH ${docCtes(cfg16)}, ${queryCtes(cfg16)},
        cand AS (
          SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
          WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
        scored AS (
          SELECT c.doc_id,
            CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
              / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
          FROM cand c, qsig q)
        SELECT sc.doc_id, d.text, sc.jaccard, st.stage
        FROM scored sc JOIN documents d USING (doc_id)
             CROSS JOIN (VALUES ('pinned'), ('exported')) st(stage)
        WHERE sc.doc_id <> 50
        ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 20)
      UNION ALL
      SELECT * FROM (
        WITH ${docCtesFrom(cfg16, "(SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'revised edition number ' || doc_id || ' replaces the prior draft' ELSE text END AS text FROM documents) rev")},
        ${queryCtes(cfg16)},
        cand AS (
          SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
          WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
        scored AS (
          SELECT c.doc_id,
            CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
              / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
          FROM cand c, qsig q)
        SELECT sc.doc_id, d.text, sc.jaccard, 'live' AS stage
        FROM scored sc JOIN documents d USING (doc_id)
        WHERE sc.doc_id <> 50
        ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10)
      ORDER BY stage, jaccard DESC, doc_id""",
    // the pinned BATCH path: 20-query workload against the pin-time index
    // state (the true documents — backlog correction served through the
    // pinned cutoffs), candidate 50 pierced by the live takedown;
    // live_differs replays as `true` — the %3 revision REPLACED those
    // docs' text, so the live batch answer cannot equal the pinned one
    "ann_snapshot_batch" -> s"""
      WITH ${docCtes(cfg16)},
      qf AS (SELECT s.doc_id AS qid, s.signature AS q_sig, b.bucket_ids AS q_buckets
             FROM sig s JOIN buck b USING (doc_id) WHERE s.doc_id < 20),
      pairs AS (
        SELECT q.qid, s.doc_id AS id, q.q_sig, s.signature
        FROM qf q, buck b JOIN sig s USING (doc_id)
        WHERE list_has_any(b.bucket_ids, q.q_buckets) AND s.doc_id <> 50),
      scored AS (
        SELECT qid, id,
          CAST(CAST(len(list_filter(range(1, 17), i -> signature[i] = q_sig[i])) AS DOUBLE)
            / least(len(signature), len(q_sig)) AS FLOAT4) AS jaccard
        FROM pairs),
      ranked AS (
        SELECT qid, id, jaccard,
          row_number() OVER (PARTITION BY qid ORDER BY jaccard DESC, id) AS rank
        FROM scored)
      SELECT qid, id, jaccard, rank, true AS live_differs
      FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",
    // the PAIRED snapshot serves the pin-time text corpus (the capped
    // TRUE documents — the post-pin %3 revision is invisible through the
    // pin) and carries the protocol claims as literals: the raced first
    // attempt rolled back whole (paired_attempts = 2), the committed pin
    // holds the post-race vector state (vec_pin_coherent), and the live
    // vector table moved past the pin (vec_live_moved)
    "snapshot_pair_pin" -> s"""
      WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      ${docCtesFrom(cfg16, "corpus")}, ${queryCtes(cfg16)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard, 2 AS paired_attempts,
        true AS vec_pin_coherent, true AS vec_live_moved
      FROM scored sc JOIN corpus d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // pin-retention debt: every claim is engine-computed from the signal
    // (pins exact, age positive while pinned and −1 after, retained
    // locations/generations/markers positive while pinned and zero after
    // the post-unpin maintenance head) — the oracle pins the expected
    // lifecycle outcomes
    "ann_snapshot_debt" -> """
      SELECT 1 AS pins, true AS pin_aged, true AS retained_for_pin,
             true AS cleared_on_unpin""",
    "sim_snapshot_debt" -> """
      SELECT 1 AS pins, true AS pin_aged, true AS retained_for_pin,
             true AS markers_retained, true AS cleared_on_unpin""",
    // the one-frame training-set debt view: one row per pinned surface,
    // every lifecycle claim engine-computed from the union frame (quiet
    // window pins in one attempt; age positive in each family's own
    // writer-op unit; retention held per surface — text markers −1 by
    // the permanent-tombstone contract, vector markers positive for the
    // pin; everything clears whole after unpinTrainingSet + heads)
    "snapshot_pair_debt" -> """
      SELECT * FROM (VALUES
        ('text',   1, true, true, true, true),
        ('vector', 1, true, true, true, true))
        t(kind, pin_attempts, pin_aged, retained_for_pin, markers_ok,
          cleared_on_unpin)
      ORDER BY kind""",
    // the audit lookup returns the physical posting rows (featurize
    // replay for the audited ids) plus the tombstone marker (null bucket)
    "ann_postings_audit" -> s"""
      WITH ${docCtes(cfg16)},
      p AS (SELECT doc_id, CAST(1 AS BIGINT) AS ingest_seq,
                   unnest(bucket_ids) AS bucket
            FROM buck WHERE doc_id IN (0, 50, 82))
      SELECT doc_id, ingest_seq, bucket FROM p
      UNION ALL
      SELECT CAST(82 AS BIGINT), CAST(2 AS BIGINT), NULL
      ORDER BY doc_id, ingest_seq, bucket NULLS LAST""",
    // layout migration changes bytes-on-disk, never answers: fresh build
    // over the final corpus minus the pre-migration takedown (doc 82, a
    // planted near-dup of the flagship key — its absence proves the
    // marker survived the migration)
    "ann_index_relayout" -> s"""
      WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id <> 82),
      ${docCtesFrom(cfg16, "corpus")}, ${queryCtes(cfg16)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN corpus d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // takedown: fresh MinHash replay over corpus-minus-deleted; the same
    // top-10 must serve in both engine stages (tombstones-only and
    // physically compacted), so the oracle emits each row twice
    "ann_index_deleted" -> s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 11 <> 6 AND doc_id NOT IN (50, 82)),
      ${docCtesFrom(cfg16, "corpus")}, ${queryCtes(cfg16)},
      cand AS (
        SELECT s.doc_id, s.signature FROM sig s JOIN buck b USING (doc_id), qbuck q
        WHERE list_has_any(b.bucket_ids, q.bucket_ids)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q),
      topk AS (
        SELECT sc.doc_id, d.text, sc.jaccard
        FROM scored sc JOIN corpus d USING (doc_id)
        ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10)
      SELECT t.doc_id, t.text, t.jaccard, st.stage
      FROM topk t CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      ORDER BY st.stage, t.jaccard DESC, t.doc_id""",
    // co-located-layout takedown: fresh MinHash batch replay with the
    // deleted ids filtered from the INDEX side only (they still query);
    // both serving states must produce the identical top-5 per query, so
    // the oracle emits each row under both stage tags. The featurize
    // pipeline is per-row, so signatures over the full table restricted
    // to survivors equal signatures over the survivor corpus.
    "ann_batch_colocated_deleted" -> s"""
      WITH ${docCtes(cfg16)},
      live AS (SELECT doc_id FROM documents
               WHERE doc_id % 11 <> 6 AND doc_id NOT IN (50, 82)),
      qf AS (SELECT s.doc_id AS qid, s.signature AS q_sig, b.bucket_ids AS q_buckets
             FROM sig s JOIN buck b USING (doc_id) WHERE s.doc_id < 20),
      pairs AS (
        SELECT q.qid, s.doc_id AS id, q.q_sig, s.signature
        FROM qf q, buck b JOIN sig s USING (doc_id) JOIN live USING (doc_id)
        WHERE list_has_any(b.bucket_ids, q.q_buckets)),
      scored AS (
        SELECT qid, id,
          CAST(CAST(len(list_filter(range(1, 17), i -> signature[i] = q_sig[i])) AS DOUBLE)
            / least(len(signature), len(q_sig)) AS FLOAT4) AS jaccard
        FROM pairs),
      ranked AS (
        SELECT qid, id, jaccard,
          row_number() OVER (PARTITION BY qid ORDER BY jaccard DESC, id) AS rank
        FROM scored)
      SELECT qid, id, jaccard, rank, st.stage
      FROM ranked CROSS JOIN (VALUES ('pre_compact'), ('post_compact')) st(stage)
      WHERE rank <= 5 ORDER BY st.stage, qid, rank""",
    // the batch hot-cap keeps the recall floor per query vs its uncapped
    // twin (capped candidates are engine-policy-internal; the floor
    // boolean is the oracle-checkable claim, the sim_recall_* pattern)
    "ann_batch_hotcap" -> """
      SELECT CAST(doc_id AS BIGINT) AS qid, true AS recall_ok
      FROM documents WHERE doc_id < 20 ORDER BY qid""",
    // hot-bucket serving policy, mirrored end to end: plant the boiler
    // corpus, count per-bucket occupancy, skip query buckets above the
    // N/10 threshold (falling back to all when every bucket is hot), and
    // score candidates from the surviving buckets only
    "ann_query_hotskip" -> s"""
      WITH corpus AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN '$hotBoiler' ELSE text END AS text
        FROM documents),
      ${docCtesFrom(cfg16, "corpus")},
      ${queryCtesExpr(cfg16, s"'$hotBoiler ' || substr(text, 1, 60)")},
      db AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      hot AS (SELECT bucket FROM db GROUP BY bucket
              HAVING count(*) > (SELECT count(*) // 10 FROM documents)),
      qb AS (SELECT unnest(bucket_ids) AS bucket FROM qbuck),
      qlive AS (SELECT bucket FROM qb
                WHERE bucket NOT IN (SELECT bucket FROM hot)),
      qprobe AS (SELECT bucket FROM qlive UNION ALL
                 SELECT bucket FROM qb
                 WHERE NOT EXISTS (SELECT 1 FROM qlive)),
      cand AS (
        SELECT DISTINCT s.doc_id, s.signature
        FROM sig s JOIN db USING (doc_id) JOIN qprobe USING (bucket)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN corpus d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // the SKETCH hot mode's policy, replayed to the engine's exact rule:
    // hot = base buckets whose est over the BASE matrix passes the
    // threshold (the save-time refresh) ∪ delta buckets whose est over
    // the base+delta matrix passes it (the merge) — CMS hashing is the
    // repo's DuckDB-replayable md5 idiom (CountMinAgg's update rule)
    "ann_query_hotskip_cms" -> s"""
      WITH corpus AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN '$hotBoiler' ELSE text END AS text
        FROM documents),
      ${docCtesFrom(cfg16, "corpus")},
      ${queryCtesExpr(cfg16, s"'$hotBoiler ' || substr(text, 1, 60)")},
      db AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      thr AS (SELECT count(*) // 10 AS t FROM documents),
      bcb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM db
              WHERE doc_id % 3 <> 0 GROUP BY 1),
      bcd AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM db
              WHERE doc_id % 3 = 0 GROUP BY 1),
      rr AS (SELECT unnest(range(${IndexStore.HotCmsDepth})) AS r),
      mb AS (SELECT rr.r, CAST('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || bucket), 1, 8) AS UBIGINT) % ${IndexStore.HotCmsWidth} AS cell,
               CAST(sum(cnt) AS BIGINT) AS v
             FROM bcb CROSS JOIN rr GROUP BY 1, 2),
      mf AS (SELECT rr.r, CAST('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || bucket), 1, 8) AS UBIGINT) % ${IndexStore.HotCmsWidth} AS cell,
               CAST(sum(cnt) AS BIGINT) AS v
             FROM (SELECT * FROM bcb UNION ALL SELECT * FROM bcd)
             CROSS JOIN rr GROUP BY 1, 2),
      eb AS (SELECT b.bucket, min(m.v) AS est
             FROM bcb b CROSS JOIN rr
             JOIN mb m ON m.r = rr.r AND m.cell =
               CAST('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || b.bucket), 1, 8) AS UBIGINT) % ${IndexStore.HotCmsWidth}
             GROUP BY 1),
      ef AS (SELECT b.bucket, min(m.v) AS est
             FROM bcd b CROSS JOIN rr
             JOIN mf m ON m.r = rr.r AND m.cell =
               CAST('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || b.bucket), 1, 8) AS UBIGINT) % ${IndexStore.HotCmsWidth}
             GROUP BY 1),
      hot AS (SELECT bucket FROM eb WHERE est > (SELECT t FROM thr)
              UNION
              SELECT bucket FROM ef WHERE est > (SELECT t FROM thr)),
      qb AS (SELECT unnest(bucket_ids) AS bucket FROM qbuck),
      qlive AS (SELECT bucket FROM qb
                WHERE bucket NOT IN (SELECT bucket FROM hot)),
      qprobe AS (SELECT bucket FROM qlive UNION ALL
                 SELECT bucket FROM qb
                 WHERE NOT EXISTS (SELECT 1 FROM qlive)),
      cand AS (
        SELECT DISTINCT s.doc_id, s.signature
        FROM sig s JOIN db USING (doc_id) JOIN qprobe USING (bucket)),
      scored AS (
        SELECT c.doc_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> c.signature[i] = q.signature[i])) AS DOUBLE)
            / least(len(c.signature), len(q.signature)) AS FLOAT4) AS jaccard
        FROM cand c, qsig q)
      SELECT sc.doc_id, d.text, sc.jaccard
      FROM scored sc JOIN corpus d USING (doc_id)
      ORDER BY sc.jaccard DESC, sc.doc_id LIMIT 10""",
    // CDC→index composition: fresh MinHash replay over the APPLIED
    // snapshot (upserts rewritten, deletes gone) — the engine must reach
    // the same answer through Cdc.applyChanges + index maintenance; the
    // streaming twin replays the identical event set file-by-file
    "pipeline_cdc_index" -> cdcIndexOracle,
    "stream_takedown_real" -> cdcIndexOracle,
    "ann_batch_md5" -> annBatchMd5Oracle,
    "dedup_exact_keep" -> """
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1 ORDER BY doc_id""",
    // SQL-frontend twin of dedup_exact_keep — identical keep-min semantics
    "dedup_exact_sql" -> """
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1 ORDER BY doc_id""",
    "dedup_image_phash" -> """
      WITH h AS (
        SELECT doc_id, doc_id % 25 AS family,
          xor(xor(xor(xor(xor(
            doc_id % 25,
            (doc_id % 25) << 13),
            (doc_id % 25) << 27),
            (doc_id % 25) << 41),
            (doc_id % 25) << 55),
            ((CAST(1 AS BIGINT) << CAST((doc_id // 25) % 4 AS INTEGER)) - 1) << 60) AS dh
        FROM documents),
      p AS (
        SELECT a.family AS family, bit_count(xor(a.dh, b.dh)) AS d
        FROM h a JOIN h b ON a.family = b.family AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.dh, b.dh)) <= 2),
      f AS (SELECT family, count(*) AS n_docs FROM h GROUP BY family),
      agg AS (SELECT family, count(*) AS n_pairs,
        sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS n_exact,
        sum(d) AS sum_hamming FROM p GROUP BY family)
      SELECT f.family, CAST(f.n_docs AS BIGINT) AS n_docs,
        CAST(coalesce(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
        CAST(coalesce(agg.n_exact, 0) AS BIGINT) AS n_exact,
        CAST(coalesce(agg.sum_hamming, 0) AS BIGINT) AS sum_hamming
      FROM f LEFT JOIN agg USING (family) ORDER BY family""",
    "audio_match_offset" -> """
      WITH cfr AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
          unnest(range(0, (2 + doc_id % 3) * 4)) AS f
        FROM documents),
      cpk AS (SELECT id, f,
          CAST(20 + (id % 40) + 40 * ((f // 4) % 2) +
            CASE WHEN f // 4 = 0 THEN (id // 40) % 3 ELSE 0 END AS BIGINT) AS b
        FROM cfr),
      ch0 AS (SELECT id, f, b AS b0,
          lead(b, 1) OVER (PARTITION BY id ORDER BY f) AS b1,
          lead(b, 2) OVER (PARTITION BY id ORDER BY f) AS b2
        FROM cpk),
      ch AS (SELECT id AS c_id, f AS c_fr,
          b0 * 4294967296 + b1 * 65536 + b2 AS h
        FROM ch0 WHERE b1 IS NOT NULL AND b2 IS NOT NULL),
      qfr AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
          unnest(range(0, (1 + doc_id % 3) * 4)) AS f
        FROM documents WHERE doc_id % 10 = 0),
      qpk AS (SELECT id, f,
          CAST(20 + (id % 40) + 40 * ((f // 4 + 1) % 2) AS BIGINT) AS b
        FROM qfr),
      qh0 AS (SELECT id, f, b AS b0,
          lead(b, 1) OVER (PARTITION BY id ORDER BY f) AS b1,
          lead(b, 2) OVER (PARTITION BY id ORDER BY f) AS b2
        FROM qpk),
      qh AS (SELECT id AS q_id, f AS q_fr,
          b0 * 4294967296 + b1 * 65536 + b2 AS h
        FROM qh0 WHERE b1 IS NOT NULL AND b2 IS NOT NULL),
      v AS (SELECT q.q_id, c.c_id, c.c_fr - q.q_fr AS dt, count(*) AS votes
            FROM qh q JOIN ch c ON c.h = q.h
            GROUP BY 1, 2, 3 HAVING count(*) >= 2),
      r AS (SELECT q_id, c_id, dt, votes, row_number() OVER (
              PARTITION BY q_id ORDER BY votes DESC, dt ASC, c_id ASC) AS rn
            FROM v)
      SELECT q_id, c_id, CAST(dt AS BIGINT) AS dt, votes FROM r
      WHERE rn = 1 ORDER BY q_id""",
    "dedup_cdc_chunks" -> """
      WITH base AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN text || ' the archive replicates' ||
            ' shared passages verbatim across documents and a content' ||
            ' defined chunker must find every one of them regardless of' ||
            ' byte offset in the carrying document'
          ELSE text END AS t
        FROM documents),
      nz AS (SELECT doc_id, t, length(t) AS len FROM base WHERE length(t) > 0),
      bl AS (SELECT doc_id, t, len,
          list_filter(range(16, len + 1), i ->
            CAST('0x' || substr(md5(substr(t, i - 15, 16)), 1, 8) AS UBIGINT)
              % 64 = 0) AS bs
        FROM nz),
      es0 AS (SELECT doc_id, t,
          CASE WHEN len(bs) > 0 AND bs[-1] = len THEN bs
               ELSE list_append(bs, len) END AS es
        FROM bl),
      ch AS (SELECT doc_id, t, es, unnest(range(1, len(es) + 1)) AS j FROM es0),
      ck AS (SELECT doc_id, j AS chunk_idx,
          es[j] - (CASE WHEN j = 1 THEN 0 ELSE es[j - 1] END) AS clen,
          md5(substr(t, (CASE WHEN j = 1 THEN 0 ELSE es[j - 1] END) + 1,
            es[j] - (CASE WHEN j = 1 THEN 0 ELSE es[j - 1] END))) AS h
        FROM ch),
      r AS (SELECT doc_id, chunk_idx, clen, h, row_number() OVER (
              PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
            FROM ck)
      SELECT doc_id, count(*) AS n_chunks,
        CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT) AS bytes_saved,
        md5(string_agg(h, ',' ORDER BY chunk_idx)) AS chunks_md5
      FROM r GROUP BY doc_id ORDER BY doc_id""",
    "dedup_audio_fingerprint" -> """
      WITH fr AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
          unnest(range(0, (2 + doc_id % 3) * 4)) AS f
        FROM documents),
      pk AS (SELECT id, f,
          CAST(20 + (id % 40) + 40 * ((f // 4) % 2) +
            CASE WHEN f // 4 = 0 THEN (id // 40) % 3 ELSE 0 END AS BIGINT) AS b
        FROM fr),
      tr AS (SELECT id, b AS b0,
          lead(b, 1) OVER (PARTITION BY id ORDER BY f) AS b1,
          lead(b, 2) OVER (PARTITION BY id ORDER BY f) AS b2
        FROM pk),
      h AS (SELECT DISTINCT id,
          b0 * 4294967296 + b1 * 65536 + b2 AS h
        FROM tr WHERE b1 IS NOT NULL AND b2 IS NOT NULL),
      sz AS (SELECT id, count(*) AS nh FROM h GROUP BY id),
      iv AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_inter
             FROM h a JOIN h b ON a.h = b.h AND a.id < b.id
             GROUP BY 1, 2),
      jp AS (SELECT iv.a_id, iv.b_id, iv.n_inter, sa.nh AS n_a, sb.nh AS n_b,
               iv.n_inter * 1000000 // (sa.nh + sb.nh - iv.n_inter) AS jac_micro
             FROM iv JOIN sz sa ON sa.id = iv.a_id
                     JOIN sz sb ON sb.id = iv.b_id
             WHERE iv.n_inter * 1000000 // (sa.nh + sb.nh - iv.n_inter)
               >= 250000),
      fam AS (SELECT id % 40 AS family, count(DISTINCT id) AS n_docs,
                count(*) AS n_frames, sum(b) AS sum_bins FROM pk GROUP BY 1),
      agg AS (SELECT a_id % 40 AS family, count(*) AS n_pairs,
                sum(n_inter) AS n_inter_sum, sum(jac_micro) AS sum_jac_micro
              FROM jp GROUP BY 1)
      SELECT fam.family, CAST(fam.n_docs AS BIGINT) AS n_docs,
        CAST(fam.n_frames AS BIGINT) AS n_frames,
        CAST(fam.sum_bins AS BIGINT) AS sum_bins,
        CAST(coalesce(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
        CAST(coalesce(agg.n_inter_sum, 0) AS BIGINT) AS n_inter_sum,
        CAST(coalesce(agg.sum_jac_micro, 0) AS BIGINT) AS sum_jac_micro
      FROM fam LEFT JOIN agg USING (family) ORDER BY family""",
    "dedup_video_phash" -> """
      WITH fr AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
          unnest(range(0, 2 + doc_id % 5)) AS j
        FROM documents),
      sc AS (SELECT id, j,
          CAST(sum(CASE WHEN j > 0 AND (id + j) % 3 = 0 THEN 1 ELSE 0 END)
            OVER (PARTITION BY id ORDER BY j) AS BIGINT) AS scene
        FROM fr),
      h AS (SELECT id, j AS fr,
          xor(xor(xor(xor(xor(
            id % 100,
            (id % 100) << 13),
            (id % 100) << 27),
            (id % 100) << 41),
            ((CAST(1 AS BIGINT) << CAST(scene % 3 AS INTEGER)) - 1) << 50),
            ((CAST(1 AS BIGINT) << CAST((id // 100) % 3 AS INTEGER)) - 1) << 60) AS ph
        FROM sc WHERE j = 0 OR (j > 0 AND (id + j) % 3 = 0)),
      nk AS (SELECT id, count(*) AS nk FROM h GROUP BY id),
      fm AS (SELECT a.id AS a_id, b.id AS b_id, a.fr AS a_fr, b.fr AS b_fr
             FROM h a JOIN h b ON a.id < b.id
             WHERE bit_count(xor(a.ph, b.ph)) <= 2),
      vp AS (SELECT a_id, b_id,
               count(DISTINCT a_fr) AS nma, count(DISTINCT b_fr) AS nmb
             FROM fm GROUP BY 1, 2),
      vf AS (SELECT vp.a_id, vp.b_id, vp.nma, vp.nmb,
               (vp.nma + vp.nmb) * 1000000 // (na.nk + nb.nk) AS frac_micro
             FROM vp JOIN nk na ON na.id = vp.a_id
                     JOIN nk nb ON nb.id = vp.b_id
             WHERE (vp.nma + vp.nmb) * 1000000 // (na.nk + nb.nk) >= 500000),
      fam AS (SELECT id % 100 AS family, count(DISTINCT id) AS n_videos,
                count(*) AS n_keyframes FROM h GROUP BY 1),
      agg AS (SELECT a_id % 100 AS family, count(*) AS n_pairs,
                sum(nma + nmb) AS n_matched, sum(frac_micro) AS sum_frac_micro
              FROM vf GROUP BY 1)
      SELECT fam.family, CAST(fam.n_videos AS BIGINT) AS n_videos,
        CAST(fam.n_keyframes AS BIGINT) AS n_keyframes,
        CAST(coalesce(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
        CAST(coalesce(agg.n_matched, 0) AS BIGINT) AS n_matched,
        CAST(coalesce(agg.sum_frac_micro, 0) AS BIGINT) AS sum_frac_micro
      FROM fam LEFT JOIN agg USING (family) ORDER BY family""",
    // first-arrival ≡ keep-min on the one-split sorted stream, so the
    // closed-form planted dHash formula + keep-min window replay exactly
    "stream_phash_real" -> """
      WITH h AS (
        SELECT doc_id,
          xor(xor(xor(xor(xor(
            doc_id % 25,
            (doc_id % 25) << 13),
            (doc_id % 25) << 27),
            (doc_id % 25) << 41),
            (doc_id % 25) << 55),
            ((CAST(1 AS BIGINT) << CAST((doc_id // 25) % 4 AS INTEGER)) - 1) << 60) AS dh
        FROM documents),
      r AS (SELECT doc_id, dh,
              row_number() OVER (PARTITION BY dh ORDER BY doc_id) AS rn FROM h)
      SELECT doc_id, dh AS dhash FROM r WHERE rn = 1 ORDER BY doc_id""",
    "dedup_minhash_pairs" -> s"""
      WITH ${docCtes(cfg16)},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
            / least(len(sa.signature), len(sb.signature)) AS FLOAT4) AS jaccard
        FROM pairs p JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id)
      SELECT a_id, b_id, jaccard FROM scored WHERE jaccard >= 0.5 ORDER BY a_id, b_id""",
    // the fast (xx64) mode admits the SAME pair-id set as md5 at gate
    // scale (bimodal similarity structure, dedup_mode_agreement's claim) —
    // so the md5 pair set is its oracle, ids only
    // the exact-duplicate core, brute-forced from the TEXT — identical
    // shingle sets are admitted by any hash family's banding
    // deterministically (identical signatures ⇒ identical buckets ⇒
    // estimate 1.0), so no LSH probability appears on either side
    "dedup_minhash_pairs_fast" -> s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
      ${docCtesFrom(cfg16, "corpus")},
      canon AS (SELECT doc_id,
                  md5(array_to_string(list_sort(shingles), chr(31))) AS fp
                FROM shing WHERE len(shingles) > 0)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM canon a JOIN canon b ON a.fp = b.fp AND a.doc_id < b.doc_id
      ORDER BY a_id, b_id""",
    "dedup_bbit_pairs" -> s"""
      WITH ${docCtes(cfg16)},
      pb AS (SELECT doc_id,
               CAST(list_aggregate(list_transform(range(1, 17), i ->
                 CASE WHEN strpos('13579bdf', right(signature[i], 1)) > 0
                      THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END),
                 'sum') AS BIGINT) AS bits
             FROM sig),
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      scored AS (SELECT p.a_id, p.b_id,
          CAST(bit_count((~xor(pa.bits, pb2.bits)) & 65535) AS BIGINT) AS matched_bits
        FROM pairs p JOIN pb pa ON p.a_id = pa.doc_id JOIN pb pb2 ON p.b_id = pb2.doc_id)
      SELECT a_id, b_id, matched_bits,
        round((CAST(matched_bits AS DOUBLE) * 2 - 16) / 16, 6) AS jaccard_est
      FROM scored
      WHERE round((CAST(matched_bits AS DOUBLE) * 2 - 16) / 16, 6) >= 0.5
      ORDER BY a_id, b_id""",
    "graph_node_jaccard" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      ids AS (SELECT doc_id AS v FROM documents),
      -- no unnest: DuckDB (as of the driver's build) fails to bind an
      -- unnest CTE referenced twice through a UNION ALL
      e1 AS (SELECT v AS src, (v * 3 + 1) % n AS dst FROM ids, nn
             UNION ALL SELECT v, (v + 7) % n FROM ids, nn
             UNION ALL SELECT v, CAST(0 AS BIGINT) FROM ids),
      undr AS (SELECT src AS a, dst AS b FROM e1
               UNION ALL SELECT dst AS a, src AS b FROM e1),
      und0 AS (SELECT DISTINCT a, b FROM undr WHERE a <> b),
      deg0 AS (SELECT a, count(*) AS deg FROM und0 GROUP BY 1),
      hubs AS (SELECT a FROM deg0 WHERE deg > 64),
      und AS (SELECT a, b FROM und0
              WHERE a NOT IN (SELECT a FROM hubs)
                AND b NOT IN (SELECT a FROM hubs)),
      deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
      cm AS (SELECT p.a AS x, q.b AS y, count(*) AS common
             FROM und p JOIN und q ON p.b = q.a AND p.a < q.b
             GROUP BY 1, 2)
      SELECT cm.x AS a_id, cm.y AS b_id, cm.common,
        round(CAST(cm.common AS DOUBLE) / (dx.deg + dy.deg - cm.common), 6)
          AS jaccard6
      FROM cm JOIN deg dx ON cm.x = dx.a JOIN deg dy ON cm.y = dy.a
      ORDER BY jaccard6 DESC, a_id, b_id LIMIT 200""",
    "graph_ppr" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      ids AS (SELECT doc_id AS v FROM documents),
      e AS (SELECT v AS src,
              unnest([(v * 3 + 1) % n, (v + 7) % n, CAST(0 AS BIGINT)]) AS dst
            FROM ids, nn),
      deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
      ns AS (SELECT count(*) AS s FROM ids WHERE v % 50 = 0),
      tv AS (SELECT ids.v,
               CAST(CASE WHEN ids.v % 50 = 0
                 THEN ((15 * n * 1000000) // 100) // s ELSE 0 END AS BIGINT) AS t
             FROM ids, nn, ns),
      r0 AS (SELECT v, t AS r FROM tv),
      c1 AS (SELECT e.dst AS v, sum(r0.r // deg.d) AS c
             FROM e JOIN r0 ON e.src = r0.v JOIN deg ON e.src = deg.src
             GROUP BY 1),
      r1 AS (SELECT tv.v,
               CAST(tv.t + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM tv LEFT JOIN c1 USING (v)),
      c2 AS (SELECT e.dst AS v, sum(r1.r // deg.d) AS c
             FROM e JOIN r1 ON e.src = r1.v JOIN deg ON e.src = deg.src
             GROUP BY 1),
      r2 AS (SELECT tv.v,
               CAST(tv.t + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM tv LEFT JOIN c2 USING (v))
      SELECT v AS node_id, r AS ppr_micro FROM r2 ORDER BY node_id""",
    "graph_kcore" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      ids AS (SELECT CAST(doc_id AS BIGINT) AS v FROM documents),
      bg AS (SELECT v AS src,
              unnest([(v * 3 + 1) % n, (v + 7) % n, CAST(0 AS BIGINT)]) AS dst
            FROM ids, nn),
      cl AS (SELECT a.v AS src, b.v AS dst FROM ids a JOIN ids b
             ON a.v < b.v AND a.v < 20 AND b.v < 20),
      frg AS (SELECT i + 200 AS src,
              unnest([(i + 1) % 20 + 200, (i + 2) % 20 + 200,
                (i + 3) % 20 + 200, (i + 4) % 20 + 200,
                (i * 13 + 3) % n, (i * 17 + 11) % n]) AS dst
            FROM (SELECT v - 200 AS i FROM ids
                  WHERE v >= 200 AND v < 220), nn),
      e0 AS (SELECT src, dst FROM bg UNION ALL SELECT src, dst FROM cl
             UNION ALL SELECT src, dst FROM frg),
      und AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0
              UNION ALL SELECT dst AS a, src AS b FROM e0),
      a0 AS (SELECT v FROM ids),
      a1 AS MATERIALIZED (SELECT u.a AS v FROM und u
            JOIN a0 x ON u.a = x.v JOIN a0 y ON u.b = y.v
            GROUP BY u.a HAVING count(*) >= 11),
      a2 AS MATERIALIZED (SELECT u.a AS v FROM und u
            JOIN a1 x ON u.a = x.v JOIN a1 y ON u.b = y.v
            GROUP BY u.a HAVING count(*) >= 11),
      a3 AS MATERIALIZED (SELECT u.a AS v FROM und u
            JOIN a2 x ON u.a = x.v JOIN a2 y ON u.b = y.v
            GROUP BY u.a HAVING count(*) >= 11),
      a4 AS MATERIALIZED (SELECT u.a AS v FROM und u
            JOIN a3 x ON u.a = x.v JOIN a3 y ON u.b = y.v
            GROUP BY u.a HAVING count(*) >= 11),
      a5 AS MATERIALIZED (SELECT u.a AS v FROM und u
            JOIN a4 x ON u.a = x.v JOIN a4 y ON u.b = y.v
            GROUP BY u.a HAVING count(*) >= 11)
      SELECT ids.v AS node_id,
        ids.v IN (SELECT v FROM a4) AS in_kcore,
        (SELECT count(*) FROM a5) = (SELECT count(*) FROM a4) AS converged
      FROM ids ORDER BY node_id""",
    "graph_lpa" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      ids AS (SELECT doc_id AS v FROM documents),
      e0 AS (SELECT v AS src,
              unnest([(v * 3 + 1) % n, (v + 7) % n, CAST(0 AS BIGINT)]) AS dst
            FROM ids, nn),
      und AS (SELECT src AS a, dst AS b FROM e0
              UNION ALL SELECT dst AS a, src AS b FROM e0),
      l0 AS (SELECT v, v AS label FROM ids),
      c1 AS (SELECT u.a, l.label, count(*) AS cnt
             FROM und u JOIN l0 l ON u.b = l.v GROUP BY 1, 2),
      w1 AS (SELECT a, label, row_number() OVER (
               PARTITION BY a ORDER BY cnt DESC, label) AS rn FROM c1),
      l1 AS (SELECT i.v, coalesce(w.label, i.v) AS label FROM ids i
             LEFT JOIN (SELECT a, label FROM w1 WHERE rn = 1) w ON i.v = w.a),
      c2 AS (SELECT u.a, l.label, count(*) AS cnt
             FROM und u JOIN l1 l ON u.b = l.v GROUP BY 1, 2),
      w2 AS (SELECT a, label, row_number() OVER (
               PARTITION BY a ORDER BY cnt DESC, label) AS rn FROM c2),
      l2 AS (SELECT i.v, coalesce(w.label, i.v) AS label FROM ids i
             LEFT JOIN (SELECT a, label FROM w2 WHERE rn = 1) w ON i.v = w.a)
      SELECT v AS node_id, label FROM l2 ORDER BY node_id""",
    "graph_pagerank" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      ids AS (SELECT doc_id AS v FROM documents),
      e AS (SELECT v AS src,
              unnest([(v * 3 + 1) % n, (v + 7) % n, CAST(0 AS BIGINT)]) AS dst
            FROM ids, nn),
      deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
      r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM ids),
      c1 AS (SELECT e.dst AS v, sum(r0.r // deg.d) AS c
             FROM e JOIN r0 ON e.src = r0.v JOIN deg ON e.src = deg.src
             GROUP BY 1),
      r1 AS (SELECT ids.v,
               CAST(150000 + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM ids LEFT JOIN c1 USING (v)),
      c2 AS (SELECT e.dst AS v, sum(r1.r // deg.d) AS c
             FROM e JOIN r1 ON e.src = r1.v JOIN deg ON e.src = deg.src
             GROUP BY 1),
      r2 AS (SELECT ids.v,
               CAST(150000 + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM ids LEFT JOIN c2 USING (v)),
      c3 AS (SELECT e.dst AS v, sum(r2.r // deg.d) AS c
             FROM e JOIN r2 ON e.src = r2.v JOIN deg ON e.src = deg.src
             GROUP BY 1),
      r3 AS (SELECT ids.v,
               CAST(150000 + (17 * coalesce(c, 0)) // 20 AS BIGINT) AS r
             FROM ids LEFT JOIN c3 USING (v))
      SELECT v AS node_id, r AS rank_micro FROM r3 ORDER BY v""",
    "graph_hits" -> """
      WITH nn AS (SELECT count(*) AS n FROM documents),
      ids AS (SELECT doc_id AS v FROM documents),
      e AS (SELECT v AS src,
              unnest([(v * 3 + 1) % n, (v + 7) % n, CAST(0 AS BIGINT)]) AS dst
            FROM ids, nn),
      h0 AS (SELECT v, CAST(1000000 AS BIGINT) AS h FROM ids),
      ra1 AS (SELECT ids.v, CAST(coalesce(sum(h0.h), 0) AS BIGINT) AS a
              FROM ids LEFT JOIN e ON e.dst = ids.v
                       LEFT JOIN h0 ON e.src = h0.v GROUP BY 1),
      a1 AS (SELECT v, a // greatest(1,
               ((SELECT max(a) FROM ra1) + 999999) // 1000000) AS a FROM ra1),
      rh1 AS (SELECT ids.v, CAST(coalesce(sum(a1.a), 0) AS BIGINT) AS h
              FROM ids LEFT JOIN e ON e.src = ids.v
                       LEFT JOIN a1 ON e.dst = a1.v GROUP BY 1),
      h1 AS (SELECT v, h // greatest(1,
               ((SELECT max(h) FROM rh1) + 999999) // 1000000) AS h FROM rh1),
      ra2 AS (SELECT ids.v, CAST(coalesce(sum(h1.h), 0) AS BIGINT) AS a
              FROM ids LEFT JOIN e ON e.dst = ids.v
                       LEFT JOIN h1 ON e.src = h1.v GROUP BY 1),
      a2 AS (SELECT v, a // greatest(1,
               ((SELECT max(a) FROM ra2) + 999999) // 1000000) AS a FROM ra2),
      rh2 AS (SELECT ids.v, CAST(coalesce(sum(a2.a), 0) AS BIGINT) AS h
              FROM ids LEFT JOIN e ON e.src = ids.v
                       LEFT JOIN a2 ON e.dst = a2.v GROUP BY 1),
      h2 AS (SELECT v, h // greatest(1,
               ((SELECT max(h) FROM rh2) + 999999) // 1000000) AS h FROM rh2)
      SELECT ids.v AS node_id, h2.h AS hub_micro, a2.a AS auth_micro
      FROM ids JOIN h2 ON ids.v = h2.v JOIN a2 ON ids.v = a2.v
      ORDER BY node_id""",
    "graph_link_extract" -> """
      WITH k AS (SELECT doc_id, (doc_id // 2) % 10 AS rh FROM documents),
      e AS (
        SELECT doc_id, 'h' || rh || '.example' AS src_host,
               'h' || ((2 * rh + 1) % 10) || '.example' AS dst_host,
               ((2 * rh + 1) % 10) = rh AS internal FROM k
        UNION ALL
        SELECT doc_id, 'h' || rh || '.example', 'h' || rh || '.example', true
        FROM k
        UNION ALL
        SELECT doc_id, 'h' || rh || '.example', 'h' || rh || '.example', true
        FROM k)
      SELECT doc_id, src_host, dst_host, internal FROM e
      ORDER BY doc_id, dst_host, internal""",
    "graph_host_rank" -> s"""
      WITH $hostRankCtes
      SELECT v AS node_id, r AS rank_micro FROM r2 ORDER BY node_id""",
    "pipeline_curate_v6" -> s"""
      WITH planted AS $plantedUrlSql,
      clean AS (SELECT doc_id,
          text || ' caf' || chr(233) || ' d' || chr(233) || 'j' || chr(224) ||
          chr(8217) || 'vu ' || chr(8212) || ' ' || chr(230) || chr(248) ||
          chr(229) AS text
        FROM documents),
      jj AS (SELECT p.doc_id, p.raw_url, c.text, len(c.text) AS score
             FROM planted p JOIN clean c USING (doc_id)),
      hh AS (SELECT doc_id, lower(regexp_extract(raw_url,
               '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)', 1)) AS host,
               score FROM jj),
      rr AS (SELECT doc_id, row_number() OVER (PARTITION BY host
               ORDER BY score DESC, doc_id) AS rn FROM hh),
      capped AS (SELECT doc_id FROM rr WHERE rn <= 30),
      toks AS (SELECT c.doc_id, (c.doc_id % 2 = 0) AS is_train,
          $tokenizeSql AS tokens FROM clean c JOIN capped USING (doc_id)),
      occ AS (SELECT doc_id, is_train, unnest(tokens) AS token FROM toks),
      bg AS (SELECT doc_id, is_train,
               unnest(list_transform(range(1, len(tokens)),
                 i -> tokens[i] || ' ' || tokens[i + 1])) AS bigram
             FROM toks),
      c2 AS (SELECT bigram, count(*) AS c2,
               string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[-1] AS w2
             FROM bg WHERE is_train GROUP BY 1),
      hist AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY 1),
      cont AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY 1),
      t AS (SELECT (SELECT count(*) FROM c2) AS tt,
                   (SELECT count(DISTINCT token) FROM occ WHERE is_train) AS v),
      sc AS (SELECT b.doc_id,
               CAST(round(ln(CASE WHEN h.c1 IS NOT NULL
                   THEN greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE) - 0.75, 0.0)
                          / h.c1
                        + 0.75 * CAST(h.n1f AS DOUBLE) / h.c1
                          * (CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                             / CAST(t.tt + t.v AS DOUBLE))
                   ELSE CAST(coalesce(ct.n1b, 0) + 1 AS DOUBLE)
                          / CAST(t.tt + t.v AS DOUBLE) END) * 1e6) AS BIGINT) AS lsi
             FROM bg b
             LEFT JOIN c2 ON b.bigram = c2.bigram
             LEFT JOIN hist h ON string_split(b.bigram, ' ')[1] = h.w1
             LEFT JOIN cont ct ON string_split(b.bigram, ' ')[-1] = ct.w2
             CROSS JOIN t),
      per AS (SELECT doc_id, count(*) AS n_bigrams, sum(lsi) AS s
              FROM sc GROUP BY 1),
      scored AS (SELECT doc_id, n_bigrams,
                   CAST(round(CAST(s AS DOUBLE) / n_bigrams) AS BIGINT) AS lsm
                 FROM per WHERE n_bigrams > 0),
      cut AS (SELECT avg(lsm) AS c FROM scored)
      SELECT doc_id, n_bigrams, round(lsm / 1e6, 6) AS avg_ls6
      FROM scored, cut WHERE CAST(lsm AS DOUBLE) > c
      ORDER BY doc_id""",
    "layout_compaction" -> """
      WITH m AS (
        SELECT o_orderpriority AS part, o_orderkey AS file_id,
               (o_orderkey % 997) * 16384 + 65536 AS size_bytes
        FROM orders WHERE o_orderkey % 5 = 0),
      p AS (
        SELECT part, file_id, size_bytes,
          CAST((CAST(sum(size_bytes) OVER (PARTITION BY part ORDER BY file_id)
            AS BIGINT) - size_bytes) // 16777216 AS BIGINT) AS bin
        FROM m)
      SELECT part, file_id, size_bytes, bin,
        count(*) OVER (PARTITION BY part, bin) AS n_in_bin,
        CAST(sum(size_bytes) OVER (PARTITION BY part, bin) AS BIGINT)
          AS bin_bytes
      FROM p ORDER BY part, file_id""",
    "layout_hilbert" -> layoutHilbertOracle,
    "layout_zorder" -> s"""
      WITH base AS (SELECT event_id, user_id % 8192 AS x, event_id % 8192 AS y
                    FROM events)
      SELECT event_id, CAST(${zTermsSql(13)} AS BIGINT) AS zval FROM base
      ORDER BY event_id""",
    "layout_zorder_buckets" -> s"""
      WITH base AS (SELECT user_id % 32 AS x, event_id % 32 AS y,
                      event_id AS t FROM events),
      nn AS (SELECT count(*) AS n FROM base),
      z AS (SELECT x, y, CAST(${zTermsSql(5)} AS BIGINT) AS zv, t FROM base),
      zi AS (SELECT x, y,
               ((row_number() OVER (ORDER BY zv, t)) - 1) * 16
                 // (SELECT n FROM nn) AS bucket
             FROM z),
      zs AS (SELECT 'z' AS layout, bucket, CAST(count(*) AS BIGINT) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
             FROM zi GROUP BY bucket),
      li AS (SELECT x, y,
               ((row_number() OVER (ORDER BY y, t)) - 1) * 16
                 // (SELECT n FROM nn) AS bucket
             FROM base),
      ls AS (SELECT 'linear' AS layout, bucket, CAST(count(*) AS BIGINT) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
             FROM li GROUP BY bucket)
      SELECT layout, bucket, n_rows, x_min, x_max, y_min, y_max
      FROM (SELECT * FROM zs UNION ALL SELECT * FROM ls)
      ORDER BY layout, bucket""",
    "graph_triangles" -> s"""
      WITH ${docCtes(cfg16)},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
            / least(len(sa.signature), len(sb.signature)) AS FLOAT4) AS jaccard
        FROM pairs p JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id),
      e AS (SELECT a_id AS u, b_id AS v FROM scored WHERE jaccard >= 0.3)
      SELECT e1.u AS i, e1.v AS j, e2.v AS k
      FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
      ORDER BY i, j, k""",
    "graph_clustering" -> s"""
      WITH ${docCtes(cfg16)},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
            / least(len(sa.signature), len(sb.signature)) AS FLOAT4) AS jaccard
        FROM pairs p JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id),
      e AS (SELECT a_id AS u, b_id AS v FROM scored WHERE jaccard >= 0.3),
      deg AS (SELECT id, count(*) AS degree FROM (
                SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      tri AS (SELECT e1.u AS i, e1.v AS j, e2.v AS k
              FROM e e1 JOIN e e2 ON e1.v = e2.u
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      pn AS (SELECT id, count(*) AS n_triangles FROM (
               SELECT i AS id FROM tri UNION ALL SELECT j FROM tri
               UNION ALL SELECT k FROM tri) GROUP BY 1)
      SELECT d.id, d.degree, coalesce(pn.n_triangles, 0) AS n_triangles,
        CASE WHEN d.degree >= 2
          THEN round(2.0 * coalesce(pn.n_triangles, 0)
                 / (d.degree * (d.degree - 1)), 6) END AS clustering6
      FROM deg d LEFT JOIN pn USING (id) ORDER BY d.id""",
    "dedup_ngram_pairs" -> s"""
      WITH ${docCtes(cfg16)},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      cand AS (
        SELECT p.a_id, p.b_id FROM pairs p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.1),
      sh3 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens) - 1),
        i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS sh FROM toks),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM cand p JOIN sh3 a ON p.a_id = a.doc_id JOIN sh3 b ON p.b_id = b.doc_id)
      SELECT a_id, b_id, jaccard FROM scored WHERE jaccard >= 0.3 ORDER BY a_id, b_id""",
    "dedup_jaccard_exact" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      sh3 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens) - 1),
        i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS sh FROM toks),
      ne AS (SELECT doc_id, sh FROM sh3 WHERE len(sh) > 0),
      scored AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM ne a JOIN ne b ON a.doc_id < b.doc_id)
      SELECT a_id, b_id, jaccard FROM scored WHERE jaccard >= 0.3 ORDER BY a_id, b_id""",
    "dedup_novel_filter" -> s"""
      WITH ${docCtes(cfg16)},
      inc AS (SELECT s.doc_id, s.signature, b.bucket_ids
              FROM sig s JOIN buck b USING (doc_id) WHERE s.doc_id >= 400),
      ix AS (SELECT s.doc_id, s.signature, b.bucket_ids
             FROM sig s JOIN buck b USING (doc_id) WHERE s.doc_id < 400),
      dups AS (
        SELECT DISTINCT i.doc_id
        FROM inc i JOIN ix x ON list_has_any(i.bucket_ids, x.bucket_ids)
        WHERE CAST(CAST(len(list_filter(range(1, 17), k -> i.signature[k] = x.signature[k])) AS DOUBLE)
          / least(len(i.signature), len(x.signature)) AS FLOAT4) >= 0.5)
      SELECT doc_id FROM documents
      WHERE doc_id >= 400 AND doc_id NOT IN (SELECT doc_id FROM dups)
      ORDER BY doc_id""",
    "dedup_cluster_keep" -> s"""
      WITH RECURSIVE ${docCtes(cfg16).trim},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      cpair AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      jpair AS (
        SELECT p.a_id, p.b_id FROM cpair p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM jpair
                UNION SELECT b_id, a_id FROM jpair),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (SELECT src AS id, least(src, min(dst)) AS label
                 FROM reach GROUP BY src),
      losers AS (SELECT id FROM labels WHERE label < id)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT id FROM losers) ORDER BY doc_id""",
    "dedup_cluster_best" -> s"""
      WITH RECURSIVE ${docCtes(cfg16).trim},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      cpair AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      jpair AS (
        SELECT p.a_id, p.b_id FROM cpair p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM jpair
                UNION SELECT b_id, a_id FROM jpair),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (SELECT src AS id, least(src, min(dst)) AS label
                 FROM reach GROUP BY src),
      ranked AS (SELECT l.id, l.label,
                   row_number() OVER (PARTITION BY l.label
                     ORDER BY d.n_chars DESC, l.id ASC) AS rn
                 FROM labels l JOIN documents d ON l.id = d.doc_id),
      losers AS (SELECT id FROM ranked WHERE rn > 1)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT id FROM losers) ORDER BY doc_id""",
    "dedup_cluster_sizes" -> s"""
      WITH RECURSIVE ${docCtes(cfg16).trim},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      cpair AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      jpair AS (
        SELECT p.a_id, p.b_id FROM cpair p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM jpair
                UNION SELECT b_id, a_id FROM jpair),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (SELECT src AS id, least(src, min(dst)) AS label
                 FROM reach GROUP BY src),
      lab AS (SELECT coalesce(l.label, d.doc_id) AS label
              FROM documents d LEFT JOIN labels l ON d.doc_id = l.id),
      szs AS (SELECT label, count(*) AS sz FROM lab GROUP BY 1)
      SELECT sz AS cluster_size, count(*) AS n_clusters
      FROM szs GROUP BY 1 ORDER BY 1""",
    "dedup_snapshot_diff" -> """
      WITH oldc AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
      newc AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id >= 100)
      SELECT coalesce(o.doc_id, n.doc_id) AS id,
        CASE WHEN o.doc_id IS NULL THEN 'added'
             WHEN n.doc_id IS NULL THEN 'removed'
             WHEN md5(o.text) <> md5(n.text) THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id
      ORDER BY id""",
    "cdc_apply_changes" -> cdcApplyOracle,
    "cdc_apply_pruned" -> cdcApplyOracle,
    "cdc_maintain_agg" -> """
      WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                    FROM orders),
      ch AS (
        SELECT o_orderkey, 1 AS seq, 'U' AS op, o_custkey,
               'U1' AS o_orderstatus, o_totalprice + 1.5 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, 2, 'U', o_custkey, 'U2', o_totalprice + 2.5
        FROM orders WHERE o_orderkey % 20 = 0
        UNION ALL
        SELECT o_orderkey, 3, 'D', o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey + 1000000000, 1, 'I', o_custkey, o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 13 = 1),
      latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY seq DESC, op DESC) AS rn
          FROM ch) WHERE rn = 1),
      snap AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM latest l
                          WHERE l.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice FROM latest
        WHERE op <> 'D')
      SELECT o_custkey % 100 AS grp, count(*) AS n_rows,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS sum_cents
      FROM snap GROUP BY 1 ORDER BY grp""",
    "stream_cdc_apply_real" -> cdcApplyOracle,
    "cdc_scd2" -> cdcScd2Oracle,
    "cdc_pit_join" -> """
      WITH e AS (SELECT event_id, user_id, event_type,
          CAST(ts AS TIMESTAMP) AS ts FROM events),
      h0 AS (SELECT user_id, ts, event_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM e),
      h AS (SELECT user_id, ts AS vfrom, event_id AS hid, event_type
            FROM h0 WHERE prev IS NULL OR prev <> event_type),
      p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
      cand AS (SELECT p.event_id, p.user_id, p.ts,
          h.event_type AS v_event_type, h.vfrom, h.hid
        FROM p JOIN h ON p.user_id = h.user_id AND h.vfrom <= p.ts),
      best AS (SELECT *, row_number() OVER (PARTITION BY event_id
          ORDER BY vfrom DESC, hid DESC) AS rn FROM cand)
      SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        v_event_type, strftime(vfrom, '%Y-%m-%d %H:%M:%S') AS v_from
      FROM best WHERE rn = 1 ORDER BY event_id""",
    "stream_scd2_real" -> cdcScd2Oracle,
    "split_stratified" -> """
      WITH e AS (SELECT vec_id, label, CAST(label AS VARCHAR) AS s,
            md5('graft:' || vec_id) AS h FROM embeddings),
      r AS (SELECT vec_id, label, s,
              row_number() OVER (PARTITION BY s ORDER BY h, vec_id) AS rn,
              count(*) OVER (PARTITION BY s) AS n FROM e)
      SELECT vec_id, label,
        CASE WHEN rn <= ceil(n * 0.1) THEN 'val' ELSE 'train' END AS split
      FROM r ORDER BY vec_id""",
    "split_leakage_safe" -> s"""
      WITH RECURSIVE ${docCtes(cfg16).trim},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      cpair AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      jpair AS (
        SELECT p.a_id, p.b_id FROM cpair p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM jpair
                UNION SELECT b_id, a_id FROM jpair),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (SELECT src AS id, least(src, min(dst)) AS label
                 FROM reach GROUP BY src)
      SELECT d.doc_id,
        CASE WHEN substr(md5(CAST(coalesce(l.label, d.doc_id) AS VARCHAR)), 1, 2) < '19'
             THEN 'val' ELSE 'train' END AS split
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
      ORDER BY d.doc_id""",
    "stream_decontam_real" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      shing AS (SELECT doc_id,
        list_distinct(list_transform(range(1, len(tokens) - 2),
          i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
            || ' ' || tokens[i+3])) AS shingles FROM toks),
      bench AS (SELECT DISTINCT unnest(shingles) AS shingle FROM shing WHERE doc_id % 20 = 0),
      corpus AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing WHERE doc_id % 20 <> 0),
      hits AS (SELECT DISTINCT c.doc_id FROM corpus c JOIN bench USING (shingle))
      SELECT d.doc_id, md5(d.text) AS text_md5
      FROM documents d
      WHERE d.doc_id % 20 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
      ORDER BY d.doc_id""",
    "dedup_decontaminate" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      shing AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles FROM toks),
      bench AS (SELECT DISTINCT unnest(shingles) AS shingle FROM shing WHERE doc_id % 20 = 0),
      corpus AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing WHERE doc_id % 20 <> 0),
      hits AS (SELECT doc_id, count(*) AS n_overlap
               FROM corpus JOIN bench USING (shingle) GROUP BY 1)
      SELECT d.doc_id, coalesce(h.n_overlap, 0) AS n_overlap,
        h.doc_id IS NOT NULL AS contaminated
      FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
      LEFT JOIN hits h ON d.doc_id = h.doc_id
      ORDER BY d.doc_id""",
    "dedup_ngram_coverage" -> s"""
      WITH planted AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 1
            THEN ' the quick brown fox jumps over the lazy dog again today'
            ELSE '' END ||
          CASE WHEN doc_id % 9 = 4 THEN ' ' || text ELSE '' END AS text
        FROM documents),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      base AS (SELECT doc_id, tokens, len(tokens) AS nt FROM toks),
      h AS (SELECT doc_id, i, md5(array_to_string(tokens[i:i+9], ' ')) AS h
            FROM (SELECT doc_id, tokens,
                    unnest(range(1, len(tokens) - 8)) AS i FROM base)),
      cnt AS (SELECT h, count(*) AS c FROM h GROUP BY 1),
      dup AS (SELECT doc_id, i FROM h JOIN cnt USING (h) WHERE c > 1),
      perdoc AS (SELECT doc_id, count(*) AS ndup FROM dup GROUP BY 1),
      covc AS (SELECT doc_id, count(*) AS ct FROM (
                 SELECT DISTINCT doc_id, tp FROM (
                   SELECT doc_id, unnest(range(i, i + 10)) AS tp FROM dup))
               GROUP BY 1)
      SELECT b.doc_id, nt AS n_tokens, greatest(nt - 9, 0) AS n_ngrams,
        coalesce(ndup, 0) AS n_dup_ngrams, coalesce(ct, 0) AS dup_tokens,
        CASE WHEN nt > 0
          THEN round(CAST(coalesce(ct, 0) AS DOUBLE) / nt, 6) END AS dup6
      FROM base b LEFT JOIN perdoc USING (doc_id) LEFT JOIN covc USING (doc_id)
      ORDER BY b.doc_id""",
    "dedup_bench_leak" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      shing AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens)),
        i -> tokens[i] || ' ' || tokens[i+1])) AS shingles FROM toks),
      bench AS (SELECT doc_id AS bid, unnest(shingles) AS shingle
                FROM shing WHERE doc_id % 20 = 0),
      ns AS (SELECT bid, count(*) AS n_shingles FROM bench GROUP BY 1),
      corpus AS (SELECT doc_id AS cid, unnest(shingles) AS shingle
                 FROM shing WHERE doc_id % 20 <> 0),
      hits AS (SELECT b.bid, count(DISTINCT b.shingle) AS nh,
                 count(DISTINCT c.cid) AS nc
               FROM bench b JOIN corpus c USING (shingle) GROUP BY 1)
      SELECT ns.bid AS doc_id, ns.n_shingles,
        coalesce(h.nh, 0) AS n_hit_shingles,
        coalesce(h.nc, 0) AS n_corpus_docs
      FROM ns LEFT JOIN hits h ON ns.bid = h.bid ORDER BY doc_id""",
    "dedup_span_removal" -> s"""
      WITH planted AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 1
            THEN ' the quick brown fox jumps over the lazy dog again today'
            ELSE '' END ||
          CASE WHEN doc_id % 9 = 4 THEN ' ' || text ELSE '' END AS text
        FROM documents),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      base AS (SELECT doc_id, tokens, len(tokens) AS nt FROM toks),
      h AS (SELECT doc_id, i, md5(array_to_string(tokens[i:i+9], ' ')) AS h
            FROM (SELECT doc_id, tokens,
                    unnest(range(1, len(tokens) - 8)) AS i FROM base)),
      cnt AS (SELECT h, count(*) AS c FROM h GROUP BY 1),
      dup AS (SELECT doc_id, i FROM h JOIN cnt USING (h) WHERE c > 1),
      cov AS (SELECT DISTINCT doc_id, tp FROM (
                SELECT doc_id, unnest(range(i, i + 10)) AS tp FROM dup)),
      pos AS (SELECT doc_id, unnest(range(1, nt + 1)) AS p FROM base),
      kept AS (SELECT pos.doc_id, p FROM pos
               LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.tp
               WHERE cov.doc_id IS NULL),
      clean AS (SELECT k.doc_id, count(*) AS kt,
                  string_agg(b.tokens[k.p], ' ' ORDER BY k.p) AS ct
                FROM kept k JOIN base b USING (doc_id) GROUP BY k.doc_id)
      SELECT b.doc_id, nt AS n_tokens, coalesce(kt, 0) AS kept_tokens,
        coalesce(ct, '') AS clean_text
      FROM base b LEFT JOIN clean USING (doc_id)
      ORDER BY b.doc_id""",
    "dedup_span_keepfirst" -> s"""
      WITH planted AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 1
            THEN ' the quick brown fox jumps over the lazy dog again today'
            ELSE '' END ||
          CASE WHEN doc_id % 9 = 4 THEN ' ' || text ELSE '' END AS text
        FROM documents),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      base AS (SELECT doc_id, tokens, len(tokens) AS nt FROM toks),
      h AS (SELECT doc_id, i, md5(array_to_string(tokens[i:i+9], ' ')) AS h
            FROM (SELECT doc_id, tokens,
                    unnest(range(1, len(tokens) - 8)) AS i FROM base)),
      cnt AS (SELECT h, count(*) AS c FROM h GROUP BY 1),
      dup AS (SELECT doc_id, i, h,
                row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
              FROM h JOIN cnt USING (h) WHERE c > 1),
      losers AS (SELECT doc_id, i FROM dup WHERE rn > 1),
      cov AS (SELECT DISTINCT doc_id, tp FROM (
                SELECT doc_id, unnest(range(i, i + 10)) AS tp FROM losers)),
      pos AS (SELECT doc_id, unnest(range(1, nt + 1)) AS p FROM base),
      kept AS (SELECT pos.doc_id, p FROM pos
               LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.tp
               WHERE cov.doc_id IS NULL),
      clean AS (SELECT k.doc_id, count(*) AS kt,
                  string_agg(b.tokens[k.p], ' ' ORDER BY k.p) AS ct
                FROM kept k JOIN base b USING (doc_id) GROUP BY k.doc_id)
      SELECT b.doc_id, nt AS n_tokens, coalesce(kt, 0) AS kept_tokens,
        coalesce(ct, '') AS clean_text
      FROM base b LEFT JOIN clean USING (doc_id)
      ORDER BY b.doc_id""",
    "dedup_bloom_decontam" -> s"""
      WITH $bloomGateCtes
      SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated,
        TRUE AS no_false_neg
      FROM corpus_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
      ORDER BY d.doc_id""",
    "dedup_bloom_fp" -> s"""
      WITH $bloomGateCtes
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(h.doc_id) AS BIGINT) AS n_exact, TRUE AS fp_ok
      FROM corpus_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id""",
    "dedup_containment_pairs" -> s"""
      WITH ${docCtes(cfg16)},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      cand AS (
        SELECT p.a_id, p.b_id FROM pairs p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.1),
      sh3 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens) - 1),
        i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS sh FROM toks),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / least(len(a.sh), len(b.sh)) AS containment
        FROM cand p JOIN sh3 a ON p.a_id = a.doc_id JOIN sh3 b ON p.b_id = b.doc_id)
      SELECT a_id, b_id, round(containment, 6) AS cont6 FROM scored
      WHERE containment >= 0.6 ORDER BY a_id, b_id""",
    "dedup_containment_deep" -> s"""
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, substr(text, 1, 150) AS text
        FROM documents WHERE doc_id % 10 = 0),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM base),
      sh3 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tokens) - 1),
        i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS sh FROM toks
        WHERE len(tokens) >= 3),
      scored AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / least(len(a.sh), len(b.sh)) AS containment
        FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
        WHERE len(a.sh) > 0 AND len(b.sh) > 0)
      SELECT a_id, b_id, round(containment, 6) AS cont6 FROM scored
      WHERE containment >= 0.8 ORDER BY a_id, b_id""",
    "dedup_embedding_clusters" -> """
      WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id),
      jp AS (SELECT a_id, b_id FROM pairs WHERE cosine >= 0.35),
      edges AS (SELECT a_id AS src, b_id AS dst FROM jp
                UNION SELECT b_id, a_id FROM jp),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (SELECT src AS id, least(src, min(dst)) AS label
                 FROM reach GROUP BY src),
      losers AS (SELECT id FROM labels WHERE label < id)
      SELECT CAST(vec_id AS BIGINT) AS vec_id FROM embeddings
      WHERE vec_id NOT IN (SELECT id FROM losers) ORDER BY vec_id""",
    "dedup_semantic_cells" -> """
      WITH RECURSIVE
      v AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings),
      seeds AS (SELECT id, embedding FROM v ORDER BY id LIMIT 8),
      cents AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS j,
          list_transform(embedding, x -> CAST(x AS DOUBLE) /
            sqrt(list_sum(list_transform(embedding,
              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS c
        FROM seeds),
      dots AS (SELECT v.id, cents.j,
          CAST(round(list_sum(list_transform(range(1, 65),
            i -> CAST(v.embedding[i] AS DOUBLE) * cents.c[i])) * 1e6) AS BIGINT) AS dotr
        FROM v CROSS JOIN cents),
      asg AS (SELECT id, j AS cell FROM (
          SELECT id, j,
            row_number() OVER (PARTITION BY id ORDER BY dotr DESC, j ASC) AS rn
          FROM dots) WHERE rn = 1),
      c2c AS (SELECT v.id, a.cell,
          CAST(round(
            list_sum(list_transform(range(1, 65),
              i -> CAST(v.embedding[i] AS DOUBLE) * cents.c[i]))
            / nullif(
              sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))) *
              sqrt(list_sum(list_transform(cents.c, x -> x * x))), 0.0)
            * 1e6) AS BIGINT) AS c2c_micro
        FROM v JOIN asg a ON v.id = a.id JOIN cents ON cents.j = a.cell),
      jp AS (SELECT a.id AS a_id, b.id AS b_id
        FROM v a JOIN asg aa ON a.id = aa.id
        JOIN v b ON a.id < b.id JOIN asg bb ON b.id = bb.id
        WHERE aa.cell = bb.cell AND
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0)
          >= 0.35),
      edges AS (SELECT a_id AS src, b_id AS dst FROM jp
                UNION SELECT b_id, a_id FROM jp),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (SELECT src AS id, least(src, min(dst)) AS label
                 FROM reach GROUP BY src),
      keepers AS (SELECT id FROM (
          SELECT l.id, row_number() OVER (PARTITION BY l.label
            ORDER BY c.c2c_micro ASC, l.id ASC) AS rn
          FROM labels l JOIN c2c c ON c.id = l.id) WHERE rn = 1),
      losers AS (SELECT id FROM labels
                 WHERE id NOT IN (SELECT id FROM keepers))
      SELECT c.id AS vec_id, c.cell, c.c2c_micro FROM c2c c
      WHERE c.id NOT IN (SELECT id FROM losers) ORDER BY vec_id""",
    "dedup_semantic_cells_leak" -> """
      WITH jp AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0)
          >= 0.35)
      SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
        count(*) AS n_brute_pairs, TRUE AS leak_ok FROM jp""",
    "dedup_embedding_pairs" -> """
      WITH pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
      SELECT a_id, b_id, round(cosine, 6) AS cos6 FROM pairs
      WHERE cosine >= 0.35 ORDER BY a_id, b_id""",
    // the exact brute pair count is the replayable half; the recall value
    // depends on engine-internal Lloyd centroids (tolerance-boolean form)
    "dedup_embedding_ivf_recall" -> """
      WITH pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
      SELECT CAST(count(*) AS BIGINT) AS n_brute_pairs, true AS recall_ok
      FROM pairs WHERE cosine >= 0.35""",
    "sim_recall_eval" -> """
      WITH e AS (SELECT vec_id AS id, embedding AS v,
        (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
        (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
        (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
        (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) +
        (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) +
        (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) +
        (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END) +
        (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
        FROM embeddings),
      q AS (SELECT id AS qid, v AS qv, bucket AS qb FROM e WHERE id < 20),
      pairs AS (
        SELECT q.qid, e.id, e.bucket, q.qb,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.v[i] AS DOUBLE) * CAST(e.v[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))), 0.0) AS c
        FROM e, q WHERE e.id <> q.qid),
      brute AS (SELECT qid, id FROM (
        SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rn
        FROM pairs) WHERE rn <= 10),
      buck AS (SELECT qid, id FROM (
        SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rn
        FROM pairs WHERE bucket = qb) WHERE rn <= 10),
      multi AS (SELECT qid, id FROM (
        SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rn
        FROM pairs WHERE bucket = qb OR bucket = xor(qb, 1) OR bucket = xor(qb, 2)
          OR bucket = xor(qb, 4) OR bucket = xor(qb, 8) OR bucket = xor(qb, 16)
          OR bucket = xor(qb, 32) OR bucket = xor(qb, 64) OR bucket = xor(qb, 128))
        WHERE rn <= 10),
      hits AS (SELECT b.qid,
                 count(bk.id) AS n_hit_single,
                 count(m.id) AS n_hit_multi
               FROM brute b
               LEFT JOIN buck bk ON b.qid = bk.qid AND b.id = bk.id
               LEFT JOIN multi m ON b.qid = m.qid AND b.id = m.id
               GROUP BY 1)
      SELECT qid, n_hit_single, n_hit_multi,
        round(n_hit_single / 10.0, 6) AS recall_single,
        round(n_hit_multi / 10.0, 6) AS recall_multi
      FROM hits ORDER BY qid""",
    "sim_topk_cosine" -> """
      WITH q AS (SELECT embedding AS q_v FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.q_v[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings e, q WHERE e.vec_id <> 0)
      SELECT vec_id, round(cosine, 6) AS cos6 FROM scored
      ORDER BY cos6 DESC, vec_id LIMIT 10""",
    "sim_label_stats" -> """
      WITH v AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
      e AS (SELECT label, i, v[i] AS x FROM (
              SELECT label, v, unnest(range(1, 65)) AS i FROM v)),
      cs AS (SELECT label, i, CAST(round(sum(x) * 1e6) AS BIGINT) AS sm,
               count(*) AS nd FROM e GROUP BY 1, 2),
      cent0 AS (SELECT label, max(nd) AS n_vecs, list(sm ORDER BY i) AS sml
                FROM cs GROUP BY 1),
      cent AS (SELECT label, n_vecs,
                 list_transform(sml, s -> CAST(s AS DOUBLE) / 1e6 / n_vecs) AS c
               FROM cent0),
      pc AS (SELECT v.label,
               CAST(round((list_sum(list_transform(range(1, 65), i -> v.v[i] * cent.c[i]))
                 / nullif(sqrt(list_sum(list_transform(range(1, 65), i -> v.v[i] * v.v[i])))
                        * sqrt(list_sum(list_transform(range(1, 65), i -> cent.c[i] * cent.c[i]))), 0.0))
                 * 1e6) AS BIGINT) AS cm
             FROM v JOIN cent USING (label)),
      intra AS (SELECT label, count(*) AS nv, sum(cm) AS s, min(cm) AS mn
                FROM pc GROUP BY 1),
      pairs AS (SELECT a.label AS la, b.label AS lb,
                  round(list_sum(list_transform(range(1, 65), i -> a.c[i] * b.c[i]))
                    / nullif(sqrt(list_sum(list_transform(range(1, 65), i -> a.c[i] * a.c[i])))
                           * sqrt(list_sum(list_transform(range(1, 65), i -> b.c[i] * b.c[i]))), 0.0), 6) AS c6
                FROM cent a JOIN cent b ON a.label <> b.label),
      nn AS (SELECT la AS label, lb AS nn_label, c6 AS nn_cos6,
               row_number() OVER (PARTITION BY la ORDER BY c6 DESC, lb) AS rn
             FROM pairs)
      SELECT c.label, c.n_vecs,
        round(sqrt(list_sum(list_transform(c.c, x -> x * x))), 6) AS centroid_norm6,
        CAST(round(CAST(i.s AS DOUBLE) / i.nv) AS BIGINT) / 1e6 AS mean_cos6,
        CAST(i.mn AS DOUBLE) / 1e6 AS min_cos6,
        nn.nn_label, nn.nn_cos6
      FROM cent c JOIN intra i USING (label)
      JOIN nn ON nn.label = c.label AND nn.rn = 1
      ORDER BY c.label""",
    "sim_label_outliers" -> """
      WITH v AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      e AS (SELECT label, i, v[i] AS x FROM (
              SELECT label, v, unnest(range(1, 65)) AS i FROM v)),
      cs AS (SELECT label, i, CAST(round(sum(x) * 1e6) AS BIGINT) AS sm,
               count(*) AS nd FROM e GROUP BY 1, 2),
      cent0 AS (SELECT label, max(nd) AS n_vecs, list(sm ORDER BY i) AS sml
                FROM cs GROUP BY 1),
      cent AS (SELECT label, n_vecs,
                 list_transform(sml, s -> CAST(s AS DOUBLE) / 1e6 / n_vecs) AS c
               FROM cent0),
      pc AS (SELECT v.label, v.vec_id,
               CAST(round((list_sum(list_transform(range(1, 65), i -> v.v[i] * cent.c[i]))
                 / nullif(sqrt(list_sum(list_transform(range(1, 65), i -> v.v[i] * v.v[i])))
                        * sqrt(list_sum(list_transform(range(1, 65), i -> cent.c[i] * cent.c[i]))), 0.0))
                 * 1e6) AS BIGINT) AS cm
             FROM v JOIN cent USING (label)),
      st AS (SELECT label, sum(cm) AS s, count(*) AS n,
               sum(CAST(cm AS HUGEINT) * cm) AS q FROM pc GROUP BY 1)
      SELECT p2.label, p2.vec_id, CAST(p2.cm AS DOUBLE) / 1e6 AS cos6,
        (s - n * p2.cm > 0 AND
         CAST(s - n * p2.cm AS HUGEINT) * (s - n * p2.cm)
           > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)) AS is_outlier
      FROM pc p2 JOIN st USING (label) ORDER BY p2.label, p2.vec_id""",
    "sim_topk_bucketed" -> """
      WITH eb AS (
        SELECT vec_id, embedding,
          CAST(list_sum(list_transform(range(0, 4),
            d -> CASE WHEN embedding[d+1] > 0 THEN CAST(pow(2, d) AS INTEGER) ELSE 0 END)) AS INTEGER) AS bucket
        FROM embeddings),
      q AS (SELECT embedding AS q_v, bucket FROM eb WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id, e.bucket,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.q_v[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))), 0.0) AS cosine
        FROM eb e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> 0)
      SELECT vec_id, bucket, round(cosine, 6) AS cos6 FROM scored
      ORDER BY cos6 DESC, vec_id LIMIT 10""",
    "sim_topk_multiprobe" -> """
      WITH eb AS (
        SELECT vec_id, embedding,
          CAST(list_sum(list_transform(range(0, 4),
            d -> CASE WHEN embedding[d+1] > 0 THEN CAST(pow(2, d) AS INTEGER) ELSE 0 END)) AS INTEGER) AS bucket
        FROM embeddings),
      q AS (SELECT embedding AS q_v,
              unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS bucket
            FROM eb WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id, e.bucket,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.q_v[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))), 0.0) AS cosine
        FROM eb e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> 0)
      SELECT vec_id, bucket, round(cosine, 6) AS cos6 FROM scored
      ORDER BY cos6 DESC, vec_id LIMIT 10""",
    "sim_knn_graph" -> """
      WITH eb AS (
        SELECT vec_id, embedding,
          CAST(list_sum(list_transform(range(0, 4),
            d -> CASE WHEN embedding[d+1] > 0 THEN CAST(pow(2, d) AS INTEGER) ELSE 0 END)) AS INTEGER) AS bucket
        FROM embeddings),
      scored AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      ranked AS (
        SELECT a_id, b_id, cosine,
          row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rank
        FROM scored)
      SELECT a_id, b_id, rank, round(cosine, 6) AS cos6
      FROM ranked WHERE rank <= 5 ORDER BY a_id, rank""",
    "sim_knn_confusion" -> """
      WITH eb AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
          CAST(list_sum(list_transform(range(0, 4),
            d -> CASE WHEN embedding[d+1] > 0 THEN CAST(pow(2, d) AS INTEGER) ELSE 0 END)) AS INTEGER) AS bucket
        FROM embeddings),
      scored AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, b.label AS blab,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      ranked AS (
        SELECT a_id, blab,
          row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rank
        FROM scored),
      votes AS (SELECT a_id, blab, count(*) AS v FROM ranked
                WHERE rank <= 5 GROUP BY 1, 2),
      pred AS (SELECT a_id, blab AS pred_label,
                 row_number() OVER (PARTITION BY a_id ORDER BY v DESC, blab) AS rn
               FROM votes)
      SELECT e.label AS true_label, p.pred_label, count(*) AS n
      FROM eb e LEFT JOIN pred p ON e.vec_id = p.a_id AND p.rn = 1
      GROUP BY 1, 2 ORDER BY true_label, pred_label""",
    "sim_knn_accuracy" -> """
      WITH eb AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
          CAST(list_sum(list_transform(range(0, 4),
            d -> CASE WHEN embedding[d+1] > 0 THEN CAST(pow(2, d) AS INTEGER) ELSE 0 END)) AS INTEGER) AS bucket
        FROM embeddings),
      scored AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, b.label AS blab,
          list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 0.0) AS cosine
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      ranked AS (
        SELECT a_id, blab,
          row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rank
        FROM scored),
      votes AS (SELECT a_id, blab, count(*) AS v FROM ranked
                WHERE rank <= 5 GROUP BY 1, 2),
      pred AS (SELECT a_id, blab AS pred_label,
                 row_number() OVER (PARTITION BY a_id ORDER BY v DESC, blab) AS rn
               FROM votes),
      cm AS (SELECT e.label AS true_label, p.pred_label, count(*) AS n
             FROM eb e LEFT JOIN pred p ON e.vec_id = p.a_id AND p.rn = 1
             GROUP BY 1, 2),
      fn AS (SELECT true_label AS cls,
               sum(CASE WHEN pred_label IS NULL OR pred_label <> true_label
                     THEN n ELSE 0 END) AS f
             FROM cm GROUP BY 1),
      tp AS (SELECT true_label AS cls, n AS t FROM cm
             WHERE pred_label = true_label),
      fp AS (SELECT pred_label AS cls, sum(n) AS p FROM cm
             WHERE pred_label IS NOT NULL AND pred_label <> true_label
             GROUP BY 1),
      pc AS (SELECT fn.cls, coalesce(tp.t, 0) AS t, fn.f, coalesce(fp.p, 0) AS p
             FROM fn LEFT JOIN tp USING (cls) LEFT JOIN fp USING (cls)),
      f1 AS (SELECT CASE WHEN 2 * t + p + f > 0
               THEN CAST(round(2.0 * t / (2 * t + p + f) * 1e6) AS BIGINT)
               ELSE 0 END AS f1m FROM pc),
      mac AS (SELECT CAST(round(CAST(sum(f1m) AS DOUBLE) / count(*)) AS BIGINT)
                / 1e6 AS macro_f1_6 FROM f1),
      acc AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                CAST(sum(CASE WHEN pred_label = true_label THEN n ELSE 0 END) AS BIGINT)
                  AS n_correct
              FROM cm)
      SELECT acc.n_total, acc.n_correct,
        round(CAST(acc.n_correct AS DOUBLE) / acc.n_total, 6) AS accuracy6,
        mac.macro_f1_6
      FROM acc, mac""",
    "text_langid_v2" -> s"""
      WITH planted AS ($langIdPlantedSql),
      $langIdScoreCtes
      SELECT d.doc_id, coalesce(p.n_feats, 0) AS n_feats,
        coalesce(p.de_micro, 0) AS de_micro, coalesce(p.en_micro, 0) AS en_micro,
        coalesce(p.es_micro, 0) AS es_micro, coalesce(p.fr_micro, 0) AS fr_micro,
        coalesce(p.lang_pred_v2, 'und') AS lang_pred_v2
      FROM documents d LEFT JOIN lpred p USING (doc_id) ORDER BY d.doc_id""",
    "text_langid_v2_agree" -> s"""
      WITH planted0 AS ($langIdPlantedSql),
      planted AS (SELECT * FROM planted0 WHERE doc_id % 5 <= 3),
      $langIdScoreCtes,
      sl AS (SELECT doc_id, text,
          CASE WHEN doc_id % 5 = 0 THEN 'de' WHEN doc_id % 5 = 1 THEN 'en'
               WHEN doc_id % 5 = 2 THEN 'es' ELSE 'fr' END AS planted_lang
        FROM planted),
      htoks AS (SELECT doc_id, planted_lang, $tokenizeSql AS tokens FROM sl),
      hh AS (SELECT doc_id, planted_lang,
          len(list_filter(tokens, t -> list_contains(${stopwordList("de")}, t))) AS dh,
          len(list_filter(tokens, t -> list_contains(${stopwordList("en")}, t))) AS eh,
          len(list_filter(tokens, t -> list_contains(${stopwordList("es")}, t))) AS sh,
          len(list_filter(tokens, t -> list_contains(${stopwordList("fr")}, t))) AS fh
        FROM htoks),
      hp AS (SELECT doc_id, planted_lang,
          CASE
            WHEN dh >= eh AND dh >= sh AND dh >= fh AND dh > 0 THEN 'de'
            WHEN eh >= sh AND eh >= fh AND eh > 0 THEN 'en'
            WHEN sh >= fh AND sh > 0 THEN 'es'
            WHEN fh > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred
        FROM hh),
      j AS (SELECT hp.planted_lang, hp.lang_pred, p.lang_pred_v2
            FROM hp JOIN lpred p USING (doc_id))
      SELECT planted_lang, count(*) AS n_docs,
        CAST(sum(CASE WHEN lang_pred = planted_lang THEN 1 ELSE 0 END) AS BIGINT)
          AS n_heur_match,
        CAST(sum(CASE WHEN lang_pred_v2 = planted_lang THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clf_match,
        CAST(sum(CASE WHEN lang_pred = lang_pred_v2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_agree
      FROM j GROUP BY 1 ORDER BY 1""",
    "text_langid" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      hits AS (
        SELECT doc_id,
          len(list_filter(tokens, t -> list_contains(${stopwordList("de")}, t))) AS de_hits,
          len(list_filter(tokens, t -> list_contains(${stopwordList("en")}, t))) AS en_hits,
          len(list_filter(tokens, t -> list_contains(${stopwordList("es")}, t))) AS es_hits,
          len(list_filter(tokens, t -> list_contains(${stopwordList("fr")}, t))) AS fr_hits
        FROM toks)
      SELECT doc_id, de_hits, en_hits, es_hits, fr_hits,
        CASE
          WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
          WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
          WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
          WHEN fr_hits > 0 THEN 'fr'
          ELSE 'und' END AS lang_pred
      FROM hits ORDER BY doc_id""",
    "text_quality" -> s"""
      WITH toks AS (SELECT doc_id, text, $tokenizeSql AS tokens FROM documents),
      m AS (
        SELECT doc_id, len(tokens) AS n_tokens,
          CAST(list_sum(list_transform(tokens, t -> len(t))) AS DOUBLE)
            / greatest(len(tokens), 1) AS mean_token_len,
          CAST(len(list_filter(tokens, t -> list_contains(${stopwordList("en")}, t))) AS DOUBLE)
            / greatest(len(tokens), 1) AS stopword_ratio,
          CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
            / greatest(len(text), 1) AS digit_ratio
        FROM toks)
      SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, digit_ratio,
        (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0.0 END +
         CASE WHEN digit_ratio <= 0.2 THEN 0.25 ELSE 0.0 END) AS quality_score
      FROM m ORDER BY doc_id""",
    "text_token_counts" -> """
      SELECT doc_id,
        CASE WHEN len(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens
      FROM documents ORDER BY doc_id""",
    "text_pii_scrub" -> """
      WITH planted AS (
        SELECT doc_id,
          text || ' contact u' || doc_id || '@example.com via 10.0.' ||
          (doc_id % 256) || '.7 tel 555-' ||
          lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4829' AS t
        FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
        len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ipv4>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<phone>', 'g')) AS scrubbed_md5
      FROM planted ORDER BY doc_id""",
    "text_token_counts_bpe" -> s"""
      WITH $bpeDocCountCtes
      SELECT d.doc_id,
        CAST(len($tokenizeSql) AS BIGINT) AS n_words,
        coalesce(c.nb, 0) AS n_bpe_tokens
      FROM documents d LEFT JOIN __bpe_c c USING (doc_id) ORDER BY d.doc_id""",
    "text_chunk_bpe" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      w AS (SELECT doc_id, i, tokens[i] AS w FROM (
              SELECT doc_id, tokens,
                unnest(range(1, len(tokens) + 1)) AS i FROM toks)),
      per AS (SELECT doc_id, i,
                CAST(${graft.functions.Bpe.duckdbCountSql("w")} AS BIGINT) AS cnt
              FROM w),
      cum AS (SELECT doc_id, i, cnt,
                coalesce(sum(cnt) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
              FROM per)
      SELECT doc_id, CAST(bef // 64 AS BIGINT) AS chunk_idx,
        count(*) AS n_words, CAST(sum(cnt) AS BIGINT) AS bpe_tokens,
        CAST(min(i) - 1 AS BIGINT) AS start_word
      FROM cum GROUP BY 1, 2 ORDER BY doc_id, chunk_idx""",
    "text_pack_sequences_bpe" -> s"""
      WITH $bpeDocCountCtes,
      t AS (SELECT d.doc_id, coalesce(c.nb, 0) AS n_tokens
            FROM documents d LEFT JOIN __bpe_c c USING (doc_id)),
      cum AS (SELECT doc_id, n_tokens,
              coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
            FROM t)
      SELECT doc_id, n_tokens,
        CAST(floor(s / 512.0) AS BIGINT) AS seq_id,
        CAST(s % 512 AS INTEGER) AS seq_offset,
        n_tokens > 0 AND floor((s + n_tokens - 1) / 512.0) > floor(s / 512.0)
          AS spans_boundary
      FROM cum ORDER BY doc_id""",
    "text_token_budget_bpe" -> s"""
      WITH $bpeDocCountCtes,
      t AS (SELECT d.doc_id, d.n_chars, coalesce(c.nb, 0) AS nt
            FROM documents d LEFT JOIN __bpe_c c USING (doc_id)),
      cum AS (SELECT doc_id, nt,
              sum(nt) OVER (ORDER BY n_chars DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
      SELECT doc_id, nt AS n_tokens, CAST(cum AS BIGINT) AS cum_tokens
      FROM cum WHERE cum <= 15000 ORDER BY doc_id""",
    "text_pack_sequences" -> s"""
      WITH t AS (SELECT doc_id, CAST(len($tokenizeSql) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, n_tokens,
              coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
            FROM t)
      SELECT doc_id, n_tokens,
        CAST(floor(s / 512.0) AS BIGINT) AS seq_id,
        CAST(s % 512 AS INTEGER) AS seq_offset,
        n_tokens > 0 AND floor((s + n_tokens - 1) / 512.0) > floor(s / 512.0)
          AS spans_boundary
      FROM c ORDER BY doc_id""",
    "text_url_canonical" -> s"""
      WITH $urlCanonCtes
      SELECT doc_id, raw_url, url_canon FROM canon ORDER BY doc_id""",
    "dedup_url_keyed" -> s"""
      WITH $urlCanonCtes
      SELECT doc_id, url_canon FROM (
        SELECT doc_id, url_canon,
          min(doc_id) OVER (PARTITION BY url_canon) AS keep
        FROM canon)
      WHERE doc_id = keep ORDER BY doc_id""",
    "text_domain_stats" -> s"""
      WITH planted AS $plantedUrlSql,
      j AS (SELECT p.doc_id, p.raw_url, d.text
            FROM planted p JOIN documents d USING (doc_id)),
      h AS (SELECT lower(regexp_extract(raw_url,
              '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)', 1)) AS host,
            len($tokenizeSql) AS nt FROM j)
      SELECT host, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM h GROUP BY 1 ORDER BY host""",
    "text_mojibake_repair" -> """
      WITH clean AS (SELECT doc_id,
          text || ' caf' || chr(233) || ' d' || chr(233) || 'j' || chr(224) ||
          chr(8217) || 'vu ' || chr(8212) || ' ' || chr(230) || chr(248) ||
          chr(229) AS text
        FROM documents)
      SELECT doc_id, (doc_id % 3 = 0) AS was_repaired,
        CAST(length(text) AS BIGINT) AS fixed_len, md5(text) AS fixed_md5
      FROM clean ORDER BY doc_id""",
    "text_domain_cap" -> s"""
      WITH planted AS $plantedUrlSql,
      u AS (SELECT doc_id, CASE WHEN doc_id % 25 = 7 THEN 'no-scheme-here'
              ELSE raw_url END AS raw_url FROM planted),
      j AS (SELECT u.doc_id, u.raw_url, len(d.text) AS score
            FROM u JOIN documents d USING (doc_id)),
      h AS (SELECT doc_id, lower(regexp_extract(raw_url,
              '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)', 1)) AS host,
              score FROM j),
      r AS (SELECT doc_id, row_number() OVER (PARTITION BY host
              ORDER BY score DESC, doc_id) AS rn
            FROM h WHERE host <> ''),
      losers AS (SELECT doc_id FROM r WHERE rn > 20)
      SELECT d.doc_id FROM documents d
      LEFT JOIN losers l USING (doc_id) WHERE l.doc_id IS NULL
      ORDER BY d.doc_id""",
    "text_chunk" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      nz AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) > 0),
      chunks AS (
        SELECT doc_id,
          unnest(range(0, ((n - 1) // 40) + 1)) AS chunk_idx,
          tokens, n
        FROM nz)
      SELECT doc_id, chunk_idx,
        md5(array_to_string(tokens[(chunk_idx*40+1):(chunk_idx*40+50)], ' ')) AS chunk_md5,
        least(50, n - chunk_idx*40) AS chunk_tokens
      FROM chunks ORDER BY doc_id, chunk_idx""",
    "text_normalize" -> """
      SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+', ' ', 'g')) AS text_norm
      FROM documents ORDER BY doc_id""",
    "text_repetition" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      uni AS (SELECT doc_id, unnest(tokens) AS gram FROM toks),
      uc AS (SELECT doc_id, gram, count(*) AS c FROM uni GROUP BY 1, 2),
      ua AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_unigram_frac
             FROM uc GROUP BY 1),
      big AS (SELECT doc_id, unnest(list_transform(range(1, len(tokens)),
                i -> tokens[i] || ' ' || tokens[i+1])) AS gram FROM toks),
      bc AS (SELECT doc_id, gram, count(*) AS c FROM big GROUP BY 1, 2),
      ba AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac,
               round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c), 6) AS dup_bigram_frac
             FROM bc GROUP BY 1)
      SELECT d.doc_id, ua.top_unigram_frac, ba.top_bigram_frac, ba.dup_bigram_frac
      FROM documents d
      LEFT JOIN ua ON d.doc_id = ua.doc_id
      LEFT JOIN ba ON d.doc_id = ba.doc_id
      ORDER BY d.doc_id""",
    "text_boilerplate" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      nz AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) > 0),
      segs AS (SELECT doc_id, unnest(range(0, ((n - 1) // 10) + 1)) AS seg_idx, tokens
               FROM nz),
      st AS (SELECT doc_id, seg_idx,
               array_to_string(tokens[(seg_idx*10+1):(seg_idx*10+10)], ' ') AS seg
             FROM segs),
      cnt AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM st GROUP BY 1),
      j AS (SELECT st.doc_id, st.seg_idx, st.seg, cnt.nd >= 2 AS dropped
            FROM st JOIN cnt USING (seg))
      SELECT doc_id, count(*) AS n_segs, count(*) FILTER (WHERE dropped) AS n_dropped,
        md5(coalesce(array_to_string(list(seg ORDER BY seg_idx) FILTER (WHERE NOT dropped), ' '), '')) AS clean_md5
      FROM j GROUP BY 1 ORDER BY 1""",
    "text_bm25_scores" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      tl AS (SELECT doc_id, tokens, len(tokens) AS dl FROM toks),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM tl),
      qdoc AS (SELECT substr(text, 1, 120) AS text FROM documents WHERE doc_id = 0),
      qt AS (SELECT DISTINCT unnest($tokenizeSql) AS token FROM qdoc),
      hits AS (
        SELECT doc_id, dl, unnest(tokens) AS token FROM tl),
      tf AS (
        SELECT h.doc_id, h.dl, h.token, count(*) AS tf
        FROM hits h JOIN qt ON h.token = qt.token
        GROUP BY 1, 2, 3),
      idf AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
          sum(ln((s.n - i.df + 0.5) / (i.df + 0.5) + 1.0)
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS score
        FROM tf JOIN idf i USING (token), stats s
        GROUP BY 1)
      SELECT doc_id, round(score, 6) AS score6 FROM scored ORDER BY doc_id""",
    "text_phrase_search" -> s"""
      WITH planted AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 10 = 4 THEN ' alpha beta gamma alpha beta gamma'
               WHEN doc_id % 5 = 2 THEN ' zeta alpha beta gamma'
               WHEN doc_id % 5 = 3 THEN ' alpha beta delta'
               ELSE '' END AS text
        FROM documents),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      anch AS (SELECT doc_id, i FROM (
                 SELECT doc_id, tokens,
                   unnest(range(1, len(tokens) - 1)) AS i FROM toks)
               WHERE tokens[i] = 'alpha' AND tokens[i+1] = 'beta'
                 AND tokens[i+2] = 'gamma')
      SELECT doc_id, count(*) AS n_matches,
        CAST(min(i) - 1 AS BIGINT) AS first_pos
      FROM anch GROUP BY 1 ORDER BY doc_id""",
    "text_phrase_batch" -> s"""
      WITH planted AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 10 = 4 THEN ' alpha beta gamma alpha beta gamma'
               WHEN doc_id % 5 = 2 THEN ' zeta alpha beta gamma'
               WHEN doc_id % 5 = 3 THEN ' alpha beta delta'
               ELSE '' END AS text
        FROM documents),
      toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM planted),
      anch AS (
        SELECT 0 AS phrase_id, doc_id, i FROM (
            SELECT doc_id, tokens, unnest(range(1, len(tokens) - 1)) AS i FROM toks)
          WHERE tokens[i] = 'alpha' AND tokens[i+1] = 'beta' AND tokens[i+2] = 'gamma'
        UNION ALL
        SELECT 1, doc_id, i FROM (
            SELECT doc_id, tokens, unnest(range(1, len(tokens) - 1)) AS i FROM toks)
          WHERE tokens[i] = 'zeta' AND tokens[i+1] = 'alpha' AND tokens[i+2] = 'beta'
        UNION ALL
        SELECT 2, doc_id, i FROM (
            SELECT doc_id, tokens, unnest(range(1, len(tokens))) AS i FROM toks)
          WHERE tokens[i] = 'gamma' AND tokens[i+1] = 'alpha')
      SELECT phrase_id, doc_id, count(*) AS n_matches,
        CAST(min(i) - 1 AS BIGINT) AS first_pos
      FROM anch GROUP BY 1, 2 ORDER BY phrase_id, doc_id""",
    "text_hybrid_rrf" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents),
      tl AS (SELECT doc_id, tokens, len(tokens) AS dl FROM toks),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM tl),
      qdoc AS (SELECT substr(text, 1, 120) AS text FROM documents WHERE doc_id = 0),
      qt AS (SELECT DISTINCT unnest($tokenizeSql) AS token FROM qdoc),
      hits AS (SELECT doc_id, dl, unnest(tokens) AS token FROM tl),
      tf AS (SELECT h.doc_id, h.dl, h.token, count(*) AS tf
             FROM hits h JOIN qt ON h.token = qt.token GROUP BY 1, 2, 3),
      idf AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
          sum(ln((s.n - i.df + 0.5) / (i.df + 0.5) + 1.0)
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS score
        FROM tf JOIN idf i USING (token), stats s GROUP BY 1),
      bmr AS (SELECT doc_id AS id, row_number()
                OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank_text
              FROM scored QUALIFY rank_text <= 50),
      q AS (SELECT embedding AS q_v FROM embeddings WHERE vec_id = 0),
      cs AS (
        SELECT e.vec_id,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))
          / nullif(
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.q_v[i] AS DOUBLE) * CAST(q.q_v[i] AS DOUBLE)))), 0.0) AS cosine
        FROM embeddings e, q WHERE e.vec_id <> 0),
      csr AS (SELECT vec_id AS id, row_number()
                OVER (ORDER BY round(cosine, 6) DESC, vec_id) AS rank_vec
              FROM cs QUALIFY rank_vec <= 50),
      fused AS (SELECT coalesce(b.id, c.id) AS doc_id, b.rank_text, c.rank_vec,
          coalesce(1.0 / (60 + b.rank_text), 0) + coalesce(1.0 / (60 + c.rank_vec), 0) AS rrf
        FROM bmr b FULL OUTER JOIN csr c ON b.id = c.id)
      SELECT doc_id, rank_text, rank_vec, round(rrf, 6) AS rrf
      FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""",
    "text_fingerprint" -> s"""
      WITH toks AS (SELECT doc_id, $tokenizeSql AS tokens FROM documents)
      SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS bag_fingerprint,
        md5(array_to_string(tokens, ' ')) AS seq_fingerprint
      FROM toks ORDER BY doc_id""",
    "pipeline_curate" -> s"""
      WITH ${docCtes(cfg16)},
      bk AS (SELECT doc_id, unnest(bucket_ids) AS bucket FROM buck),
      pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
      nd AS (
        SELECT DISTINCT p.b_id FROM pairs p
        JOIN sig sa ON p.a_id = sa.doc_id JOIN sig sb ON p.b_id = sb.doc_id
        WHERE CAST(CAST(len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
          / least(len(sa.signature), len(sb.signature)) AS FLOAT4) >= 0.5),
      q AS (
        SELECT t.doc_id,
          (CASE WHEN len(tokens) BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
           CASE WHEN CAST(list_sum(list_transform(tokens, x -> len(x))) AS DOUBLE)
                  / greatest(len(tokens), 1) BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
           CASE WHEN CAST(len(list_filter(tokens, x -> list_contains(${stopwordList("en")}, x))) AS DOUBLE)
                  / greatest(len(tokens), 1) >= 0.05 THEN 0.25 ELSE 0.0 END +
           CASE WHEN CAST(len(d.text) - len(regexp_replace(d.text, '[0-9]', '', 'g')) AS DOUBLE)
                  / greatest(len(d.text), 1) <= 0.2 THEN 0.25 ELSE 0.0 END) AS score,
          CASE
            WHEN len(list_filter(tokens, x -> list_contains(${stopwordList("de")}, x))) >= len(list_filter(tokens, x -> list_contains(${stopwordList("en")}, x)))
             AND len(list_filter(tokens, x -> list_contains(${stopwordList("de")}, x))) >= len(list_filter(tokens, x -> list_contains(${stopwordList("es")}, x)))
             AND len(list_filter(tokens, x -> list_contains(${stopwordList("de")}, x))) >= len(list_filter(tokens, x -> list_contains(${stopwordList("fr")}, x)))
             AND len(list_filter(tokens, x -> list_contains(${stopwordList("de")}, x))) > 0 THEN 'de'
            WHEN len(list_filter(tokens, x -> list_contains(${stopwordList("en")}, x))) >= len(list_filter(tokens, x -> list_contains(${stopwordList("es")}, x)))
             AND len(list_filter(tokens, x -> list_contains(${stopwordList("en")}, x))) >= len(list_filter(tokens, x -> list_contains(${stopwordList("fr")}, x)))
             AND len(list_filter(tokens, x -> list_contains(${stopwordList("en")}, x))) > 0 THEN 'en'
            WHEN len(list_filter(tokens, x -> list_contains(${stopwordList("es")}, x))) >= len(list_filter(tokens, x -> list_contains(${stopwordList("fr")}, x)))
             AND len(list_filter(tokens, x -> list_contains(${stopwordList("es")}, x))) > 0 THEN 'es'
            WHEN len(list_filter(tokens, x -> list_contains(${stopwordList("fr")}, x))) > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred
        FROM toks t JOIN documents d USING (doc_id)),
      exact AS (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1)
      SELECT q.doc_id FROM q JOIN exact USING (doc_id)
      WHERE q.score >= 0.75 AND q.lang_pred <> 'und'
        AND q.doc_id NOT IN (SELECT b_id FROM nd)
      ORDER BY q.doc_id""",
    "pipeline_curate_incremental" -> s"""
      WITH ch AS (
        SELECT doc_id, 1 AS seq, 'U' AS op, text || ' update v2' AS text
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id, 2, 'U', text || ' update v3'
        FROM documents WHERE doc_id % 20 = 0
        UNION ALL
        SELECT doc_id, 3, 'D', text FROM documents WHERE doc_id % 7 = 3
        UNION ALL
        SELECT doc_id + 1000000000, 1, 'I', text || ' inserted fresh sample'
        FROM documents WHERE doc_id % 13 = 1),
      latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY seq DESC, op DESC) AS rn
          FROM ch) WHERE rn = 1),
      snap AS (
        SELECT d.doc_id, d.text FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.doc_id = d.doc_id)
        UNION ALL
        SELECT doc_id, text FROM latest WHERE op <> 'D'),
      toks AS (SELECT doc_id, text, $tokenizeSql AS tokens FROM snap),
      q AS (
        SELECT doc_id,
          (CASE WHEN len(tokens) BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
           CASE WHEN CAST(list_sum(list_transform(tokens, t -> len(t))) AS DOUBLE)
                  / greatest(len(tokens), 1) BETWEEN 2.0 AND 12.0
                THEN 0.25 ELSE 0.0 END +
           CASE WHEN CAST(len(list_filter(tokens, t -> list_contains(${stopwordList("en")}, t))) AS DOUBLE)
                  / greatest(len(tokens), 1) >= 0.05 THEN 0.25 ELSE 0.0 END +
           CASE WHEN CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                  / greatest(len(text), 1) <= 0.2 THEN 0.25 ELSE 0.0 END)
            AS score
        FROM toks)
      SELECT doc_id FROM q WHERE score >= 0.75 ORDER BY doc_id""",
    "stream_tumbling_agg" -> """
      SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
               '%Y-%m-%d %H:%M:%S') AS window_start,
        event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_session_agg" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      marked AS (
        SELECT user_id, ts, value,
          -- > (strict): Spark's session_window merges an event arriving
          -- EXACTLY gap after its predecessor (verified empirically: events
          -- at 00:00/00:30/00:59:59 with gap=30m form ONE session), so only
          -- a strictly larger gap starts a new session
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT user_id, ts, value,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
      SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "stream_sliding_agg" -> """
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      w AS (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
                   event_type, value FROM e)
      SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
    "mm_decode_meta" -> """
      SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        'stub' AS format,
        CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
        CAST(64 + (octet_length(encode(text)) // 7) % 512 AS INTEGER) AS height,
        CAST(1 + octet_length(encode(text)) % 16 AS INTEGER) AS frame_count
      FROM documents ORDER BY doc_id""",
    "mm_decode_png" -> """
      SELECT doc_id, CAST(45 AS INTEGER) AS byte_len, 'png' AS format,
        CAST(16 + doc_id % 512 AS INTEGER) AS width,
        CAST(16 + (doc_id * 7) % 512 AS INTEGER) AS height,
        CAST(1 AS INTEGER) AS frame_count
      FROM documents ORDER BY doc_id""",
    "mm_decode_jpeg" -> """
      SELECT doc_id, CAST(41 AS INTEGER) AS byte_len, 'jpeg' AS format,
        CAST(16 + doc_id % 512 AS INTEGER) AS width,
        CAST(16 + (doc_id * 7) % 512 AS INTEGER) AS height,
        CAST(1 AS INTEGER) AS frame_count
      FROM documents ORDER BY doc_id""",
    "mm_features" -> """
      WITH n AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
      SELECT doc_id,
        CAST((len * 3) % 97 AS DOUBLE) / 97.0 AS f0,
        CAST((len * 4) % 97 AS DOUBLE) / 97.0 AS f1,
        CAST((len * 5) % 97 AS DOUBLE) / 97.0 AS f2,
        CAST((len * 6) % 97 AS DOUBLE) / 97.0 AS f3,
        CAST((len * 7) % 97 AS DOUBLE) / 97.0 AS f4,
        CAST((len * 8) % 97 AS DOUBLE) / 97.0 AS f5,
        CAST((len * 9) % 97 AS DOUBLE) / 97.0 AS f6,
        CAST((len * 10) % 97 AS DOUBLE) / 97.0 AS f7
      FROM n ORDER BY doc_id""",
    "mm_decode_gif" -> """
      SELECT doc_id, CAST(14 + 21 * (1 + doc_id % 5) AS INTEGER) AS byte_len,
        'gif' AS format,
        CAST(16 + doc_id % 512 AS INTEGER) AS width,
        CAST(16 + (doc_id * 7) % 512 AS INTEGER) AS height,
        CAST(1 + doc_id % 5 AS INTEGER) AS frame_count
      FROM documents ORDER BY doc_id""",
    "mm_decode_bmp" -> """
      WITH dims AS (SELECT doc_id,
          CAST(4 + doc_id % 13 AS INTEGER) AS w,
          CAST(4 + (doc_id * 5) % 11 AS INTEGER) AS h
        FROM documents)
      SELECT doc_id,
        CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INTEGER) AS byte_len,
        'bmp' AS format, w AS width, h AS height,
        CAST(1 AS INTEGER) AS frame_count
      FROM dims ORDER BY doc_id""",
    "mm_features_real_bmp" -> """
      SELECT doc_id,
        round((doc_id % 256) / 255.0, 6) AS f0,
        round(((doc_id * 3) % 256) / 255.0, 6) AS f1,
        round(((doc_id * 7) % 256) / 255.0, 6) AS f2,
        0.0 AS f3, 0.0 AS f4, 0.0 AS f5,
        round((4 + doc_id % 13) / 1024.0, 6) AS f6,
        round((4 + (doc_id * 5) % 11) / 1024.0, 6) AS f7
      FROM documents ORDER BY doc_id""",
    "mm_features_real" -> """
      SELECT doc_id,
        round((doc_id % 256) / 255.0, 6) AS f0,
        round(((doc_id * 3) % 256) / 255.0, 6) AS f1,
        round(((doc_id * 7) % 256) / 255.0, 6) AS f2,
        0.0 AS f3, 0.0 AS f4, 0.0 AS f5,
        round((4 + doc_id % 13) / 1024.0, 6) AS f6,
        round((4 + (doc_id * 5) % 11) / 1024.0, 6) AS f7
      FROM documents ORDER BY doc_id""",
    "mm_features_real_gif" -> """
      SELECT doc_id,
        round((doc_id % 256) / 255.0, 6) AS f0,
        round(((doc_id * 3) % 256) / 255.0, 6) AS f1,
        round(((doc_id * 7) % 256) / 255.0, 6) AS f2,
        0.0 AS f3, 0.0 AS f4, 0.0 AS f5,
        round((4 + doc_id % 13) / 1024.0, 6) AS f6,
        round((4 + (doc_id * 5) % 11) / 1024.0, 6) AS f7
      FROM documents ORDER BY doc_id""",
    "mm_features_real_jpeg" -> """
      SELECT doc_id, true AS is_uniform, true AS mean_close,
        round((4 + doc_id % 13) / 1024.0, 6) AS f6,
        round((4 + (doc_id * 5) % 11) / 1024.0, 6) AS f7
      FROM documents ORDER BY doc_id""",
    "mm_features_real_wav" -> """
      WITH p AS (SELECT doc_id,
          8000 + (doc_id % 8) * 1000 AS sample_rate,
          1 + doc_id % 2 AS channels,
          64 + (doc_id % 16) * 4 AS n_frames,
          2 * (1 + (doc_id * 7) % 8192) AS a0,
          2 * (1 + (doc_id * 7 + 11) % 8192) AS a1
        FROM documents)
      SELECT doc_id,
        CAST(sample_rate AS BIGINT) AS sample_rate,
        CAST(channels AS BIGINT) AS channels,
        CAST(16 AS BIGINT) AS bit_depth,
        CAST(n_frames AS BIGINT) AS n_frames,
        round(sqrt(5 * a0 * a0 / 8.0) / 32768, 6) AS rms_ch0,
        round(a0 / 32768.0, 6) AS peak_ch0,
        CASE WHEN channels > 1 THEN round(sqrt(5 * a1 * a1 / 8.0) / 32768, 6) END AS rms_ch1,
        CASE WHEN channels > 1 THEN round(a1 / 32768.0, 6) END AS peak_ch1
      FROM p ORDER BY doc_id""",
    "mm_features_real_flac" -> """
      SELECT doc_id,
        CAST(list_extract([44100, 48000, 32000, 96000],
          CAST(1 + doc_id % 4 AS INTEGER)) AS BIGINT) AS sample_rate,
        CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 24 ELSE 16 END AS BIGINT)
          AS bits_per_sample,
        CAST(1000 + doc_id % 9000 AS BIGINT) AS total_samples,
        CAST(4096 AS BIGINT) AS min_block, CAST(4096 AS BIGINT) AS max_block
      FROM documents ORDER BY doc_id""",
    "mm_features_real_mp3" -> """
      WITH p AS (SELECT doc_id,
          list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
            CAST(1 + doc_id % 14 AS INTEGER)) AS kbps,
          list_extract([44100,48000,32000],
            CAST(1 + doc_id % 3 AS INTEGER)) AS sr,
          3 + doc_id % 6 AS frames,
          CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS ch
        FROM documents)
      SELECT doc_id, 'mpeg1' AS version, CAST(3 AS BIGINT) AS layer,
        CAST(kbps AS BIGINT) AS bitrate_kbps, CAST(sr AS BIGINT) AS sample_rate,
        CAST(ch AS BIGINT) AS channels, CAST(frames AS BIGINT) AS n_frames,
        CAST(frames * 1152 AS BIGINT) AS n_samples
      FROM p ORDER BY doc_id""",
    "mm_features_real_avi" -> """
      SELECT doc_id, 'avi' AS format,
        CAST(4 + doc_id % 13 AS INTEGER) AS width,
        CAST(4 + (doc_id * 5) % 11 AS INTEGER) AS height,
        CAST(1 + doc_id % 4 AS INTEGER) AS frame_count,
        true AS is_uniform, true AS mean_close
      FROM documents ORDER BY doc_id""",
    "mm_frame_sample_real" -> """
      WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS frame_count FROM documents)
      SELECT doc_id, unnest(range(0, frame_count, 2)) AS frame_idx,
        CAST(4 + doc_id % 13 AS INTEGER) AS width,
        CAST(4 + (doc_id * 5) % 11 AS INTEGER) AS height,
        true AS is_uniform, true AS mean_close
      FROM m ORDER BY doc_id, frame_idx""",
    "mm_silence_real" -> """
      WITH m AS (SELECT doc_id, 16 + (doc_id % 8) * 4 AS L,
          4 + doc_id % 3 AS nb FROM documents),
      s AS (SELECT doc_id, L, unnest(range(0, nb // 2)) AS k FROM m)
      SELECT doc_id, CAST(k AS BIGINT) AS seg_idx,
        CAST((2 * k + 1) * L AS BIGINT) AS start_frame,
        CAST(L AS BIGINT) AS n_frames
      FROM s ORDER BY doc_id, seg_idx""",
    "mm_gps_parse" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'N' ELSE 'S' END AS lat_ref,
        CAST(doc_id % 90 AS INTEGER) AS lat_d,
        CAST((doc_id * 7) % 60 AS INTEGER) AS lat_m,
        CAST((doc_id * 13) % 6000 AS INTEGER) AS lat_s100,
        CASE WHEN doc_id % 4 < 2 THEN 'E' ELSE 'W' END AS lon_ref,
        CAST(doc_id % 180 AS INTEGER) AS lon_d,
        CAST((doc_id * 11) % 60 AS INTEGER) AS lon_m,
        CAST((doc_id * 17) % 6000 AS INTEGER) AS lon_s100
      FROM documents ORDER BY doc_id""",
    "mm_keyframes_real" -> """
      WITH m AS (SELECT doc_id, 2 + doc_id % 5 AS n FROM documents),
      f AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM m)
      SELECT doc_id, CAST(j AS BIGINT) AS frame_idx, CAST(n AS BIGINT) AS n_frames
      FROM f WHERE j = 0 OR (doc_id + j) % 3 = 0
      ORDER BY doc_id, frame_idx""",
    "mm_exif_parse" -> exifOracle,
    "stream_exif_real" -> exifOracle,
    "mm_resize_real_avi" -> """
      WITH m AS (SELECT doc_id,
          CAST(4 + doc_id % 13 AS DOUBLE) AS w,
          CAST(4 + (doc_id * 5) % 11 AS DOUBLE) AS h
        FROM documents),
      s AS (SELECT doc_id, w, h, least(8.0 / w, 8.0 / h, 1.0) AS sc FROM m)
      SELECT doc_id, 'png' AS format,
        CAST(greatest(floor(w * sc), 1) AS INTEGER) AS out_width,
        CAST(greatest(floor(h * sc), 1) AS INTEGER) AS out_height,
        true AS is_uniform, true AS mean_close
      FROM s ORDER BY doc_id""",
    "mm_resize_real_gif" -> """
      WITH m AS (SELECT doc_id,
          CAST(4 + doc_id % 13 AS DOUBLE) AS w,
          CAST(4 + (doc_id * 5) % 11 AS DOUBLE) AS h
        FROM documents),
      s AS (SELECT doc_id, w, h, least(8.0 / w, 8.0 / h, 1.0) AS sc FROM m)
      SELECT doc_id, 'png' AS format,
        CAST(greatest(floor(w * sc), 1) AS INTEGER) AS out_width,
        CAST(greatest(floor(h * sc), 1) AS INTEGER) AS out_height,
        round((doc_id % 256) / 255.0, 6) AS mean_r6,
        round(((doc_id * 3) % 256) / 255.0, 6) AS mean_g6,
        round(((doc_id * 7) % 256) / 255.0, 6) AS mean_b6
      FROM s ORDER BY doc_id""",
    "mm_frame_sample" -> """
      WITH m AS (SELECT doc_id, 1 + doc_id % 5 AS frame_count FROM documents)
      SELECT doc_id, unnest(range(0, frame_count, 2)) AS frame_idx
      FROM m ORDER BY doc_id, frame_idx""",
    "mm_resize" -> """
      WITH m AS (SELECT doc_id,
          CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
          CAST(64 + (octet_length(encode(text)) // 7) % 512 AS INTEGER) AS height
        FROM documents),
      s AS (SELECT doc_id, width, height,
          least(256.0 / width, 256.0 / height, 1.0) AS sc FROM m)
      SELECT doc_id, width, height,
        CAST(floor(width * sc) AS INTEGER) AS out_width,
        CAST(floor(height * sc) AS INTEGER) AS out_height
      FROM s ORDER BY doc_id""")
}
