package graft.operators

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}
import graft.functions.SimHash64.{hamming, simhash64}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All are lazy plans over (id, text) / (id, embedding) inputs; every join is
  * key-blocked (hash group, LSH bucket, simhash band, sign bucket) so no
  * operator does an all-pairs comparison at scale.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical-text group.
    *
    * Scale shape: the keep/drop DECISION is computed on a (id, 16-byte md5)
    * projection — partial-aggregated min-id per hash, then a hash equi-join
    * back to that same narrow projection to name the losers — so every
    * exchange in the decision carries hash + id, never text. (The previous
    * `row_number().over(partitionBy(md5(text)))` window had to shuffle the
    * FULL row to emit it, shipping the whole corpus text.) The loser-id
    * list is then removed with an id-keyed anti-join carrying NO hint: a
    * web crawl can shed 30-50 % of its docs as exact dupes, so the loser
    * list scales with the corpus and must be allowed to shuffle. When the
    * list IS small (curated corpora), AQE's runtime size estimate converts
    * the anti-join to a broadcast on its own; a forced `broadcast()` hint
    * would instead be honored unconditionally and die at the 8 GB
    * broadcast / driver-memory ceiling on a dup-heavy corpus.
    */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("__ded_id"), md5(col(textCol)).as("__ded_h"))
    val winners = keyed.groupBy(col("__ded_h")).agg(min(col("__ded_id")).as("__ded_keep"))
    val losers = keyed.join(winners, Seq("__ded_h"))
      .where(col("__ded_id") =!= col("__ded_keep"))
      .select(col("__ded_id").as("__ded_loser"))
    docs.join(losers, docs(idCol) === col("__ded_loser"), "left_anti")
  }

  /** URL-keyed dedup — the crawl-pipeline step BEFORE any content dedup:
    * keep the min-id document per CANONICAL URL
    * ([[TextAnalysis.canonicalizeUrl]] — scheme/host case, default ports,
    * fragments, and tracking params do not distinguish pages). Identical
    * hash-only decision shape to [[dropExactDuplicates]]: the
    * canonicalized URL collapses to a 16-byte md5 before any exchange, so
    * every shuffle carries (hash, id) — never the URL text, never the
    * document — and the loser anti-join stays unhinted (AQE broadcasts a
    * small loser list, a dup-heavy crawl's list is allowed to shuffle).
    *
    * Null-URL rows are ALL KEPT: `md5(null)` is null, and null keys never
    * match in the winner equi-join, so a row with no URL can never be
    * declared a loser. This is deliberate dead-letter semantics — a
    * missing URL carries no evidence two documents are the same page;
    * route null-URL rows to content dedup ([[dropExactDuplicates]])
    * instead of guessing here.
    */
  def dropUrlDuplicates(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("__ud_id"),
      md5(TextAnalysis.canonicalizeUrl(col(urlCol))).as("__ud_h"))
    val winners = keyed.groupBy(col("__ud_h")).agg(min(col("__ud_id")).as("__ud_keep"))
    val losers = keyed.join(winners, Seq("__ud_h"))
      .where(col("__ud_id") =!= col("__ud_keep"))
      .select(col("__ud_id").as("__ud_loser"))
    docs.join(losers, docs(idCol) === col("__ud_loser"), "left_anti")
  }

  /** Exact-duplicate groups (diagnostic view): content hash → group size +
    * kept id. Only groups with >1 member.
    */
  def exactDuplicateGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .where(col("dup_count") > 1)

  /** Benchmark decontamination: flag corpus documents that share at least
    * one k-token shingle with a benchmark/eval set (the train-test overlap
    * scrub of a training pipeline). Adds `n_overlap` (distinct shared
    * shingles) and `contaminated` to `docs`.
    *
    * Scale shape: the benchmark side (eval suites — thousands of docs, not
    * terabytes) collapses to its distinct shingle set and is broadcast; the
    * corpus side is a narrow tokenize→shingle→explode whose broadcast inner
    * join keeps only MATCHED (id, shingle) rows, so the only shuffle — the
    * per-doc count — carries hit rows, not the corpus. The 100 TB side is
    * never shuffled or collected.
    */
  def contaminationFlags(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 2): DataFrame = {
    val benchShingles = broadcast(
      bench.select(explode(T.shingles(col(benchTextCol), k)).as("shingle")).distinct())
    val corpusShingles = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol), explode(T.shingles(col(textCol), k)).as("shingle"))
    val hits = corpusShingles.join(benchShingles, Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    docs.join(hits, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** BENCH-side leak report — the inverse view of [[contaminationFlags]],
    * and the one an eval owner actually consumes: per benchmark item, how
    * many distinct corpus documents share a k-shingle with it and how
    * many of its own shingles are compromised. Items with high
    * `n_corpus_docs` are memorization risks regardless of whether the
    * corpus rows get dropped. Output: (benchId, n_shingles,
    * n_hit_shingles, n_corpus_docs), every bench item present.
    *
    * Scale shape: identical to the forward direction — the bench side
    * collapses to (id, shingle) types and broadcasts; the corpus pass
    * keeps only MATCHED (bench_id, shingle, corpus_id) rows, so the only
    * shuffled rows are hits: two distinct-aggregates over hit rows, the
    * 100 TB side never shuffled whole.
    */
  def benchLeakReport(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int = 2): DataFrame = {
    val benchShingles = bench.select(col(benchIdCol).as("__bl_id"),
        explode(T.shingles(col(benchTextCol), k)).as("shingle")).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    val nShingles = benchShingles.groupBy("__bl_id")
      .agg(count(lit(1)).as("n_shingles"))
    val hits = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).as("__bl_doc"), explode(T.shingles(col(textCol), k)).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"))
    val perItem = hits.groupBy("__bl_id")
      .agg(count_distinct(col("shingle")).as("n_hit_shingles"),
        count_distinct(col("__bl_doc")).as("n_corpus_docs"))
    nShingles.join(perItem, Seq("__bl_id"), "left")
      .select(col("__bl_id").as(benchIdCol), col("n_shingles"),
        coalesce(col("n_hit_shingles"), lit(0L)).as("n_hit_shingles"),
        coalesce(col("n_corpus_docs"), lit(0L)).as("n_corpus_docs"))
  }

  /** Filtering form of [[contaminationFlags]]: the corpus minus everything
    * that overlaps the benchmark set.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 2): DataFrame =
    contaminationFlags(docs, idCol, textCol, bench, benchTextCol, k)
      .where(!col("contaminated"))
      .drop("n_overlap", "contaminated")

  /** Corpus-level duplicated n-gram coverage — the measurable core of
    * exact-substring deduplication (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better": spans repeated anywhere
    * in the corpus, not just within near-duplicate PAIRS): per document,
    * how many token n-grams occur more than once corpus-wide, and what
    * fraction of the document's tokens those duplicated spans COVER
    * (overlapping spans merged by an interval union, so a token under
    * three overlapping duplicated 10-grams counts once).
    *
    * Output: (id, n_tokens, n_ngrams, n_dup_ngrams, dup_tokens, dup_frac).
    *
    * Scale shape: the corpus-wide occurrence count runs on exploded
    * (id, pos, 16-byte hash) rows — decision-sized, never text — as one
    * partial-aggregated count plus a semi-join back; the interval union is
    * a running-max window over (id, pos) pairs partitioned BY DOCUMENT, so
    * no global ordering exists anywhere. Memory-bound per task by the
    * duplicated-occurrence count of one partition's docs, not the corpus.
    */
  def duplicatedNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 10): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val base = df.select(col(idCol).as("__dn_id"), T.tokenize(col(textCol)).as("__dn_toks"))
      .withColumn("__dn_nt", size(col("__dn_toks")).cast("long"))
      .transform(graft.SparkUtil.scopedPersist)
    // sequence(1, m) flips to DESCENDING when m < 1 — guard empty docs
    val idxs = when(size(col("__dn_toks")) >= n,
      sequence(lit(0), size(col("__dn_toks")) - n)).otherwise(array().cast("array<int>"))
    val grams = base.select(col("__dn_id"),
        posexplode(transform(idxs, i => md5(array_join(slice(col("__dn_toks"), i + 1, lit(n)), " ")))))
      .toDF("__dn_id", "__dn_pos", "__dn_h")
    val dupHashes = grams.groupBy("__dn_h").agg(count(lit(1)).as("__dn_c"))
      .where(col("__dn_c") > 1).select("__dn_h")
    val w = Window.partitionBy("__dn_id").orderBy("__dn_pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDoc = grams.join(dupHashes, Seq("__dn_h"), "left_semi")
      .withColumn("__dn_prev_end", max(col("__dn_pos") + n).over(w))
      .withColumn("__dn_cov",
        greatest(lit(0), (col("__dn_pos") + n) -
          greatest(col("__dn_pos"), coalesce(col("__dn_prev_end"), col("__dn_pos")))))
      .groupBy("__dn_id")
      .agg(count(lit(1)).as("n_dup_ngrams"), sum(col("__dn_cov").cast("long")).as("dup_tokens"))
    base.select(col("__dn_id").as(idCol), col("__dn_nt").as("n_tokens"),
        greatest(col("__dn_nt") - (n - 1), lit(0L)).as("n_ngrams"))
      .join(perDoc.withColumnRenamed("__dn_id", idCol), Seq(idCol), "left")
      .withColumn("n_dup_ngrams", coalesce(col("n_dup_ngrams"), lit(0L)))
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_frac", when(col("n_tokens") > 0,
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)))
  }

  /** Exact-substring span REMOVAL — the applied form of
    * [[duplicatedNgramStats]] (Lee et al. 2021 §4.1 "ExactSubstr": cut the
    * duplicated spans out of the training text instead of dropping whole
    * documents). Every token covered by ANY occurrence of a
    * corpus-duplicated n-gram is removed (the conservative both-copies
    * variant); the surviving tokens are re-joined with single spaces, so
    * `clean_text` is a token stream, not byte-identical prose — exactly
    * what a tokenizer-bound training pipeline consumes.
    *
    * Output: (id, n_tokens, kept_tokens, clean_text); `clean_text` is the
    * empty string when nothing survives.
    *
    * Scale shape: the duplicated-occurrence decision reuses the
    * [[duplicatedNgramStats]] machinery — exploded (id, pos, 16-byte hash)
    * rows, one partial-aggregated corpus count, one semi-join — and the
    * per-doc duplicated START offsets collapse to one int-array row per
    * affected doc (bounded by that doc's n-gram count) before joining back
    * onto the (id, tokens) projection; the cut itself is a NARROW
    * in-place slice ([[cutCoveredSpans]] — merged-interval complement,
    * O(tokens + intervals) per doc even when the doc is fully duplicated).
    * Token arrays therefore cross AT MOST ONE exchange — none when AQE
    * broadcasts the start table (curated corpora), exactly one SMJ
    * co-partitioning when the affected-doc set outgrows broadcast
    * (dup-heavy crawls) — the same documented degradation convention as
    * [[dropExactDuplicates]]'s loser list; every other exchange carries
    * (id, pos, hash) ints only.
    */
  /** Tokens of `toks` NOT covered by any interval `[s, s+n)` for the
    * SORTED-ascending start list `starts` — the shared cut kernel of the
    * two ExactSubstr variants. Touching/overlapping intervals are merged
    * first by the consecutive-gap test (sorted fixed-length intervals are
    * one contiguous run exactly while each gap ≤ n), then the SURVIVING
    * complement ranges are sliced out directly — O(tokens + intervals)
    * per doc, where the naive per-token `exists` probe is
    * O(tokens × starts) and a long fully-duplicated document (the
    * dup-heavy crawl case) made that per-doc quadratic.
    */
  private def cutCoveredSpans(toks: Column, starts: Column, n: Int): Column = {
    // group boundaries of the merged coverage: a start opens a new run iff
    // its gap to the previous start exceeds n (element_at is 1-based, so
    // element_at(starts, i) is the 0-based predecessor of index i)
    val runLo = filter(starts, (s, i) =>
      i === lit(0) || s - element_at(starts, i) > lit(n))
    val runHi = transform(
      filter(starts, (s, i) =>
        i === size(starts) - 1 || element_at(starts, i + 2) - s > lit(n)),
      s => s + lit(n))
    // complement of the merged runs within [0, |toks|): gap g sits between
    // run g-1's end and run g's start, plus the head and tail gaps
    val gapA = concat(array(lit(0)), runHi)
    val gapB = concat(runLo, array(size(toks)))
    val ranges = filter(
      zip_with(gapA, gapB, (a, b) => struct(a.as("a"), b.as("b"))),
      r => r("b") > r("a"))
    flatten(transform(ranges, r => slice(toks, r("a") + 1, r("b") - r("a"))))
  }

  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 10): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val base = df.select(col(idCol).as("__rs_id"), T.tokenize(col(textCol)).as("__rs_toks"))
      .transform(graft.SparkUtil.scopedPersist)
    // sequence(1, m) flips to DESCENDING when m < 1 — guard empty docs
    val idxs = when(size(col("__rs_toks")) >= n,
      sequence(lit(0), size(col("__rs_toks")) - n)).otherwise(array().cast("array<int>"))
    val grams = base.select(col("__rs_id"),
        posexplode(transform(idxs, i => md5(array_join(slice(col("__rs_toks"), i + 1, lit(n)), " ")))))
      .toDF("__rs_id", "__rs_pos", "__rs_h")
    val dupHashes = grams.groupBy("__rs_h").agg(count(lit(1)).as("__rs_c"))
      .where(col("__rs_c") > 1).select("__rs_h")
    val starts = grams.join(dupHashes, Seq("__rs_h"), "left_semi")
      .groupBy("__rs_id")
      .agg(sort_array(collect_list(col("__rs_pos"))).as("__rs_starts"))
    base.join(starts, Seq("__rs_id"), "left")
      .withColumn("__rs_starts",
        coalesce(col("__rs_starts"), array().cast("array<int>")))
      .withColumn("__rs_kept",
        cutCoveredSpans(col("__rs_toks"), col("__rs_starts"), n))
      .select(col("__rs_id").as(idCol),
        size(col("__rs_toks")).cast("long").as("n_tokens"),
        size(col("__rs_kept")).cast("long").as("kept_tokens"),
        array_join(col("__rs_kept"), " ").as("clean_text"))
  }

  /** KEEP-FIRST variant of [[removeDuplicatedSpans]] — the other
    * ExactSubstr semantics Lee et al. discuss: the corpus-FIRST occurrence
    * of each duplicated n-gram (smallest (id, pos)) survives, every other
    * occurrence is cut — so duplicated content keeps exactly one copy
    * corpus-wide instead of vanishing entirely. Output and conventions
    * identical to the conservative variant.
    *
    * Scale shape: adds ONE decision aggregate to the conservative
    * variant — the per-hash `min(struct(id, pos))` winner (map-side
    * combined, (hash, id, pos) rows) joined back onto the duplicated
    * occurrences to exempt winners; everything else unchanged, token
    * arrays still cross at most the one reconstruction exchange.
    */
  def removeDuplicatedSpansKeepFirst(df: DataFrame, idCol: String,
      textCol: String, n: Int = 10): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val base = df.select(col(idCol).as("__rs_id"), T.tokenize(col(textCol)).as("__rs_toks"))
      .transform(graft.SparkUtil.scopedPersist)
    val idxs = when(size(col("__rs_toks")) >= n,
      sequence(lit(0), size(col("__rs_toks")) - n)).otherwise(array().cast("array<int>"))
    val grams = base.select(col("__rs_id"),
        posexplode(transform(idxs, i => md5(array_join(slice(col("__rs_toks"), i + 1, lit(n)), " ")))))
      .toDF("__rs_id", "__rs_pos", "__rs_h")
    val dupOcc = grams.join(
        grams.groupBy("__rs_h").agg(count(lit(1)).as("__rs_c"))
          .where(col("__rs_c") > 1).select("__rs_h"),
        Seq("__rs_h"), "left_semi")
      .transform(graft.SparkUtil.scopedPersist)
    val winners = dupOcc.groupBy("__rs_h")
      .agg(min(struct(col("__rs_id"), col("__rs_pos"))).as("__rs_w"))
    val starts = dupOcc.join(winners, Seq("__rs_h"))
      .where(!(col("__rs_id") === col("__rs_w.__rs_id") &&
        col("__rs_pos") === col("__rs_w.__rs_pos")))
      .groupBy("__rs_id")
      .agg(sort_array(collect_list(col("__rs_pos"))).as("__rs_starts"))
    base.join(starts, Seq("__rs_id"), "left")
      .withColumn("__rs_starts",
        coalesce(col("__rs_starts"), array().cast("array<int>")))
      .withColumn("__rs_kept",
        cutCoveredSpans(col("__rs_toks"), col("__rs_starts"), n))
      .select(col("__rs_id").as(idCol),
        size(col("__rs_toks")).cast("long").as("n_tokens"),
        size(col("__rs_kept")).cast("long").as("kept_tokens"),
        array_join(col("__rs_kept"), " ").as("clean_text"))
  }

  /** Serialized Bloom filter over the benchmark set's distinct k-shingle
    * hashes — the bounded-sketch form of the [[contaminationFlags]] bench
    * side, for corpora where even the shingle JOIN is too expensive.
    *
    * Scale shape: built with Spark's own `BloomFilterAggregate` (the same
    * sketch the runtime-filter optimizer injects), so construction is one
    * partial-aggregated pass over the bench shingles — every executor ORs
    * its local bitset, the driver receives exactly ONE serialized filter of
    * `numBits/8` bytes regardless of bench size. With the default
    * `fpp = 1e-6` sizing a 1 M-shingle benchmark costs ~3.6 MB — safely
    * inside broadcast budget at any corpus scale, vs. a bench-shingle
    * broadcast join whose build side grows with the benchmark.
    *
    * The returned bytes are deterministic for a given (bench, params): bit
    * ORs commute, so partial-merge order cannot change the bitset.
    */
  def benchShingleBloom(bench: DataFrame, textCol: String, k: Int = 2,
      expectedItems: Long = 1L << 18, fpp: Double = 1e-6): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnBridge
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val hashed = graft.SparkUtil.ensureParallelism(bench)
      .select(explode(T.shingles(col(textCol), k)).as("__bf_sh"))
      .select(xxhash64(col("__bf_sh")).as("__bf_h"))
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(col("__bf_h")), Literal(expectedItems),
        Literal(numBits)).toAggregateExpression())
    hashed.agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain` over a serialized bench Bloom filter, as a Column —
    * wraps Spark's codegen'd `BloomFilterMightContain` (filter deserialized
    * once per task, not per row). `value` must be an xxhash64 long.
    */
  private def bloomMightContain(bloom: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bloom)), ColumnBridge.expression(value)))
  }

  /** Bloom-filter benchmark decontamination — the zero-shuffle, zero-join
    * scale path of [[contaminationFlags]]: a corpus document is flagged
    * when ANY of its k-shingles might be in the benchmark Bloom filter.
    *
    * Scale shape: the flag is a NARROW projection — `exists()` over the
    * shingle array with the bloom probe inside the lambda — so the corpus
    * pass has no explode, no join, and no shuffle at all; the only data
    * movement is the bounded filter literal riding the task closure. This
    * is the shape that survives 100 TB: the exact join must move every
    * corpus shingle once, the bloom pass moves nothing.
    *
    * Guarantees (gated): NO FALSE NEGATIVES — a Bloom filter never drops an
    * inserted element, so every exactly-contaminated doc is flagged. False
    * positives exist at the configured rate; per doc the any-shingle union
    * bound is ~`n_shingles × fpp` (the default 1e-6 keeps a 1 k-shingle doc
    * under 0.1 %). Pipelines that cannot tolerate FP removals re-check
    * flagged docs with the exact join — a second pass over only the flagged
    * sliver.
    */
  def bloomContaminationFlags(docs: DataFrame, idCol: String, textCol: String,
      bloom: Array[Byte], k: Int = 2): DataFrame =
    docs.withColumn("bloom_hit",
      exists(T.shingles(col(textCol), k),
        sh => bloomMightContain(bloom, xxhash64(sh))))

  /** MinHash+LSH near-duplicate pairs — delegates to the fitted index
    * (explode buckets → bucket equi-join → signature jaccard ≥ threshold).
    */
  def minhashPairs(model: MinHashLSHModel, threshold: Double): DataFrame =
    model.approxSimilarityJoin(threshold)

  /** tf-WEIGHTED MinHash near-duplicate pairs: integer-weight expansion —
    * every occurrence of a repeated k-shingle becomes its own element
    * "gram#occ" — so signature agreement estimates weighted Jaccard
    * sum(min tf)/sum(max tf). Catches repetition-heavy near-dups that
    * set-semantics MinHash under-scores.
    *
    * Distributed shape: ZERO shuffles below the bucket join. Occurrence
    * tagging is a per-row hashmap pass ([[graft.functions.TagOccurrences]])
    * and the signature the per-row one-pass kernel — both inside the scan's
    * projection. (The earlier form exploded the non-distinct gram stream and
    * paid an O(corpus-tokens) `(id, gram)` window shuffle plus a second
    * groupBy(id) aggregate shuffle for bit-identical signatures.)
    * Candidate blocking and verification mirror [[minhashPairs]].
    */
  def weightedMinhashPairs(docs: DataFrame, idCol: String, textCol: String,
      cfg: graft.MinHashConfig, threshold: Double, k: Int = 2): DataFrame = {
    // empty-gram filter strictly ABOVE the persist, as sig IS NULL (the
    // kernel's empty⇒null contract): a size(tg) > 0 filter below the cache
    // gets substituted+pushed onto the single-task file scan, re-running
    // the whole tokenize→shingle→tag tree per row there (the round-3
    // dedup_novel_filter regression; plan-asserted in PlanPropertiesSpec)
    val sigs = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).cast("long").as("id"),
        graft.functions.ArrayKernels.tagOccurrences(
          T.kShinglesAll(T.tokenize(col(textCol)), k)).as("tg"))
      .select(col("id"),
        graft.functions.MinHashExpr.minhashMd5(col("tg"), cfg.numHash).as("sig"))
      .withColumn("bucket_ids",
        H.bandBucketsMd5(col("sig"), cfg.numBands, cfg.numRows, cfg.bucketHexLen))
      .transform(graft.SparkUtil.scopedPersist)
    val live = sigs.where(col("sig").isNotNull)
    val a = live.select(col("id").as("a_id"), col("sig").as("a_sig"),
      explode(col("bucket_ids")).as("bucket"))
    val b = live.select(col("id").as("b_id"), col("sig").as("b_sig"),
      explode(col("bucket_ids")).as("bucket"))
    a.join(b, Seq("bucket")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        H.signatureJaccard(col("a_sig"), col("b_sig")).as("w_jaccard"))
      .where(col("w_jaccard") >= threshold)
      .dropDuplicates("a_id", "b_id")
  }

  /** SimHash near-duplicate pairs with band blocking: split the 64-bit
    * simhash into 4 × 16-bit bands; by pigeonhole any pair within hamming
    * distance ≤ 3 shares at least one exact band. Join key = (band#, value).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "band blocking with 4 bands guarantees recall only for maxDist <= 3")
    val sh = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).cast("long").as("id"),
        simhash64(T.tokenize(col(textCol))).as("sh"))
    val banded = sh.select(col("id"), col("sh"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("bv"))
      .select(col("id"), col("sh"), col("bv.band"), col("bv.v"))
    val a = banded.select(col("band"), col("v"), col("id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("v"), col("id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "v"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", hamming(col("a_sh"), col("b_sh")))
      .where(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** [[simhashPairs]] in md5 hash mode — the oracle-checkable twin: the
    * fingerprint is [[graft.functions.SimHash64.simhashMd5]]'s 16-hex-char
    * string (DuckDB rebuilds it nibble-for-nibble from md5, the
    * fn_simhash_md5 oracle), banding is 4 × 4-hex-char substrings (same
    * 16-bit pigeonhole guarantee for maxDist ≤ 3), and Hamming distance is
    * bit_count over the two 32-bit halves parsed from hex — every step
    * replayable in ANSI SQL. Same shuffle shape as the xx64 path:
    * (band, value) equi-join over 4 decision-sized rows per doc.
    * Docs with zero tokens are excluded (no hash evidence — the
    * fn_simhash_md5 contract).
    */
  def simhashPairsMd5(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "band blocking with 4 bands guarantees recall only for maxDist <= 3")
    val sh = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).cast("long").as("id"), T.tokenize(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("id"),
        graft.functions.SimHash64.simhashMd5(col("__toks")).as("hx"))
      // 32-bit halves fit a long losslessly via conv(hex, 16, 10)
      .withColumn("hi", conv(substring(col("hx"), 1, 8), 16, 10).cast("long"))
      .withColumn("lo", conv(substring(col("hx"), 9, 8), 16, 10).cast("long"))
    val banded = sh.select(col("id"), col("hi"), col("lo"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        substring(col("hx"), 1 + 4 * b, 4).as("v"))): _*)).as("bv"))
      .select(col("id"), col("hi"), col("lo"), col("bv.band"), col("bv.v"))
    val a = banded.select(col("band"), col("v"), col("id").as("a_id"),
      col("hi").as("a_hi"), col("lo").as("a_lo"))
    val b = banded.select(col("band"), col("v"), col("id").as("b_id"),
      col("hi").as("b_hi"), col("lo").as("b_lo"))
    a.join(b, Seq("band", "v"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming",
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("int"))
      .where(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** PERCEPTUAL image near-duplicate pairs over a precomputed 64-bit
    * dHash/pHash column ([[Multimodal.imageDHashes]]) — the image analogue
    * of [[simhashPairs]], bridging the real pixel decode to the dedup
    * stack: two images whose horizontal-gradient hashes sit within
    * `maxDist` Hamming bits are near-identical up to rescaling /
    * recompression / small edits. Output: (a_id, b_id, hamming), a < b.
    *
    * Scale shape: identical to the SimHash path — the 64-bit hash splits
    * into `bands` equal segments and by PIGEONHOLE any pair within
    * `maxDist < bands` collides on at least one segment, so candidates
    * come from a (band, value) EQUI-JOIN over 4 decision-sized rows per
    * image (id, hash, band, 16-bit value), never an all-pairs product;
    * the exact Hamming check then disposes candidates with one codegen'd
    * XOR/popcount. Pixels never enter the operator; nothing wider than
    * two longs crosses any exchange.
    */
  def imagePhashPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int = 2, bands: Int = 4): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 (got $bands)")
    require(maxDist < bands,
      s"band blocking with $bands bands guarantees recall only for maxDist < $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1L
    // persist the (id, long) projection: the banded frame feeds BOTH join
    // sides — left lazy, an expensive upstream (the per-image decode+hash
    // pipeline) would run twice. Tiny cache (16 bytes/image), recomputable.
    val h = graft.SparkUtil.scopedPersist(graft.SparkUtil.ensureParallelism(hashes)
      .select(col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("ph")))
    val banded = h.select(col("id"), col("ph"), explode(array(
        (0 until bands).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("ph"), width * b).bitwiseAND(lit(mask)).as("v"))): _*)).as("bv"))
      .select(col("id"), col("ph"), col("bv.band"), col("bv.v"))
    val a = banded.select(col("band"), col("v"), col("id").as("a_id"), col("ph").as("a_ph"))
    val b = banded.select(col("band"), col("v"), col("id").as("b_id"), col("ph").as("b_ph"))
    a.join(b, Seq("band", "v"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", hamming(col("a_ph"), col("b_ph")))
      .where(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** VIDEO perceptual near-dup pairs over per-keyframe dHashes — the video
    * counterpart of [[imagePhashPairs]]: keyframe hashes band-join into
    * candidate FRAME pairs (same 16-bit band blocking, recall guaranteed
    * for `maxDist < bands`), exact Hamming keeps frame matches at
    * ≤ `maxDist`, and matched frames roll up per VIDEO pair into the
    * matched-keyframe fraction
    * `frac_micro = (n_matched_a + n_matched_b)·10⁶ div (n_keys_a + n_keys_b)`
    * (exact integer arithmetic — a frame counts as matched when ANY frame
    * of the partner video is within `maxDist`). Pairs below `minFracMicro`
    * drop: one shared scene between two long unrelated videos is not a
    * duplicate; a near-full matching is.
    *
    * Scale shape: pixels never reach this operator (the hash frame is
    * (long, int, long) rows); the candidate generator is the band
    * equi-join — NEVER a cross join — so pair volume is Σ per-band-bucket
    * occupancy²; the roll-up and the two n_keys joins ride (long, long)
    * keys with map-side-combined distinct counts.
    */
  def videoPhashPairs(keyHashes: DataFrame, idCol: String, frameCol: String,
      hashCol: String, maxDist: Int = 2, bands: Int = 4,
      minFracMicro: Long = 500000L): DataFrame = {
    require(bands >= 2 && 64 % bands == 0, s"bands must divide 64 (got $bands)")
    require(maxDist < bands,
      s"band blocking with $bands bands guarantees recall only for maxDist < $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1L
    // persisted: feeds both band-join sides AND the per-video key counts —
    // left lazy, the upstream decode+hash pipeline would run three times
    val h = graft.SparkUtil.scopedPersist(graft.SparkUtil.ensureParallelism(keyHashes)
      .select(col(idCol).cast("long").as("id"),
        col(frameCol).cast("int").as("fr"), col(hashCol).cast("long").as("ph")))
    val nkeys = h.groupBy("id").agg(count(lit(1)).as("nk"))
    val banded = h.select(col("id"), col("fr"), col("ph"), explode(array(
        (0 until bands).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("ph"), width * b).bitwiseAND(lit(mask)).as("v"))): _*)).as("bv"))
      .select(col("id"), col("fr"), col("ph"), col("bv.band"), col("bv.v"))
    val a = banded.select(col("band"), col("v"), col("id").as("a_id"),
      col("fr").as("a_fr"), col("ph").as("a_ph"))
    val b = banded.select(col("band"), col("v"), col("id").as("b_id"),
      col("fr").as("b_fr"), col("ph").as("b_ph"))
    val frameMatches = a.join(b, Seq("band", "v"))
      .where(col("a_id") < col("b_id"))
      // Hamming filters inside the join projection; NO dropDuplicates
      // stage — a frame pair matching in several bands reaches the
      // roll-up multiply, and countDistinct dedups it there with MAP-SIDE
      // partial sets (a dedicated distinct exchange shipped every full
      // candidate row: measured 31 MB of the gate's shuffle at sf0.1)
      .withColumn("hamming", hamming(col("a_ph"), col("b_ph")))
      .where(col("hamming") <= maxDist)
    frameMatches.groupBy("a_id", "b_id")
      .agg(countDistinct(col("a_fr")).as("n_matched_a"),
        countDistinct(col("b_fr")).as("n_matched_b"))
      .join(nkeys.select(col("id").as("a_id"), col("nk").as("n_keys_a")), Seq("a_id"))
      .join(nkeys.select(col("id").as("b_id"), col("nk").as("n_keys_b")), Seq("b_id"))
      .withColumn("frac_micro",
        expr("(n_matched_a + n_matched_b) * 1000000 div (n_keys_a + n_keys_b)"))
      .where(col("frac_micro") >= minFracMicro)
      .select(col("a_id"), col("b_id"), col("n_matched_a"), col("n_matched_b"),
        col("n_keys_a"), col("n_keys_b"), col("frac_micro"))
  }

  /** AUDIO near-dup pairs over per-frame spectral peaks (Wang 2003
    * constellation hashing, the Shazam scheme): consecutive-frame peak
    * TRIPLES pack into one long hash (frequency pair + implicit time
    * delta — the paper's combinatorial hash), each document reduces to
    * its DISTINCT hash set, and document pairs score by exact set
    * Jaccard in integer micro-units. The hash equi-join IS the candidate
    * generator — two documents sharing no triple never meet, and matches
    * are exact (no Hamming stage: a spectral hash either matches or
    * does not, the paper's design).
    *
    * Scale shape: the peak stream is (long, int, int) rows; the triple
    * window partitions per document (each partition holds one document's
    * frame count — bounded by audio length, never corpus-sized); the
    * join ships (hash, id) pairs and the Jaccard roll-up (long, long)
    * keys with map-side-combined counts. A hash shared by MANY documents
    * (the constellation stopword) is the hot key — real pipelines drop
    * hashes above a document-frequency cap the same way text search
    * drops stopwords; the planted corpus caps family size by
    * construction.
    */
  def audioFingerprintPairs(peaks: DataFrame, idCol: String,
      frameCol: String, binCol: String,
      minJacMicro: Long = 250000L): DataFrame = {
    val w = Window.partitionBy("id").orderBy("fr")
    val h = graft.SparkUtil.scopedPersist(
      graft.SparkUtil.ensureParallelism(peaks)
        .select(col(idCol).cast("long").as("id"),
          col(frameCol).cast("int").as("fr"), col(binCol).cast("long").as("b0"))
        .withColumn("b1", lead(col("b0"), 1).over(w))
        .withColumn("b2", lead(col("b0"), 2).over(w))
        .where(col("b1").isNotNull && col("b2").isNotNull)
        .select(col("id"),
          (col("b0") * lit(4294967296L) + col("b1") * lit(65536L) + col("b2"))
            .as("h"))
        .distinct())
    val sizes = h.groupBy("id").agg(count(lit(1)).as("nh"))
    val inter = h.select(col("h"), col("id").as("a_id"))
      .join(h.select(col("h"), col("id").as("b_id")), Seq("h"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("a_id"), col("nh").as("n_a")), Seq("a_id"))
      .join(sizes.select(col("id").as("b_id"), col("nh").as("n_b")), Seq("b_id"))
      .withColumn("jac_micro",
        expr("n_inter * 1000000 div (n_a + n_b - n_inter)"))
      .where(col("jac_micro") >= minJacMicro)
      .select(col("a_id"), col("b_id"), col("n_inter"), col("n_a"),
        col("n_b"), col("jac_micro"))
  }

  /** AUDIO RETRIEVAL by time-offset voting — the matcher half of Wang
    * 2003: a query clip's triple hashes equi-join the corpus fingerprint
    * table, each matching (query frame, corpus frame) pair VOTES for the
    * offset `dt = corpus_frame − query_frame`, and a true containment
    * match concentrates its votes on ONE offset where chance collisions
    * scatter — the property that makes constellation matching robust.
    * Per query the best (corpus doc, offset) wins by (votes desc, dt asc,
    * id asc) — fully pinned. Matches below `minVotes` drop (a one-hash
    * coincidence is not a detection).
    *
    * Scale shape: the fingerprint table is the (hash, id, frame) index a
    * production system PERSISTS (the [[graft.sources.IndexStore]] shape);
    * query workloads join it by hash — decision-sized rows throughout,
    * vote counting map-side combined on (q, c, dt), and the per-query
    * argmax an aggregate, not a sort.
    */
  def audioMatchOffsets(queryPeaks: DataFrame, corpusPeaks: DataFrame,
      minVotes: Long = 2): DataFrame = {
    def hashes(df: DataFrame, idOut: String, frOut: String): DataFrame = {
      val w = Window.partitionBy("id").orderBy("fr")
      df.select(col("doc_id").cast("long").as("id"),
          col("frame_idx").cast("int").as("fr"),
          col("peak_bin").cast("long").as("b0"))
        .withColumn("b1", lead(col("b0"), 1).over(w))
        .withColumn("b2", lead(col("b0"), 2).over(w))
        .where(col("b1").isNotNull && col("b2").isNotNull)
        .select(col("id").as(idOut), col("fr").as(frOut),
          (col("b0") * lit(4294967296L) + col("b1") * lit(65536L) + col("b2"))
            .as("h"))
    }
    val votes = hashes(queryPeaks, "q_id", "q_fr")
      .join(hashes(corpusPeaks, "c_id", "c_fr"), Seq("h"))
      .groupBy(col("q_id"), col("c_id"), (col("c_fr") - col("q_fr")).as("dt"))
      .agg(count(lit(1)).as("votes"))
      .where(col("votes") >= minVotes)
    // per-query argmax as an aggregate: max over (votes, -dt, -c_id)
    votes.groupBy("q_id")
      .agg(max(struct(col("votes").as("v"), (-col("dt")).as("nd"),
        (-col("c_id")).as("nc"))).as("w"))
      .select(col("q_id"), (-col("w.nc")).as("c_id"),
        (-col("w.nd")).cast("long").as("dt"), col("w.v").as("votes"))
  }

  /** CONTENT-DEFINED CHUNKING dedup (the rsync / LBFS scheme,
    * Muthitacharoen et al. 2001 "A low-bandwidth network file system"):
    * chunk boundaries land where the hash of the trailing `k`-gram is
    * ≡ 0 mod `divisor` — a pure function of CONTENT, so shared passages
    * chunk identically regardless of their position (the property that
    * makes CDC dedup insertions-proof where fixed-size blocks break).
    * Expected chunk length ≈ `divisor` chars; the document tail is always
    * a final chunk. An instance is a DUPLICATE when an identical chunk
    * occurred earlier in (doc_id, chunk_idx) order — the storage-dedup
    * ledger semantics; `bytes_saved` is what a chunk store would not
    * write again.
    *
    * Everything is Catalyst expressions (the per-position md5 runs inside
    * the scan projection — pricey per row, like any CDC chunker, but
    * zero-shuffle); the ONLY exchange after the scan carries
    * (chunk_hash, doc_id, idx, len) decision rows for the first-instance
    * window. Returns per-doc (doc_id, n_chunks, n_dup_chunks,
    * bytes_saved, chunks_md5 — the ordered chunk-hash digest).
    */
  def cdcChunkStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, divisor: Int = 64): DataFrame = {
    require(k >= 2 && divisor >= 2, s"need k >= 2, divisor >= 2, got ($k, $divisor)")
    val t = col("__t")
    val len = length(t)
    val boundExpr = when(len >= k,
      filter(sequence(lit(k), len), i =>
        pmod(conv(substring(md5(substring(t, i - lit(k) + 1, lit(k))), 1, 8),
          16, 10).cast("long"), lit(divisor)) === 0))
      .otherwise(array().cast("array<int>"))
    val ends = array_distinct(concat(boundExpr, array(len)))
    val chunks = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .where(len > 0)
      .select(col("doc_id"), col("__t"), posexplode(ends).as(Seq("__j", "__e")))
      .withColumn("__s", coalesce(
        lag(col("__e"), 1).over(Window.partitionBy("doc_id").orderBy("__j")),
        lit(0)))
      .select(col("doc_id"), (col("__j") + 1).as("chunk_idx"),
        (col("__e") - col("__s")).as("chunk_len"),
        md5(expr("substring(__t, __s + 1, __e - __s)")).as("chunk_hash"))
      .transform(graft.SparkUtil.scopedPersist)
    val ranked = chunks.withColumn("__rn", row_number().over(
      Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")))
    ranked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__rn") > 1, col("chunk_len").cast("long"))
          .otherwise(0L)).as("bytes_saved"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_hash")))),
          x => x.getField("chunk_hash")))).as("chunks_md5"))
  }

  /** Token-shingle exact-Jaccard verification of LSH candidate pairs — the
    * classic coarse-to-fine near-dup pipeline: MinHash buckets propose,
    * the cheap signature estimate prunes (estimate ≥ threshold/3 keeps
    * recall at the exact stage), exact set Jaccard over k-token shingles
    * disposes.
    */
  def ngramJaccardPairs(model: MinHashLSHModel, docs: DataFrame, idCol: String,
      textCol: String, k: Int, threshold: Double): DataFrame = {
    val cands = model.approxSimilarityJoin(threshold / 3).select("a_id", "b_id")
    // Shingle once, in parallel, and cache: the frame feeds BOTH join
    // sides — left lazy it would re-tokenize the corpus twice, and a
    // single-file local scan would do so on one task. persist (not
    // localCheckpoint): the InMemoryRelation gives Catalyst size stats for
    // the broadcast decision and stays recomputable if blocks are evicted.
    val sh = graft.SparkUtil.scopedPersist(graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"), T.tokenize(col(textCol)).as("toks")))
      .select(col("id"), T.kShingles(col("toks"), k).as("sh")))
    cands
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jaccard",
        graft.functions.ArrayKernels.setJaccard(col("a_sh"), col("b_sh")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Near-subset pairs: containment |A∩B| / min(|A|,|B|) ≥ threshold over
    * k-token shingle sets — catches a document substantially contained in a
    * larger one (boilerplate expansion, partial copies), which symmetric
    * Jaccard under-scores by the size ratio. Candidates come from the LSH
    * index at `jaccardFloor` (signature estimate); recall therefore extends
    * only down to pairs whose symmetric Jaccard clears that floor. For the
    * containment-NATIVE recall guarantee (no floor), use
    * [[containmentPairsDeep]] — exact prefix-filtering blocking. This
    * LSH-candidate form remains the cheap path when an index is already
    * fitted and the size ratio is bounded.
    */
  def containmentPairs(model: MinHashLSHModel, docs: DataFrame, idCol: String,
      textCol: String, k: Int, threshold: Double,
      jaccardFloor: Double = 0.1): DataFrame = {
    val cands = model.approxSimilarityJoin(jaccardFloor).select("a_id", "b_id")
    val sh = graft.SparkUtil.scopedPersist(graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"), T.tokenize(col(textCol)).as("toks")))
      .select(col("id"), T.kShingles(col("toks"), k).as("sh")))
    cands
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("containment",
        graft.functions.ArrayKernels.setIntersectCount(col("a_sh"), col("b_sh"))
          .cast("double") / least(size(col("a_sh")), size(col("b_sh"))))
      .where(col("containment") >= threshold)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  /** Containment-NATIVE near-subset pairs — EXACT prefix-filtering blocking
    * (the set-similarity-join trick), no LSH recall floor: unlike
    * [[containmentPairs]], a tiny document inside a 100× larger one is
    * found, because candidates never depend on symmetric Jaccard.
    *
    * Pigeonhole guarantee: for a pair with containment ≥ t whose smaller
    * side has n shingles, at most (1-t)·n of them are missing from the
    * other side — so ANY floor((1-t)·n)+1 chosen shingles include at least
    * one that both share. Each doc therefore publishes only its
    * floor((1-t)·n)+1 globally-RAREST shingles (ascending document
    * frequency — rare shingles minimize candidate fan-out) as its blocking
    * prefix; a shingle equi-join of prefixes against the full postings
    * recovers every qualifying pair (recall 1.0), and exact containment
    * verification disposes.
    *
    * Scale shape: df + postings are one explode of the DISTINCT per-doc
    * shingles (not the token stream); the prefix choice bounds the
    * candidate join (a doc contributes (1-t)·n+1 probes, each hitting
    * df(shingle) postings — rarest-first makes that product small); the
    * verify join ships shingle arrays only for surviving candidate pairs.
    */
  /** Blocking stage of [[containmentPairsDeep]], exposed as its own step so
    * scale diagnostics (tools/scale_ladder.scala) can count the candidate
    * pairs the rarest-prefix bound admits, separately from verification.
    * Returns (persisted shingle frame, deduped candidate-pair frame).
    */
  def containmentBlocking(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): (DataFrame, DataFrame) = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    val sh = graft.SparkUtil.scopedPersist(graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"), T.tokenize(col(textCol)).as("toks")))
      .select(col("id"), T.kShingles(col("toks"), k).as("sh"))
      .where(size(col("sh")) > 0))
    val posting = sh.select(col("id").as("pid"), explode(col("sh")).as("shingle"))
    val dfreq = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    // per-doc blocking prefix: the floor((1-t)*n)+1 rarest shingles, ranked
    // by (df asc, shingle) — sort_array on struct(df, shingle) is the
    // deterministic rank; ties can pick either, the guarantee holds for any
    // fixed choice
    val prefix = posting.join(dfreq, Seq("shingle"))
      .groupBy(col("pid"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("ranked"))
      .select(col("pid").as("a_pid"), explode(expr(
        s"transform(slice(ranked, 1, cast(floor((1.0 - $threshold) * size(ranked)) as int) + 1), " +
          "r -> r.shingle)")).as("shingle"))
    val cands = prefix
      .join(posting.select(col("pid").as("b_pid"), col("shingle")), Seq("shingle"))
      .where(col("a_pid") =!= col("b_pid"))
      .select(least(col("a_pid"), col("b_pid")).as("a_id"),
        greatest(col("a_pid"), col("b_pid")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
    (sh, cands)
  }

  def containmentPairsDeep(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val (sh, cands) = containmentBlocking(docs, idCol, textCol, k, threshold)
    cands
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("containment",
        graft.functions.ArrayKernels.setIntersectCount(col("a_sh"), col("b_sh"))
          .cast("double") / least(size(col("a_sh")), size(col("b_sh"))))
      .where(col("containment") >= threshold)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  /** EXACT Jaccard self-join via prefix filtering — the AllPairs/PPJoin
    * family (Bayardo et al. 2007 "Scaling Up All Pairs"; Chaudhuri et al.
    * 2006 SSJoin; Xiao et al. 2008 PPJoin), the exact complement to
    * [[minhashPairs]]: every pair of documents whose k-shingle Jaccard is
    * ≥ `threshold`, with NO approximation and NO recall floor — where the
    * LSH path trades a small false-negative band for speed, this path is
    * complete by theorem. (`dedup_ngram_pairs`' LSH-candidate result is a
    * subset of this one by construction.)
    *
    * Candidate generation is the prefix-filtering principle: order the
    * shingle universe once, globally, by (document-frequency asc,
    * shingle) — rarest first — and index each document only by its
    * PREFIX, the first |S| − ⌈t·|S|⌉ + 1 shingles of its ranked set. Any
    * pair with J ≥ t has |A∩B| ≥ t·|A∪B| ≥ ⌈t·max(|A|,|B|)⌉, and by the
    * prefix lemma two sets with overlap ≥ o share an element in their
    * (n−o+1)-prefixes — so the prefix equi-join misses nothing. The
    * required overlap ⌈t·n⌉ is computed in EXACT integer arithmetic
    * ((n·tMicro + 999999) div 1e6) — a double `ceil(t*n)` can read 4 at
    * t=0.3, n=10 from float error, silently shortening the prefix below
    * the completeness bound. A length filter (J ≤ min/max sizes, checked
    * as den·min ≥ num·max in integers) prunes candidates before the
    * verify join.
    *
    * Scale shape: df-ascending ranking is what makes this survive skew —
    * a boilerplate shingle shared by half the corpus ranks LAST, so it
    * enters a document's prefix only when the document is almost nothing
    * but boilerplate; candidate volume concentrates on rare shingles with
    * short posting lists (Bayardo's observation). Exchanges carry
    * (shingle, id, size) for candidates and (id, shingle-set) once for
    * the verify join; texts never shuffle. Verification is the same
    * cached-shingle pair join as [[ngramJaccardPairs]].
    */
  def jaccardPairsExact(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    // Rational approximation rounds DOWN: a too-low candidate threshold only
    // lengthens the prefix and loosens the length filter, so candidates stay
    // a SUPERSET and the exact `jaccard >= threshold` verify restores
    // completeness. round() could round UP (e.g. 0.3 * 1e6 dust), silently
    // dropping pairs with threshold <= J < tNum/1e6 — a false-negative hole
    // in a function documented as complete-by-theorem.
    val tNum = math.floor(threshold * 1000000L).toLong
    val tDen = 1000000L
    val sh = graft.SparkUtil.scopedPersist(graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"), T.tokenize(col(textCol)).as("toks")))
      .select(col("id"), T.kShingles(col("toks"), k).as("sh"))
      .where(size(col("sh")) > 0))
    val posting = sh.select(col("id").as("pid"), explode(col("sh")).as("shingle"))
    val dfreq = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    // per-doc prefix: first n − ⌈t·n⌉ + 1 shingles ranked (df asc, shingle);
    // sort_array on struct(df, shingle) is the deterministic global order
    // persisted: feeds BOTH sides of the candidate self-join below — without
    // it the posting⋈dfreq join + per-document ranked aggregation run twice
    val prefix = graft.SparkUtil.scopedPersist(posting.join(dfreq, Seq("shingle"))
      .groupBy(col("pid"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("ranked"))
      .select(col("pid"), size(col("ranked")).as("n"),
        explode(expr(
          s"transform(slice(ranked, 1, cast(size(ranked) - ((cast(size(ranked) as bigint)" +
            s" * $tNum + ${tDen - 1}) div $tDen) + 1 as int)), r -> r.shingle)")).as("shingle")))
    val cands = prefix.select(col("shingle"), col("pid").as("a_pid"), col("n").as("a_n"))
      .join(prefix.select(col("shingle"), col("pid").as("b_pid"), col("n").as("b_n")),
        Seq("shingle"))
      .where(col("a_pid") < col("b_pid"))
      .where(least(col("a_n"), col("b_n")) * tDen >=
        greatest(col("a_n"), col("b_n")) * tNum)
      .select(col("a_pid").as("a_id"), col("b_pid").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    cands
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jaccard",
        graft.functions.ArrayKernels.setJaccard(col("a_sh"), col("b_sh")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact shared-substring pairs — character-level duplication, the signal
    * token/shingle dedup misses when copies differ in tokenization
    * boundaries (code, templated text, partial sentences). Blocking =
    * winnowing fingerprints ([[TextAnalysis.winnowFingerprints]]): by the
    * winnowing theorem every pair sharing an exact run of ≥ w + k - 1
    * normalized characters shares a fingerprint, alignment-free, so recall
    * over that length floor is 1.0 at the blocking stage; `minShared`
    * fingerprints dispose (2+ rejects single-anchor coincidences).
    *
    * Scale shape: fingerprints are a narrow per-row projection; the only
    * shuffles are the fingerprint equi-join and the pair count — both
    * carry (32-hex fingerprint, id), never text. Over-common fingerprints
    * (boilerplate phrases) are the usual hot-bucket story: AQE skew-split
    * handles them like LSH buckets (plan evidence in PlanPropertiesSpec).
    */
  def sharedSubstringPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8, minShared: Int = 2): DataFrame = {
    val fp = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.winnowFingerprints(col(textCol), k, w)).as("fp"))
    val a = fp.select(col("fp"), col("id").as("a_id"))
    val b = fp.select(col("fp"), col("id").as("b_id"))
    a.join(b, Seq("fp"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Instrumentation only: propagation rounds used by the most recent
    * [[connectedComponents]] call on this driver — scale-ladder evidence
    * for the O(log diameter) convergence claim, not part of the API.
    */
  @volatile private[graft] var ccRoundsLastRun: Int = 0

  /** Connected components over an undirected (a_id, b_id) pair list by
    * iterative min-label propagation: every node's label converges to the
    * smallest id reachable from it. Iterations are bounded by the
    * component diameter (near-dup clusters are shallow — typically ≤ 3
    * hops), then halved each round by pointer jumping — convergence is
    * O(log diameter) shuffles. Deterministic; the SQL twin is a recursive
    * transitive-closure CTE. If `maxIter` is ever hit (pathological
    * diameter), a warning is emitted and labels may be under-merged.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct().persist()
    // fused first propagation: label = min(own id, min neighbor id) — the
    // node list comes out of the same groupBy that a plain `distinct` would
    // run, so the whole first min-propagation round is free (round-19 opt:
    // one fewer full round for every caller)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), col("src")).as("label")).persist()
    // labels only ever DECREASE under min-propagation, so the exact-decimal
    // label sum is strictly monotone: sum unchanged ⇔ fixpoint. One cheap
    // aggregate per round instead of a change-detection join. sum over an
    // EMPTY frame is null — zero, not an NPE (a duplicate-free corpus has
    // no edges and must converge immediately).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0).getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = prevSum.signum() == 0 && labels.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      // candidate label per node: min of own label and every neighbor's...
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nl"))
      val stepped0 = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // the pointer jump below is a SELF-join, and Catalyst plans the two
      // branches as independent subtrees (their exchanges hash different
      // keys, so ReuseExchange never fires) — without a persist the whole
      // neighbor-min join above computes twice per round (round-19 opt).
      // The RDD rebind also keeps the per-round plan constant-size.
      val stepped = stepped0.sparkSession
        .createDataFrame(stepped0.rdd, stepped0.schema).persist()
      // ...then pointer-jump (label := label of label): halves the residual
      // diameter each round, so convergence is O(log diameter) iterations —
      // a 10^6-node chain fits comfortably inside the default cap
      val jumped = stepped.as("n")
        .join(stepped.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
      // rebind through the RDD: the loop references each round's frame
      // multiple times, so carrying the full logical plan forward grows it
      // exponentially (4^iterations tree copies — OOMs plan rendering long
      // before the data is big). A LogicalRDD leaf keeps every round's
      // plan constant-size; the round is materialized by labelSum below.
      val next = jumped.sparkSession.createDataFrame(jumped.rdd, jumped.schema).persist()
      val newSum = labelSum(next)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      stepped.unpersist()
      labels.unpersist()
      labels = next
      i += 1
    }
    if (!converged)
      System.err.println(s"[graft] connectedComponents hit maxIter=$maxIter before " +
        "convergence — labels may be under-merged; raise maxIter")
    ccRoundsLastRun = i
    edges.unpersist()
    // the returned frame stays persisted for the caller's join(s); register
    // it for the harness sweep so it doesn't outlive the query
    graft.SparkUtil.registerScoped(labels) // (id, label = min id of the component)
  }

  /** Cluster-level near-duplicate removal: form clusters as connected
    * components of `pairs` and keep only each cluster's minimum id (plus
    * every document in no cluster). The production form of dedup — pairwise
    * thresholds alone under-delete because near-duplication is transitive.
    */
  def dropNearDuplicateClusters(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .where(col("id") =!= col("label")).select(col("id").as("__loser"))
    docs.join(losers, docs(idCol).cast("long") === col("__loser"), "left_anti")
  }

  /** Cluster-level dedup keeping the BEST-scoring member of each near-dup
    * cluster (ties broken by min id) instead of [[dropNearDuplicateClusters]]'
    * min-id convention — the production curation form: when a crawl holds
    * five mirrors of a page, keep the longest / highest-quality capture,
    * not the one with the accidentally-smallest id. `scoreCol` is any
    * numeric column of `docs` (n_chars, a quality score, ...).
    *
    * Scale shape: identical to the min-id form — the winner decision runs
    * on an (id, label, score) projection (never text), one map-side
    * combined argmax per cluster via `max(struct(score, -id))`, and the
    * kept set returns as a LEFT ANTI join of loser ids (unhinted; AQE
    * broadcasts when the loser list is actually small).
    */
  def keepBestPerCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame = {
    val labels = connectedComponents(pairs) // (id, label), persisted+scoped
    // NaN orders ABOVE every double in Spark comparisons — an upstream
    // 0.0/0.0 score would otherwise always win the cluster; treat NaN (and
    // null) as worst instead
    val scored = docs
      .select(col(idCol).cast("long").as("__sid"),
        coalesce(nanvl(col(scoreCol).cast("double"), lit(Double.NegativeInfinity)),
          lit(Double.NegativeInfinity)).as("__score"))
      .join(labels, col("__sid") === col("id"))
      .select(col("label"), col("__sid"), col("__score"))
    val best = scored.groupBy("label")
      .agg(max(struct(col("__score").as("s"), (-col("__sid")).as("nid"))).as("w"))
      .select(col("label"), (-col("w.nid")).as("__keep_id"))
    val losers = labels.join(best, Seq("label"))
      .where(col("id") =!= col("__keep_id"))
      .select(col("id").as("__loser"))
    docs.join(losers, docs(idCol).cast("long") === col("__loser"), "left_anti")
  }

  /** Near-dup cluster size histogram — the corpus-QA report of a dedup run
    * (how much of the corpus is mirrored, and in how big clumps). Docs in
    * no cluster count as size-1 singletons. Returns
    * (cluster_size, n_clusters). Two tiny (label)/(size) aggregates above
    * the pair generator; the corpus side ships ids only.
    */
  def clusterSizeHistogram(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(pairs)
    val ids = docs.select(col(idCol).cast("long").as("__cid"))
    ids.join(labels, ids("__cid") === labels("id"), "left")
      .select(coalesce(col("label"), col("__cid")).as("label"))
      .groupBy("label").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
  }

  /** Corpus snapshot diff — the crawl-to-crawl delta of an ingestion
    * pipeline: classify every id across two corpus versions as `added`
    * (new only), `removed` (old only), `changed` (both, different text) or
    * `unchanged`. The comparison joins 16-byte md5 content hashes, never
    * text — at 100 TB the full-outer join ships (id, hash) pairs, and both
    * scans stay pruned to (id, text).
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def hashed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as(s"__h_$side"))
    hashed(oldDocs, "old").join(hashed(newDocs, "new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Leakage-safe train/validation split: near-duplicate CLUSTERS
    * (connected components of `pairs`) are assigned to a side atomically,
    * so a validation document never has a near-duplicate in train — the
    * contamination mode a plain per-doc hash split cannot prevent.
    * Deterministic and engine-portable: side = first-2-hex-chars of
    * md5(cluster label) compared against a threshold (fraction granularity
    * 1/256, same scheme as the hash-sampling operators). Unclustered docs
    * use their own id as the label. Adds a `split` column ('train'/'val').
    *
    * Scale shape: the component labels are O(log diameter) label-propagation
    * rounds over the PAIR list (tiny next to the corpus); the final join
    * ships (id, label) only; the hash split is a narrow projection.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      valFraction: Double = 0.1): DataFrame = {
    require(valFraction > 0.0 && valFraction < 1.0,
      s"valFraction must be in (0,1), got $valFraction")
    val ceil = f"${math.floor(valFraction * 256).toInt}%02x"
    // both component columns renamed to reserved names BEFORE the join: a
    // user `label` column on docs would otherwise make the coalesce
    // ambiguous (AnalysisException) or get dropped from the output
    val labels = connectedComponents(pairs)
      .withColumnRenamed("id", "__cid").withColumnRenamed("label", "__cc_label")
    docs.join(labels, docs(idCol).cast("long") === col("__cid"), "left")
      .withColumn("__label", coalesce(col("__cc_label"), col(idCol).cast("long")))
      .withColumn("split",
        when(substring(md5(col("__label").cast("string")), 1, 2) < ceil, "val")
          .otherwise("train"))
      .drop("__cid", "__cc_label", "__label")
  }

  /** Deterministic STRATIFIED split with exact per-stratum quotas — the
    * eval-split discipline for labeled datasets (a plain hash split only
    * hits the target fraction in expectation; per-class quotas keep rare
    * classes represented): within each stratum, rows rank by
    * `md5(seed:id)` with id tie-break and the first `ceil(frac · n)` go
    * to "val". Reproducible from (seed, id, label) alone — provenance,
    * not a random draw (the [[TextAnalysis.shuffleShards]] convention).
    *
    * Scale shape: the rank window and the per-stratum count run on a
    * narrow (id, stratum, hashkey) projection — payload never enters the
    * exchange — and the split column rejoins by id (unhinted; AQE
    * broadcasts the decision frame when it fits).
    */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
      valFraction: Double = 0.1, seed: String = "graft"): DataFrame = {
    require(valFraction > 0.0 && valFraction < 1.0,
      s"valFraction must be in (0,1), got $valFraction")
    val w = Window.partitionBy(col("__ss_s"))
      .orderBy(col("__ss_h"), col("__ss_id"))
    val decisions = df.select(col(idCol).as("__ss_id"),
        col(stratumCol).cast("string").as("__ss_s"))
      .withColumn("__ss_h", md5(concat(lit(seed), lit(":"), col("__ss_id").cast("string"))))
      .withColumn("__ss_rn", row_number().over(w))
      .withColumn("__ss_n", count(lit(1)).over(Window.partitionBy(col("__ss_s"))))
      .withColumn("split",
        when(col("__ss_rn") <= ceil(col("__ss_n") * valFraction), "val")
          .otherwise("train"))
      .select(col("__ss_id").as(idCol), col("split"))
    df.join(decisions, Seq(idCol))
  }

  /** Triangles of an undirected (a_id, b_id) pair list (a < b normalized):
    * the smallest unit of cluster density — a near-dup pair that closes a
    * triangle is far more likely to be a true duplicate family than an
    * isolated LSH collision. Cyclic 3-way self-join on ordered edges
    * (i < j < k with (i,j), (j,k), (i,k) all present), each leg an
    * equi-join on an edge endpoint — no product joins; the ordered-edge
    * normalization means every triangle is emitted exactly once.
    */
  def trianglePairs(pairs: DataFrame): DataFrame = {
    val e = pairs.selectExpr("least(a_id, b_id) AS u", "greatest(a_id, b_id) AS v")
      .where(col("u") < col("v")).distinct()
    val e1 = e.select(col("u").as("i"), col("v").as("j"))
    val e2 = e.select(col("u").as("j"), col("v").as("k"))
    val e3 = e.select(col("u").as("i"), col("v").as("k"))
    e1.join(e2, Seq("j")).join(e3, Seq("i", "k"))
      .select(col("i"), col("j"), col("k"))
  }

  /** Embedding cosine near-duplicate pairs, brute all-pairs — correctness
    * baseline / oracle twin. Quadratic: only for modest partitions.
    */
  def embeddingPairsBrute(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("a_id"), col(vecCol).as("a_v")))
    val b = emb.select(col(idCol).cast("long").as("b_id"), col(vecCol).as("b_v"))
    // stream side spread across tasks, small side broadcast → the O(n²) loop
    // parallelizes instead of landing on one partition
    a.crossJoin(broadcast(b)).where(col("a_id") < col("b_id"))
      .withColumn("cosine", V.cosine(col("a_v"), col("b_v")))
      .where(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Embedding cosine near-dup pairs, sign-bucket blocked (scale path):
    * pairs are only compared within the same sign-quantizer cell, turning
    * the cross join into a bucket equi-join. Near-identical vectors agree
    * on high-|value| dims, so recall is high for threshold ≈ 1; boundary
    * dims can flip — documented approximation, like any single-probe IVF.
    */
  def embeddingPairsBucketed(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8): DataFrame = {
    val withB = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        V.signBucket(col(vecCol), nBits).as("bucket")))
    val a = withB.select(col("bucket"), col("id").as("a_id"), col("v").as("a_v"))
    val b = withB.select(col("bucket"), col("id").as("b_id"), col("v").as("b_v"))
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cosine", V.cosine(col("a_v"), col("b_v")))
      .where(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Embedding cosine near-dup pairs blocked by TRAINED IVF cells — the
    * data-adaptive counterpart of [[embeddingPairsBucketed]]: Lloyd
    * centroids follow the corpus distribution, so clustered embeddings get
    * balanced blocks where fixed sign-planes skew (a dense cluster lands
    * whole in one sign cell). Each vector is assigned to its `probes`
    * nearest cells (multiprobe: a near-dup pair split across a cell
    * boundary still collides in a shared probe cell); candidates come from
    * the within-cell equi-join, scored with EXACT cosine, kept at ≥
    * threshold. Every emitted pair is exact-verified — the approximation
    * is recall only, floor-gated against the brute twin
    * (`dedup_embedding_ivf_recall`).
    *
    * Scale shape: assignment is a narrow projection over the plan-literal
    * centroid table (nLists ≤ [[SimSearch.TypedLitCentroidMax]] — the
    * broadcast form of trainIvf applies above); the single exchange is the
    * cell-keyed pair join (per-cell quadratic, cell occupancy = corpus /
    * nLists is the tuning knob); pair dedup rides (int, int) keys.
    */
  def embeddingPairsIvf(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 16, probes: Int = 2,
      iters: Int = 2): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    require(probes >= 1 && probes <= nLists, s"need 1 <= probes <= nLists")
    require(nLists <= SimSearch.TypedLitCentroidMax,
      s"cell-blocked dedup keeps the typedlit assignment (nLists <= " +
        s"${SimSearch.TypedLitCentroidMax}); shard the corpus first for more cells")
    val model = SimSearch.trainIvf(emb, idCol, vecCol, nLists, iters)
    val cents = typedlit(model.centroids)
    // top-`probes` cells via ONE evaluation of the similarity array + one
    // 64-element sort (the ivfFilteredRecallEval ranked-slice pattern).
    // The previous nested-masked-argmax form re-built the nLists-dot tree
    // per probe — measured 28.9× per-unit at the sf1 validation bench
    // (BENCH_sf1.json round 12); this form reads 0.9×. Sort order
    // (−sim, idx) reproduces first-position-wins ties exactly.
    val sims = transform(cents, c => dotProduct(col("v"), c))
    val probeCells = slice(transform(sort_array(zip_with(sims,
      sequence(lit(0), lit(nLists - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx")))),
      r => r.getField("idx")), 1, probes)
    val assigned = model.assigned
      .select(col("id"), col("v"), explode(probeCells).as("cell"))
    val a = assigned.select(col("cell"), col("id").as("a_id"), col("v").as("a_v"))
    val b = assigned.select(col("cell"), col("id").as("b_id"), col("v").as("b_v"))
    // score + threshold BEFORE the pair dedup (the approxSimilarityJoin
    // convention): cosine is deterministic per pair, so the distinct
    // shuffle carries only SURVIVING (a_id, b_id, cosine) triples — a
    // dedup-first order would ship two full vectors per multiprobe
    // candidate pair through the exchange (measured 918 MB at sf0.1 vs
    // ~2 MB this way; PERF.md round 11)
    a.join(b, Seq("cell"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cosine", V.cosine(col("a_v"), col("b_v")))
      .where(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Recall of [[embeddingPairsIvf]] against the exhaustive brute pair set
    * at the same threshold — ONE row: the exact brute pair count (the
    * oracle-replayable half) and the floor boolean (Lloyd centroids are
    * engine-internal, so the recall VALUE follows the tolerance-boolean
    * convention of `sim_recall_ivf`).
    */
  def embeddingPairsIvfRecall(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 16, probes: Int = 2,
      recallFloor: Double = 0.8): DataFrame = {
    val brute = graft.SparkUtil.scopedPersist(
      embeddingPairsBrute(emb, idCol, vecCol, threshold)
        .select(col("a_id"), col("b_id")))
    val ivf = embeddingPairsIvf(emb, idCol, vecCol, threshold, nLists, probes)
      .select(col("a_id"), col("b_id"))
    brute
      .join(ivf.withColumn("__hit", lit(1)), Seq("a_id", "b_id"), "left")
      .agg(count(lit(1)).as("n_brute_pairs"),
        sum(coalesce(col("__hit"), lit(0))).as("__nh"))
      .select(col("n_brute_pairs"),
        (col("__nh").cast("double") /
          greatest(col("n_brute_pairs"), lit(1L)) >= recallFloor).as("recall_ok"))
  }

  /** SemDeDup-style cluster-granularity semantic dedup (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): shard the corpus into k-means
    * cells, connect within-cell pairs at cosine >= `minCosine` (the
    * paper's 1−ε floor, passed directly so both engines compare against
    * the IDENTICAL literal — `1.0 - eps` is not exact in binary for most
    * ε), and keep ONE representative per ε-component: the member FARTHEST
    * from its cell centroid (the paper's keep-low-centroid-similarity
    * convention — boundary examples carry the most information), ties
    * pinned to the smallest id. Singletons and whole untouched cells
    * survive as-is.
    *
    * `iters = 0` keeps the SEED centroids (the nLists lowest-id vectors,
    * L2-normalized) — a closed-form assignment a SQL oracle replays
    * exactly; `iters > 0` runs Lloyd rounds via [[SimSearch.trainIvf]]
    * (the production path — centroids follow the corpus, cells balance).
    * Either way the cell argmax runs over MICRO-ROUNDED dots (first/lowest
    * cell wins ties) and the keep ranking over micro-rounded
    * centroid-cosines with an id tie-break, so every decision is a pure
    * function of the input in both engines — raw-double argmax drifts at
    * ties (duplicated vectors).
    *
    * Scale shape: assignment is a narrow projection over the plan-literal
    * centroid table (nLists ≤ [[SimSearch.TypedLitCentroidMax]]); the wide
    * exchanges are the within-cell pair join (per-cell quadratic — cell
    * count is the occupancy knob, exactly [[embeddingPairsIvf]]) and the
    * component propagation on (long, long) ids. The keep decision runs on
    * (id, cell, c2c_micro) — vectors never cross a second exchange.
    * Returns the KEPT rows as (id, cell, c2c_micro).
    */
  def semanticDedupCells(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nLists: Int = 8, iters: Int = 0,
      probes: Int = 1): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    require(minCosine > 0 && minCosine < 1, s"minCosine in (0,1), got $minCosine")
    require(nLists >= 1 && nLists <= SimSearch.TypedLitCentroidMax,
      s"semantic dedup keeps the typedlit assignment (nLists <= " +
        s"${SimSearch.TypedLitCentroidMax}); shard the corpus first for more cells")
    require(probes >= 1 && probes <= nLists, "need 1 <= probes <= nLists")
    val model = SimSearch.trainIvf(emb, idCol, vecCol, nLists, iters)
    val cents = typedlit(model.centroids)
    // top-`probes` cells by micro-rounded centroid dot, lowest index wins
    // ties ([[SimSearch.pinnedCellsExpr]]). Probe 0 is the primary
    // (keep-decision) cell; the extra probes only widen CANDIDATE
    // generation, so a mid-similarity pair split by a cell boundary still
    // collides in a shared probe cell.
    val assigned = model.assigned.select(col("id"), col("v"))
      .withColumn("__cells",
        SimSearch.pinnedCellsExpr(col("v"), cents, nLists, probes))
      .withColumn("cell", col("__cells").getItem(0))
      .withColumn("c2c_micro",
        round(V.cosine(col("v"), element_at(cents, col("cell") + 1)) * 1e6)
          .cast("long"))
      .transform(graft.SparkUtil.scopedPersist)
    val probed = assigned.select(col("id"), col("v"),
      explode(col("__cells")).as("__pc"))
    val a = probed.select(col("__pc"), col("id").as("a_id"), col("v").as("a_v"))
    val b = probed.select(col("__pc"), col("id").as("b_id"), col("v").as("b_v"))
    // score-then-dedup, the embeddingPairsIvf exchange order: only
    // surviving (a_id, b_id) pairs cross the distinct shuffle
    val pairs = a.join(b, Seq("__pc"))
      .where(col("a_id") < col("b_id"))
      .where(V.cosine(col("a_v"), col("b_v")) >= minCosine)
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    // keepBestPerCluster maximizes (score, -id): negating c2c keeps the
    // min-centroid-cosine member, ties to the smallest id
    keepBestPerCluster(
        assigned.select(col("id"), col("cell"), col("c2c_micro"),
          (-col("c2c_micro")).as("__negc2c")),
        "id", pairs, "__negc2c")
      .select(col("id"), col("cell"), col("c2c_micro"))
  }

  /** Duplicate-leak audit of [[semanticDedupCells]] against the EXHAUSTIVE
    * pair graph — the quality twin for the trained (Lloyd) path, whose
    * cells are engine-internal: ONE row with the exact corpus/pair counts
    * (the oracle-replayable half) and a tolerance boolean. A "leak" is a
    * brute pair at >= minCosine with BOTH endpoints kept — only possible
    * when a cell boundary splits the pair (within-cell leaks are
    * impossible by construction), so leaked/brute measures exactly the
    * recall the cell sharding gives up (the `sim_recall_ivf` convention).
    */
  def semanticDedupLeakEval(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nLists: Int = 8, iters: Int = 2,
      probes: Int = 3, leakCeil: Double = 0.2): DataFrame = {
    val kept = semanticDedupCells(emb, idCol, vecCol, minCosine, nLists,
        iters, probes)
      .select(col("id")).transform(graft.SparkUtil.scopedPersist)
    val brute = graft.SparkUtil.scopedPersist(
      embeddingPairsBrute(emb, idCol, vecCol, minCosine)
        .select(col("a_id"), col("b_id")))
    val leaked = brute
      .join(kept.select(col("id").as("a_id")), Seq("a_id"))
      .join(kept.select(col("id").as("b_id")), Seq("b_id"))
    val n = emb.select(col(idCol)).count()
    brute.agg(count(lit(1)).as("n_brute_pairs")).crossJoin(
        leaked.agg(count(lit(1)).as("__nl")))
      .select(lit(n).as("n_vecs"), col("n_brute_pairs"),
        (col("__nl").cast("double") /
          greatest(col("n_brute_pairs"), lit(1L)) <= leakCeil).as("leak_ok"))
  }

  /** Entity resolution by blocking + edit distance (the Fellegi-Sunter
    * record-linkage shape with a deterministic decision rule): each query
    * record joins the reference ONLY within its blocking key (a shared
    * string prefix — the standard "typos do not hit the block key"
    * assumption), candidates are scored with Levenshtein distance, and
    * each query resolves to its single best match by (distance asc,
    * reference id asc) — ties pinned, unmatched queries dropped (route
    * them to a dead-letter review queue, not to a forced match).
    *
    * Scale shape: the candidate generator is a hash equi-join on the
    * block key — NEVER a cross join — so pair volume is Σ|block_q|·|block_r|,
    * controlled by the caller's block length; the distance filter runs
    * inside the join projection BEFORE the best-match window, which then
    * ranks a candidate-sized (ids, names, dist) frame keyed on q_id. A
    * hot block is a data-model smell the block length fixes, not a plan
    * problem; AQE skew-split covers the residue.
    */
  /** Sorted-neighborhood record linkage (Hernández & Stolfo 1995) — the
    * OTHER classic ER blocking strategy: sort all records by the match
    * field, then compare each record only to its `windowSize` successors
    * in sort order. Complements [[blockedFuzzyMatch]]: prefix blocking
    * misses typos IN the prefix, sorted-neighborhood misses typos that
    * move a record far in sort order — production pipelines run both and
    * union the candidate pairs.
    *
    * Scale shape: the global rank is the vocabulary convention
    * (distributed sort + `zipWithIndex` — range-partitioned total order,
    * NO single-partition window); candidates come from `windowSize` equi-
    * joins on shifted ranks (explode of 1..w, one hash join on the rank —
    * decision-sized (rank, id, name) rows); Levenshtein filters inside
    * the join projection. Pair volume is exactly n·w by construction —
    * no skew is possible, regardless of key distribution (the property
    * that makes sorted-neighborhood attractive when blocking keys are
    * pathological).
    *
    * Output pairs are sort-ordered (a before b); uniqueness of (name, id)
    * makes the rank — and therefore the pair set — engine-reproducible.
    */
  def sortedNeighborhoodMatch(records: DataFrame, idCol: String,
      nameCol: String, windowSize: Int, maxDistance: Int): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = records.sparkSession
    // scoped-persist: zipWithIndex's eager offset job would otherwise run
    // the sort twice; registry release keeps the block recomputable (the
    // (name, id) order is a unique total order, so recompute is identical)
    val sorted = graft.SparkUtil.scopedPersist(records
      .select(col(idCol).cast("long").as("id"), col(nameCol).as("name"))
      .where(col("name").isNotNull)
      .orderBy("name", "id"))
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row(i, r.getLong(0), r.getString(1)) },
      StructType(Seq(StructField("rank", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = false))))
    ranked
      .select(col("rank"), col("id").as("a_id"), col("name").as("a_name"))
      .select(col("a_id"), col("a_name"),
        explode(sequence(lit(1), lit(windowSize))).as("__j"),
        col("rank"))
      .withColumn("__r2", col("rank") + col("__j"))
      .join(ranked.select(col("rank").as("__r2"), col("id").as("b_id"),
        col("name").as("b_name")), Seq("__r2"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .where(col("dist") <= maxDistance)
      .select(col("a_id"), col("a_name"), col("b_id"), col("b_name"),
        col("dist").cast("long").as("dist"))
  }

  def blockedFuzzyMatch(queries: DataFrame, reference: DataFrame,
      queryId: String, queryName: String, refId: String, refName: String,
      blockLen: Int, maxDistance: Int): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    val q = queries.select(col(queryId).as("q_id"), col(queryName).as("q_name"),
      substring(col(queryName), 1, blockLen).as("__blk"))
    val r = reference.select(col(refId).as("r_id"), col(refName).as("r_name"),
      substring(col(refName), 1, blockLen).as("__blk"))
    q.join(r, Seq("__blk"))
      .withColumn("dist", levenshtein(col("q_name"), col("r_name")))
      .where(col("dist") <= maxDistance)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dist").asc, col("r_id").asc)))
      .where(col("__rn") === 1)
      .select(col("q_id"), col("q_name"), col("r_id"), col("r_name"),
        col("dist").cast("long").as("dist"))
  }
}
