package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * narrow Column expressions — every one survives a 100× scale-up as a
  * projection inside whole-stage scan pipelines.
  */
object TextAnalysis {

  /** Tiny fixed stopword lists (top function words). Deliberately small and
    * hard-coded: the operator demonstrates the n-gram/stopword heuristic
    * shape; swap lists for real fastText-style ID offline.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"))

  private def stopwordHits(tokens: Column, lang: String): Column =
    size(filter(tokens, t => array_contains(lit(Stopwords(lang).toArray), t)))

  /** Average of an exact integer micro-unit sum, rounded to integer
    * micro-units BEFORE any scale-down: `sum/n` lands exact .5 ties on
    * representable doubles that both engines round half-away-from-zero,
    * while `sum/1e6/n` puts the tie at the 7th decimal of a
    * non-representable double where Spark and DuckDB rounding diverge
    * (the `text_dsir_weights` round-8 lesson).
    */
  private def microAvgLong(sumMicro: Column, n: Column): Column =
    round(sumMicro.cast("double") / n).cast("long")

  /** [[microAvgLong]] scaled back to natural units as a double. */
  private def microAvg(sumMicro: Column, n: Column): Column =
    microAvgLong(sumMicro, n).cast("double") / 1e6

  /** Adds per-language stopword-hit scores and `lang_pred` (argmax,
    * alphabetical tie-break, "und" when no hits).
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    // tokenize through a named column: passing the expression tree to each
    // stopwordHits would re-evaluate the tokenizer once per language after
    // project collapse (CollapseProject keeps multi-referenced non-cheap
    // producers in their own project stage)
    val toks = col("__toks")
    val scored = df
      .withColumn("__toks", T.tokenize(col(textCol)))
      .withColumn("de_hits", stopwordHits(toks, "de"))
      .withColumn("en_hits", stopwordHits(toks, "en"))
      .withColumn("es_hits", stopwordHits(toks, "es"))
      .withColumn("fr_hits", stopwordHits(toks, "fr"))
    scored.withColumn("lang_pred",
      when(col("de_hits") >= col("en_hits") && col("de_hits") >= col("es_hits") &&
        col("de_hits") >= col("fr_hits") && col("de_hits") > 0, "de")
        .when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") > 0, "en")
        .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
        .when(col("fr_hits") > 0, "fr")
        .otherwise("und"))
      .drop("__toks")
  }

  /** Deterministic "offline training" for [[langIdClassifierScore]]: each
    * language's stopwords contribute +1e6 micro-logits to the hashed bucket
    * of every boundary-padded char trigram (`" der "` → `" de"`, `"der"`,
    * `"er "`). The hash is the repo's md5-prefix idiom, so the learned
    * table replays in DuckDB as a VALUES literal. Stands in for fastText
    * langid weights the way `qualityWeights` stands in for a trained
    * quality classifier — the Spark-side machinery (hashing, broadcast,
    * exact integer scoring) is identical for real weights.
    *
    * Returns sparse rows (bucket, lang → microWeight), sorted by bucket.
    */
  /** The repo's md5-prefix bucket idiom on the JVM side — first 8 hex
    * chars of md5(s) mod buckets, bit-identical to the Spark
    * `conv(substring(md5(·), 1, 8), 16, 10) % buckets` column and DuckDB's
    * `CAST('0x' || substr(md5(·), 1, 8) AS UBIGINT) % buckets`. One
    * definition so trainers and specs cannot drift from the column form.
    */
  def md5Bucket(s: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  def langIdTrainFromStopwords(buckets: Int): Seq[(Int, Map[String, Long])] = {
    require(buckets > 0, "buckets must be positive")
    def bucketOf(g: String): Int = md5Bucket(g, buckets)
    def grams(w: String): Iterator[String] = (" " + w + " ").sliding(3)
    // IDF-style discrimination weighting: a trigram produced by the
    // stopwords of k languages contributes 1e6/k to each — " la" (es+fr)
    // carries half the evidence of a language-unique trigram, which is
    // what separates the Romance pair the raw counts confuse
    val sharing: Map[String, Int] = (for {
      (lang, words) <- Stopwords.toSeq
      w <- words
      g <- grams(w)
    } yield (g, lang)).distinct.groupBy(_._1).map { case (g, ls) => g -> ls.size }
    val acc = scala.collection.mutable.Map.empty[(Int, String), Long]
    for {
      (lang, words) <- Stopwords.toSeq.sortBy(_._1)
      w <- words
      g <- grams(w)
    } acc((bucketOf(g), lang)) =
      acc.getOrElse((bucketOf(g), lang), 0L) + 1000000L / sharing(g)
    acc.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (b, m) =>
      b -> m.map { case ((_, l), v) => l -> v }.toMap
    }
  }

  /** Classifier-grade language ID — the fastText shape (hashed char-ngram
    * linear model, Joulin et al. 2016) that public pipelines (CCNet) use
    * where [[withLangId]] is the stopword-count heuristic. Features are ALL
    * char trigrams (with multiplicity) of the boundary-padded token-joined
    * text; each hashes to `b = md5-prefix mod buckets` and looks up one
    * per-language integer micro-logit row in the bounded broadcast weight
    * table. Per-doc per-language scores are exact integer sums —
    * order-independent and oracle-replayable; `lang_pred_v2` is the argmax
    * with the [[withLangId]] conventions (alphabetical precedence chain,
    * "und" when no feature scores positive).
    *
    * Scale shape — identical to [[qualityClassifierScore]]: one
    * occurrence-level map-side-combined (id, count, 4 sums) aggregate after
    * a broadcast join against the ≤`buckets`-row weight table; no
    * vocabulary-sized state, no text in any exchange.
    */
  def langIdClassifierScore(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(Int, Map[String, Long])], buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val langs = Stopwords.keys.toSeq.sorted // de, en, es, fr
    val wDf = broadcast(weights.map { case (b, m) =>
      (b.toLong, m.getOrElse("de", 0L), m.getOrElse("en", 0L),
        m.getOrElse("es", 0L), m.getOrElse("fr", 0L))
    }.toDF("__b", "__w_de", "__w_en", "__w_es", "__w_fr"))
    val norm = concat(lit(" "), array_join(T.tokenize(col(textCol)), " "), lit(" "))
    val grams = when(length(col("__n")) >= 3,
      transform(sequence(lit(1), length(col("__n")) - 2),
        i => col("__n").substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val occ = graft.SparkUtil.ensureParallelism(
        df.select(col(idCol), col(textCol)))
      .withColumn("__n", norm)
      .select(col(idCol), explode(grams).as("__g"))
      .select(col(idCol),
        (conv(substring(md5(col("__g")), 1, 8), 16, 10).cast("long") %
          buckets).as("__b"))
    val perDoc = occ.join(wDf, Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        langs.map(l => sum(coalesce(col(s"__w_$l"), lit(0L))).as(s"${l}_micro")): _*)
    def sc(l: String) = col(s"${l}_micro")
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
      .withColumn("de_micro", coalesce(sc("de"), lit(0L)))
      .withColumn("en_micro", coalesce(sc("en"), lit(0L)))
      .withColumn("es_micro", coalesce(sc("es"), lit(0L)))
      .withColumn("fr_micro", coalesce(sc("fr"), lit(0L)))
      .withColumn("lang_pred_v2",
        when(sc("de") >= sc("en") && sc("de") >= sc("es") &&
          sc("de") >= sc("fr") && sc("de") > 0, "de")
          .when(sc("en") >= sc("es") && sc("en") >= sc("fr") && sc("en") > 0, "en")
          .when(sc("es") >= sc("fr") && sc("es") > 0, "es")
          .when(sc("fr") > 0, "fr")
          .otherwise("und"))
  }

  /** Quality signals + a rubric score in {0, 0.25, 0.5, 0.75, 1}: length in
    * range, mean token length in range, stopword presence, digit-ratio cap.
    * Threshold-based (not weighted floats) so the score is bit-stable across
    * engines.
    */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__toks_q")
    val en = lit(Stopwords("en").toArray)
    df.withColumn("__toks_q", T.tokenize(col(textCol)))
      .withColumn("n_chars_q", length(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_token_len",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(size(toks), lit(1)))
      .withColumn("stopword_ratio",
        size(filter(toks, t => array_contains(en, t))).cast("double") /
          greatest(size(toks), lit(1)))
      .withColumn("digit_ratio",
        (length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", "")))
          .cast("double") / greatest(length(col(textCol)), lit(1)))
      .withColumn("quality_score",
        (when(col("n_tokens").between(10, 2000), 0.25).otherwise(0.0) +
          when(col("mean_token_len").between(2.0, 12.0), 0.25).otherwise(0.0) +
          when(col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0) +
          when(col("digit_ratio") <= 0.2, 0.25).otherwise(0.0)))
      .drop("__toks_q")
  }

  /** Whitespace token count + a BPE-ish regex token count
    * (letter runs | digit runs | single non-alnum glyph).
    */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val trimmed = trim(col(textCol))
    df.withColumn("ws_tokens",
      when(length(trimmed) === 0, 0).otherwise(size(split(trimmed, "\\s+"))))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))
  }

  /** Context-window chunking: split each document into overlapping
    * token windows of `chunkTokens` with `overlapTokens` carried between
    * consecutive chunks — the sequence-packing precursor of an LLM
    * training pipeline. One row per (doc, chunk): (idCol, chunk_idx,
    * chunk_text, chunk_tokens). Chunk starts are every
    * `chunkTokens - overlapTokens` tokens; the final chunk may be short;
    * empty docs produce no rows. Pure narrow projection + generator — no
    * shuffle, scales as the scan does.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap($overlapTokens) < chunk($chunkTokens)")
    val stride = chunkTokens - overlapTokens
    val toks = col("__toks_c")
    val starts = sequence(lit(0),
      floor((size(toks) - 1) / stride).cast("int") * stride, lit(stride))
    df.withColumn("__toks_c", T.tokenize(col(textCol)))
      .where(size(toks) > 0)
      .select(col(idCol),
        posexplode(transform(starts, st => slice(toks, st + 1, lit(chunkTokens))))
          .as(Seq("chunk_idx", "__chunk")))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("chunk_tokens"))
  }

  /** Sequence packing — pretraining batch construction: documents are
    * concatenated in id order and cut into fixed-capacity token sequences
    * (the GPT-style pack-then-chunk step). Each doc gets the sequence its
    * FIRST token lands in plus its offset there; `spans_boundary` flags
    * docs that cross into the next sequence (the ones an attention mask /
    * document-boundary reset must handle).
    *
    * Distributed shape: a DISTRIBUTED two-pass running total — local cumsum
    * inside range partitions plus broadcast per-partition prefix offsets.
    * (The naive `Window.orderBy(id)` with no partitionBy funnels the ENTIRE
    * corpus through one task — the canonical global-window trap.) The range
    * shuffle carries only (id, n_tokens); the totals pass collects one row
    * per partition. The persisted partitioning pins the sampled range
    * boundaries so the totals pass and the cumsum pass agree on `__pid`.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame =
    packSequencesCounted(df, idCol,
      size(T.tokenize(col(textCol))).cast("long"), maxTokens)

  /** [[packSequences]] with a caller-supplied per-doc token count — the
    * budgeting unit is pluggable (whitespace words, BPE subwords via
    * [[graft.functions.Bpe.countTokens]], chars); the distributed two-pass
    * cumsum is identical.
    */
  def packSequencesCounted(df: DataFrame, idCol: String, nTokens: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be > 0, got $maxTokens")
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df
      .withColumn("n_tokens", nTokens.cast("long"))
      .select(col(idCol), col("n_tokens"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.SparkUtil.scopedPersist)
    // one row per partition; prefix-sum on the driver (bounded by the
    // partition count, never the data)
    val totals = parted.groupBy("__pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(offDf, Seq("__pid"))
      .withColumn("__start",
        col("__off") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("n_tokens"),
        floor(col("__start") / maxTokens).cast("long").as("seq_id"),
        (col("__start") % maxTokens).cast("int").as("seq_offset"),
        (col("n_tokens") > 0 &&
          floor((col("__start") + col("n_tokens") - 1) / maxTokens) >
            floor(col("__start") / maxTokens)).as("spans_boundary"))
  }

  /** Top-k corpus vocabulary by term frequency (count desc, term asc as
    * the deterministic tiebreak) — the bounded table [[oovStats]] measures
    * coverage against. One map-side-combined count aggregate, then a
    * TakeOrdered of k rows: the driver holds k terms, never the corpus.
    */
  def topFrequencyVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    df.select(explode(T.tokenize(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("term_count"))
      .orderBy(col("term_count").desc, col("term").asc).limit(k)
  }

  /** Out-of-vocabulary statistics — tokenizer/vocab coverage measurement
    * (the check run before committing to a vocab size: what fraction of
    * corpus tokens fall outside it): per doc, total tokens, tokens not in
    * the vocabulary, and the OOV rate (null for token-free docs).
    *
    * Scale shape: tokens explode once and LEFT-join the vocabulary — a
    * bounded table (32 k-1 M terms) that AQE broadcasts, keeping the join
    * map-side; the only shuffle is the (id, counts) partial aggregate.
    * Docs with zero tokens are restored by the final id join (count 0,
    * rate null).
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, termCol: String = "term"): DataFrame = {
    val toks = df.select(col(idCol), explode(T.tokenize(col(textCol))).as("__ov_tok"))
    val v = vocab.select(col(termCol).as("__ov_tok")).distinct()
      .withColumn("__ov_in", lit(true))
    val counts = toks.join(v, Seq("__ov_tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__ov_in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol)).join(counts, Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
      .withColumn("oov_rate", when(col("n_tokens") > 0,
        round(col("n_oov").cast("double") / col("n_tokens"), 6)))
  }

  /** Deterministic shuffle-and-shard — the LAST stage of a training-data
    * pipeline: assign every document a pseudo-random shard and a position
    * inside it, reproducibly from (seed, id) alone. The order key is the
    * first 8 hex chars of `md5(seed || ':' || id)` — the same
    * engine-portable hash-threshold trick as `text_mix_sample` — so
    * re-running the pipeline (or a different engine) lands every doc in
    * the identical slot: shard = key mod nShards, position = rank of the
    * key inside the shard (id as tiebreak for the astronomically-unlikely
    * collision).
    *
    * Scale shape: the decision runs on a narrow (id, key) projection — the
    * per-shard rank's `Window.partitionBy(shard)` therefore exchanges
    * id+key rows, never text — and the full row joins back by id at the
    * end. Writing the result as files is then
    * `repartition(nShards, shard).sortWithinPartitions(pos)`: one
    * shuffle, each output file internally in training order.
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be > 0, got $nShards")
    val decision = df.select(col(idCol).as("__sh_id"))
      .withColumn("__sh_key", conv(substring(md5(concat(
        lit(seed + ":"), col("__sh_id").cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("shard", pmod(col("__sh_key"), lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__sh_key"), col("__sh_id")))
        .cast("long"))
      .select(col("__sh_id"), col("shard"), col("shard_pos"))
    df.join(decision, col(idCol) === col("__sh_id")).drop("__sh_id")
  }

  /** PII scrubbing: replace emails, IPv4 addresses, and NNN-NNN-NNNN phone
    * numbers with typed placeholder tags, and count each redaction. The
    * patterns are deliberately restricted to syntax with identical
    * semantics in Java regex and RE2 (no lookarounds, no backrefs) so the
    * operation is oracle-checkable and portable. Pure narrow projection.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b"))

  /** URL metadata: count of http(s) URLs, the first URL, and its host —
    * the provenance/domain-filtering signals of a web-scrape pipeline.
    * RE2-safe patterns (no lookarounds), pure narrow projection.
    */
  val UrlPattern = "https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._/%-]*)?"
  val UrlHostPattern = "https?://([A-Za-z0-9.-]+)"

  def withUrlMetadata(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_urls",
        size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0))))
      .withColumn("first_url", regexp_extract(col(textCol), UrlPattern, 0))
      .withColumn("first_host", regexp_extract(col(textCol), UrlHostPattern, 1))

  /** URL canonicalization — the crawl-frontier dedup normalizer: lowercase
    * scheme+host, strip the scheme's default port (:80 / :443), drop the
    * fragment, remove tracking parameters (`utm_*`, `fbclid`, `gclid`) and
    * tidy the separators they leave behind. Path case and meaningful query
    * params are preserved (they are significant per RFC 3986). Non-URL
    * input passes through unchanged. Pure RE2-safe regex chain — a narrow
    * projection the DuckDB oracle replays verbatim, applied identically at
    * any scale.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // only the HOST is case-insensitive per RFC 3986 — userinfo (user:pass@)
    // keeps its case
    val userinfo = regexp_extract(auth, "^([^@]*@)", 1)
    val host = lower(regexp_replace(auth, "^[^@]*@", ""))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    // tracking params live only in the QUERY (after the first '?'), and a
    // param starts only at the query head or after '&' — anchoring there
    // keeps '?myfbclid=1', '?last_utm_source=x', values like
    // '?next=/a?gclid=1', and path segments '/p/gclid=x' intact
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*(\\?.*)$", 1)
    val noTrackQ = regexp_replace(query,
      "(^\\?|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "$1")
    val tidyQ = regexp_replace(regexp_replace(noTrackQ, "([?&])&+", "$1"),
      "[?&]+$", "")
    when(scheme === "" || host === "", url)
      .otherwise(concat(scheme, lit("://"), userinfo, hostNoPort, path, tidyQ))
  }

  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val Seq((_, email), (_, ipv4), (_, phone)) = PiiPatterns
    // counts against the ORIGINAL text; replacements applied email → ipv4
    // → phone (the patterns cannot match inside each other's tags)
    df.withColumn("n_email", size(regexp_extract_all(col(textCol), lit(email), lit(0))))
      .withColumn("n_ipv4", size(regexp_extract_all(col(textCol), lit(ipv4), lit(0))))
      .withColumn("n_phone", size(regexp_extract_all(col(textCol), lit(phone), lit(0))))
      .withColumn("text_scrubbed",
        regexp_replace(regexp_replace(regexp_replace(col(textCol),
          email, "<email>"), ipv4, "<ipv4>"), phone, "<phone>"))
  }

  /** Text normalization as a standalone curation step: lowercase,
    * punctuation→space, whitespace collapse, trim — the canonical form every
    * downstream dedup/fingerprint operator assumes. Pure narrow projection.
    */
  def withNormalizedText(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("text_norm", T.normalize(col(textCol)))

  /** HTML tag-strip stages, applied IN ORDER: script and style blocks
    * (with their contents — a raw `1 < 2 && x > 0` inside a script would
    * corrupt a naive tag regex, so blocks go first), comments, then all
    * remaining tags. `[\s\S]*?` stands in for dotall so Java regex and RE2
    * read the patterns identically.
    */
  val HtmlStripStages: Seq[String] = Seq(
    "(?i)<script[^>]*>[\\s\\S]*?</script>",
    "(?i)<style[^>]*>[\\s\\S]*?</style>",
    "<!--[\\s\\S]*?-->",
    "<[^>]*>")

  /** Entity decodes, `&amp;` deliberately LAST so `&amp;lt;` renders as
    * the literal `&lt;` instead of double-decoding.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** HTML-to-text extraction — the step between WARC ingestion and every
    * text operator: strip script/style/comment blocks and tags, decode the
    * core entities, collapse whitespace; also count `<a` anchors on the
    * ORIGINAL markup (`n_links` — links-per-token is a standard
    * boilerplate signal). Pure narrow projection, and every regex is
    * RE2-identical so the oracle replays the chain verbatim.
    */
  def htmlToText(df: DataFrame, htmlCol: String): DataFrame = {
    var c: Column = col(htmlCol)
    HtmlStripStages.foreach(p => c = regexp_replace(c, p, " "))
    HtmlEntities.foreach { case (e, r) => c = regexp_replace(c, e, r) }
    df.withColumn("n_links",
        size(regexp_extract_all(col(htmlCol), lit("(?i)<a[\\s>]"), lit(0)))
          .cast("long"))
      .withColumn("text_extracted", trim(regexp_replace(c, "\\s+", " ")))
  }

  /** Anchor-link extraction — the step between HTML extraction and the
    * host graph ([[Graphs.hostEdges]] → [[Graphs.pageRankKeyed]]): pull
    * every double-quoted `href` off the `<a>` tags, resolve it to a
    * destination HOST (absolute http(s)/scheme'd links parse their own
    * authority with the same RFC 3986 host regex as [[domainStats]];
    * relative links inherit the page's host), and flag intra-host links
    * (`internal`). Fragment-only, `mailto:` and `javascript:` hrefs are
    * dropped, as are links whose resolved host is empty. Output:
    * (id, src_host, dst_host, internal) — one row per kept anchor.
    *
    * Scale shape: pure narrow stage — regex extract + bounded explode
    * (links per page), zero shuffles; the downstream host-pair aggregate
    * is where the first exchange happens, and it carries hosts+counts
    * only, never markup.
    */
  def extractLinks(df: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)"
    val href = col("__href")
    df.select(col(idCol),
        lower(regexp_extract(col(urlCol), hostRe, 1)).as("src_host"),
        explode(regexp_extract_all(col(htmlCol),
          lit("(?i)<a\\s[^>]*?href=\"([^\"]*)\""), lit(1))).as("__href"))
      .where(href =!= "" &&
        !lower(href).startsWith("#") &&
        !lower(href).startsWith("mailto:") &&
        !lower(href).startsWith("javascript:"))
      .withColumn("dst_host",
        when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
          lower(regexp_extract(href, hostRe, 1)))
        .otherwise(col("src_host")))
      .where(col("dst_host") =!= "")
      .select(col(idCol), col("src_host"), col("dst_host"),
        (col("dst_host") === col("src_host")).as("internal"))
  }

  /** Per-domain corpus statistics — the provenance table a crawl pipeline
    * feeds into [[domainMixWeights]] / `sampleToMixture`: per canonical
    * HOST (lowercased, userinfo and port stripped — the same RFC 3986
    * fields [[canonicalizeUrl]] normalizes), document count and total
    * token count. Rows without a parseable URL group under host `''` (the
    * dead-letter bucket a real pipeline routes to provenance review).
    *
    * Scale shape: ONE map-side-combined aggregate keyed on the host — the
    * exchange carries (host, count, sum) partials, never text; host
    * cardinality (millions) is tiny against a 100 TB corpus.
    */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame =
    df.select(
        lower(regexp_extract(col(urlCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)", 1)).as("host"),
        size(T.tokenize(col(textCol))).cast("long").as("__nt"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"))

  /** Zipf-law fit over the frequency head — the corpus-health statistic
    * (natural language sits near slope −1; template/spam corpora flatten
    * or steepen it): ordinary least squares of `ln(freq)` on `ln(rank)`
    * for the top-`topV` tokens. Returns ONE row:
    * (v_fit, slope6, intercept6, r2_6).
    *
    * Determinism: ranks are exact (count desc, token asc); both log
    * coordinates quantize to integer micro units, every OLS sum is an
    * exact DECIMAL(38,0), and the two final double divisions mirror the
    * oracle's operand order — so the fit is bit-stable across engines
    * and partitionings.
    *
    * Scale shape: one map-side-combined token count, a distributed
    * TakeOrdered head cut (driver/window bounded by `topV`), and the OLS
    * sums over the ≤ topV-row frame. The unbounded corpus only ever
    * flows through the count aggregate.
    */
  def zipfFit(df: DataFrame, textCol: String, topV: Int = 500): DataFrame = {
    require(topV >= 3, s"topV must be >= 3, got $topV")
    val counts = graft.SparkUtil.ensureParallelism(df)
      .select(explode(T.tokenize(col(textCol))).as("__zf_t"))
      .groupBy("__zf_t").agg(count(lit(1)).as("__zf_c"))
      .orderBy(col("__zf_c").desc, col("__zf_t").asc).limit(topV)
    // single-partition window is SAFE: the frame is already cut to topV
    val ranked = counts.withColumn("__zf_r",
        row_number().over(Window.orderBy(col("__zf_c").desc, col("__zf_t").asc)))
      .select(
        round(log(col("__zf_r").cast("double")) * 1e6).cast("long").as("__zf_x"),
        round(log(col("__zf_c").cast("double")) * 1e6).cast("long").as("__zf_y"))
    val d38 = "decimal(38,0)"
    val s = ranked.agg(count(lit(1)).as("__n"),
      sum(col("__zf_x").cast(d38)).as("__sx"), sum(col("__zf_y").cast(d38)).as("__sy"),
      sum(col("__zf_x").cast(d38) * col("__zf_y")).as("__sxy"),
      sum(col("__zf_x").cast(d38) * col("__zf_x")).as("__sxx"),
      sum(col("__zf_y").cast(d38) * col("__zf_y")).as("__syy"))
    val a = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val b = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val c = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    // degenerate heads (one distinct token → b = 0; all-equal counts →
    // c = 0) must yield stable NULLs, not engine-dependent NaN/Inf renders
    val ok = b =!= 0.0 && c =!= 0.0
    s.select(col("__n").as("v_fit"),
      when(ok, round(a / b, 6)).as("slope6"),
      when(ok, round((col("__sy").cast("double") - (a / b) * col("__sx").cast("double"))
        / col("__n") / 1e6, 6)).as("intercept6"),
      when(ok, round(a * a / (b * c), 6)).as("r2_6"))
  }

  /** Flesch-Kincaid readability grade (Kincaid et al. 1975 — the public
    * formula every prose-quality pipeline reports):
    * `0.39·(words/sentences) + 11.8·(syllables/words) − 15.59`, with
    * syllables approximated as VOWEL GROUPS (`[aeiouy]+` runs of the
    * lowercased text — the standard cheap estimator) and sentences as
    * terminal-punctuation runs (`[.!?]+`). Adds `n_words`, `n_sentences`,
    * `n_syllables` (exact integers) and `fk_grade6` (null when either
    * denominator is zero — an unpunctuated fragment has no grade).
    *
    * Scale shape: ZERO shuffles — two codegen'd regexp counts and the
    * shared tokenizer inside the scan pipeline.
    */
  def withReadability(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_words", size(T.tokenize(t)).cast("long"))
      .withColumn("n_sentences", regexp_count(t, lit("[.!?]+")).cast("long"))
      .withColumn("n_syllables", regexp_count(lower(t), lit("[aeiouy]+")).cast("long"))
      .withColumn("fk_grade6",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          round(lit(0.39) * (col("n_words").cast("double") / col("n_sentences")) +
            lit(11.8) * (col("n_syllables").cast("double") / col("n_words")) -
            lit(15.59), 6)))
  }

  /** Context-window chunking at SUBWORD granularity — the unit a trained
    * model's window is actually measured in (the whitespace-token
    * [[chunk]] twin budgets in the wrong currency for a BPE-tokenized
    * pipeline). Each word is assigned to chunk `floor(bpe_offset /
    * budget)` by its STARTING subword offset, so boundaries fall every
    * `budget` subwords and a word's subwords may straddle one — exactly
    * how packed training windows treat word boundaries. No greedy resets
    * means the assignment is a closed-form cumulative sum, not a
    * sequential fold. Output: (id, chunk_idx, n_words, bpe_tokens,
    * start_word); token-free docs produce no rows.
    *
    * Scale shape: per-word BPE counts are a narrow codegen'd kernel pass;
    * the word strings are DROPPED before the only exchange — the
    * per-document cumsum window and chunk aggregate run on (id, pos, cnt)
    * decision rows, partitioned BY DOCUMENT (no global ordering anywhere).
    */
  def chunkByBpeBudget(df: DataFrame, idCol: String, textCol: String,
      budget: Int,
      table: graft.functions.BpeTable = graft.functions.Bpe.plantedTable): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val perWord = graft.SparkUtil.ensureParallelism(
        df.select(col(idCol).as("__cb_id"), T.tokenize(col(textCol)).as("__cb_w")))
      .select(col("__cb_id"), posexplode(col("__cb_w")).as(Seq("__cb_pos", "__cb_word")))
      .select(col("__cb_id"), col("__cb_pos"),
        size(graft.functions.Bpe.encodeWord(col("__cb_word"), table))
          .cast("long").as("__cb_cnt"))
    val w = Window.partitionBy("__cb_id").orderBy("__cb_pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    perWord
      .withColumn("__cb_before", coalesce(sum(col("__cb_cnt")).over(w), lit(0L)))
      .withColumn("chunk_idx", expr(s"__cb_before div $budget"))
      .groupBy(col("__cb_id").as(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"), sum("__cb_cnt").as("bpe_tokens"),
        min("__cb_pos").cast("long").as("start_word"))
  }

  /** Mojibake detection and single-pass repair — the ftfy-core heuristic
    * (Speer, public `ftfy` docs) for the dominant crawl corruption: UTF-8
    * bytes decoded as Latin-1 somewhere upstream ("caf&eacute;" arriving as
    * "cafÃ©"). A row is flagged when its characters all sit in U+0000-U+00FF
    * AND, reinterpreted as Latin-1 bytes, they form VALID UTF-8 with at
    * least one multibyte sequence — in that case re-encoding as Latin-1 and
    * decoding as UTF-8 inverts the corruption exactly. Adds `was_repaired`
    * and `text_fixed` (the input verbatim when not flagged).
    *
    * Known ambiguity (inherent to the heuristic, shared with ftfy): genuine
    * Latin-1 prose that happens to form valid UTF-8 (e.g. a literal "Â©")
    * is indistinguishable from mojibake and gets "repaired". Single-pass by
    * design — doubly-corrupted text repairs one layer per application.
    *
    * Scale shape: a ZERO-shuffle narrow projection — two codegen'd RLIKE
    * probes plus a conditional encode/decode roundtrip inside the scan
    * pipeline; no UDF, no state.
    */
  def repairMojibake(df: DataFrame, textCol: String): DataFrame = {
    // each alternative covers one valid UTF-8 sequence, expressed over the
    // Latin-1 codepoints U+0080-U+00FF (RFC 3629 table: C2-DF tails, the
    // E0/ED overlong+surrogate exclusions, the F0/F4 plane bounds)
    val validUtf8InLatin1 =
      "^(?:[\\x00-\\x7F]" +
        "|[\\xC2-\\xDF][\\x80-\\xBF]" +
        "|\\xE0[\\xA0-\\xBF][\\x80-\\xBF]" +
        "|[\\xE1-\\xEC][\\x80-\\xBF]{2}" +
        "|\\xED[\\x80-\\x9F][\\x80-\\xBF]" +
        "|[\\xEE-\\xEF][\\x80-\\xBF]{2}" +
        "|\\xF0[\\x90-\\xBF][\\x80-\\xBF]{2}" +
        "|[\\xF1-\\xF3][\\x80-\\xBF]{3}" +
        "|\\xF4[\\x80-\\x8F][\\x80-\\xBF]{2})*$"
    val t = col(textCol)
    val detected = t.isNotNull && t.rlike("[\\x80-\\xFF]") && t.rlike(validUtf8InLatin1)
    df.withColumn("was_repaired", detected)
      .withColumn("text_fixed",
        when(detected, decode(encode(t, "ISO-8859-1"), "UTF-8")).otherwise(t))
  }

  /** Per-domain document cap — the anti-monoculture step of public crawl
    * curation (C4 and RefinedWeb cap how much any single host contributes
    * so template-heavy megasites cannot dominate the mixture): keep at most
    * `maxDocs` documents per host, preferring the highest `scoreCol` with
    * lowest-id tie-break. Documents with no parseable host are KEPT
    * unconditionally (dead-letter semantics, like
    * [[Dedup.dropUrlDuplicates]] — a missing URL is no evidence of
    * monoculture); NaN/null scores rank worst, never first.
    *
    * Scale shape: the rank runs on a NARROW (id, host, score) projection —
    * the per-host window shuffles 24-byte decision rows, never text — and
    * the cut is an id-keyed anti-join of the LOSER ids (docs beyond the
    * cap: a small sliver of a healthy corpus, so AQE usually broadcasts
    * it; the hint is deliberately omitted so a monoculture-heavy crawl may
    * still shuffle — the [[Dedup.dropExactDuplicates]] convention).
    */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String,
      scoreCol: String, maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)", 1))
    val w = Window.partitionBy(col("__cd_host"))
      .orderBy(col("__cd_score").desc, col("__cd_id"))
    val losers = df.select(col(idCol).as("__cd_id"), host.as("__cd_host"),
        coalesce(nanvl(col(scoreCol).cast("double"), lit(Double.NegativeInfinity)),
          lit(Double.NegativeInfinity)).as("__cd_score"))
      .where(col("__cd_host") =!= "")
      .withColumn("__cd_rn", row_number().over(w))
      .where(col("__cd_rn") > maxDocs)
      .select(col("__cd_id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Domain-blocklist URL filtering — the UT1/adult-list-shaped gatekeeper
    * every public crawl pipeline (CCNet, C4, RefinedWeb) runs before
    * content filters: a document is blocked when its canonical host equals
    * a blocklist domain OR sits under one as a subdomain. Matching is
    * LABEL-ALIGNED, not string-suffix: the host is split on dots and every
    * dot-aligned suffix is joined back, so `ads.bad.example` is blocked by
    * `bad.example` while `notbad.example` is NOT.
    *
    * Scale shape: the per-host suffix expansion is bounded by label depth
    * (≤ ~10), so the explode is a constant-factor narrow stage; the join
    * against the blocklist is keyed on the suffix string (UT1 is a few
    * million rows — AQE broadcasts it; a forced hint is deliberately
    * omitted so a pathological list may still shuffle), and the only other
    * exchange is the blocked-id distinct — id-sized, never text. Rows with
    * no parseable host produce only the empty suffix, match nothing, and
    * are KEPT (dead-letter semantics, like [[Dedup.dropUrlDuplicates]]).
    */
  def urlBlocklistFlags(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame = {
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)", 1))
    val parts = split(host, "\\.")
    val suffixes = transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
    val keyed = df.select(col(idCol).as("__bl_id"), explode(suffixes).as("__bl_sfx"))
    val blockKeys = blocklist
      .select(lower(trim(col(domainCol))).as("__bl_sfx")).distinct()
    val blockedIds = keyed.join(blockKeys, Seq("__bl_sfx"))
      .select(col("__bl_id")).distinct()
      .withColumn("__bl_hit", lit(true))
    df.withColumn("host", host)
      .join(blockedIds, col(idCol) === col("__bl_id"), "left")
      .withColumn("blocked", coalesce(col("__bl_hit"), lit(false)))
      .drop("__bl_id", "__bl_hit")
  }

  /** Filtering form of [[urlBlocklistFlags]]: the corpus minus blocked
    * documents.
    */
  def filterBlockedUrls(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame =
    urlBlocklistFlags(df, idCol, urlCol, blocklist, domainCol)
      .where(!col("blocked")).drop("host", "blocked")

  /** Temperature-scaled domain mixing weights — the multilingual/multi-
    * domain sampling step of a training pipeline: per domain, its corpus
    * share p = n/N and sampling weight w ∝ p^alpha renormalized
    * (alpha < 1 upsamples small domains, alpha = 1 keeps natural
    * proportions). Output: (domain, n, p, weight).
    *
    * Scale shape: one partial-agg count shuffle keyed on the domain; the
    * two scalars (corpus total, normalizer) ride along as broadcast
    * one-row aggregates — nothing is collected, nothing else shuffles.
    */
  def domainMixWeights(df: DataFrame, domainCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val counts = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    val raw = counts.crossJoin(broadcast(total))
      .withColumn("p", col("n") / col("__total"))
      .withColumn("__praw", pow(col("p"), lit(alpha)))
    val z = raw.agg(sum("__praw").as("__z"))
    raw.crossJoin(broadcast(z))
      .select(col("domain"), col("n"), col("p"),
        (col("__praw") / col("__z")).as("weight"))
  }

  /** Deterministic domain-mixture sampling — APPLY the
    * [[domainMixWeights]] mixture to the corpus: each domain is sampled at
    * `rate_d = min(1, weight_d · N / n_d)` (the rate that reshapes the
    * corpus toward the temperature-scaled mixture without replication), and
    * membership is decided by a per-document HASH threshold
    * (`md5(id) prefix / 2^32 < rate_d`), not a random draw — the sample is
    * reproducible across runs, cluster sizes, and engines, which is what a
    * training-data pipeline needs for provenance. Adds `sample_rate` to the
    * kept rows.
    *
    * Scale shape: the rate table is |domains| rows (a broadcast); the
    * corpus side is one narrow filter on a hash prefix — no shuffle of the
    * 100 TB side at all.
    */
  def sampleToMixture(df: DataFrame, idCol: String, domainCol: String,
      alpha: Double = 0.5): DataFrame = {
    val weights = domainMixWeights(df, domainCol, alpha)
    val total = weights.agg(sum("n").as("__total"))
    val rates = weights.crossJoin(broadcast(total))
      .select(col("domain").as("__mix_domain"),
        least(lit(1.0), col("weight") * col("__total") / col("n")).as("sample_rate"))
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    df.join(broadcast(rates), df(domainCol) === col("__mix_domain"))
      .where(u < col("sample_rate"))
      .drop("__mix_domain")
  }

  /** Repetition quality signals (Gopher-style): the occupancy of the most
    * frequent unigram/bigram and the fraction of bigram occurrences that are
    * repeats. High values flag degenerate/boilerplate text for filtering.
    *
    * Distributed shape: ZERO shuffles. Per row, sort the gram multiset and
    * fold run lengths with one `aggregate` HOF — the longest run is the top
    * gram's count, runs ≥ 2 sum to the duplicate occurrences. O(n log n)
    * per document inside the scan's projection, so the operator scales
    * exactly as the scan does (the earlier explode → two-level groupBy form
    * paid two shuffle rounds keyed on (id, gram) for the same numbers).
    * Docs with zero tokens/bigrams keep null metrics.
    */
  // run-length fold over a SORTED gram array → (maxRun, dupSum):
  // extending a run 1→2 adds 2 (both occurrences become duplicates),
  // extending further adds 1; a fresh gram resets the run to 1.
  private def runStats(sortedGrams: Column): Column =
    aggregate(sortedGrams,
      // null prev (not "" — a gram can legitimately BE the empty string,
      // e.g. blank lines): `t === null` is null, `when` treats it as
      // false, so the first element always opens a fresh run
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("max_run"), lit(0L).as("dup")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        // dup increment depends only on the NEW run length: a run reaching
        // 2 retro-counts both occurrences, extending past 2 adds one
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("max_run"), run).as("max_run"),
          (acc.getField("dup") +
            when(run === 2, lit(2L)).when(run > 2, lit(1L))
              .otherwise(lit(0L))).as("dup"))
      })

  private def fracOrNull(num: Column, denom: Column): Column =
    when(denom > 0, num.cast("double") / denom)

  def withRepetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def frac(num: Column, denom: Column): Column = fracOrNull(num, denom)
    val toks = col("__toks_r")
    val bi = col("__bi_r")
    df.withColumn("__toks_r", T.tokenize(col(textCol)))
      .withColumn("__uni_st", runStats(array_sort(toks)))
      .withColumn("__bi_r", T.kShinglesAll(toks, 2))
      .withColumn("__bi_st", runStats(array_sort(bi)))
      .withColumn("top_unigram_frac",
        frac(col("__uni_st").getField("max_run"), size(toks)))
      .withColumn("top_bigram_frac",
        frac(col("__bi_st").getField("max_run"), size(bi)))
      .withColumn("dup_bigram_frac",
        frac(col("__bi_st").getField("dup"), size(bi)))
      .drop("__toks_r", "__uni_st", "__bi_r", "__bi_st")
  }

  /** Character-distribution Shannon entropy per document — the classic
    * gibberish/degenerate-text signal (keyboard mash and repeated filler
    * score far below prose; base64/hex blobs score far above it). Adds
    * `n_distinct_chars` and `char_entropy` (nats, null for empty text),
    * computed as `H = (n·ln n − Σ_c c·ln c) / n` over character counts.
    *
    * Determinism: each `c·ln c` term and the `n·ln n` term quantize to
    * integer MICRO-NATS; the per-doc fold accumulates the TELESCOPED
    * per-step delta `q(run) − q(run−1)` (which sums exactly to
    * `Σ q(c_final)`), so the result is bit-identical to the oracle's
    * group-and-sum form. The final average rounds to integer micro-nats
    * before the 1e-6 scale-down (same tie-safety as
    * [[dsirImportanceWeights]]).
    *
    * Distributed shape: ZERO shuffles — sort the char array and fold runs
    * inside the scan's projection, exactly like [[withRepetitionMetrics]].
    */
  def withCharEntropy(df: DataFrame, textCol: String): DataFrame = {
    val chars = col("__chars_e")
    val q = (c: Column) =>
      round(c.cast("double") * log(c.cast("double")) * 1e6).cast("long")
    val fold = aggregate(array_sort(chars),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("s"), lit(0L).as("nd")),
      (acc, ch) => {
        val run = when(ch === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(ch.as("prev"), run.as("run"),
          (acc.getField("s") +
            when(run >= 2, q(run) - q(run - 1)).otherwise(lit(0L))).as("s"),
          (acc.getField("nd") +
            when(run === 1, lit(1L)).otherwise(lit(0L))).as("nd"))
      })
    val n = col("__n_e")
    df.withColumn("__chars_e",
        regexp_extract_all(col(textCol), lit("[\\s\\S]"), lit(0)))
      .withColumn("__n_e", size(chars).cast("long"))
      .withColumn("__st_e", fold)
      .withColumn("n_distinct_chars", col("__st_e").getField("nd"))
      .withColumn("char_entropy",
        when(n > 0, microAvg(q(n) - col("__st_e").getField("s"), n)))
      .drop("__chars_e", "__n_e", "__st_e")
  }

  /** Cross-document boilerplate removal, the segment-level dedup of a
    * training pipeline: split each document into consecutive `segTokens`
    * token segments (the corpus has no line structure, so fixed windows
    * stand in for lines), drop every segment whose exact text occurs in at
    * least `minDocs` distinct documents, and reassemble the survivors in
    * order.
    *
    * Distributed shape: chunk (narrow generator) → groupBy(16-byte segment
    * HASH) countDistinct, filtered to the boilerplate segments only → left
    * join back on the hash → per-doc reassembly via collect_list +
    * array_sort (segment count per doc is len/segTokens, so the collected
    * state is bounded by the document itself). The count aggregation and
    * its join key carry md5(seg), never the segment text (at 100 TB the
    * count-side shuffle is 16 bytes + id per segment), and the build side
    * is |distinct BOILERPLATE segments| — the nd ≥ minDocs filter runs
    * before the join, so unique segments never enter it.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10, minDocs: Int = 2): DataFrame = {
    require(segTokens > 0 && minDocs > 1, s"need segTokens>0, minDocs>1")
    val segs = chunk(df, idCol, textCol, segTokens, overlapTokens = 0)
      .withColumnRenamed("chunk_idx", "seg_idx")
      .withColumnRenamed("chunk_text", "seg")
      .withColumn("__segh", md5(col("seg")))
    val common = segs.select(col("__segh"), col(idCol))
      .groupBy("__segh")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("__segh")
    segs.join(common.withColumn("__hit", lit(true)), Seq("__segh"), "left")
      .withColumn("__dropped", col("__hit").isNotNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("__dropped"), 1)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(!col("__dropped"),
            struct(col("seg_idx"), col("seg"))))),
          x => x.getField("seg")), " ").as("text_clean"))
  }

  /** Intra-document segment dedup (the within-doc twin of
    * [[removeBoilerplate]], Gopher's repeated-paragraph removal): drop every
    * repeat of a segment already seen EARLIER IN THE SAME DOCUMENT, keep
    * first occurrences in order. Pure narrow implementation — the
    * first-seen filter is a per-row HOF over the doc's own segments (state
    * bounded by the document), so the operator scales as the scan; no
    * shuffle at all.
    */
  def dedupSegmentsWithin(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10): DataFrame = {
    require(segTokens > 0, s"segTokens must be > 0: $segTokens")
    val toks = col("__toks_w")
    val starts = sequence(lit(0),
      floor((size(toks) - 1) / segTokens).cast("int") * segTokens, lit(segTokens))
    val segs = transform(starts, st => concat_ws(" ", slice(toks, st + 1, lit(segTokens))))
    df.withColumn("__toks_w", T.tokenize(col(textCol)))
      .where(size(toks) > 0)
      .withColumn("__segs", segs)
      .select(col(idCol),
        size(col("__segs")).cast("long").as("n_segs"),
        // keep segment i iff no identical segment appears at j < i
        filter(col("__segs"), (s, i) =>
          !exists(slice(col("__segs"), lit(1), i), p => p === s)).as("__kept"))
      .select(col(idCol), col("n_segs"),
        (col("n_segs") - size(col("__kept"))).cast("long").as("n_dropped"),
        array_join(col("__kept"), " ").as("text_deduped"))
  }

  /** C4-style LINE filtering (Raffel et al. 2020 §2.2 — the most-cited
    * public curation pipeline): keep only lines that end in a terminal
    * punctuation mark (`.` `!` `?` `"`) and carry at least `minWords`
    * whitespace words — the rule that strips navigation, button text,
    * and cookie banners from web extracts. Adds `n_lines`, `n_kept`,
    * and `text_clean` (kept lines re-joined). Whole-doc drop decisions
    * (C4's ≥3-sentence rule) compose on top via a `where` on `n_kept`.
    *
    * Pure narrow projection — per-row HOFs over the doc's own lines,
    * zero shuffles, scales as the scan. Terminal-punctuation test is a
    * dialect-safe `substr(-1)` membership (no regex), so the DuckDB
    * oracle replays it verbatim.
    */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val lines = split(col(textCol), "\n")
    def keepLine(l: Column): Column = {
      val t = trim(l)
      substring(t, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(t, "\\s+"), w => w =!= "")) >= minWords
    }
    df.withColumn("__lines_c4", lines)
      .withColumn("__kept_c4", filter(col("__lines_c4"), keepLine _))
      .withColumn("n_lines", size(col("__lines_c4")).cast("long"))
      .withColumn("n_kept", size(col("__kept_c4")).cast("long"))
      .withColumn("text_clean", array_join(col("__kept_c4"), "\n"))
      .drop("__lines_c4", "__kept_c4")
  }

  /** CORPUS-WIDE duplicate-paragraph removal — the CCNet preprocessing
    * step BEFORE perplexity scoring (Wenzek et al. 2020 run it over
    * shards of Common Crawl): a paragraph that appears anywhere else in
    * the corpus keeps only its FIRST occurrence (lowest (id, position)),
    * every other copy is dropped — boilerplate (headers, cookie banners,
    * license blocks) repeats across pages and would otherwise dominate
    * the LM. The within-doc twin is [[dedupSegmentsWithin]]; this one's
    * decision is global, so it must shuffle — but only hashes.
    *
    * Scale shape (the [[graft.operators.Dedup.dropExactDuplicates]]
    * convention): paragraphs explode to (16-byte md5, id, pos) DECISION
    * rows — the winner groupBy and the loser join carry hashes and ints,
    * never paragraph text. Losers collapse to one (id, drop-positions)
    * row per affected document, and the reconstruction is a single
    * unhinted join back onto the un-exploded corpus (AQE broadcasts the
    * drop table when dup density is low; a boilerplate-heavy crawl's
    * table is allowed to shuffle) followed by an in-row indexed filter —
    * document text itself crosses at most that one join.
    */
  def dedupParagraphsGlobal(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = df.select(col(idCol),
      split(col(textCol), java.util.regex.Pattern.quote(sep)).as("__paras"))
    val keyed = paras
      .select(col(idCol), posexplode(col("__paras")).as(Seq("__pi", "__p")))
      .select(col(idCol), col("__pi"), md5(col("__p")).as("__h"))
    val winners = keyed.groupBy("__h")
      .agg(min(struct(col(idCol), col("__pi"))).as("__w"))
    val drops = keyed.join(winners, Seq("__h"))
      .where(struct(col(idCol), col("__pi")) =!= col("__w"))
      .groupBy(col(idCol)).agg(collect_set(col("__pi")).as("__drop"))
    paras.join(drops, Seq(idCol), "left")
      .select(col(idCol),
        size(col("__paras")).cast("long").as("n_paras"),
        coalesce(size(col("__drop")), lit(0)).cast("long").as("n_dropped"),
        array_join(filter(col("__paras"), (_, i) =>
          !coalesce(array_contains(col("__drop"), i), lit(false))), sep)
          .as("text_deduped"))
  }

  /** Content fingerprints: md5 over the sorted distinct token set (word-bag
    * fingerprint, order-insensitive) and over the normalized token sequence
    * (order-sensitive).
    */
  def withFingerprints(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__toks_f")
    df.withColumn("__toks_f", T.tokenize(col(textCol)))
      .withColumn("bag_fingerprint", md5(concat_ws(" ", array_sort(array_distinct(toks)))))
      .withColumn("seq_fingerprint", md5(concat_ws(" ", toks)))
      .drop("__toks_f")
  }

  /** Token-budget subset selection — "give me the best documents that fit
    * in N training tokens": rank by `scoreCol` descending (id as the
    * deterministic tiebreaker) and keep the prefix whose cumulative token
    * count stays within `budget`. Output: (id, n_tokens, cum_tokens) of
    * the selected documents.
    *
    * Distributed shape: the same two-pass running total as
    * [[packSequences]] — range-partition on the rank order, local cumsum
    * per partition, one collected offset row per partition — so there is
    * no single-task global window; the range shuffle carries
    * (id, score, n_tokens) only.
    */
  def selectWithinTokenBudget(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String, budget: Long): DataFrame =
    selectWithinTokenBudgetCounted(df, idCol,
      size(T.tokenize(col(textCol))).cast("long"), scoreCol, budget)

  /** [[selectWithinTokenBudget]] with a caller-supplied per-doc token
    * count (see [[packSequencesCounted]] — budget in the unit that
    * matters, e.g. BPE subwords).
    */
  def selectWithinTokenBudgetCounted(df: DataFrame, idCol: String,
      nTokens: Column, scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val parted = df
      .withColumn("__nt", nTokens.cast("long"))
      .select(col(idCol), col(scoreCol).as("__score"), col("__nt"))
      .repartitionByRange(col("__score").desc, col(idCol))
      .sortWithinPartitions(col("__score").desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.SparkUtil.scopedPersist)
    val totals = parted.groupBy("__pid").agg(sum("__nt").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(col("__score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    parted.join(offDf, Seq("__pid"))
      .withColumn("cum_tokens", col("__off") + sum(col("__nt")).over(w))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col("__nt").as("n_tokens"), col("cum_tokens"))
  }

  /** Unigram language-model quality score — the cheap perplexity filter of
    * a curation pipeline: train a unigram LM on the corpus itself (token
    * frequencies over the whole input) and score every document by its
    * average token log-probability. Vocabulary-atypical documents
    * (gibberish, wrong language, heavy boilerplate) score low, exactly the
    * signal an n-gram-LM perplexity filter provides, with no external
    * model file. Adds `n_tokens` and `avg_logprob` (null for empty docs).
    *
    * Determinism at scale: each token's log-prob is quantized to integer
    * MICRO-NATS (`round(logp * 1e6)` as long) on the per-TOKEN side, so
    * the per-doc aggregate is an exact integer sum — order-independent
    * under any partitioning, plain partial-aggregable sum/count, no
    * ordered fold, no per-doc buffering. (The previous form collected each
    * document's full (pos, logp) list into one aggregation buffer and
    * sorted it just to pin the double addition order — a 1M-token doc
    * meant a 1M-entry array in executor memory, plus a second
    * occurrence-level shuffle.) The 1e-6-nat quantization is far below any
    * curation threshold and makes the score bit-reproducible across
    * cluster sizes. Shuffle shape: one map-side-combined (token, count)
    * aggregate, ONE occurrence-level exchange (the unhinted toks⋈freqs
    * join — AQE broadcasts the vocab when it is actually small), then a
    * map-side-combined (id, count, sum) aggregate of longs; the corpus
    * total is a broadcast one-row aggregate.
    */
  def withUnigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), explode(T.tokenize(col(textCol))).as("token"))
    val freqs = toks.groupBy("token").agg(count(lit(1)).as("__c"))
    val total = freqs.agg(sum("__c").as("__total"))
    val lp = freqs.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("__c").cast("double") / col("__total")) * 1e6)
          .cast("long").as("__lpi"))
    val perDoc = toks.join(lp, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("__lpi").as("__slpi"))
      .select(col(idCol), col("n_tokens"), col("__slpi").as("logprob_micro"),
        // microAvg (round to integer micro-nats BEFORE the 1e-6 scale-down)
        // — raw s/1e6/n puts cross-engine rounding ties at the 7th decimal
        // of a non-representable double (the text_dsir_weights lesson);
        // the integer average is exact and scale-independent
        microAvg(col("__slpi"), col("n_tokens")).as("avg_logprob"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): assign every
    * document to `head` / `middle` / `tail` by its LM score against FIXED
    * cutoffs (CCNet's design — cutoffs come from a reference model /
    * calibration run, NOT from a corpus-wide quantile, so the operator is
    * a pure narrow projection over [[withUnigramLogProb]] with no global
    * sort or percentile window; a 100 TB corpus buckets in one pass).
    * Cutoffs are INTEGER MICRO-NATS compared against the exact per-doc
    * integer average — zero float-boundary ambiguity across engines or
    * cluster sizes. Token-less docs get `unscored`.
    */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
      headCutMicro: Long, tailCutMicro: Long): DataFrame = {
    require(headCutMicro > tailCutMicro,
      s"head cutoff must exceed tail cutoff, got $headCutMicro <= $tailCutMicro")
    withUnigramLogProb(df, idCol, textCol)
      .withColumn("__avg_micro",
        when(col("n_tokens") > 0,
          microAvgLong(col("logprob_micro"), col("n_tokens"))))
      .withColumn("ppl_bucket",
        when(col("__avg_micro").isNull, "unscored")
          .when(col("__avg_micro") >= headCutMicro, "head")
          .when(col("__avg_micro") < tailCutMicro, "tail")
          .otherwise("middle"))
      .drop("__avg_micro")
  }

  /** Derived CCNet cutoffs: scored-doc count and the head/tail micro-nat
    * cutoffs ready for [[ccnetBuckets]].
    */
  final case class CcnetCutoffs(nScored: Long, headCutMicro: Long, tailCutMicro: Long)

  /** CCNet cutoff CALIBRATION (Wenzek et al. 2020 derive their bucket
    * thresholds from a calibration run, not by hand): compute, from a
    * calibration slice, the integer micro-nat cutoffs such that the top
    * `headFrac` of scored docs land in `head` and the bottom `tailFrac`
    * in `tail` — i.e. the discrete (1−headFrac)- and tailFrac-quantiles
    * of the exact per-doc integer averages, with the k-th-smallest rank
    * rule `k = ⌈q·n⌉` (DuckDB's `quantile_disc` semantics, so the gate
    * can cross-check against the oracle's own quantile implementation).
    *
    * Distributed shape: one value-counts aggregate over the integer
    * averages — cardinality is bounded by the micro-nat value RANGE
    * (corpus-size-independent), so the counts table stays small at any
    * scale — then a range-partitioned two-pass cumulative count (the
    * [[packSequences]] offsets pattern; no single-task global window) and
    * two single-row fetches for the selected order statistics. Nothing
    * unbounded is ever collected.
    */
  def calibrateCcnetCutoffs(df: DataFrame, idCol: String, textCol: String,
      headFrac: Double, tailFrac: Double): CcnetCutoffs = {
    require(headFrac > 0 && tailFrac > 0 && headFrac + tailFrac < 1,
      s"need 0 < headFrac, 0 < tailFrac, headFrac+tailFrac < 1; got $headFrac/$tailFrac")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = withUnigramLogProb(df, idCol, textCol)
      .where(col("n_tokens") > 0)
      .select(microAvgLong(col("logprob_micro"), col("n_tokens")).as("__avg"))
      .groupBy("__avg").agg(count(lit(1)).as("__c"))
    val parted = counts.repartitionByRange(col("__avg"))
      .sortWithinPartitions("__avg")
      .withColumn("__pid", spark_partition_id())
      .transform(graft.SparkUtil.scopedPersist)
    // one row per partition, prefix-summed on the driver (bounded by the
    // partition count, never the data)
    val totals = parted.groupBy("__pid").agg(sum("__c").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = totals.map(_._2).sum
    require(n > 0, "calibration slice has no scored documents")
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy("__avg")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = parted.join(offDf, Seq("__pid"))
      .withColumn("__cum", col("__off") + sum("__c").over(w))
      .transform(graft.SparkUtil.scopedPersist)
    def kthSmallest(k: Long): Long =
      cum.where(col("__cum") >= k).agg(min("__avg")).first().getLong(0)
    val kHead = math.max(1L, math.ceil((1.0 - headFrac) * n).toLong)
    val kTail = math.max(1L, math.ceil(tailFrac * n).toLong)
    val head = kthSmallest(kHead)
    val tail = kthSmallest(kTail)
    CcnetCutoffs(n, head, tail)
  }

  /** Bigram-LM quality score with STUPID BACKOFF (Brants et al. 2007 — the
    * web-scale scoring scheme: no discounting to train, just
    * `S(w2|w1) = c(w1 w2)/c(w1)` when the bigram was seen, else
    * `α · (c(w2)+1)/(N+V)` from the unigram distribution). Counts are
    * TRAINED on a held-out slice (`trainFilter`) and scored over every
    * document, so unseen bigrams — and the backoff path — genuinely occur,
    * which is what makes the score a perplexity filter rather than a
    * self-fit tautology. Adds `n_bigrams` and `avg_logscore` (null for docs
    * with < 2 tokens).
    *
    * Determinism: per-bigram log-scores quantize to integer micro-nats
    * ([[withUnigramLogProb]]'s trick), so per-doc sums are exact,
    * order-independent, plain partial-aggregable.
    *
    * Scale shape: count tables are corpus-vocabulary sized (NOT bounded),
    * so they are never force-broadcast — the three occurrence-level joins
    * are equi-joins on bigram/token keys that AQE broadcasts only when the
    * vocabulary is actually small; every aggregate is map-side combined.
    */
  def withBigramLogProb(df: DataFrame, idCol: String, textCol: String,
      trainFilter: Column, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val base = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), trainFilter.as("__is_train"),
        T.tokenize(col(textCol)).as("__toks"))
    val toks = base.select(col(idCol), col("__is_train"),
      explode(col("__toks")).as("token"))
    // guard: sequence(1, n-1) for n < 2 would produce a DESCENDING range
    // (and OOB element_at under ANSI); short docs get no bigram rows
    val bigrams = base
      .select(col(idCol), col("__is_train"),
        explode(when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => concat(element_at(col("__toks"), i), lit(" "),
              element_at(col("__toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("bigram"))
    val c2 = bigrams.where(col("__is_train"))
      .groupBy("bigram").agg(count(lit(1)).as("__c2"))
    val c1 = toks.where(col("__is_train"))
      .groupBy("token").agg(count(lit(1)).as("__c1"))
    val tot = c1.agg(sum("__c1").as("__N"),
      count(lit(1)).cast("long").as("__V"))
    // score DISTINCT bigram types, then join occurrences once: the three
    // count lookups run on the (Zipf-small) type table, so only the
    // partial-agg'd distinct and one equi-join touch occurrence rows —
    // not three back-to-back occurrence-level shuffles
    val types = bigrams.select("bigram").distinct()
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val typeScores = types
      .join(c2, Seq("bigram"), "left")
      .join(c1.select(col("token").as("w1"), col("__c1").as("__cw1")),
        Seq("w1"), "left")
      .join(c1.select(col("token").as("w2"), col("__c1").as("__cw2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      // an empty train slice must fail loudly at execution, not return
      // all-null scores a downstream filter would silently act on
      .withColumn("__nv",
        when(col("__N").isNotNull, (col("__N") + col("__V")).cast("double"))
          .otherwise(raise_error(lit(
            "withBigramLogProb: trainFilter matched no rows — no counts to train on"))
            .cast("double")))
      .select(col("bigram"),
        round(log(when(col("__c2").isNotNull,
            col("__c2").cast("double") / col("__cw1"))
          .otherwise(lit(alpha) *
            (coalesce(col("__cw2"), lit(0L)) + 1).cast("double") /
            col("__nv"))) * 1e6)
          .cast("long").as("__lsi"))
    val scored = bigrams.select(col(idCol), col("bigram"))
      .join(typeScores, Seq("bigram"))
      .select(col(idCol), col("__lsi"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__lsi").as("__s"))
      .select(col(idCol), col("n_bigrams"),
        microAvg(col("__s"), col("n_bigrams")).as("avg_logscore"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Bigram-LM quality score with INTERPOLATED KNESER-NEY smoothing (Kneser
    * & Ney 1995; Chen & Goodman 1998 eq. 20 — the scheme KenLM implements
    * and CCNet's perplexity filter therefore runs, vs. the train-free
    * stupid backoff of [[withBigramLogProb]]):
    *
    *   P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·) + D·N1+(w1·)/c(w1·)·Pc(w2)
    *
    * with fixed discount `D = 0.75`, history count `c(w1·)` = bigram
    * occurrences opening with w1, fan-out `N1+(w1·)` = distinct
    * continuations of w1, and the continuation distribution add-one
    * smoothed so unseen words keep finite log-mass (the Chen–Goodman OOV
    * escape folded into one term): `Pc(w2) = (N1+(·w2) + 1)/(T + V)` over
    * T = distinct train bigram types, V = train vocabulary size. An unseen
    * HISTORY backs off to `Pc(w2)` alone. Counts train on the held-out
    * `trainFilter` slice and score every document, so the backoff paths
    * genuinely occur. Adds `n_bigrams` and `avg_logscore`.
    *
    * Determinism: per-bigram log-scores quantize to integer micro-nats, so
    * per-doc sums are exact and order-independent; the double-precision
    * expression tree is structurally mirrored by the SQL oracle.
    *
    * Scale shape: identical to [[withBigramLogProb]] — all five count
    * tables are corpus-vocabulary sized (never force-broadcast; AQE
    * broadcasts the Zipf-small type tables when they fit), scoring runs on
    * DISTINCT bigram types with one occurrence-level equi-join, and every
    * aggregate is map-side combined.
    */
  def withKneserNeyLogProb(df: DataFrame, idCol: String, textCol: String,
      trainFilter: Column, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount in (0,1), got $discount")
    val base = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), trainFilter.as("__is_train"),
        T.tokenize(col(textCol)).as("__toks"))
    val toks = base.select(col(idCol), col("__is_train"),
      explode(col("__toks")).as("token"))
    val bigrams = base
      .select(col(idCol), col("__is_train"),
        explode(when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => concat(element_at(col("__toks"), i), lit(" "),
              element_at(col("__toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("bigram"))
    val c2 = bigrams.where(col("__is_train"))
      .groupBy("bigram").agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", substring_index(col("bigram"), " ", 1))
      .withColumn("__w2", substring_index(col("bigram"), " ", -1))
      .transform(graft.SparkUtil.scopedPersist)
    // history count + fan-out from the TYPE table (c1 = Σ c2 over w1)
    val hist = c2.groupBy(col("__w1"))
      .agg(sum("__c2").as("__c1"), count(lit(1)).as("__n1f"))
    val cont = c2.groupBy(col("__w2")).agg(count(lit(1)).as("__n1b"))
    val vocab = toks.where(col("__is_train")).agg(
      count_distinct(col("token")).as("__V"))
    val tot = c2.agg(count(lit(1)).cast("long").as("__T"))
      .crossJoin(vocab)
    val types = bigrams.select("bigram").distinct()
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val typeScores = types
      .join(c2.select(col("bigram"), col("__c2")), Seq("bigram"), "left")
      .join(hist.select(col("__w1").as("w1"), col("__c1"), col("__n1f")),
        Seq("w1"), "left")
      .join(cont.select(col("__w2").as("w2"), col("__n1b")), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      // an empty train slice must fail loudly at execution, not return
      // all-null scores a downstream filter would silently act on
      .withColumn("__tv",
        when(col("__V") > 0, (col("__T") + col("__V")).cast("double"))
          .otherwise(raise_error(lit(
            "withKneserNeyLogProb: trainFilter matched no rows — no counts to train on"))
            .cast("double")))
      .withColumn("__pc",
        (coalesce(col("__n1b"), lit(0L)) + 1).cast("double") / col("__tv"))
      .select(col("bigram"),
        round(log(when(col("__c1").isNotNull,
            greatest(coalesce(col("__c2"), lit(0L)).cast("double") - discount,
              lit(0.0)) / col("__c1") +
              lit(discount) * col("__n1f").cast("double") / col("__c1") * col("__pc"))
          .otherwise(col("__pc"))) * 1e6)
          .cast("long").as("__lsi"))
    val scored = bigrams.select(col(idCol), col("bigram"))
      .join(typeScores, Seq("bigram"))
      .select(col(idCol), col("__lsi"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__lsi").as("__s"))
      .select(col(idCol), col("n_bigrams"),
        microAvg(col("__s"), col("n_bigrams")).as("avg_logscore"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Trigram-LM quality score with INTERPOLATED KNESER-NEY — the KenLM
    * order-3 shape (Chen & Goodman 1998 §4.1.6: highest order uses RAW
    * counts, every lower order uses CONTINUATION type counts):
    *
    *   P(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2·)
    *                + D·N1+(w1w2·)/c(w1w2·) · Pkn(w3|w2)
    *   Pkn(w3|w2) = max(N1+(·w2w3)−D,0)/N1+(·w2·)
    *                + D·N1+(w2·)/N1+(·w2·) · Pc(w3)
    *   Pc(w3)     = (N1+(·_w3)+1)/(T2+V)      (add-one OOV escape,
    *                the [[withKneserNeyLogProb]] convention)
    *
    * with fixed `D = 0.75` at both levels and each unseen history backing
    * off to the next level. Counts train on the `trainFilter` slice;
    * every document is scored, so all four branch combinations genuinely
    * occur. Adds `n_trigrams` and `avg_logscore` (null for docs with < 3
    * tokens). Per-trigram log-scores quantize to integer micro-nats; the
    * double expression tree is mirrored by the oracle term for term.
    *
    * Scale shape: identical census to the bigram gates — all count
    * tables are corpus-vocabulary sized (never force-broadcast), scoring
    * runs on DISTINCT trigram types with ONE occurrence-level equi-join,
    * every aggregate map-side combined.
    */
  def withKneserNeyTrigramLogProb(df: DataFrame, idCol: String, textCol: String,
      trainFilter: Column, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount in (0,1), got $discount")
    val base = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), trainFilter.as("__is_train"),
        T.tokenize(col(textCol)).as("__toks"))
    val toks = base.select(col(idCol), col("__is_train"),
      explode(col("__toks")).as("token"))
    val trigrams = base
      .select(col(idCol), col("__is_train"),
        explode(when(size(col("__toks")) >= 3,
          transform(sequence(lit(1), size(col("__toks")) - 2),
            i => concat_ws(" ", element_at(col("__toks"), i),
              element_at(col("__toks"), i + 1), element_at(col("__toks"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("trigram"))
    def w1(c: Column) = substring_index(c, " ", 1)
    def w3(c: Column) = substring_index(c, " ", -1)
    def w2(c: Column) = substring_index(substring_index(c, " ", 2), " ", -1)
    val c3 = trigrams.where(col("__is_train"))
      .groupBy("trigram").agg(count(lit(1)).as("__c3"))
      .withColumn("__w1", w1(col("trigram")))
      .withColumn("__w2", w2(col("trigram")))
      .withColumn("__w3", w3(col("trigram")))
      .transform(graft.SparkUtil.scopedPersist)
    val h12 = c3.groupBy(col("__w1"), col("__w2"))
      .agg(sum("__c3").as("__c12"), count(lit(1)).as("__n1f12"))
    // continuation-bigram TYPE table: cc2(w2,w3) = N1+(·w2w3)
    val cc2 = c3.groupBy(col("__w2"), col("__w3")).agg(count(lit(1)).as("__cc2"))
      .transform(graft.SparkUtil.scopedPersist)
    val midH = cc2.groupBy(col("__w2"))
      .agg(sum("__cc2").as("__cc2h"), count(lit(1)).as("__n1fm"))
    val cont = cc2.groupBy(col("__w3")).agg(count(lit(1)).as("__n1b"))
    val vocab = toks.where(col("__is_train")).agg(
      count_distinct(col("token")).as("__V"))
    val tot = cc2.agg(count(lit(1)).cast("long").as("__T2")).crossJoin(vocab)
    val types = trigrams.select("trigram").distinct()
      .withColumn("tw1", w1(col("trigram")))
      .withColumn("tw2", w2(col("trigram")))
      .withColumn("tw3", w3(col("trigram")))
    val typeScores = types
      .join(c3.select(col("trigram"), col("__c3")), Seq("trigram"), "left")
      .join(h12.select(col("__w1").as("tw1"), col("__w2").as("tw2"),
        col("__c12"), col("__n1f12")), Seq("tw1", "tw2"), "left")
      .join(cc2.select(col("__w2").as("tw2"), col("__w3").as("tw3"),
        col("__cc2")), Seq("tw2", "tw3"), "left")
      .join(midH.select(col("__w2").as("tw2"), col("__cc2h"), col("__n1fm")),
        Seq("tw2"), "left")
      .join(cont.select(col("__w3").as("tw3"), col("__n1b")), Seq("tw3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__tv",
        when(col("__V") > 0, (col("__T2") + col("__V")).cast("double"))
          .otherwise(raise_error(lit(
            "withKneserNeyTrigramLogProb: trainFilter matched no rows — no counts to train on"))
            .cast("double")))
      .withColumn("__pc",
        (coalesce(col("__n1b"), lit(0L)) + 1).cast("double") / col("__tv"))
      .withColumn("__pm",
        when(col("__cc2h").isNotNull,
          greatest(coalesce(col("__cc2"), lit(0L)).cast("double") - discount,
            lit(0.0)) / col("__cc2h") +
            lit(discount) * col("__n1fm").cast("double") / col("__cc2h") * col("__pc"))
          .otherwise(col("__pc")))
      .select(col("trigram"),
        round(log(when(col("__c12").isNotNull,
            greatest(coalesce(col("__c3"), lit(0L)).cast("double") - discount,
              lit(0.0)) / col("__c12") +
              lit(discount) * col("__n1f12").cast("double") / col("__c12") * col("__pm"))
          .otherwise(col("__pm"))) * 1e6)
          .cast("long").as("__lsi"))
    val scored = trigrams.select(col(idCol), col("trigram"))
      .join(typeScores, Seq("trigram"))
      .select(col(idCol), col("__lsi"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum("__lsi").as("__s"))
      .select(col(idCol), col("n_trigrams"),
        microAvg(col("__s"), col("n_trigrams")).as("avg_logscore"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_trigrams", coalesce(col("n_trigrams"), lit(0L)))
  }

  /** Gopher-style document quality rules (the published rule set of Rae et
    * al. 2021, Appendix A1.1 — the standard pre-filter of web-crawl
    * curation pipelines). Adds the raw signals and one boolean per rule:
    *
    *  - `r_word_count`:    50 ≤ word count ≤ 100,000
    *  - `r_mean_word_len`: 3 ≤ mean word length ≤ 10
    *  - `r_symbol_ratio`:  (# of `#` + `...` symbols) / words ≤ 0.1
    *  - `r_bullet_lines`:  ≤ 90% of lines start with a bullet (`-`/`*`/`•`)
    *  - `r_ellipsis_lines`: ≤ 30% of lines end with `...`/`…`
    *  - `r_alpha_words`:   ≥ 80% of words contain a letter
    *  - `r_stopwords`:     ≥ 2 of the 8 required English stop words present
    *
    * and `gopher_pass` = conjunction. Every signal is an exact integer (or
    * a ratio of two exact integers), so the booleans are bit-stable across
    * engines and cluster sizes. Distributed shape: ZERO shuffles — one
    * narrow projection per row inside the scan pipeline, scaling exactly as
    * the scan does at 100 TB.
    */
  def withGopherRules(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = col("__toks_gr")
    val lines = col("__lines_gr")
    val nWords = col("n_words")
    val denomW = greatest(nWords, lit(1)).cast("double")
    val bulletStart = (l: Column) =>
      substring(trim(l), 1, 1).isin("-", "*", "•")
    val ellipsisEnd = (l: Column) =>
      (length(l) >= 3 && l.substr(length(l) - 2, lit(3)) === "...") ||
        (length(l) >= 1 && l.substr(length(l), lit(1)) === "…")
    val required = lit(Array("the", "be", "to", "of", "and", "that", "have", "with"))
    df.withColumn("__toks_gr", T.tokenize(t))
      .withColumn("__lines_gr", split(t, "\n"))
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_word_len",
        aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") / denomW)
      .withColumn("__n_symbols",
        (length(t) - length(regexp_replace(t, "#", ""))).cast("long") +
          ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long"))
      .withColumn("symbol_ratio", col("__n_symbols").cast("double") / denomW)
      .withColumn("__n_lines", greatest(size(lines), lit(1)).cast("double"))
      .withColumn("bullet_frac",
        size(filter(lines, bulletStart)).cast("double") / col("__n_lines"))
      .withColumn("ellipsis_frac",
        size(filter(lines, ellipsisEnd)).cast("double") / col("__n_lines"))
      .withColumn("alpha_word_frac",
        // "contains a letter" without a per-token regex-engine call:
        // translate deletes [a-z] via a char map, so a length drop == a
        // letter present (tokenize output is already lowercase). Same
        // boolean as rlike("[a-z]") at a fraction of the instruction count
        // — this projection's per-token work dominates an otherwise
        // zero-shuffle operator at 100 TB.
        size(filter(toks, w =>
          length(w) > length(translate(w, "abcdefghijklmnopqrstuvwxyz", ""))))
          .cast("double") / denomW)
      .withColumn("stop_hits",
        size(filter(required, w => array_contains(toks, w))).cast("long"))
      .withColumn("r_word_count", nWords.between(50L, 100000L))
      .withColumn("r_mean_word_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("r_symbol_ratio", col("symbol_ratio") <= 0.1)
      .withColumn("r_bullet_lines", col("bullet_frac") <= 0.9)
      .withColumn("r_ellipsis_lines", col("ellipsis_frac") <= 0.3)
      .withColumn("r_alpha_words", col("alpha_word_frac") >= 0.8)
      .withColumn("r_stopwords", col("stop_hits") >= 2L)
      .withColumn("gopher_pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_lines") && col("r_ellipsis_lines") &&
          col("r_alpha_words") && col("r_stopwords"))
      .drop("__toks_gr", "__lines_gr", "__n_symbols", "__n_lines")
  }

  /** The COMPLETE Gopher rule set (Rae et al. 2021, Appendix A1): the
    * A1.1 document rules of [[withGopherRules]] PLUS the A1.2
    * repetition rules the paper applies alongside them —
    *
    *  - `r_dup_lines`:    duplicate-line fraction ≤ 0.30
    *  - `r_dup_paras`:    duplicate-paragraph fraction ≤ 0.30
    *  - `r_top_bigram`:   top-2-gram occurrence fraction ≤ 0.20
    *  - `r_top_trigram`:  top-3-gram occurrence fraction ≤ 0.18
    *
    * and `gopher_full_pass` = `gopher_pass` ∧ the four. Fractions are
    * ratios of exact integers from the same sorted run-length fold as
    * [[withRepetitionMetrics]] (paragraphs split on blank lines, lines on
    * `\n`); a doc with no bigrams/trigrams passes the n-gram rules
    * vacuously (null-safe ≤). Thresholds are the paper's Table A1 values
    * applied to occurrence fractions.
    *
    * Distributed shape: like the base rules, ZERO shuffles — every signal
    * is a per-row fold inside the scan projection; the operator scales as
    * the scan at 100 TB.
    */
  def withGopherRulesFull(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val lines = col("__lines_gf")
    val paras = col("__paras_gf")
    val toks = col("__toks_gf")
    def passOrVacuous(c: Column): Column = coalesce(c, lit(true))
    withGopherRules(df, textCol)
      .withColumn("__lines_gf", split(t, "\n"))
      .withColumn("__paras_gf", split(t, "\n\n"))
      .withColumn("__toks_gf", T.tokenize(t))
      .withColumn("dup_line_frac",
        fracOrNull(runStats(array_sort(lines)).getField("dup"), size(lines)))
      .withColumn("dup_para_frac",
        fracOrNull(runStats(array_sort(paras)).getField("dup"), size(paras)))
      .withColumn("top_bigram_frac2",
        fracOrNull(runStats(array_sort(T.kShinglesAll(toks, 2))).getField("max_run"),
          greatest(size(toks) - 1, lit(0))))
      .withColumn("top_trigram_frac",
        fracOrNull(runStats(array_sort(T.kShinglesAll(toks, 3))).getField("max_run"),
          greatest(size(toks) - 2, lit(0))))
      .withColumn("r_dup_lines", passOrVacuous(col("dup_line_frac") <= 0.30))
      .withColumn("r_dup_paras", passOrVacuous(col("dup_para_frac") <= 0.30))
      .withColumn("r_top_bigram", passOrVacuous(col("top_bigram_frac2") <= 0.20))
      .withColumn("r_top_trigram", passOrVacuous(col("top_trigram_frac") <= 0.18))
      .withColumn("gopher_full_pass",
        col("gopher_pass") && col("r_dup_lines") && col("r_dup_paras") &&
          col("r_top_bigram") && col("r_top_trigram"))
      .drop("__lines_gf", "__paras_gf", "__toks_gf")
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much more
    * likely its hashed-unigram features are under a TARGET distribution
    * (e.g. the wiki-like slice of the corpus) than under the overall SOURCE
    * distribution — `log w(d) = Σ_tokens [log p̂_target(b) − log p̂_source(b)]`
    * with the hashing trick (`b = md5-prefix(token) mod buckets`) and
    * add-one smoothing. High-weight docs are the ones importance resampling
    * keeps when curating toward the target domain.
    *
    * Adds `n_tokens`, `log_weight`, `avg_log_weight` (null log-weights for
    * empty docs). Like [[withUnigramLogProb]], each bucket's log-ratio is
    * quantized to integer MICRO-NATS so the per-doc sum is exact and
    * order-independent — plain partial-aggregable aggregates throughout.
    *
    * Scale shape: the hashing trick makes the feature table AT MOST
    * `buckets` rows regardless of corpus size — always broadcastable — so
    * the only occurrence-level exchange is the map-side-combined
    * (bucket, count) aggregate; the per-doc sum is a broadcast-join +
    * combined (id, sum) aggregate. No vocabulary-sized state anywhere.
    */
  def dsirImportanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // project BEFORE the parallelism spread so the local round-robin (a
    // cluster no-op) never ships columns the scorer doesn't read
    val occ = graft.SparkUtil.ensureParallelism(
        df.select(col(idCol), isTarget.as("__is_t"), col(textCol)))
      .select(col(idCol), col("__is_t"),
        explode(T.tokenize(col(textCol))).as("token"))
      .select(col(idCol), col("__is_t"),
        (conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") %
          buckets).as("__b"))
    val counts = occ.groupBy("__b")
      .agg(count(lit(1)).as("__cs"),
        sum(when(col("__is_t"), 1L).otherwise(0L)).as("__ct"))
    val totals = counts.agg(sum("__cs").as("__S"), sum("__ct").as("__T"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        round((log((col("__ct") + 1).cast("double") /
                   (col("__T") + buckets).cast("double")) -
               log((col("__cs") + 1).cast("double") /
                   (col("__S") + buckets).cast("double"))) * 1e6)
          .cast("long").as("__lri"))
    val perDoc = occ.join(broadcast(lr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("__lri").as("__s"))
      .select(col(idCol), col("n_tokens"), col("__s").as("log_weight_micro"),
        (col("__s").cast("double") / 1e6).as("log_weight"),
        microAvg(col("__s"), col("n_tokens")).as("avg_log_weight"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
  }

  /** Linear quality-classifier scoring — the fastText shape (Joulin et
    * al. 2016, "Bag of Tricks for Efficient Text Classification") used by
    * public curation pipelines (GPT-3/LLaMA-style "looks like wiki/books"
    * filters) to complement perplexity filtering: hashed unigram+bigram
    * features (`b = md5-prefix mod buckets`, the [[dsirImportanceWeights]]
    * trick), a LINEAR score `logit = bias + mean(w[b])`, and a keep/drop
    * threshold. Weights come from OFFLINE training and arrive as a
    * bounded table (`buckets` rows regardless of corpus size — the
    * DSIR-style justified broadcast); `weightsMicro` are integer
    * MICRO-logits so the per-doc sum is exact, order-independent, and
    * oracle-replayable. The sigmoid is monotone, so thresholding the
    * logit IS thresholding the probability — the operator stays in
    * exact log-space like [[withUnigramLogProb]].
    *
    * Adds `n_feats`, `logit` (mean micro-logit + bias, natural units),
    * and `quality_pass` (exact integer comparison against 0; fold any
    * threshold into `biasMicro`). Empty docs: n_feats 0, null logit/pass.
    *
    * Scale shape: one occurrence-level map-side-combined (id, count, sum)
    * aggregate after a broadcast join against the weight table — no
    * vocabulary-sized state, no text in any exchange.
    */
  def qualityClassifierScore(df: DataFrame, idCol: String, textCol: String,
      weightsMicro: Seq[Long], biasMicro: Long): DataFrame = {
    val buckets = weightsMicro.size
    require(buckets > 0, "weight table must not be empty")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = broadcast(
      weightsMicro.zipWithIndex.map { case (w, b) => (b.toLong, w) }
        .toDF("__b", "__w"))
    val toks = graft.SparkUtil.ensureParallelism(
        df.select(col(idCol), col(textCol)))
      .select(col(idCol), T.tokenize(col(textCol)).as("__toks"))
    val n = size(col("__toks"))
    val bigrams = when(n >= 2,
      zip_with(slice(col("__toks"), lit(1), n - 1),
        slice(col("__toks"), lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val occ = toks
      .select(col(idCol), explode(concat(col("__toks"), bigrams)).as("__f"))
      .select(col(idCol),
        (conv(substring(md5(col("__f")), 1, 8), 16, 10).cast("long") %
          buckets).as("__b"))
    val perDoc = occ.join(wDf, Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("__w").as("__s"))
      .select(col(idCol), col("n_feats"),
        ((microAvgLong(col("__s"), col("n_feats")) + biasMicro).cast("double")
          / 1e6).as("logit"),
        (microAvgLong(col("__s"), col("n_feats")) + biasMicro >= 0L)
          .as("quality_pass"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
  }

  /** Winnowing fingerprints (the MOSS document-fingerprinting scheme) over
    * whitespace-normalized text: md5 every char `k`-gram, then keep the
    * MINIMUM hash of each sliding window of `w` consecutive gram hashes,
    * distinct. DETERMINISTIC GUARANTEE: two documents sharing any exact
    * substring of length ≥ w + k - 1 characters share at least one
    * fingerprint — the winnowing theorem, alignment-free (unlike stride
    * sampling, which misses shifted copies). The blocking signal of exact
    * substring-level dedup over a training corpus.
    *
    * Runs as a one-pass O(n) kernel ([[graft.functions.WinnowFingerprints]],
    * monotonic-deque sliding minimum, md5 digester reused); the HOF twin
    * below is O(n·w) and kept for cross-checks and as the DuckDB oracle's
    * formula. Docs shorter than w+k-1 chars get no fingerprints.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(norm), k, w))
  }

  /** The HOF-encoded twin of [[winnowFingerprints]] — the exact formula the
    * DuckDB oracle replays; KernelSpec pins kernel ≡ twin. The gram-hash
    * array is BOUND ONCE through a lambda variable (`transform` over a
    * singleton array) — inlining it into the window lambda would re-run
    * all n md5s per window position, the CharNGrams O(n²) trap.
    */
  def winnowFingerprintsHof(text: Column, k: Int, w: Int): Column = {
    require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    val hashes = transform(sequence(lit(1), length(norm) - (k - 1)),
      i => md5(norm.substr(i, lit(k))))
    when(length(norm) >= k + w - 1,
      element_at(transform(array(hashes), hs =>
        array_distinct(transform(sequence(lit(0), size(hs) - w),
          j => array_min(slice(hs, j + 1, lit(w)))))), 1))
      .otherwise(array().cast("array<string>"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990; the
    * phrase-detection signal word2vec's phrase pass thresholds on):
    * adjacent token pairs scored by `ln(c_ab · N / (c_a · c_b))` with all
    * counts exact corpus occurrences (N = total tokens), reported in the
    * engine's integer micro-nat convention so the double surface is the
    * proven-deterministic one. Top `topN` by (pmi desc, w1, w2) — ties
    * fully pinned.
    *
    * Scale shape: bigram and unigram counting are both map-side-combined
    * aggregations over exploded token frames (decision-sized: short token
    * strings + longs). `minCount` prunes the bigram table BEFORE the two
    * vocabulary joins, so the joined frame is collocation-candidate-sized,
    * not corpus-sized; N is a 1-row scalar broadcast. The final cut is a
    * distributed TakeOrdered, never a global sort.
    */
  /** Rule-based sentence segmentation — the chunking primitive upstream
    * of readability, dedup-span, and context-window operators: a sentence
    * is a maximal run of non-terminator characters plus its trailing
    * `[.!?]` run (`[^.!?]+[.!?]*` — deliberately RE2-safe: no lookaround,
    * so the DuckDB oracle runs the IDENTICAL pattern). Terminator-only
    * fragments ("?!" with no preceding text) are unmatched and drop.
    * Pure narrow projection: posexplode of the per-doc match array,
    * zero shuffles.
    */
  def sentenceSplit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(expr(
          s"filter(transform(regexp_extract_all($textCol, '[^.!?]+[.!?]*', 0), " +
            "s -> trim(s)), s -> s != '')"))
          .as(Seq("sent_idx", "sentence")))

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents"): candidate phrases are the
    * maximal runs of non-stopword tokens; each word scores
    * `deg(w)/freq(w)` where freq counts its phrase occurrences and deg
    * sums the lengths of the phrases it appears in (co-occurrence
    * degree); a phrase scores the sum of its member word scores. All
    * corpus-global counts are exact, word scores are exact integer
    * micro-units (`(deg·10⁶) div freq`), phrase scores exact micro sums —
    * no float ever — and the top-N cut ranks on (score desc, phrase asc),
    * fully pinned.
    *
    * Scale shape: phrase segmentation is the gaps-and-islands anchor
    * (pos − rank-of-non-stop per doc — one per-doc window over (id, pos,
    * short token) decision rows); word stats are map-side-combined
    * aggregations; the word-score join is vocabulary-sized; the final cut
    * is a distributed TakeOrdered.
    */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      lang: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val stops = Stopwords.getOrElse(lang,
      throw new IllegalArgumentException(s"no stopword list for '$lang'"))
    val toks = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol).cast("long").as("__id"),
        posexplode(T.tokenize(col(textCol))).as(Seq("pos", "w")))
    val nonStop = toks.where(!col("w").isInCollection(stops))
    val phrased = nonStop.withColumn("__anchor",
      col("pos") - row_number().over(
        Window.partitionBy("__id").orderBy("pos")))
    // phrase membership rows: (phrase key, pos, w) + the phrase length
    val withLen = phrased.withColumn("__plen",
      count(lit(1)).over(Window.partitionBy("__id", "__anchor")))
    val wordScores = withLen.groupBy("w")
      .agg(count(lit(1)).as("__freq"), sum(col("__plen")).as("__deg"))
      .select(col("w"), expr("(__deg * 1000000) div __freq").as("__wscore"))
    val phrases = withLen.join(wordScores, Seq("w"))
      .groupBy("__id", "__anchor")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"),
        sum(col("__wscore")).as("__pscore"))
    phrases.groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("__pscore")).as("score_micro")) // identical text ⇒ identical score
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(topN)
      .select(col("phrase"), col("n_occurrences"), col("score_micro"))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES): row i gets key uᵢ^(1/wᵢ) with uᵢ a
    * reproducible md5-derived uniform in (0, 1], and the sample is the
    * top-k by key — equivalently top-k by ln(uᵢ)/wᵢ (monotone transform;
    * avoids pow). The key is rounded to integer micro-units BEFORE the
    * cut and ties pin by id, so the selected set is identical across
    * engines, partitionings, and runs — rand()-based weighted sampling is
    * none of those. Zero/negative weights are excluded (a zero-weight row
    * has selection probability 0 by definition).
    *
    * Scale shape: the key is a codegen'd narrow projection on the scan;
    * the cut is a distributed TakeOrdered (k rows per partition merge on
    * the driver), never a global sort.
    */
  def weightedSampleTopK(df: DataFrame, idCol: String, weightCol: String,
      seed: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (conv(substring(md5(concat(lit(seed), lit(":"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 1) /
      lit(4294967296.0)
    df.where(col(weightCol) > 0)
      .withColumn("key_micro",
        round(log(u) / col(weightCol).cast("double") * 1e6).cast("long"))
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col(weightCol), col("key_micro"))
  }

  /** Jensen-Shannon divergence between the unigram distributions of two
    * corpus slices (Lin 1991) — the symmetric, bounded [0, ln 2] drift
    * measure a curation pipeline uses to compare domains, snapshots, or a
    * filtered corpus against its source. Counts are exact; each token's
    * JSD term `½p·ln(p/m) + ½q·ln(q/m)` (m = (p+q)/2) is rounded to
    * integer micro-nats and the corpus total is the EXACT integer sum of
    * those terms — aggregation order cannot perturb the result, and the
    * DuckDB oracle mirrors the per-term expression tree.
    *
    * Scale shape: two map-side-combined token counts, one full-outer
    * equi-join on the vocabulary (vocab-sized, decision columns only),
    * totals as a 1-row broadcast, then a scalar roll-up. Nothing is ever
    * collected beyond the single result row.
    */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      graft.SparkUtil.ensureParallelism(df)
        .select(explode(T.tokenize(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as(out))
    val ca = counts(a, "ca")
    val cb = counts(b, "cb")
    val totals = ca.agg(sum(col("ca")).as("na"))
      .crossJoin(cb.agg(sum(col("cb")).as("nb")))
    val joined = ca.join(cb, Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(totals))
      .withColumn("p", col("ca").cast("double") / col("na"))
      .withColumn("q", col("cb").cast("double") / col("nb"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term_micro",
        round((when(col("ca") > 0, lit(0.5) * col("p") * log(col("p") / col("m")))
            .otherwise(lit(0.0)) +
          when(col("cb") > 0, lit(0.5) * col("q") * log(col("q") / col("m")))
            .otherwise(lit(0.0))) * 1e6).cast("long"))
    joined.agg(
      sum(when(col("ca") > 0, 1L).otherwise(0L)).as("n_vocab_a"),
      sum(when(col("cb") > 0, 1L).otherwise(0L)).as("n_vocab_b"),
      sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)).as("n_shared"),
      sum(col("term_micro")).as("jsd_micro"))
  }

  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int,
      topN: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val toks = graft.SparkUtil.ensureParallelism(df)
      .select(T.tokenize(col(textCol)).as("__pmi_ts"))
    val uni = toks.select(explode(col("__pmi_ts")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(count(lit(1)).as("n"))
    val bc = toks.where(size(col("__pmi_ts")) >= 2)
      .select(explode(zip_with(
        slice(col("__pmi_ts"), lit(1), size(col("__pmi_ts")) - 1),
        slice(col("__pmi_ts"), lit(2), size(col("__pmi_ts")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bi"))
      .groupBy(col("bi.w1").as("w1"), col("bi.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    bc.join(uc.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        round(log(col("c_ab").cast("double") * col("n").cast("double")
            / (col("c_a").cast("double") * col("c_b").cast("double"))) * 1e6)
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
  }
}
