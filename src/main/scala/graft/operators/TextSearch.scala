package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text relevance scoring (Robertson/Spärck Jones; the
  * `+1`-inside-the-log variant so idf stays positive for common terms) —
  * the search-side counterpart of the similarity operators: score every
  * document against a free-text query with the same tokenizer the dedup
  * pipeline uses.
  *
  * Scale design: the query's token set is tiny, so document tokens are
  * exploded, FILTERED to query tokens at the scan (predicate on the
  * generator output — everything else never enters the shuffle), tf
  * computed per (doc, token), idf joined in from a ≤|query|-row broadcast
  * frame, and scores summed per doc. Corpus size N and average doc length
  * are the only driver scalars (one 2-value aggregate). No vocabulary, no
  * per-doc state — the shuffle carries (doc, token, tf) for query tokens
  * only.
  */
object TextSearch {

  /** Per-document BM25 scores for `query`, docs with score 0 excluded.
    * Output: (id, score) — deterministic; order downstream as needed.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      query: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    // query tokens through the SAME tokenizer expression as the documents —
    // a re-implemented driver-side copy would silently drift if the
    // tokenizer ever changes
    val qTokens = spark.range(1)
      .select(T.tokenize(lit(query)).as("t"))
      .collect()(0).getSeq[String](0).distinct
    require(qTokens.nonEmpty, "query tokenizes to nothing")

    val toks = graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"), T.tokenize(col(textCol)).as("toks")))
      .withColumn("dl", size(col("toks")))
      .transform(graft.SparkUtil.scopedPersist)
    // the only driver scalars: corpus size + average doc length. avg over
    // an empty/all-null corpus is null — score nothing rather than NPE.
    val stats = toks.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).collect()(0)
    if (stats.isNullAt(1))
      return toks.select(col("id"), lit(0.0).as("score")).where(lit(false))
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1)

    val hits = toks
      .select(col("id"), col("dl"), explode(col("toks")).as("token"))
      .where(col("token").isin(qTokens: _*))
    val tf = hits.groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))
    // df per query token → idf; ≤ |query tokens| rows, broadcast into the join
    val idf = tf.groupBy("token")
      .agg(countDistinct(col("id")).as("df"))
      .withColumn("idf", log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    tf.join(broadcast(idf), Seq("token"))
      .withColumn("s", col("idf") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("id").agg(sum(col("s")).as("score"))
  }

  /** Exact-phrase search over positional postings — the phrase-query side
    * of a search engine (positional inverted index + adjacency), beside the
    * bag-of-words BM25. A document matches where the phrase's tokens occur
    * at CONSECUTIVE positions under the shared tokenizer; overlapping
    * occurrences all count, duplicate phrase tokens are handled (each
    * query offset must be witnessed by its own posting). Output:
    * (id, n_matches, first_pos) for matching docs, positions 0-based.
    *
    * Scale shape: no m-way self-join — each posting (id, pos, token)
    * surviving the query-token scan filter emits one candidate ANCHOR
    * `pos − j` per query offset j holding that token (an m-row broadcast
    * join), and an anchor with exactly m witnesses is a match: ONE
    * aggregation shuffle carrying (id, anchor) ints for query-token
    * occurrences only — document text and non-query tokens never leave
    * the scan. The per-doc rollup reuses decision-sized rows.
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // phrase tokens through the SAME tokenizer expression as the documents
    // (the bm25Scores convention) — order and duplicates kept
    val qTokens = spark.range(1)
      .select(T.tokenize(lit(phrase)).as("t"))
      .collect()(0).getSeq[String](0)
    require(qTokens.nonEmpty, "phrase tokenizes to nothing")
    val m = qTokens.length
    val offsets = qTokens.zipWithIndex.toDF("token", "j")
    val postings = graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"),
          T.tokenize(col(textCol)).as("__toks")))
      .select(col("id"), posexplode(col("__toks")).as(Seq("pos", "token")))
      .where(col("token").isin(qTokens.distinct: _*))
    postings.join(broadcast(offsets), Seq("token"))
      .select(col("id"), (col("pos") - col("j")).as("anchor"))
      .groupBy("id", "anchor").agg(count(lit(1)).as("__w"))
      .where(col("__w") === m)
      .groupBy("id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("anchor")).cast("long").as("first_pos"))
  }

  /** Hybrid retrieval by RECIPROCAL RANK FUSION (Cormack et al. 2009 —
    * the standard production shape for lexical + vector search): fuse the
    * BM25 top-`perList` and the embedding-cosine top-`perList` as
    * `Σ 1/(rrfK + rank)`, ranking each list by its 6-dp-ROUNDED score with
    * id tie-break (raw shuffled double sums are not bit-stable across
    * engines; the rounded values are the proven-deterministic surface).
    * Ids absent from a list contribute nothing. Output:
    * (id, rank_text, rank_vec, rrf) — nullable ranks for one-list hits.
    *
    * Scale shape: each ranker cuts to its top-`perList` with a distributed
    * TakeOrdered (no global sort); rank assignment and the full-outer fuse
    * then run on two ≤ perList-row frames — the only unbounded work is the
    * two rankers themselves, which keep their own documented shapes.
    */
  def hybridRrfTopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, emb: DataFrame, embIdCol: String, embVecCol: String,
      queryId: Long, k: Int, perList: Int = 100, rrfK: Int = 60): DataFrame = {
    require(k >= 1 && perList >= k, s"need 1 <= k <= perList, got k=$k perList=$perList")
    // single-partition windows are SAFE here: both frames are already cut
    // to perList rows
    val wText = Window.orderBy(col("s6").desc, col("id").asc)
    val wVec = Window.orderBy(col("c6").desc, col("id").asc)
    val textRanks = bm25Scores(docs, idCol, textCol, query)
      .select(col("id"), round(col("score"), 6).as("s6"))
      .orderBy(col("s6").desc, col("id").asc).limit(perList)
      .withColumn("rank_text", row_number().over(wText).cast("long"))
      .select(col("id"), col("rank_text"))
    // cut on the ROUNDED score (mirroring the text side): cosineTopK's raw-
    // double ordering could cut two same-c6 vectors differently than the
    // oracle at the perList boundary
    val vecRanks = SimSearch.cosineScores(emb, embIdCol, embVecCol, queryId)
      .select(col("id"), round(col("cosine"), 6).as("c6"))
      .orderBy(col("c6").desc, col("id").asc).limit(perList)
      .withColumn("rank_vec", row_number().over(wVec).cast("long"))
      .select(col("id"), col("rank_vec"))
    textRanks.join(vecRanks, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_text")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_vec")), lit(0.0)))
      .orderBy(col("rrf").desc, col("id").asc).limit(k)
      .select(col("id"), col("rank_text"), col("rank_vec"),
        round(col("rrf"), 6).as("rrf"))
  }

  /** Batch form of [[phraseMatches]] — a query WORKLOAD in one corpus
    * pass: every phrase shares the single postings scan (filtered to the
    * union of all query tokens), anchors carry a phrase id, and each
    * (phrase, anchor) needs exactly that phrase's own token count of
    * witnesses. Output: (phrase_id, id, n_matches, first_pos) for
    * matching (phrase, doc) pairs — semantics per phrase identical to
    * the single-query operator.
    *
    * Scale shape: unchanged from the single query — ONE aggregation
    * shuffle of (id, phrase_id, anchor) ints over union-query-token
    * occurrences; the offsets and per-phrase-length tables are bounded
    * by the total workload token count and broadcast.
    */
  def phraseMatchesBatch(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "no phrases given")
    val spark = docs.sparkSession
    import spark.implicits._
    // workload tokens through the SAME tokenizer expression as documents;
    // one bounded collect (total workload tokens), the bm25 convention
    val offsetRows = spark.createDataset(phrases.zipWithIndex)
      .toDF("phrase", "pid")
      .select(col("pid"), posexplode(T.tokenize(col("phrase"))).as(Seq("j", "token")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    require(phrases.indices.forall(p => offsetRows.exists(_._1 == p)),
      "a phrase tokenizes to nothing")
    val allTokens = offsetRows.map(_._3).distinct.toSeq
    val offsets = offsetRows.toSeq.toDF("pid", "j", "token")
    val lens = offsetRows.groupBy(_._1).view.mapValues(_.length).toSeq
      .toDF("pid", "m")
    val postings = graft.SparkUtil.ensureParallelism(
        docs.select(col(idCol).cast("long").as("id"),
          T.tokenize(col(textCol)).as("__toks")))
      .select(col("id"), posexplode(col("__toks")).as(Seq("pos", "token")))
      .where(col("token").isin(allTokens: _*))
    postings.join(broadcast(offsets), Seq("token"))
      .select(col("id"), col("pid"), (col("pos") - col("j")).as("anchor"))
      .groupBy("id", "pid", "anchor").agg(count(lit(1)).as("__w"))
      .join(broadcast(lens), Seq("pid"))
      .where(col("__w") === col("m"))
      .groupBy("pid", "id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("anchor")).cast("long").as("first_pos"))
      .select(col("pid").as("phrase_id"), col("id"), col("n_matches"),
        col("first_pos"))
  }

  /** Top-k BM25 hits with the document text attached (score-desc, id-asc). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .join(broadcast(
        bm25Scores(docs, idCol, textCol, query)
          .orderBy(col("score").desc, col("id").asc).limit(k)), Seq("id"))
      .select(col("id"), col("text"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
}
