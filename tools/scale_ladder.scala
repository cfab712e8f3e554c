// Scale ladder: replicate the sf0.1 corpus 1x/3x/10x/30x and time the
// index-backed operators at each size, with buckets scaled by
// MinHashConfig.forCorpusSize (PERF.md scale design). Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/scale_ladder.scala <<< ":quit"
//
// Prints one JSON line per (scale, op). Flat seconds across the ladder for
// the per-doc ops (featurize) and sub-linear growth for the probe ops
// (batch ANN, filterNovel) is the pass criterion — superlinear growth means
// a bucket-join degenerated.
import org.apache.spark.sql.functions._
import graft._
import graft.operators._

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  .select(col("doc_id"), col("text"))
val n0 = base.count()

for (mult <- Seq(1, 3, 10, 30)) {
  val docs = (0 until mult).map { r =>
    base.select((col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"), col("text"))
  }.reduce(_ union _).repartition(32).persist()
  val n = docs.count()
  val cfg = MinHashConfig.forCorpusSize(n,
    base = MinHashConfig(numHash = 16, numBands = 4, numRows = 4))
  def time(op: String)(body: => Unit): Unit = {
    val t0 = System.nanoTime()
    body
    println(f"""{"ladder":$mult,"docs":$n,"op":"$op","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
  }
  var model: MinHashLSHModel = null
  time("fit_featurize") {
    model = new MinHashLSH(cfg).fit(docs, "doc_id", "text")
    model.indexDf.write.format("noop").mode("overwrite").save()
  }
  time("ann_batch_20q") {
    val qs = base.where(col("doc_id") < 20).select(col("doc_id").as("qid"), col("text"))
    model.approxNearestNeighborsAll(qs, "qid", "text", 5)
      .write.format("noop").mode("overwrite").save()
  }
  time("filter_novel_500") {
    val incoming = base.where(col("doc_id") < 500)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
    model.filterNovel(incoming, "doc_id", "text", 0.5)
      .write.format("noop").mode("overwrite").save()
  }
  time("weighted_featurize") {
    // round-6 shuffle-free weighted MinHash: tag → sig → buckets is one
    // narrow projection, so it must scale exactly as the scan does (the
    // pair JOIN is excluded on purpose — a replicated corpus makes every
    // doc a near-dup family of size mult, so pair output is quadratic by
    // definition and would measure output volume, not the blocking)
    import graft.functions.{ArrayKernels, MinHashExpr, TextFunctions => T, HashFunctions => H}
    docs.select(col("doc_id"),
        ArrayKernels.tagOccurrences(T.kShinglesAll(T.tokenize(col("text")), 2)).as("tg"))
      .select(col("doc_id"), MinHashExpr.minhashMd5(col("tg"), cfg.numHash).as("sig"))
      .withColumn("bucket_ids",
        H.bandBucketsMd5(col("sig"), cfg.numBands, cfg.numRows, cfg.bucketHexLen))
      .write.format("noop").mode("overwrite").save()
  }
  model.unpersist()
  docs.unpersist()
}

// ---- containment ladder: rarest-prefix blocking under corpus growth ----
// Replication alone would make every doc a cross-replica near-dup (pair
// output quadratic by construction), so each replica is letter-rotated
// (translate over the full alphabet) — replicas share no shingles and the
// TRUE pair count grows linearly with the planted families: 10 small
// prefix-docs per replica, each contained in its long source doc. The pass
// criterion is near-linear candidate-pair growth — superlinear candidates
// mean the rarest-prefix bound stopped holding as df grew.
val alpha = "abcdefghijklmnopqrstuvwxyz"
for (mult <- Seq(1, 3, 10)) {
  val corpus = (0 until mult).map { r =>
    val to = alpha.drop(r * 7 % 26) + alpha.take(r * 7 % 26)
    val rotated = base.select((col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"),
      translate(col("text"), alpha, to).as("text"))
    val planted = rotated.orderBy("doc_id").limit(10)
      .select((col("doc_id") + 500000L).as("doc_id"),
        substring(col("text"), 1, 150).as("text"))
    rotated.unionByName(planted)
  }.reduce(_ unionByName _).repartition(32).persist()
  val n = corpus.count()
  val t0 = System.nanoTime()
  val (sh, cands) = Dedup.containmentBlocking(corpus, "doc_id", "text", 3, 0.8)
  val nCands = cands.persist().count()
  val tBlock = (System.nanoTime() - t0) / 1e9
  val t1 = System.nanoTime()
  val pairs = Dedup.containmentPairsDeep(corpus, "doc_id", "text", 3, 0.8)
  val nPairs = pairs.count()
  val tFull = (System.nanoTime() - t1) / 1e9
  println(f"""{"ladder":$mult,"docs":$n,"op":"containment_deep","cand_pairs":$nCands,"true_pairs":$nPairs,"block_sec":$tBlock%.2f,"full_sec":$tFull%.2f}""")
  cands.unpersist(); corpus.unpersist()
  graft.SparkUtil.releaseScopedCaches()
}
// ---- winnowing ladder: shared-substring blocking under corpus growth ----
// Same rotation construction as the containment rung, but the rotation
// must cover UPPERCASE (winnow normalizes with lower(), which would fold
// unrotated uppercase into cross-replica-identical lowercase) and DIGITS
// (a 40-char numeric run is replica-invariant otherwise): with the full
// [A-Za-z0-9] rotation, replicas share no normalized substrings, so
// fingerprints never collide across replicas and both candidate volume
// and true pairs must grow LINEARLY with the replica count. Within each
// replica, a replica-rotated slogan is appended to 8 docs → C(8,2) = 28
// planted true pairs per replica on top of the corpus's natural shared
// substrings. Candidates = fingerprint-join rows before the minShared
// filter (the skew surface: hot fingerprints ARE boilerplate slogans by
// construction). Superlinear candidates mean a fingerprint hot-bucket
// degenerated. Params match the dedup_substring_pairs gate (k=16, w=25).
val digits = "0123456789"
val slogan = "colorless green ideas sleep furiously beside the quick brown fox while the archive replicates itself verbatim and the winnow window slides on"
for (mult <- Seq(1, 3, 10)) {
  val rotL = (r: Int) => alpha.drop(r * 7 % 26) + alpha.take(r * 7 % 26)
  val corpus = (0 until mult).map { r =>
    val from = alpha + alpha.toUpperCase + digits
    val to = rotL(r) + rotL(r).toUpperCase + digits.drop(r * 3 % 10) + digits.take(r * 3 % 10)
    val rotated = base.select((col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"),
      translate(col("text"), from, to).as("text"))
    rotated.withColumn("text",
      when(col("doc_id") % 1000000L < 8,
        concat(col("text"), lit(" "), translate(lit(slogan), alpha, rotL(r))))
        .otherwise(col("text")))
  }.reduce(_ unionByName _).repartition(32).persist()
  val n = corpus.count()
  val t0 = System.nanoTime()
  val fp = corpus
    .select(col("doc_id").cast("long").as("id"),
      explode(graft.operators.TextAnalysis.winnowFingerprints(col("text"), 16, 25)).as("fp"))
  val cands = fp.select(col("fp"), col("id").as("a_id"))
    .join(fp.select(col("fp"), col("id").as("b_id")), Seq("fp"))
    .where(col("a_id") < col("b_id"))
    .persist()
  val nCands = cands.count()
  // linearity proof: candidates must stay WITHIN replicas (each replica's
  // count is a corpus-size-independent constant — winnow-minimum selection
  // varies per rotation, so per-replica constants differ statistically,
  // but zero cross-replica pairs means total = sum of constants = linear)
  val nCross = cands.where(
    (col("a_id") / 1000000L).cast("long") =!= (col("b_id") / 1000000L).cast("long")).count()
  val tBlock = (System.nanoTime() - t0) / 1e9
  val t1 = System.nanoTime()
  val nPairs = Dedup.sharedSubstringPairs(corpus, "doc_id", "text", 16, 25, 2).count()
  val tFull = (System.nanoTime() - t1) / 1e9
  println(f"""{"ladder":$mult,"docs":$n,"op":"winnow_substring","cand_pairs":$nCands,"cross_pairs":$nCross,"true_pairs":$nPairs,"block_sec":$tBlock%.2f,"full_sec":$tFull%.2f}""")
  cands.unpersist(); corpus.unpersist()
}
System.exit(0)
