package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / LSH hash kernels as native expression trees.
  *
  * Reference semantics: hash family /root/reference/src/utils.py:7-16,
  * signature fold /root/reference/src/minhash_utils.py:41-87,
  * banding /root/reference/src/minhash_utils.py:90-113,
  * signature Jaccard /root/reference/src/utils.py:19-29.
  */
object HashFunctions {

  /** md5-family hash i of string x: md5(str(i) ++ str(x)), 32-hex-char
    * lowercase. Fixed width ⇒ lexicographic min == unsigned numeric min.
    */
  def md5Hash(i: Column, x: Column): Column = md5(concat(i.cast("string"), x))

  /** MinHash signature, md5 "direct" mode: hash shingle strings themselves —
    * no global vocabulary, fully narrow per-row (the at-scale path).
    * sig[h] = min over shingles s of md5(h || s). Empty shingles ⇒ null
    * signature (the reference crashes on hex(inf) here,
    * /root/reference/src/minhash_utils.py:66,81 — we define it away).
    * One-pass custom expression; bit-identical to [[minhashMd5Hof]].
    */
  def minhashMd5(shingles: Column, numHash: Int): Column =
    MinHashExpr.minhashMd5(shingles, numHash)

  /** HOF encoding of [[minhashMd5]], kept as the cross-check twin. */
  def minhashMd5Hof(shingles: Column, numHash: Int): Column =
    when(size(shingles) > 0,
      transform(sequence(lit(0), lit(numHash - 1)),
        h => array_min(transform(shingles, s => md5Hash(h, s)))))
      .otherwise(lit(null).cast("array<string>"))

  /** MinHash signature over vocabulary *indices* (reference-parity vocab
    * path): sig[h] = min over true-indices ix of md5(h || ix).
    * Reference: /root/reference/src/minhash_utils.py:41-87.
    */
  def minhashMd5Indices(boolVec: Column, numHash: Int): Column =
    MinHashExpr.minhashMd5(transform(boolVec, ix => ix.cast("string")), numHash)

  /** One 64-bit base hash per shingle — computed once, reused by all
    * signature slots (O(S) string hashes + O(S·H) cheap long hashes instead
    * of O(S·H) string hashes).
    */
  def baseHashesXx(shingles: Column): Column = transform(shingles, s => xxhash64(s))

  /** MinHash signature, fast mode: sig[h] = min over shingles s of
    * xxhash64(h, xxhash64(s)) — one string hash per shingle, one cheap long
    * hash per slot, single pass (custom expression). Signed min — any fixed
    * total order on hash values is a valid MinHash order.
    */
  def minhashXx(shingles: Column, numHash: Int): Column =
    MinHashExpr.minhashXx(shingles, numHash)

  /** HOF encoding over precomputed base hashes, kept as cross-check twin. */
  def minhashXxFromBases(baseHashes: Column, numHash: Int): Column =
    when(size(baseHashes) > 0,
      transform(sequence(lit(0), lit(numHash - 1)),
        h => array_min(transform(baseHashes, x => xxhash64(h, x)))))
      .otherwise(lit(null).cast("array<bigint>"))

  /** LSH banding, md5 mode: bucket id = first `hexLen` hex chars of
    * md5(concat_ws("|", band)), deduplicated. String bucket space of
    * 16^hexLen; the reference's xxh32 % NUM_BUCKETS band hash is
    * results-shape-neutral (SURVEY.md §5.3).
    */
  def bandBucketsMd5(sig: Column, bands: Int, rows: Int, hexLen: Int): Column =
    when(sig.isNotNull,
      array_distinct(transform(sequence(lit(0), lit(bands - 1)),
        b => substring(
          md5(concat_ws("|", slice(sig, b * lit(rows) + lit(1), lit(rows)))),
          1, hexLen))))
      .otherwise(lit(null).cast("array<string>"))

  /** LSH banding, fast mode: xxhash64 of the band slice (hash expressions
    * support array inputs natively), mod numBuckets, deduplicated.
    */
  def bandBucketsXx(sig: Column, bands: Int, rows: Int, numBuckets: Int): Column =
    when(sig.isNotNull,
      array_distinct(transform(sequence(lit(0), lit(bands - 1)),
        b => pmod(xxhash64(slice(sig, b * lit(rows) + lit(1), lit(rows))),
          lit(numBuckets.toLong)).cast("int"))))
      .otherwise(lit(null).cast("array<int>"))

  /** MinHash Jaccard estimate: #(a_i == b_i) / min(|a|, |b|) — the
    * signature-agreement ratio, NOT set Jaccard (reference
    * /root/reference/src/utils.py:19-29 truncates to the shorter signature).
    * Custom while-loop kernel; bit-identical to the HOF encoding
    * `size(filter(zip_with(a,b,_<=>_),v=>v)) / least(size(a),size(b))`.
    */
  def signatureJaccard(a: Column, b: Column): Column =
    ArrayKernels.signatureAgreement(a, b)

  /** Exact set Jaccard over two array columns: |a ∩ b| / |a ∪ b|.
    * Reference bucket-threshold filter /root/reference/src/minhash_utils.py:116-119.
    */
  def setJaccard(a: Column, b: Column): Column =
    (size(array_intersect(a, b)) / size(array_union(a, b))).cast("double")
}
