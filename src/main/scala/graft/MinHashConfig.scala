package graft

/** Hash-family mode for the MinHash pipeline.
  *
  *  - [[Md5Parity]]: 32-hex-char md5 strings. Fixed-width hex means
  *    lexicographic min == unsigned 128-bit numeric min (the reference's own
  *    trick, /root/reference/src/minhash_utils.py:81-87, minus its
  *    variable-width `hex()` bug surface). DuckDB has an identical `md5()`,
  *    so signatures / buckets / scores are bit-comparable in the oracle.
  *  - [[XxFast]]: `xxhash64` longs, one base hash per shingle then one cheap
  *    long-hash per signature slot. Signed min (any fixed total order is a
  *    valid MinHash order; parity is not claimed for this mode).
  */
sealed trait MinHashMode
case object Md5Parity extends MinHashMode
case object XxFast extends MinHashMode

/** BIT-PARITY with the reference's DEFAULT hash family: signature slot =
  * xxh128(f"{slot}{x}", seed=1) unsigned-128 min, stored as Python hex()
  * strings; buckets = xxh32(repr(band_tuple), seed=1) % numBuckets
  * (/root/reference/src/utils.py:13-16,44-47, minhash_utils.py:41-113).
  * Pure-JVM spec ports — see [[graft.functions.XxHashKernel]]. Reference
  * parity holds on the vocabulary path (the reference always hashes vocab
  * indices); direct mode uses the same family over shingle strings.
  */
case object Xx128Parity extends MinHashMode

/** Hyperparameters mirrored from the reference config
  * (/root/reference/src/minhash_config.py:1-66) plus engine-side knobs.
  *
  * @param numShingles  k, tokens per shingle (minhash_config.py:2-3)
  * @param numHash      signature length (minhash_config.py:5-7)
  * @param numBands     LSH bands; numBands * numRows == numHash
  *                     (minhash_config.py:9-13)
  * @param numRows      signature slots per band
  * @param numBuckets   XxFast bucket modulus (minhash_config.py:14-19)
  * @param bucketHexLen Md5Parity bucket id = first N hex chars of the band
  *                     md5 (string bucket space of 16^N; the reference's
  *                     xxh32 % 500 band hash is results-shape-neutral,
  *                     SURVEY.md §5.3)
  * @param useVocabulary reference-parity path: global sorted shingle
  *                     vocabulary, signatures hash vocab *indices*
  *                     (minhash_pyspark.py:341-389). Off = "direct" mode:
  *                     hash shingle strings themselves — no global state,
  *                     fully narrow per-row (the 100 TB path).
  * @param vocabBroadcast hint the vectorizing equi-join to broadcast the
  *                     vocabulary (the reference ships its dict to every
  *                     worker the same way, minhash_pyspark.py:325). Turn
  *                     off when the vocabulary is too large to broadcast —
  *                     the join then degrades gracefully to shuffle.
  */
final case class MinHashConfig(
    numShingles: Int = 2,
    numHash: Int = 100,
    numBands: Int = 25,
    numRows: Int = 4,
    numBuckets: Int = 500,
    bucketHexLen: Int = 4,
    mode: MinHashMode = Md5Parity,
    useVocabulary: Boolean = false,
    vocabBroadcast: Boolean = true) {
  require(numBands * numRows == numHash,
    s"numBands($numBands) * numRows($numRows) must equal numHash($numHash)")
}

object MinHashConfig {

  /** Size the LSH bucket space for a corpus: buckets ≈ corpus / occupancy,
    * rounded up to a power of two (min 500, the reference default). The
    * bucket space is THE scale knob — with the reference's fixed 500
    * buckets, candidate collisions (and so probe cost of every bucket-join
    * operator) grow linearly with the corpus; sized by this rule, probe
    * cost stays flat while only the embarrassingly-parallel index build
    * grows (PERF.md scale ladder: filterNovel 22 s → 1.9 s at 30×).
    * `bucketHexLen` is the same knob for md5-parity mode (16^N buckets).
    */
  def forCorpusSize(nDocs: Long, occupancy: Int = 8,
      base: MinHashConfig = MinHashConfig()): MinHashConfig = {
    require(nDocs > 0 && occupancy > 0)
    // cap BEFORE rounding up: a want just above 2^30 must saturate at 2^30,
    // not double past Int.MaxValue into a negative modulus
    val want = math.min(math.max(500L, nDocs / occupancy), 1L << 30)
    val floorPow = java.lang.Long.highestOneBit(want)
    val buckets = (if (floorPow >= want) floorPow else floorPow * 2).toInt
    val hexLen = math.max(2, math.ceil(math.log(buckets.toDouble) / math.log(16)).toInt)
    base.copy(numBuckets = buckets, bucketHexLen = hexLen)
  }
}

/** Column-name constants (reference: /root/reference/src/minhash_config.py:30-51). */
object Cols {
  val Id = "id"
  val Text = "text"
  val Tokens = "tokens"
  val Shingles = "shingles"
  val BoolVec = "bool_vec"
  val Signature = "signature"
  val BucketIds = "bucket_ids"
  val Jaccard = "jaccard"
  val Shingle = "shingle"
  val VocabIdx = "idx"
}
