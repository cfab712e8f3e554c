package graft

import graft.functions.{XxHashExpr, XxHashKernel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity validation of the pure-Scala XXH32 / XXH3-128 spec ports
  * against two INDEPENDENT implementations already on the Spark classpath:
  * lz4-java's XXHash32 (net.jpountz) and parquet-column's shaded openhft
  * XXH3 (128-bit). Deterministic pseudo-random inputs sweep every length
  * branch of the algorithms (0, 1-3, 4-8, 9-16, 17-128, 129-240, >240,
  * multi-block >1024) under several seeds — any wrong constant, secret
  * byte, or branch boundary breaks a match.
  */
class XxHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // deterministic input generator (no Math.random in tests either)
  private def bytes(len: Int, salt: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    var x = 0x9E3779B9 ^ salt
    var i = 0
    while (i < len) {
      x = x * 1103515245 + 12345
      b(i) = (x >>> 16).toByte
      i += 1
    }
    b
  }

  private val lengths =
    (0 to 16) ++ Seq(17, 31, 32, 33, 63, 64, 65, 96, 97, 127, 128, 129, 160,
      192, 239, 240, 241, 512, 1023, 1024, 1025, 2048, 4099)

  test("XXH32 ≡ lz4-java across all length branches and seeds") {
    val jp = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance().hash32()
    for (len <- lengths; seed <- Seq(0, 1, 42, -7)) {
      val in = bytes(len, len * 31 + seed)
      val expect = jp.hash(in, 0, len, seed) & 0xFFFFFFFFL
      val got = XxHashKernel.xxh32(in, 0, len, seed)
      assert(got == expect, s"xxh32 mismatch at len=$len seed=$seed")
    }
  }

  test("XXH128 ≡ openhft XXH3 across all length branches and seeds") {
    for (seed <- Seq(0L, 1L, 42L, -12345L)) {
      val f = shaded.parquet.net.openhft.hashing.LongTupleHashFunction.xx128(seed)
      for (len <- lengths) {
        val in = bytes(len, len * 17 + seed.toInt)
        val expect = f.hashBytes(in) // [low64, high64]
        val (lo, hi) = XxHashKernel.xxh128(in, 0, len, seed)
        assert(lo == expect(0) && hi == expect(1),
          s"xxh128 mismatch at len=$len seed=$seed: got ($lo,$hi) want (${expect(0)},${expect(1)})")
      }
    }
  }

  test("reference hash family composition: f\"{h}{x}\" -> intdigest -> hex()") {
    // pin the exact composed semantics the reference uses per signature
    // slot (utils.py:13-16): xxh128(str(h)+str(x) utf-8, seed=1).intdigest()
    // rendered through Python hex(). Expected value built from openhft +
    // BigInteger — an independent composition path.
    val f = shaded.parquet.net.openhft.hashing.LongTupleHashFunction.xx128(1L)
    for ((h, x) <- Seq((0, 0L), (1, 7L), (99, 123456789L), (12, 42L))) {
      val in = s"$h$x".getBytes("UTF-8")
      val r = f.hashBytes(in)
      val big = new java.math.BigInteger(java.lang.Long.toHexString(r(1)), 16)
        .shiftLeft(64).add(new java.math.BigInteger(
          f"${r(0)}%016x", 16))
      val expect = "0x" + big.toString(16)
      val (lo, hi) = XxHashKernel.xxh128(in, 0, in.length, 1L)
      assert(XxHashKernel.pyHex(lo, hi).toString == expect,
        s"hex mismatch for (h=$h, x=$x)")
    }
  }

  test("xx128 band buckets: repr()-exact band hashing, mod numBuckets") {
    // two slots, one band of two rows: repr = "(a, b)" decimal; xxh32 seed 1
    val sig = Seq("0xff", "0x10")
    val a = new java.math.BigInteger("ff", 16).toString
    val b = new java.math.BigInteger("10", 16).toString
    val repr = s"($a, $b)".getBytes("UTF-8")
    val expect = java.lang.Long.remainderUnsigned(
      XxHashKernel.xxh32(repr, 0, repr.length, 1), 500L).toInt
    val got = spark.range(1)
      .select(XxHashExpr.bandBucketsXx32(
        typedLit(sig), 1, 2, 500).as("b"))
      .collect()(0).getSeq[Int](0)
    assert(got == Seq(expect))
    // single-row band: Python single-element tuple repr "(a,)"
    val repr1 = s"($a,)".getBytes("UTF-8")
    val expect1 = java.lang.Long.remainderUnsigned(
      XxHashKernel.xxh32(repr1, 0, repr1.length, 1), 500L).toInt
    val got1 = spark.range(1)
      .select(XxHashExpr.bandBucketsXx32(typedLit(Seq("0xff")), 1, 1, 500).as("b"))
      .collect()(0).getSeq[Int](0)
    assert(got1 == Seq(expect1))
  }

  test("Xx128Parity end-to-end: vocab pipeline, planted family, codegen on") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4,
        mode = Xx128Parity, useVocabulary = true)
      val m = new graft.operators.MinHashLSH(cfg).fit(docs, "doc_id", "text")
      val ix = m.indexDf.where(col(Cols.Signature).isNotNull)
      // signature slots are Python hex() strings; buckets within range
      val badSig = ix.where(!forall(col(Cols.Signature),
        s => s.rlike("^0x[0-9a-f]+$"))).count()
      assert(badSig == 0, "all signature slots must be Python hex() format")
      val badBucket = ix.where(!forall(col(Cols.BucketIds),
        bkt => bkt >= 0 && bkt < cfg.numBuckets)).count()
      assert(badBucket == 0, "bucket ids must be in [0, numBuckets)")
      // planted near-dup family: doc 0's text must retrieve 50/82
      val key = docs.where(col("doc_id") === 0).collect()(0).getAs[String]("text")
      val top = m.approxNearestNeighbors(key, 5).select("id").collect().map(_.getLong(0)).toSet
      assert(Set(0L, 50L, 82L).subsetOf(top), s"planted family missing from $top")
      m.unpersist()
      // direct (vocabulary-free) mode: same family over shingle strings —
      // the 100 TB path; must also retrieve the planted family
      val md = new graft.operators.MinHashLSH(cfg.copy(useVocabulary = false))
        .fit(docs, "doc_id", "text")
      val topD = md.approxNearestNeighbors(key, 5).select("id").collect()
        .map(_.getLong(0)).toSet
      assert(Set(0L, 50L, 82L).subsetOf(topD), s"direct-mode family missing from $topD")
      md.unpersist()
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
