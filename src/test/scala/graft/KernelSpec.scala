package graft

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}
import graft.functions.SimHash64.{hamming, simhash64}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel fixtures ported from the reference behavior (FIXTURES.md §A.3). */
class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("MinHashConfig.forCorpusSize: power-of-two buckets ≈ corpus/occupancy") {
    val small = MinHashConfig.forCorpusSize(1000)
    assert(small.numBuckets == 512 && small.bucketHexLen == 3) // pow-2 floor ≈ reference default
    val big = MinHashConfig.forCorpusSize(1000000, occupancy = 8)
    assert(big.numBuckets == 131072) // 125000 -> next pow2
    assert(big.bucketHexLen == 5) // 16^5 >= 131072
    assert(big.numHash == 100) // base config untouched otherwise
    // 100 TB scale: want above 2^30 saturates instead of overflowing to a
    // negative modulus
    assert(MinHashConfig.forCorpusSize(10000000000L).numBuckets == (1 << 30))
  }

  test("tokenize kernel ≡ regex chain on corpus + adversarial strings, codegen on") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val badCorpus = docs.select(
          T.tokenize(col("text")).as("k"),
          T.tokenizeRegexTwin(col("text"), unicode = false).as("r"))
        .where(not(col("k") <=> col("r")))
      assert(badCorpus.count() == 0, "kernel must equal the regex chain on the corpus")
      val nasty = Seq("", "   ", "...!!!", "a", "A_b9 C--d", "étoile Ünïcode 漢字 mix",
        "tab\there\nnewline nbsp", "__under__score__", "ALLCAPS lower 123",
        "ends with punct!", "!starts", "a.b,c;d:e", "ctrlchars")
      val badNasty = nasty.toDF("t").select(
          T.tokenize(col("t")).as("k"),
          T.tokenizeRegexTwin(col("t"), unicode = false).as("r"))
        .where(not(col("k") <=> col("r")))
      assert(badNasty.count() == 0,
        s"kernel diverges on: ${badNasty.collect().toSeq}")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("winnow kernel ≡ HOF twin on corpus + adversarial strings, codegen on") {
    import graft.operators.TextAnalysis
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // the HOF twin is O(n·w) per row — cap the corpus slice so the TWIN
      // (not the kernel) stays inside test time; 100 docs × 2 configs still
      // exercises every hash/window path on real text
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(100)
      for ((k, w) <- Seq((8, 8), (16, 25))) {
        val bad = docs.select(
            TextAnalysis.winnowFingerprints(col("text"), k, w).as("a"),
            TextAnalysis.winnowFingerprintsHof(col("text"), k, w).as("b"))
          .where(not(col("a") <=> col("b")))
        assert(bad.count() == 0, s"kernel must equal the HOF twin at k=$k w=$w")
      }
      // boundary lengths around the w+k-1 floor, repeats, unicode chars —
      // including SUPPLEMENTARY-PLANE (astral) chars, where one code point
      // is two UTF-16 units: Spark substr/length count code points, so the
      // kernel must too (String.substring indexing would split surrogates)
      val nasty = Seq("", "x", "a" * 14, "a" * 15, "a" * 16, "ab" * 40,
        "the the the the the the", "étoile Ünïcode 漢字 mix padded to length!!",
        "  spaces   collapse   to one   then fingerprint  ",
        "emoji 😀 mid-string padded out to enough length!",
        "😀😁😂😃 astral run " +
          "🍕🍔 more text to clear the floor",
        "😀" * 15, // 15 code points = exactly the 8+8-1 floor
        "😀" * 14) // 14 code points = below the floor → empty
      val badNasty = nasty.toDF("t").select(
          TextAnalysis.winnowFingerprints(col("t"), 8, 8).as("a"),
          TextAnalysis.winnowFingerprintsHof(col("t"), 8, 8).as("b"))
        .where(not(col("a") <=> col("b")))
      assert(badNasty.count() == 0,
        s"winnow kernel diverges on: ${badNasty.collect().toSeq}")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 run share a fingerprint") {
    import graft.operators.TextAnalysis
    val shared = "zqv wxj kpl mno rst uvw xyz abc defg"  // 36 chars > 8+8-1
    val d = Seq(("prefix junk one " + shared), (shared + " suffix junk two"))
      .toDF("t").select(TextAnalysis.winnowFingerprints(col("t"), 8, 8).as("f"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(d(0).intersect(d(1)).nonEmpty,
      "alignment-shifted copies of a long run must share a fingerprint")
  }

  test("tokenize: punctuation→space, collapse, lower, trim") {
    val got = Seq("Hello, world!  Hi.", "co-op", "  A  b\tC ", "", "?!.")
      .toDF("text").select(T.tokenize($"text").as("t")).as[Seq[String]].collect()
    assert(got(0) == Seq("hello", "world", "hi"))
    assert(got(1) == Seq("co", "op")) // punct becomes space, not deleted
    assert(got(2) == Seq("a", "b", "c"))
    // reference .split() (no-arg, /root/reference/src/utils.py:41) returns []
    // on empty — punctuation-only docs have zero tokens, not one empty token
    assert(got(3) == Seq())
    assert(got(4) == Seq())
  }

  test("tokenize unicode mode keeps non-ASCII letters (reference Python-re parity)") {
    val got = Seq("Crème brûlée! 中文 text")
      .toDF("text")
      .select(T.tokenize($"text", unicode = true).as("u"),
        T.tokenize($"text", unicode = false).as("a"))
      .collect()(0)
    assert(got.getSeq[String](0) == Seq("crème", "brûlée", "中文", "text"))
    // ASCII mode strips the accents/CJK into separators — deliberate,
    // matches the DuckDB/RE2 oracle
    assert(got.getSeq[String](1) != got.getSeq[String](0))
  }

  test("kShingles: sliding window, dedup, short docs empty") {
    val rows = Seq(
      Seq("hello", "world", "hi"),
      Seq("a", "b", "a", "b"),
      Seq("solo"),
      Seq[String]())
      .toDF("toks").select(T.kShingles($"toks", 2).as("s")).as[Seq[String]].collect()
    assert(rows(0) == Seq("hello world", "world hi"))
    assert(rows(1) == Seq("a b", "b a"))
    assert(rows(2) == Seq())
    assert(rows(3) == Seq())
  }

  test("minhashMd5: sig[h] = min over shingles of md5(h ++ s); empty → null") {
    val df = Seq(Seq("aa bb", "bb cc"), Seq[String]()).toDF("sh")
      .select(H.minhashMd5($"sh", 3).as("sig"))
    val rows = df.collect()
    val exp = (0 until 3).map(h => Seq(md5Hex(s"${h}aa bb"), md5Hex(s"${h}bb cc")).min)
    assert(rows(0).getSeq[String](0) == exp)
    assert(rows(1).isNullAt(0))
  }

  test("custom one-pass minhash expressions ≡ HOF encodings on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = T.shingles(col("text"), 2)
    val cmp = docs.select(
      H.minhashMd5(sh, 16).as("m_custom"),
      H.minhashMd5Hof(sh, 16).as("m_hof"),
      H.minhashXx(sh, 16).as("x_custom"),
      H.minhashXxFromBases(H.baseHashesXx(sh), 16).as("x_hof"))
    val bad = cmp.where(
      not(col("m_custom") <=> col("m_hof")) || not(col("x_custom") <=> col("x_hof")))
    assert(bad.count() == 0)
    // empty-shingles doc → null from both
    val e = Seq("solo").toDF("text")
      .select(H.minhashMd5(T.shingles(col("text"), 2), 4).as("m"),
        H.minhashXx(T.shingles(col("text"), 2), 4).as("x")).collect()(0)
    assert(e.isNullAt(0) && e.isNullAt(1))
  }

  test("minhash AGGREGATE ≡ per-row kernel on real corpus (partial-merge path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val perRow = docs
      .select(col("doc_id"), H.minhashMd5(T.shingles(col("text"), 2), 16).as("sig"))
      .where(col("sig").isNotNull)
    // repartition the exploded rows so each doc's shingles land in several
    // partitions — forces update+serialize+merge, not just a single update run
    val viaAgg = docs
      .select(col("doc_id"), explode(T.shingles(col("text"), 2)).as("shingle"))
      .repartition(7)
      .groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.minhashMd5Agg(col("shingle"), 16).as("sig"))
    assert(perRow.join(viaAgg, Seq("doc_id"))
      .where(not(perRow("sig") <=> viaAgg("sig"))).count() == 0)
    assert(perRow.count() == viaAgg.count())
    // SQL frontend twin
    docs.createOrReplaceTempView("docs_agg_v")
    val sqlRows = spark.sql("""
      SELECT doc_id, graft_minhash_md5_agg(shingle, 16) AS sig FROM (
        SELECT doc_id, explode(graft_shingles(text, 2)) AS shingle FROM docs_agg_v)
      GROUP BY doc_id""")
    assert(perRow.join(sqlRows, Seq("doc_id"))
      .where(not(perRow("sig") <=> sqlRows("sig"))).count() == 0)
  }

  test("simhashMd5: single token == its md5 prefix; empty == all-ones; SQL twin agrees") {
    import graft.functions.SimHash64.simhashMd5
    val got = Seq(Seq("a"), Seq[String]()).toDF("toks")
      .select(simhashMd5($"toks").as("sh")).collect().map(_.getString(0))
    assert(got(0) == md5Hex("a").take(16)) // one token: majority == its own bits
    assert(got(1) == "ffffffffffffffff")   // zero counts are >= 0 → every bit set
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_sh_v")
    val viaSql = spark.sql(
      "SELECT graft_simhash_md5(graft_tokenize(text)) AS sh FROM docs_sh_v")
    val viaDf = docs.select(simhashMd5(T.tokenize(col("text"))).as("sh"))
    assert(viaDf.exceptAll(viaSql).count() == 0 && viaSql.exceptAll(viaDf).count() == 0)
  }

  test("topK aggregate ≡ row_number window on randomized data with ties") {
    import graft.functions.TopKAgg
    val rnd = new scala.util.Random(11)
    // heavy ties: scores drawn from just 5 distinct values
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(20).toLong, (rnd.nextInt(5) / 4.0), i.toLong)
    }.toDF("key", "score", "id")
    val viaAgg = rows.repartition(7) // force partial heaps + merge
      .groupBy("key")
      .agg(TopKAgg.topK(col("score"), col("id"), 3).as("tk"))
      .select(col("key"), posexplode(col("tk")).as(Seq("r0", "e")))
      .select(col("key"), (col("r0") + 1).as("rank"),
        col("e.score").as("score"), col("e.id").as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val viaWindow = rows
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("key"), col("rank").cast("long").as("rank"),
        col("score"), col("id"))
    assert(viaAgg.exceptAll(viaWindow).count() == 0 &&
      viaWindow.exceptAll(viaAgg).count() == 0)
    // SQL frontend twin
    rows.createOrReplaceTempView("topk_v")
    val viaSql = spark.sql("""
      SELECT key, graft_topk(score, id, 3) AS tk FROM topk_v GROUP BY key""")
      .select(col("key"), posexplode(col("tk")).as(Seq("r0", "e")))
      .select(col("key"), (col("r0") + 1).as("rank"),
        col("e.score").as("score"), col("e.id").as("id"))
    assert(viaSql.exceptAll(viaWindow).count() == 0 &&
      viaWindow.exceptAll(viaSql).count() == 0)
  }

  test("bandBucketsMd5: count ≤ bands, hex ids, deterministic") {
    val sig = (0 until 8).map(i => md5Hex(i.toString))
    val df = Seq(Tuple1(sig)).toDF("sig")
      .select(H.bandBucketsMd5($"sig", 4, 2, 4).as("b"))
    val b = df.collect()(0).getSeq[String](0)
    assert(b.length <= 4 && b.distinct == b)
    assert(b.forall(_.matches("[0-9a-f]{4}")))
    val expected0 = md5Hex(sig(0) + "|" + sig(1)).take(4)
    assert(b.contains(expected0))
  }

  test("signatureJaccard: agreement / min length") {
    val df = Seq(
      (Seq("x", "y", "z"), Seq("x", "y", "z")),
      (Seq("x", "y", "z"), Seq("x", "q", "z")),
      (Seq("x", "y"), Seq("x", "y", "z"))) // truncates to min length
      .toDF("a", "b").select(H.signatureJaccard($"a", $"b").as("j"))
    val got = df.as[Float].collect()
    assert(got(0) == 1.0f && got(1) == 2f / 3f && got(2) == 1.0f)
  }

  test("setJaccard: |∩|/|∪|, custom string kernel ≡ HOF") {
    val got = Seq((Seq(1, 2, 3), Seq(2, 3, 4))).toDF("a", "b")
      .select(H.setJaccard($"a", $"b").as("j")).as[Double].collect()(0)
    assert(math.abs(got - 0.5) < 1e-12)
    val r = Seq((Seq("x", "y", "z"), Seq("y", "z", "w", "v"))).toDF("a", "b")
      .select(
        graft.functions.ArrayKernels.setJaccard($"a", $"b").as("custom"),
        H.setJaccard($"a", $"b").as("hof")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("array kernels: null elements — dot/l2 null out, agreement counts unequal") {
    // containsNull=true inputs (only reachable via the public ArrayKernels
    // surface; engine-internal embeddings/signatures are containsNull=false).
    // Contract: DotProduct/L2Norm propagate null like their HOF twins'
    // fold; SignatureAgreement counts a null slot as not-equal. Identical
    // in codegen (DataFrame path below) and interpreted eval.
    import graft.functions.ArrayKernels
    val nD = lit(null).cast("double")
    val nS = lit(null).cast("string")
    val r = spark.range(1).select(
      ArrayKernels.dotProduct(array(lit(1.0), nD), array(lit(2.0), lit(3.0))).as("dot"),
      ArrayKernels.l2Norm(array(lit(3.0), nD)).as("l2"),
      ArrayKernels.signatureAgreement(
        array(lit("a"), nS, lit("c")), array(lit("a"), nS, lit("c"))).as("agree"),
      V.dotHof(array(lit(1.0), nD), array(lit(2.0), lit(3.0))).as("dot_hof")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getFloat(2) == 2f / 3f) // null slot not equal even to null
    assert(r.isNullAt(3)) // HOF twin agrees with the custom kernel
  }

  test("simhash64: single token equals xxhash64; identical inputs hamming 0") {
    val df = Seq(Tuple1(Seq("token"))).toDF("t")
      .select(simhash64($"t").as("sh"), xxhash64(lit("token")).as("xx"))
    val r = df.collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    val d = Seq((Seq("a", "b", "c"), Seq("a", "b", "c"))).toDF("x", "y")
      .select(hamming(simhash64($"x"), simhash64($"y")).as("d")).collect()(0)
    assert(d.getInt(0) == 0)
  }

  test("cosine: orthogonal 0, identical 1, zero-norm null") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 1f), Seq(1f, 1f)),
      (Seq(0f, 0f), Seq(1f, 1f)))
      .toDF("a", "b").select(V.cosine($"a", $"b").as("c"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0)) < 1e-12)
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    assert(rows(2).isNullAt(0))
  }

  test("signBucket: deterministic sign quantizer") {
    val got = Seq(Tuple1(Seq(1f, -1f, 2f, -0.5f))).toDF("v")
      .select(V.signBucket($"v", 4).as("b")).collect()(0).getInt(0)
    assert(got == (1 + 4)) // dims 0 and 2 positive
  }

  test("charNGrams: sliding chars, distinct, custom ≡ HOF on real corpus") {
    val got = Seq("abcab").toDF("t").select(T.charNGrams($"t", 3).as("g"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("abc", "bca", "cab"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(T.charNGrams(col("text"), 3).as("c"),
        T.charNGramsHof(col("text"), 3).as("h"))
      .where(not(col("c") <=> col("h")))
    assert(bad.count() == 0)
  }

  test("deflateRatio: total function, repeated-substring collapse, codegen path") {
    val spark2 = spark
    import spark2.implicits._
    // interpreted/constant-folded path
    val folded = spark.sql(
      """SELECT graft_deflate_ratio('') AS empty,
                graft_deflate_ratio(CAST(NULL AS STRING)) AS nul,
                graft_deflate_ratio(repeat('slogan ', 50)) AS rep,
                graft_deflate_ratio('one small prose sentence here') AS prose
      """).collect()(0)
    assert(folded.getDouble(0) == 0.0, "empty text ratio 0.0 (total function)")
    assert(folded.isNullAt(1), "null in, null out")
    assert(folded.getDouble(2) < 0.1 && folded.getDouble(3) > 0.5 &&
      folded.getDouble(2) < folded.getDouble(3),
      "LZ77 must collapse the repeated slogan far below prose")
    // whole-stage-codegen path on non-literal input must agree exactly
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq("", "slogan " * 50, "one small prose sentence here")
        .toDF("text")
        .select(T.deflateRatio(col("text")).as("r")).collect().map(_.getDouble(0))
      assert(rows(0) == 0.0 && rows(1) == folded.getDouble(2) &&
        rows(2) == folded.getDouble(3),
        "generated code must call the same kernel as nullSafeEval")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("BPE kernel: exact merge loop — order by rank, all-occurrence L2R passes") {
    import graft.functions.{Bpe, BpeKernel, BpeTable}
    def enc(w: String, t: BpeTable) = BpeKernel.encodeWord(w, t).toSeq
    val planted = Bpe.plantedTable
    assert(enc("the", planted) == Seq("the"))
    assert(enc("then", planted) == Seq("the", "n"),
      "(th,e) rank 1 beats (e,n) rank 8 — 'the'+'n', not 'th'+'en'")
    assert(enc("thin", planted) == Seq("th", "in"))
    assert(enc("resting", planted) == Seq("r", "est", "ing"))
    assert(enc("ander", planted) == Seq("and", "er"))
    assert(enc("", planted).isEmpty)
    assert(enc("zq", planted) == Seq("z", "q"), "no listed pair → chars")
    // overlap: all-occurrence pass is left-to-right, non-overlapping
    val aa = new BpeTable(Seq(("a", "a")))
    assert(enc("aaaa", aa) == Seq("aa", "aa"))
    assert(enc("aaa", aa) == Seq("aa", "a"))
    // NON-hierarchical table: a later-rank merge must re-enable an
    // earlier-rank pair (iterative lowest-present, NOT one sequential
    // pass per rule — the sequential replay would leave [x, ab])
    val nh = new BpeTable(Seq(("x", "ab"), ("a", "b")))
    assert(enc("xab", nh) == Seq("xab"))
    // planted-table hierarchy: every operand is a char or an EARLIER
    // rule's output, outputs distinct — the property the DuckDB replace()
    // replay depends on (guards future edits to PlantedMerges)
    val outputs = Bpe.PlantedMerges.map { case (l, r) => l + r }
    assert(outputs.distinct == outputs, "merge outputs must be distinct")
    Bpe.PlantedMerges.zipWithIndex.foreach { case ((l, r), i) =>
      for (op <- Seq(l, r) if op.length > 1)
        assert(outputs.indexOf(op) >= 0 && outputs.indexOf(op) < i,
          s"operand '$op' of rule $i must be an earlier rule's output")
    }
  }

  test("learnMerges: greedy max-count, lexicographic tie-break, <2 early stop") {
    import graft.functions.Bpe
    try {
      // pair counts: (a,a)×4 from 'aa', (a,b)×3 from 'ab', (z,z)×1 from 'zz'
      val rows = Seq("aa ab aa ab aa", "ab aa zz").toDF("text")
      val learned = Bpe.learnMerges(rows, "text", k = 5)
      assert(learned == Seq(("a", "a", 4L), ("a", "b", 3L)),
        s"greedy order + early stop below count 2: $learned")
      // tie at count 2: (b,a) beats (c,a) lexicographically
      val tie = Seq("ba ba ca ca").toDF("text")
      assert(Bpe.learnMerges(tie, "text", k = 1).head._1 == "b")
      // learned table compresses: fewer subwords than characters
      val chars = Seq("aa ab aa").toDF("text")
        .select(Bpe.countTokens(T.tokenize(col("text")),
          new graft.functions.BpeTable(Nil)).as("n")).collect()(0).getLong(0)
      val merged = Seq("aa ab aa").toDF("text")
        .select(Bpe.countTokens(T.tokenize(col("text")),
          new graft.functions.BpeTable(learned.map(m => (m._1, m._2)))).as("n"))
        .collect()(0).getLong(0)
      assert(chars == 6L && merged == 3L,
        s"learned merges must compress: $chars chars -> $merged subwords")
    } finally graft.SparkUtil.releaseScopedCaches()
  }

  test("BPE expressions ≡ kernel + DuckDB-replay twin on corpus, codegen on") {
    import graft.functions.Bpe
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      // SQL-expressible twin of the replace()-chain oracle, run in SPARK:
      // bracket-delimit each word's chars, apply merges in rank order
      val replay = Bpe.PlantedMerges.foldLeft(
        regexp_replace(col("w"), "(.)", "[$1]")) {
        case (acc, (l, r)) => regexp_replace(acc, s"\\[$l\\]\\[$r\\]", s"[$l$r]")
      }
      val perWord = docs
        .select(explode(T.tokenize(col("text"))).as("w"))
        .select(col("w"),
          Bpe.countTokens(array(col("w"))).as("k"),
          (length(replay) - length(regexp_replace(replay, "\\[", "")))
            .cast("long").as("r"))
      val bad = perWord.where(not(col("k") <=> col("r")))
      assert(bad.count() == 0,
        s"kernel must equal the replace-chain replay: ${bad.take(5).toSeq}")
      // count over the word array == sum of per-word encodes
      val agg = docs.select(
          Bpe.countTokens(T.tokenize(col("text"))).as("n"),
          aggregate(transform(T.tokenize(col("text")),
              w => size(Bpe.encodeWord(w)).cast("long")),
            lit(0L), (a, x) => a + x).as("m"))
        .where(not(col("n") <=> col("m")))
      assert(agg.count() == 0, "array count must equal summed per-word encodes")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("count-min sketch: est >= true, exact without collisions, merge-invariant") {
    import graft.functions.Sketches
    val depth = 4; val width = 64
    // planted heavy hitter: 'hot' ×50 among 10 singleton tokens
    val toks = (Seq.fill(50)("hot") ++ (0 until 10).map(i => s"t$i"))
    val df = toks.toDF("token")
    def estimates(d: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val sk = d.agg(Sketches.countMinAgg(col("token"), depth, width).as("sk"))
      d.distinct().crossJoin(sk).select(col("token"),
          least((0 until depth).map(r =>
            element_at(col("sk"),
              ((conv(substring(md5(concat(lit(s"$r:"), col("token"))), 1, 8),
                  16, 10).cast("long") % width) + r * width + 1).cast("int"))
          ): _*).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val est = estimates(df)
    val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(truth.forall { case (t, n) => est(t) >= n }, "CMS never undercounts")
    assert(est("hot") >= 50L && est("hot") <= 60L,
      s"heavy hitter estimate near truth, got ${est("hot")}")
    // merge path: partial buffers across 7 partitions must sum exactly
    assert(estimates(df.repartition(7)) == est, "merge-invariant")
    // empty input: zero matrix, estimates 0
    val empty = df.where(lit(false))
    val zeroSk = empty.agg(Sketches.countMinAgg(col("token"), depth, width))
      .collect()(0).getSeq[Long](0)
    assert(zeroSk.length == depth * width && zeroSk.forall(_ == 0L))
    intercept[IllegalArgumentException] {
      Sketches.countMinAgg(col("token"), 0, width)
    }
  }

  test("kmvAgg: exact below capacity, partition-invariant, intersection exact regime") {
    import graft.functions.Sketches
    // 500 distinct keys, k = 1024 → the sketch IS the distinct hash set
    val keys = (1L to 500L).flatMap(i => Seq(i, i)).toDF("key") // dups collapse
    def run(df: org.apache.spark.sql.DataFrame) = df
      .agg(Sketches.kmvAgg(xxhash64(col("key")), 1024).as("sk"))
      .select(Sketches.kmvDistinct(col("sk"), 1024).as("d"), size(col("sk")).as("n"))
      .collect()(0)
    val r = run(keys)
    assert(r.getDouble(0) == 500.0 && r.getInt(1) == 500,
      s"below-capacity sketch must be exact: $r")
    assert(run(keys.repartition(13)).getDouble(0) == 500.0,
      "merge order must not change the sketch")
    // capacity regime: estimate within 3/sqrt(k) of truth on 50k distinct
    val big = (1L to 50000L).toDF("key")
      .agg(Sketches.kmvAgg(xxhash64(col("key")), 1024).as("sk"))
      .select(Sketches.kmvDistinct(col("sk"), 1024).as("d")).collect()(0).getDouble(0)
    assert(math.abs(big - 50000.0) / 50000.0 < 3.0 / math.sqrt(1024.0),
      s"capacity-regime estimate off: $big")
    // intersection, exact regime: |{1..300} ∩ {201..500}| = 100
    val a = (1L to 300L).toDF("key")
      .agg(Sketches.kmvAgg(xxhash64(col("key")), 1024).as("a"))
    val b = (201L to 500L).toDF("key")
      .agg(Sketches.kmvAgg(xxhash64(col("key")), 1024).as("b"))
    val inter = a.crossJoin(b)
      .select(Sketches.kmvIntersect(col("a"), col("b"), 1024).as("i"))
      .collect()(0).getDouble(0)
    assert(inter == 100.0, s"exact-regime intersection must be exact: $inter")
  }
}
