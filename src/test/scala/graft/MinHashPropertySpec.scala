package graft

import graft.functions.{HashFunctions => H, TextFunctions => T}
import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

/** Property tests (SURVEY.md §5.2): statistical and structural invariants of
  * the MinHash/LSH kernels, checked against an independent plain-Scala
  * computation of exact set Jaccard.
  */
object MinHashPropertySpec extends Properties("MinHashLSH") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = TestSpark.spark

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
  private val docGen: Gen[List[String]] =
    Gen.chooseNum(4, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))

  private def exactShingleJaccard(a: List[String], b: List[String]): Double = {
    val sa = a.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    val sb = b.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    if ((sa ++ sb).isEmpty) 1.0 else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private def estimate(a: List[String], b: List[String], h: Int): Double = {
    import spark.implicits._
    val df = Seq((a.mkString(" "), b.mkString(" "))).toDF("ta", "tb")
      .select(
        H.minhashMd5(T.shingles(col("ta"), 2), h).as("sa"),
        H.minhashMd5(T.shingles(col("tb"), 2), h).as("sb"))
      .select(H.signatureJaccard(col("sa"), col("sb")).as("j"))
    df.collect()(0).getFloat(0).toDouble
  }

  property("estimate tracks exact set jaccard within 3/sqrt(H), H=64") =
    forAll(docGen, docGen) { (a, b) =>
      val exact = exactShingleJaccard(a, b)
      val est = estimate(a, b, 64)
      math.abs(est - exact) <= 3.0 / math.sqrt(64.0) + 1e-9
    }

  property("identical docs: jaccard 1.0 and identical buckets") =
    forAll(docGen) { a =>
      import spark.implicits._
      val r = Seq(Tuple1(a.mkString(" "))).toDF("t")
        .select(H.minhashMd5(T.shingles(col("t"), 2), 16).as("s"))
        .select(H.signatureJaccard(col("s"), col("s")).as("j"),
          H.bandBucketsMd5(col("s"), 4, 4, 4).as("b1"),
          H.bandBucketsMd5(col("s"), 4, 4, 4).as("b2"))
        .collect()(0)
      r.getFloat(0) == 1.0f && r.getSeq[String](1) == r.getSeq[String](2)
    }

  property("signature invariant under shingle order") =
    forAll(docGen) { a =>
      import spark.implicits._
      val r = Seq(Tuple1(a.mkString(" "))).toDF("t")
        .select(T.shingles(col("t"), 2).as("sh"))
        .select(H.minhashMd5(col("sh"), 16).as("s1"),
          H.minhashMd5(reverse(col("sh")), 16).as("s2"))
        .collect()(0)
      r.getSeq[String](0) == r.getSeq[String](1)
    }

  property("fast-mode bucket ids within [0, numBuckets)") =
    forAll(docGen) { a =>
      import spark.implicits._
      val r = Seq(Tuple1(a.mkString(" "))).toDF("t")
        .select(H.minhashXxFromBases(
          H.baseHashesXx(T.shingles(col("t"), 2)), 16).as("s"))
        .select(H.bandBucketsXx(col("s"), 4, 4, 500).as("b"))
        .collect()(0)
      r.isNullAt(0) || r.getSeq[Int](0).forall(v => v >= 0 && v < 500)
    }

  private def exactWeightedJaccard(a: List[String], b: List[String]): Double = {
    def tf(d: List[String]) = d.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      .toList.groupBy(identity).view.mapValues(_.size).toMap
    val (ta, tb) = (tf(a), tf(b))
    val keys = ta.keySet ++ tb.keySet
    val num = keys.toList.map(k => math.min(ta.getOrElse(k, 0), tb.getOrElse(k, 0))).sum
    val den = keys.toList.map(k => math.max(ta.getOrElse(k, 0), tb.getOrElse(k, 0))).sum
    if (den == 0) 1.0 else num.toDouble / den
  }

  property("weighted estimate tracks exact weighted jaccard within 3/sqrt(H), H=64") =
    forAll(docGen, docGen) { (a, b) =>
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text")
      // tf-weighted signatures exactly as Dedup.weightedMinhashPairs builds them
      val sigs = docs
        .select(col("doc_id"),
          posexplode(T.kShinglesAll(T.tokenize(col("text")), 2)).as(Seq("pos", "g")))
        .withColumn("occ", row_number().over(
          Window.partitionBy("doc_id", "g").orderBy("pos")) - 1)
        .select(col("doc_id"), concat(col("g"), lit("#"), col("occ")).as("tg"))
        .groupBy("doc_id")
        .agg(graft.functions.MinHashAgg.minhashMd5Agg(col("tg"), 64).as("sig"))
      val est = sigs.where(col("doc_id") === 1).select(col("sig").as("sa"))
        .crossJoin(sigs.where(col("doc_id") === 2).select(col("sig").as("sb")))
        .select(H.signatureJaccard(col("sa"), col("sb")).as("j"))
        .collect()(0).getFloat(0).toDouble
      math.abs(est - exactWeightedJaccard(a, b)) <= 3.0 / math.sqrt(64.0) + 1e-9
    }

  property("containment >= jaccard and within [0,1]") =
    forAll(docGen, docGen) { (a, b) =>
      import spark.implicits._
      val r = Seq((a.mkString(" "), b.mkString(" "))).toDF("ta", "tb")
        .select(T.shingles(col("ta"), 2).as("sa"), T.shingles(col("tb"), 2).as("sb"))
        .select(
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            least(size(col("sa")), size(col("sb")))).as("cont"),
          graft.functions.ArrayKernels.setJaccard(col("sa"), col("sb")).as("jac"))
        .collect()(0)
      val (cont, jac) = (r.getDouble(0), r.getDouble(1))
      cont >= jac - 1e-12 && cont >= 0.0 && cont <= 1.0 + 1e-12
    }

  property("bm25: every score positive; a doc repeating a query token outranks one without it") =
    Prop.secure {
      import spark.implicits._
      val docs = Seq(
        (1L, "alpha beta alpha beta alpha"),
        (2L, "gamma delta epsilon zeta eta"),
        (3L, "alpha gamma delta zeta eta")).toDF("id", "text")
      val scores = graft.operators.TextSearch.bm25Scores(docs, "id", "text", "alpha beta")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      scores.values.forall(_ > 0) &&
        !scores.contains(2L) && // no query token → no score row
        scores(1L) > scores(3L) // more matching mass ranks higher
    }

  property("tagOccurrences: tag SET is permutation-invariant; sizes preserved") =
    forAll(docGen) { tokens =>
      // weighted-MinHash correctness rests on exactly this: the tag SET
      // {g#0..g#(tf-1)} depends only on per-element counts, never on order
      import spark.implicits._
      def tags(ts: List[String]): Seq[String] =
        Seq(Tuple1(ts)).toDF("a")
          .select(graft.functions.ArrayKernels.tagOccurrences(col("a")).as("t"))
          .collect()(0).getSeq[String](0)
      val t1 = tags(tokens)
      val t2 = tags(scala.util.Random.shuffle(tokens))
      t1.size == tokens.size && t1.toSet == t2.toSet && t1.distinct.size == t1.size
    }

  property("xxh128 spec port ≡ openhft on random content and lengths") =
    forAll(Gen.chooseNum(0, 512), Gen.chooseNum(Long.MinValue, Long.MaxValue)) {
      (len, seedSrc) =>
        val seed = seedSrc % 1000
        val rnd = new scala.util.Random(seedSrc)
        val bytes = new Array[Byte](len)
        rnd.nextBytes(bytes)
        val expect = shaded.parquet.net.openhft.hashing.LongTupleHashFunction
          .xx128(seed).hashBytes(bytes)
        val (lo, hi) = graft.functions.XxHashKernel.xxh128(bytes, 0, len, seed)
        lo == expect(0) && hi == expect(1)
    }

  property("index deterministic across partitionings") = Prop.secure {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4, numRows = 4))
    def run(parts: Int): Set[(Long, Seq[String])] = {
      val m = lsh.fit(docs.repartition(parts), "doc_id", "text")
      val out = m.indexDf.collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).toSet
      m.unpersist()
      out
    }
    run(1) == run(7)
  }
}
