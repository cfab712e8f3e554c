package graft

import graft.operators.MinHashLSH
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end index + ANN behavior on the sf0.001 documents table
  * (golden structure per FIXTURES.md §A.4: exact-member query returns
  * itself at jaccard 1.0 and top-1).
  */
class MinHashLSHSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def keyText: String =
    docs.where(docs("doc_id") === 0).select("text").collect()(0).getString(0)

  test("direct md5 mode: exact-member ANN returns the source doc at 1.0") {
    val model = new MinHashLSH(MinHashConfig(numHash = 32, numBands = 8, numRows = 4))
      .fit(docs, idCol = "doc_id", textCol = "text")
    val top = model.approxNearestNeighbors(keyText, 5).collect()
    assert(top.nonEmpty)
    assert(top(0).getLong(0) == 0L)
    assert(math.abs(top(0).getFloat(2) - 1.0f) < 1e-6)
    assert(top.length <= 5)
    // scores non-increasing
    val scores = top.map(_.getFloat(2)).toSeq
    assert(scores == scores.sorted.reverse)
    model.unpersist()
  }

  test("vocab mode agrees with reference structure; xx fast mode runs") {
    val vocabModel = new MinHashLSH(MinHashConfig(numHash = 32, numBands = 8, numRows = 4,
      useVocabulary = true)).fit(docs, "doc_id", "text")
    assert(vocabModel.vocabulary.get.count() > 0)
    val topV = vocabModel.approxNearestNeighbors(keyText, 5).collect()
    assert(topV(0).getLong(0) == 0L && math.abs(topV(0).getFloat(2) - 1.0f) < 1e-6)
    vocabModel.unpersist()

    val fast = new MinHashLSH(MinHashConfig(numHash = 32, numBands = 8, numRows = 4,
      mode = XxFast)).fit(docs, "doc_id", "text")
    val topF = fast.approxNearestNeighbors(keyText, 5).collect()
    assert(topF(0).getLong(0) == 0L && math.abs(topF(0).getFloat(2) - 1.0f) < 1e-6)
    fast.unpersist()
  }

  test("append: incremental index ≡ one-shot fit on the full corpus") {
    import org.apache.spark.sql.functions._
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val first = docs.where(col("doc_id") < 300)
    val rest = docs.where(col("doc_id") >= 300)
    val m0 = new MinHashLSH(cfg).fit(first, "doc_id", "text")
    val incr = m0.append(rest, "doc_id", "text")
    val full = new MinHashLSH(cfg).fit(docs, "doc_id", "text")
    // bit-exact index equality (direct mode featurize is per-row pure)
    assert(incr.indexDf.count() == full.indexDf.count())
    assert(incr.indexDf.except(full.indexDf).isEmpty
      && full.indexDf.except(incr.indexDf).isEmpty)
    // and identical query answers
    val a = incr.approxNearestNeighbors(keyText.take(120), 5).collect().toSeq
    val b = full.approxNearestNeighbors(keyText.take(120), 5).collect().toSeq
    assert(a == b && a.nonEmpty)
    // vocabulary mode must refuse
    val vmodel = new MinHashLSH(cfg.copy(useVocabulary = true)).fit(first, "doc_id", "text")
    intercept[IllegalArgumentException] { vmodel.append(rest, "doc_id", "text") }
    Seq(m0, incr, full, vmodel).foreach(_.unpersist())
  }

  test("bucketThres filter with zero-result fallback") {
    val model = new MinHashLSH(MinHashConfig(numHash = 32, numBands = 8, numRows = 4))
      .fit(docs, "doc_id", "text")
    // impossible threshold → falls back to overlap-any (reference :296-306)
    val top = model.approxNearestNeighbors(keyText, 3, bucketThres = 1.1).collect()
    assert(top.nonEmpty && top(0).getLong(0) == 0L)
    model.unpersist()
  }

  test("save/load round-trip: loaded model answers queries identically") {
    val dir = java.nio.file.Files.createTempDirectory("model-io").toString
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4)
    val model = new MinHashLSH(cfg).fit(docs, "doc_id", "text")
    val before = model.approxNearestNeighbors(keyText, 5).collect().toSeq
    model.save(dir)
    model.unpersist()
    val loaded = MinHashLSH.loadModel(spark, dir)
    val after = loaded.approxNearestNeighbors(keyText, 5).collect().toSeq
    assert(after == before)
    loaded.unpersist()
  }

  test("approxSimilarityJoin finds no false self-pairs and respects threshold") {
    val model = new MinHashLSH(MinHashConfig(numHash = 32, numBands = 8, numRows = 4))
      .fit(docs.limit(200), "doc_id", "text")
    val pairs = model.approxSimilarityJoin(0.2).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getFloat(2) >= 0.2f))
    model.unpersist()
  }

  test("bbitSimilarityJoin: exact-dup pair saturates, estimate = 2·m/k − 1, long-packed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // doc 10_000 is a verbatim copy of doc 0 → identical signatures →
    // every low bit matches; unrelated pairs estimate below 1
    val planted = docs.limit(100).unionByName(
      docs.where(col("doc_id") === 0)
        .select(lit(10000L).as("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
    val model = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4,
      numRows = 4, bucketHexLen = 2)).fit(planted, "doc_id", "text")
    val rows = model.bbitSimilarityJoin(-1.0).collect()
    val dup = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 10000L)
    assert(dup.isDefined, "the exact duplicate must be a candidate pair")
    assert(dup.get.getLong(2) == 16L && dup.get.getDouble(3) == 1.0)
    rows.foreach { r =>
      val m = r.getLong(2)
      assert(r.getDouble(3) == (2.0 * m - 16) / 16, s"estimator drift: $r")
      assert(r.getLong(0) < r.getLong(1))
    }
    // the LONG-signature branch (xx-fast mode, h & 1 instead of hex
    // parity): the same exact duplicate must saturate there too
    val modelXx = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4,
      numRows = 4, bucketHexLen = 2, mode = XxFast)).fit(planted, "doc_id", "text")
    val dupXx = modelXx.bbitSimilarityJoin(-1.0).collect()
      .find(r => r.getLong(0) == 0L && r.getLong(1) == 10000L)
    assert(dupXx.isDefined && dupXx.get.getLong(2) == 16L &&
      dupXx.get.getDouble(3) == 1.0, s"xx-mode exact dup must saturate: $dupXx")
    modelXx.unpersist()
    // cross-check the packed-bit scores against the full-signature
    // agreement on the SAME pairs: m/k must never disagree with the
    // k-element agreement by construction bits (1-bit projection of equal
    // elements always matches; unequal elements match with prob ~1/2)
    val full = model.approxSimilarityJoin(0.0)
      .select(col("a_id"), col("b_id"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getFloat(2)).toMap
    rows.foreach { r =>
      full.get((r.getLong(0), r.getLong(1))).foreach { j =>
        assert(r.getLong(2) >= math.round(j * 16),
          s"matched bits below full-signature agreement: $r vs $j")
      }
    }
    model.unpersist()
  }
}
