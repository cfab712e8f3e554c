package graft

import graft.functions.{TextFunctions => T}
import graft.operators.MinHashLSH
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH => MLMinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation against Spark MLlib's independent MinHashLSH
  * (SURVEY.md §7.6): both engines, fed the same shingle sets, must agree on
  * the planted near-duplicate pairs. Guards against a systematic bias in
  * our hashing/banding that the DuckDB oracle (which shares our hash
  * definitions) could not catch.
  */
class MLlibInteropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted near-dup pairs agree with MLlib MinHashLSH") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // ours: signature-jaccard >= 0.5
    val ours = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4, numRows = 4,
        bucketHexLen = 2))
      .fit(docs, "doc_id", "text")
    val ourPairs = ours.approxSimilarityJoin(0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // MLlib: jaccard *distance* <= 0.5 over hashed shingle-set vectors
    val sh = docs.select(col("doc_id"), T.shingles(col("text"), 2).as("sh"))
      .where(size(col("sh")) > 0)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val feat = tf.transform(sh).cache()
    val ml = new MLMinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(1L)
    val mlModel = ml.fit(feat)
    val mlPairs = mlModel.approxSimilarityJoin(feat, feat, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .where(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ourPairs.nonEmpty && mlPairs.nonEmpty)
    // the strongly-planted duplicate families must be found by BOTH
    val core = ourPairs.intersect(mlPairs)
    assert(core.nonEmpty, s"no overlap: ours=${ourPairs.take(5)} ml=${mlPairs.take(5)}")
    assert(core.contains((0L, 50L)) || core.contains((0L, 82L)) || core.contains((50L, 82L)),
      s"dup family missing from agreement set: $core")
    // and the engines should mostly agree (both are approximations;
    // demand a majority overlap rather than equality)
    val overlap = core.size.toDouble / math.max(ourPairs.size, mlPairs.size)
    assert(overlap >= 0.5, s"pair-set agreement only $overlap (ours=${ourPairs.size}, ml=${mlPairs.size})")
    ours.unpersist()
    feat.unpersist()
  }
}
