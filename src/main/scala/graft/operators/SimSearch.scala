package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column. */
object SimSearch {

  /** Brute-force cosine top-k against the vector of `queryId` — the exact
    * baseline. The 1-row query side is broadcast; the scan side stays
    * columnar-parallel (no shuffle, TakeOrderedAndProject top-k).
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("q_v"))
    graft.SparkUtil.ensureParallelism(emb).crossJoin(broadcast(q))
      .withColumn("cosine", V.cosine(col(vecCol), col("q_v")))
      .where(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("id"), col("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** Sign-quantizer-bucketed top-k (IVF-style single-probe scale path):
    * only the query's own quantizer cell is scanned — at scale the bucket
    * column is a partition/cluster key, so the probe prunes input files
    * instead of scanning the corpus.
    */
  def cosineTopKBucketed(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val withB = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        V.signBucket(col(vecCol), nBits).as("bucket")))
    val q = withB.where(col("id") === queryId)
      .select(col("v").as("q_v"), col("bucket"))
    withB.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= queryId)
      .withColumn("cosine", V.cosine(col("v"), col("q_v")))
      .select(col("id"), col("bucket"), col("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** Multi-probe variant: additionally scans every quantizer cell at hamming
    * distance 1 from the query's cell (each single sign-bit flip). Vectors
    * near a quantization boundary land one bit away — probing the nBits+1
    * adjacent cells recovers most of the recall single-probe loses, still
    * scanning only (nBits+1)/2^nBits of the corpus.
    */
  def cosineTopKMultiProbe(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val withB = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        V.signBucket(col(vecCol), nBits).as("bucket")))
    val probeCols = col("bucket") +:
      (0 until nBits).map(d => col("bucket").bitwiseXOR(lit(1 << d)))
    val q = withB.where(col("id") === queryId)
      .select(col("v").as("q_v"), explode(array(probeCols: _*)).as("bucket"))
    withB.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= queryId)
      .withColumn("cosine", V.cosine(col("v"), col("q_v")))
      .select(col("id"), col("bucket"), col("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
