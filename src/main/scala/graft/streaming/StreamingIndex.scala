package graft.streaming

import graft.{Cols, MinHashConfig}
import graft.operators.MinHashLSH
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Incremental corpus ingestion (SURVEY.md §7.6 north star): because the
  * direct-mode featurize pipeline is a pure per-row projection (no global
  * vocabulary, no shuffle), the same expressions run unchanged over a
  * Structured Streaming source — each micro-batch of new documents is
  * signed and bucketed as it arrives and appended to the index sink.
  */
object StreamingIndex {

  /** Streaming featurize over a parquet document directory. Direct mode
    * only: the vocabulary path needs a global sort and is inherently batch
    * (the reference rebuilds its whole index on ingest for the same reason).
    */
  def incrementalIndex(spark: SparkSession, dir: String, schema: StructType,
      cfg: MinHashConfig = MinHashConfig(), idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(!cfg.useVocabulary, "streaming ingestion requires direct (vocabulary-free) mode")
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col(idCol).cast("long").as(Cols.Id), col(textCol).as(Cols.Text))
    new MinHashLSH(cfg)
      .featurize(stream, Cols.Id, Cols.Text, None)
      .select(Cols.Id, Cols.Signature, Cols.BucketIds)
  }
}
