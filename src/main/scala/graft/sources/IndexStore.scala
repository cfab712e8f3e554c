package graft.sources

import graft.Cols
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistent index storage, bucketed on the join key.
  *
  * At cluster scale the MinHash index is not rebuilt per session — it is
  * written once and joined against by every query. Storing both the index
  * and the id-keyed side bucketed by `id` (same bucket count) lets Spark
  * plan those equi-joins with NO shuffle exchange on either side: each
  * bucket file pair joins locally. This is the storage half of the
  * "co-locate joins via bucketing" scale design (PERF.md).
  */
object IndexStore {

  /** Write a DataFrame bucketed + sorted by `id` as a managed table. */
  def saveBucketed(df: DataFrame, table: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, Cols.Id)
      .sortBy(Cols.Id)
      .format("parquet")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
