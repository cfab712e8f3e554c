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

  /** Append a micro-batch to a bucketed index table (the streaming
    * ingestion sink shape): every append lands new small files in each
    * bucket, preserving the shuffle-free join property but growing the
    * file count linearly with append cadence — [[compact]] is the
    * maintenance step that bounds it.
    */
  def appendBucketed(df: DataFrame, table: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, Cols.Id)
      .sortBy(Cols.Id)
      .format("parquet")
      .saveAsTable(table)

  /** Compact an append-log index table: drop superseded signatures (for
    * each id keep the row with the highest `seqCol` — later re-ingests of
    * a changed document supersede earlier ones) and merge each bucket's
    * small append files into ONE file (repartition by the bucketing key
    * with `buckets` tasks aligns writer tasks to buckets, so the rewritten
    * table holds exactly `buckets` data files).
    *
    * The rewrite stages through a temp table because Spark refuses to
    * overwrite a table referenced by the plan being written. At cluster
    * scale the second write is a catalog-pointer swap instead; the data
    * movement (one decision-sized shuffle keyed on id, max_by per id —
    * signatures ride it once) is the same.
    */
  def compact(spark: SparkSession, table: String, buckets: Int,
      seqCol: String = "ingest_seq"): Unit = {
    import org.apache.spark.sql.functions._
    val cur = spark.table(table)
    require(cur.columns.contains(seqCol),
      s"compact needs the append-sequence column '$seqCol'")
    val others = cur.columns.toSeq.filterNot(c => c == Cols.Id || c == seqCol)
    val winner = cur.groupBy(col(Cols.Id))
      .agg(max_by(struct((seqCol +: others).map(col): _*), col(seqCol)).as("__w"))
      .select(col(Cols.Id) +: (seqCol +: others).map(c => col(s"__w.$c").as(c)): _*)
      .repartition(buckets, col(Cols.Id))
    val tmp = table + "_compact_tmp"
    saveBucketed(winner, tmp, buckets)
    saveBucketed(
      spark.table(tmp).repartition(buckets, col(Cols.Id)), table, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
  }

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
