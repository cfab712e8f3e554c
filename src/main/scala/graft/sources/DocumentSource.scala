package graft.sources

import graft.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document ingestion (reference `read_from_txt`,
  * /root/reference/src/minhash_pyspark.py:449-477): one document per line,
  * synthetic unique id, optional corpus trim — plus the parquet path the
  * verification harness uses.
  */
object DocumentSource {

  /** Line-per-document text scan: `id` from monotonically_increasing_id
    * (unique and increasing, NOT consecutive under partitioning — the
    * reference documents the same caveat, minhash_pyspark.py:454-455).
    * Blank lines are kept, matching `spark.read.text` semantics (the
    * reference's pandas twin drops them — a documented twin divergence,
    * SURVEY.md §7.5).
    */
  def readText(spark: SparkSession, path: String, trim: Int = 0): DataFrame = {
    val base = spark.read.text(path)
      .withColumn(Cols.Id, monotonically_increasing_id())
    val trimmed = if (trim > 0) base.limit(trim) else base
    trimmed.withColumnRenamed("value", Cols.Text).select(Cols.Id, Cols.Text)
  }

  /** Parquet documents table (driver testdata layout): stable stored ids —
    * preferred over synthetic ids for oracle-checkable results.
    */
  def readParquet(spark: SparkSession, path: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    spark.read.parquet(path)
      .select(col(idCol).cast("long").as(Cols.Id), col(textCol).as(Cols.Text))
}
