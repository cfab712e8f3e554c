package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingestion path (post-parity extension, SURVEY.md
  * §7.6): windowed event aggregation with watermarking, plus its exact
  * batch twin (same expressions) for oracle checking.
  */
object EventStream {

  /** Batch twin of the streaming aggregation — tumbling 1-hour windows.
    * Decimal sum so results are order-independent (bit-stable under any
    * partitioning / oracle engine).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("total_value"))

  /** The same aggregation as a streaming query over a parquet directory,
    * with a 2-hour watermark for late data. Caller starts/stops it (tests
    * use the memory sink + processAllAvailable).
    */
  def streamingTumblingCounts(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("total_value"))
}
