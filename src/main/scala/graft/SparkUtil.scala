package graft

import org.apache.spark.sql.DataFrame

object SparkUtil {
  /** Ensure a scan has at least the session's default parallelism. Local
    * single-parquet-file inputs plan as 1-2 partitions, serializing every
    * downstream narrow pipeline; at cluster scale inputs arrive pre-split
    * and this is a no-op (never reduces partitioning).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
