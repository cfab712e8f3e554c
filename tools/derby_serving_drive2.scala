// Persistent-catalog (Derby) serving lifecycle — JVM B: a FRESH process
// answering from the catalog + warehouse JVM A left behind (run from the
// same cwd; see derby_serving_drive.scala for the invocation). Unlike the
// in-memory-catalog cold start (which falls back to a direct directory
// read), here spark.catalog.tableExists is TRUE across JVMs and
// loadInverted takes the catalog branch — the partition metadata written
// by save/append/compact must therefore be correct on its own, with no
// MSCK repair. The DERBY_SERVE2 line must equal JVM A's DERBY_SERVE.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text"))

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

val table = "derby_serving_lifecycle"

println("DERBY_TABLE_SURVIVES=" + spark.catalog.tableExists(table))

println("DERBY_META2=" + IndexStore.readMeta(spark, table))

val key = docs.where(col("id") === 0).select(substring(col("text"), 1, 120)).collect()(0).getString(0)

val served = MinHashLSH.annFromInvertedIndex(spark, table, docs.where(col("id") =!= 82L), "id", "text", key, 5, cfg).select(col("id"), col("jaccard")).collect.toSeq

println("DERBY_SERVE2=" + served.mkString(","))

System.exit(0)
