// Persistent-catalog (Derby) serving lifecycle — JVM A of the pair.
// The in-memory catalog the test suites use forgets tables between JVMs;
// spark-shell on this image runs the HIVE catalog over an embedded Derby
// metastore (metastore_db/ in cwd), the deployment shape where a catalog
// actually SURVIVES across sessions. This drive runs the full serving
// lifecycle under it — save → append (meta-derived layout) → tombstone →
// partition-scoped compact → serve — with NO MSCK anywhere: the compaction
// swaps directory contents in place, so catalog partition locations never
// go stale under either catalog implementation.
//
// Run both JVMs from ONE scratch cwd (shared metastore_db + warehouse):
//
//   cd /tmp/derby_drive && /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=8 \
//     --conf spark.sql.warehouse.dir=/tmp/derby_drive/wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/derby_serving_drive.scala <<< ":quit"
//   # then derby_serving_drive2.scala the same way (fresh JVM, same cwd)
//
// PASS criteria printed as DERBY_* lines; JVM B must print rows identical
// to JVM A's DERBY_SERVE line.
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text"))

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

val table = "derby_serving_lifecycle"

IndexStore.reset(spark, table)

val prelim = docs.select(col("id"), when(col("id") % 5 === 0, concat(lit("draft "), col("text"))).otherwise(col("text")).as("text"))

IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 2)

IndexStore.appendInverted(feat(docs.where(col("id") % 5 === 0), 2), table)

IndexStore.appendTombstones(spark, table, spark.range(0, 1).select(lit(82L).as("id")), seq = 3L)

IndexStore.compactInverted(spark, table)

println("DERBY_META=" + IndexStore.readMeta(spark, table))

println("DERBY_COUNT=" + spark.table(table).where(col("bkt_pfx") =!= IndexStore.TombstonePrefix).count())

val key = docs.where(col("id") === 0).select(substring(col("text"), 1, 120)).collect()(0).getString(0)

val served = MinHashLSH.annFromInvertedIndex(spark, table, docs.where(col("id") =!= 82L), "id", "text", key, 5, cfg).select(col("id"), col("jaccard")).collect.toSeq

println("DERBY_SERVE=" + served.mkString(","))

println("DERBY_DELETED_ABSENT=" + !served.exists(_.getLong(0) == 82L))

System.exit(0)
