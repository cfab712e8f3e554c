// Manifest-swap lifecycle under the PERSISTENT (Hive/Derby) catalog — the
// deployment shape SwapManifest requires: compaction never moves data
// files, each dirty partition's catalog entry flips to the new hidden
// generation directory (ALTER TABLE .. PARTITION .. SET LOCATION), the
// replaced directory survives one maintenance interval for in-flight
// readers, and a SECOND compaction garbage-collects it. Run from one
// scratch cwd like tools/derby_serving_drive.scala:
//
//   cd /tmp/derby_manifest && /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=8 \
//     --conf spark.sql.warehouse.dir=/tmp/derby_manifest/wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/derby_manifest_drive.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(col("doc_id").cast("long").as(graft.Cols.Id), col("text").as(graft.Cols.Text))

val m = new MinHashLSH(cfg).fit(dd, graft.Cols.Id, graft.Cols.Text)

def feat(pred: org.apache.spark.sql.Column, seq: Long) = m.indexDf.select(col(graft.Cols.Id), col(graft.Cols.Signature), col(graft.Cols.BucketIds)).where(pred).withColumn("ingest_seq", lit(seq))

val t = "derby_manifest_ix"

IndexStore.reset(spark, t)

IndexStore.saveInverted(feat(lit(true), 1L), t, prefixLen = 1, swapMode = IndexStore.SwapManifest)

IndexStore.appendInverted(feat(col(graft.Cols.Id) % 5 === 0, 2L), t)

val tableDir = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString))

val beforeDirs = tableDir.listFiles().map(_.getName).filter(_.startsWith("bkt_pfx=")).toSet

IndexStore.compactInverted(spark, t)

println("MANIFEST_GENS=" + tableDir.listFiles().map(_.getName).filter(_.startsWith("_gen")).mkString(","))

println("MANIFEST_OLD_RETAINED=" + tableDir.listFiles().map(_.getName).filter(_.startsWith("bkt_pfx=")).toSet.equals(beforeDirs))

val stale = spark.table(t).where(col(graft.Cols.Id) % 5 === 0 && col("ingest_seq") =!= 2).count()

println("MANIFEST_STALE_POSTCOMPACT=" + stale)

val key = dd.where(col(graft.Cols.Id) === 0).select(graft.Cols.Text).collect()(0).getString(0).take(120)

val serve = MinHashLSH.annFromInvertedIndex(spark, t, dd, graft.Cols.Id, graft.Cols.Text, key, 5, cfg).collect().map(r => s"[${r.getLong(0)},${r.getFloat(2)}]").mkString(",")

println("MANIFEST_SERVE=" + serve)

IndexStore.appendInverted(feat(col(graft.Cols.Id) % 7 === 0, 3L), t)

IndexStore.compactInverted(spark, t)

println("MANIFEST_GC_OK=" + !tableDir.listFiles().map(_.getName).filter(_.startsWith("bkt_pfx=")).toSet.equals(beforeDirs))

println("MANIFEST_SERVE2=" + MinHashLSH.annFromInvertedIndex(spark, t, dd, graft.Cols.Id, graft.Cols.Text, key, 5, cfg).collect().map(r => s"[${r.getLong(0)},${r.getFloat(2)}]").mkString(","))

System.exit(0)
