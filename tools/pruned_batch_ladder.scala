// Pruned vs unpruned batch serving — the CROSSOVER ladder. The pruned
// batch path (approxNearestNeighborsAllIndexedPruned) collects the
// workload's band buckets and turns them into partition/pushed literals,
// so a small batch reads only its matching directories; as the batch
// grows the probe set covers the prefix space and the advantage decays.
// This ladder measures BOTH axes on the sf0.1 index (256-directory
// prefix space): wall seconds (dominated by fixed job overhead at local
// test scale — the unpruned form wins throughout) and INPUT records/bytes
// (the axis that matters at 100 TB, where scan cost dominates: the
// pruned read starts ~20x smaller and converges into the unpruned read
// as the probe set saturates the prefix space). Cited in PERF.md.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/pruned_xover_wh \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/pruned_batch_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object XMeter { @volatile var bytes = 0L; @volatile var recs = 0L; def reset(): Unit = { bytes = 0L; recs = 0L } }

class XListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { XMeter.bytes += m.inputMetrics.bytesRead; XMeter.recs += m.inputMetrics.recordsRead } } }

import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text")).localCheckpoint()

spark.sparkContext.addSparkListener(new XListener)

val m = new MinHashLSH(cfg).fit(docs, "id", "text")

IndexStore.reset(spark, "xover_ix")

IndexStore.saveInverted(m.indexDf.select(col("id"), col("signature"), col("bucket_ids")), "xover_ix", prefixLen = 2)

def time(body: => Long): Double = { val t0 = System.nanoTime(); val n = body; val s = (System.nanoTime() - t0) / 1e9; require(n > 0); s }

def rung(batch: Int): Unit = { val qs = docs.where(col("id") < batch).select(col("id").as("qid"), col("text")).localCheckpoint(); m.releaseQueryCaches(); val w1 = time(m.approxNearestNeighborsAllIndexedPruned("xover_ix", qs, "qid", "text", 5).count()); m.releaseQueryCaches(); XMeter.reset(); val p = time(m.approxNearestNeighborsAllIndexedPruned("xover_ix", qs, "qid", "text", 5).count()); Thread.sleep(1500); val pB = XMeter.bytes; val pR = XMeter.recs; m.releaseQueryCaches(); val w2 = time(m.approxNearestNeighborsAllIndexed("xover_ix", qs, "qid", "text", 5).count()); m.releaseQueryCaches(); XMeter.reset(); val u = time(m.approxNearestNeighborsAllIndexed("xover_ix", qs, "qid", "text", 5).count()); Thread.sleep(1500); val uB = XMeter.bytes; val uR = XMeter.recs; println(f"RUNG batch=$batch%4d prunedSecs=$p%.2f unprunedSecs=$u%.2f prunedMB=${pB / 1e6}%.2f unprunedMB=${uB / 1e6}%.2f prunedRecs=$pR%8d unprunedRecs=$uR%8d") }

rung(5)

rung(25)

rung(100)

rung(250)

rung(500)

System.exit(0)
