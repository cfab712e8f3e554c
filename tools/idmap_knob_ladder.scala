// idMapBuckets knob ladder: the O(delta) compaction decision reads
// ≤ (delta's touched partitions / idMapBuckets) of the narrow id-map, so
// the knob bounds the decision read the way prefixLen bounds a point
// query — this ladder MEASURES that claim (PERF.md cites it): the same
// base corpus + the same 5-doc delta against three tables differing only
// in idMapBuckets. Expect decision bytes/records ~ inversely proportional
// to the knob until the per-partition floor (footers, row-group minimums).
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/idmap_knob_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/idmap_knob_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 4)

val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text"))

val reps = spark.range(0, 20).select(col("id").as("rep"))

val docs = d0.crossJoin(reps).select((col("id") + col("rep") * 1000000L).as("id"), concat(col("text"), lit(" rep "), col("rep")).as("text")).localCheckpoint()

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

class KListener extends org.apache.spark.scheduler.SparkListener { val byDesc = new scala.collection.concurrent.TrieMap[String, (Long, Long)](); val stageDesc = new scala.collection.concurrent.TrieMap[Int, String](); override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { val d = Option(js.properties.getProperty("spark.job.description")).getOrElse(""); js.stageInfos.foreach(si => stageDesc.put(si.stageId, d)) }; override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = { val d = stageDesc.getOrElse(s.stageInfo.stageId, ""); val m = s.stageInfo.taskMetrics; val prev = byDesc.getOrElse(d, (0L, 0L)); byDesc.put(d, (prev._1 + m.inputMetrics.bytesRead, prev._2 + m.inputMetrics.recordsRead)) } }

val kl = new KListener

spark.sparkContext.addSparkListener(kl)

val base = feat(docs, 1L)

val delta = feat(docs.orderBy("id").limit(5).select(col("id"), concat(lit("corrected "), col("text")).as("text")).localCheckpoint(), 2L)

def rung(buckets: Int): Unit = { val table = s"idmap_knob_$buckets"; IndexStore.reset(spark, table); IndexStore.saveInverted(base, table, prefixLen = 3, idMapBuckets = buckets); IndexStore.appendInverted(delta, table); kl.byDesc.clear(); val t0 = System.nanoTime(); IndexStore.compactInverted(spark, table); val secs = (System.nanoTime() - t0) / 1e9; Thread.sleep(3000); val dec = kl.byDesc.getOrElse("graft-compact-decision", (0L, 0L)); println(f"RUNG idMapBuckets=$buckets%5d decisionBytes=${dec._1}%12d decisionRecords=${dec._2}%10d compactSecs=$secs%.1f") }

rung(8)

rung(64)

rung(512)

System.exit(0)
