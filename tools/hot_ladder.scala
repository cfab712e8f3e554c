// Hot-bucket cap — BYTES evidence (the plan half lives in
// PlanPropertiesSpec "hot buckets never reach the posting scan"). Build
// the adversarial corpus (sf0.1 documents, a third replaced by one shared
// boilerplate paragraph) twice: once WITH occupancy stats (threshold
// N/10) and once without. Serve the same composite query (boiler + doc-0
// prefix; 2 of its 4 buckets are hot) from both tables and report the
// INPUT bytes and files the serve actually read (task input metrics via
// listener). Expected: the capped table's serve reads only the live
// buckets' directories — input bytes drop by roughly the hot buckets'
// share of the probe (the boiler directories hold ~N/3 postings each).
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/hot_ladder_wh \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/hot_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object HMeter { @volatile var bytes = 0L; @volatile var recs = 0L; def reset(): Unit = { bytes = 0L; recs = 0L } }

class HListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { HMeter.bytes += m.inputMetrics.bytesRead; HMeter.recs += m.inputMetrics.recordsRead } } }

spark.sparkContext.addSparkListener(new HListener)

import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

val boiler = "terms and conditions apply all rights reserved unauthorized reproduction of this document or any portion thereof is strictly prohibited please refer to the licensing agreement for further details about permitted use storage transmission and distribution of the enclosed material in any medium the publisher assumes no responsibility for errors or omissions and makes no warranty express or implied regarding fitness for a particular purpose"

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text"))

val planted = docs.select(col("id"), when(col("id") % 3 === 0, lit(boiler)).otherwise(col("text")).as("text")).localCheckpoint()

val n = planted.count()

val m = new MinHashLSH(cfg).fit(planted, "id", "text")

val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids"))

IndexStore.reset(spark, "hot_capped")

IndexStore.reset(spark, "hot_uncapped")

IndexStore.saveInverted(ix, "hot_capped", prefixLen = 2, hotBucketThreshold = n / 10)

IndexStore.saveInverted(ix, "hot_uncapped", prefixLen = 2)

val key = boiler + " " + docs.where(col("id") === 0).select(substring(col("text"), 1, 60)).collect()(0).getString(0)

def serve(table: String): Unit = { HMeter.reset(); val r = MinHashLSH.annFromInvertedIndex(spark, table, planted, "id", "text", key, 10, cfg).collect(); println(f"SERVE table=$table%-14s topIds=${r.take(3).map(_.getLong(0)).mkString(",")} inputMB=${HMeter.bytes / 1e6}%.2f inputRecords=${HMeter.recs}%d") }

serve("hot_uncapped")

serve("hot_capped")

System.exit(0)
