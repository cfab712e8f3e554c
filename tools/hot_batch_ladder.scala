// BATCH hot-bucket cap — bytes + recall evidence (the gate half lives in
// ann_batch_hotcap). Same adversarial corpus as tools/hot_ladder.scala
// (sf0.1, a third of the docs replaced by one shared boilerplate
// paragraph), served as a 60-query BATCH through the pruned batch path
// with skipHotBuckets off vs on. Report (a) the input bytes/records the
// posting scan read — capped probes never list the boiler buckets'
// postings — and (b) per-workload recall of the capped top-5 vs the
// uncapped top-5 (boiler queries fall back to their full probe set, so
// their recall is 1 by construction; mixed queries trade the stop-word
// bucket's candidates for the read bound).
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/hot_batch_wh \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/hot_batch_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object BMeter { @volatile var bytes = 0L; @volatile var recs = 0L; def reset(): Unit = { bytes = 0L; recs = 0L } }

class BListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { BMeter.bytes += m.inputMetrics.bytesRead; BMeter.recs += m.inputMetrics.recordsRead } } }

spark.sparkContext.addSparkListener(new BListener)

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

IndexStore.reset(spark, "hotb_capped")

IndexStore.saveInverted(m.indexDf.select(col("id"), col("signature"), col("bucket_ids")), "hotb_capped", prefixLen = 2, hotBucketThreshold = n / 10)

println("HOT_LIST_SIZE=" + IndexStore.hotBuckets(spark, "hotb_capped").size)

// two workloads: MIXED (non-boiler queries — the cap's read bound shows:
// no query needs the hot buckets, so capped probes never list them) and
// WITHBOILER (a third of the queries are all-hot — their per-query
// fallback re-probes the hot buckets, so the batch read does NOT drop;
// the cap is a per-query policy, not a batch guarantee)
val qsMixed = planted.where(col("id") < 90 && col("id") % 3 =!= 0).select(col("id").as("qid"), col("text")).localCheckpoint()

val qsBoiler = planted.where(col("id") < 90).select(col("id").as("qid"), col("text")).localCheckpoint()

def serve(qs: org.apache.spark.sql.DataFrame, skip: Boolean): (Map[Long, Set[Long]], Long, Long) = { m.releaseQueryCaches(); BMeter.reset(); val r = m.approxNearestNeighborsAllIndexedPruned("hotb_capped", qs, "qid", "text", 5, skipHotBuckets = skip).collect(); Thread.sleep(2000); (r.groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }, BMeter.bytes, BMeter.recs) }

def workload(tag: String, qs: org.apache.spark.sql.DataFrame): Unit = { val unc = serve(qs, false); val cap = serve(qs, true); val recalls = unc._1.keys.toSeq.sorted.map { q => (q, cap._1.getOrElse(q, Set.empty[Long]).intersect(unc._1(q)).size.toDouble / unc._1(q).size) }; println(f"BATCH $tag uncapped inputMB=${unc._2 / 1e6}%.2f records=${unc._3}%d"); println(f"BATCH $tag capped   inputMB=${cap._2 / 1e6}%.2f records=${cap._3}%d"); println(f"RECALL $tag min=${recalls.map(_._2).min}%.2f avg=${recalls.map(_._2).sum / recalls.size}%.2f queries=${recalls.size}%d below1=${recalls.count(_._2 < 1.0)}%d") }

workload("mixed", qsMixed)

workload("withboiler", qsBoiler)

System.exit(0)
