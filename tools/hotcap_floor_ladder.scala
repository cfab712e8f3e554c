// Hot-cap recall floor derivation — the number behind ann_batch_hotcap's
// gate floor. The gate runs the UNPRUNED batch path (approxNearest-
// NeighborsAllIndexed, skipHotBuckets on/off) over the planted boiler
// corpus (id % 3 == 0 -> one shared paragraph) with the gate's own query
// set (ids < 20: ~7 boiler + ~13 regular) at k = 5, and asserts a
// per-query recall floor vs the uncapped twin. This ladder measures that
// EXACT configuration across hot-threshold settings at sf0.01 and sf0.1,
// printing the per-query recall distribution — the gate's floor is the
// measured min at the shipped threshold (n/10) minus safety margin, not
// a guess.
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/hotcap_floor_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/hotcap_floor_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

// SparkEntry.hotBoiler verbatim (private[graft] — inlined like
// tools/hot_batch_ladder.scala does)
val boiler = "terms and conditions apply all rights reserved unauthorized reproduction of this document or any portion thereof is strictly prohibited please refer to the licensing agreement for further details about permitted use storage transmission and distribution of the enclosed material in any medium the publisher assumes no responsibility for errors or omissions and makes no warranty express or implied regarding fitness for a particular purpose"

def run(sf: String, div: Int): Unit = { val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text")); val planted = docs.select(col("id"), when(col("id") % 3 === 0, lit(boiler)).otherwise(col("text")).as("text")).localCheckpoint(); val n = planted.count(); val m = new MinHashLSH(cfg).fit(planted, "id", "text"); val table = s"hotcap_floor_${sf.replace(".", "_")}_$div"; IndexStore.reset(spark, table); IndexStore.saveInverted(m.indexDf.select(col("id"), col("signature"), col("bucket_ids")), table, prefixLen = 2, hotBucketThreshold = n / div); val hotSize = IndexStore.hotBuckets(spark, table).size; val qs = planted.where(col("id") < 20).select(col("id").as("qid"), col("text")); def top(skip: Boolean): Map[Long, Set[Long]] = { m.releaseQueryCaches(); m.approxNearestNeighborsAllIndexed(table, qs, "qid", "text", 5, skipHotBuckets = skip).collect().groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet } }; val unc = top(false); val cap = top(true); val recalls = unc.keys.toSeq.sorted.map { q => (q, cap.getOrElse(q, Set.empty[Long]).intersect(unc(q)).size.toDouble / unc(q).size) }; println(f"GATECFG sf=$sf%-7s threshold=n/$div%-3d hotListSize=$hotSize%3d min=${recalls.map(_._2).min}%.2f avg=${recalls.map(_._2).sum / recalls.size}%.2f below1=${recalls.count(_._2 < 1.0)}%2d of ${recalls.size}%2d  perQuery=${recalls.map { case (q, r) => f"$q:$r%.1f" }.mkString(",")}"); m.unpersist() }

for (sf <- Seq("sf0.01", "sf0.1")) { for (div <- Seq(20, 10, 5)) { run(sf, div) } }

System.exit(0)
