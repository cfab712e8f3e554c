// Entity-resolution scale ladder: both blocking strategies at 1x/3x/10x
// (50k→500k records, 20% planted dirty twins). Claims proven per rung:
// (a) blockedFuzzyMatch's candidate volume is Σ|block|² with the block
// size FIXED by the key length (10 clean records per block here), so
// shuffle bytes per record stay flat; (b) sortedNeighborhoodMatch's pair
// volume is exactly n·w by construction — per-record bytes flat and
// independent of key distribution. Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/er_ladder.scala <<< ":quit"
//
// Prints one JSON line per rung. NOTE: spark-shell -I compiles
// statement-by-statement — every val below must stay a ONE-LINER.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object ErMeter { @volatile var w = 0L; def reset(): Unit = { w = 0L } }

class ErListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { ErMeter.w += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new ErListener)

// clean names rec%09d; every 5th record also gets a dirty 'Q'-appended twin
def plantRecords(n: Long) = { val clean = spark.range(n).select(col("id").as("rid"), format_string("rec%09d", col("id")).as("rname")); val dirty = spark.range(0, n, 5).select((col("id") + 100000000L).as("rid"), concat(format_string("rec%09d", col("id")), lit("Q")).as("rname")); clean.union(dirty) }

for (mult <- Seq(1, 3, 10)) { val n = 50000L * mult; val recs = plantRecords(n).repartition(32).persist(); val nR = recs.count(); ErMeter.reset(); val t0 = System.nanoTime(); val bm = graft.operators.Dedup.blockedFuzzyMatch(recs, recs.select(col("rid").as("cid"), col("rname").as("cname")), "rid", "rname", "cid", "cname", 11, 2).count(); val bmSec = (System.nanoTime() - t0) / 1e9; val bmW = ErMeter.w; graft.SparkUtil.releaseScopedCaches(); ErMeter.reset(); val t1 = System.nanoTime(); val sn = graft.operators.Dedup.sortedNeighborhoodMatch(recs, "rid", "rname", 3, 2).count(); val snSec = (System.nanoTime() - t1) / 1e9; val snW = ErMeter.w; graft.SparkUtil.releaseScopedCaches(); println(f"""{"ladder":$mult,"records":$nR,"blocked_matches":$bm,"blocked_sec":$bmSec%.2f,"blocked_bytes_per_rec":${bmW.toDouble / nR}%.1f,"sn_matches":$sn,"sn_sec":$snSec%.2f,"sn_bytes_per_rec":${snW.toDouble / nR}%.1f}"""); recs.unpersist() }

System.exit(0)
