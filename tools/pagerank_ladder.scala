// PageRank scale ladder: synthetic 3-out-regular graphs (each node links
// to two pseudo-random neighbors plus node 0, a GLOBAL HUB of in-degree N
// — the hot-key surface) at N = 0.3M/1M/3M nodes, 3 exact-integer rounds.
// Pass criteria (PERF.md "Round 10"): per-round wall time and shuffle
// bytes grow ~linearly in |E|, and the hub does NOT bend the curve — the
// dst-keyed sum partial-aggregates map-side, so the hub adds one long per
// upstream partition, not one row per edge. Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/pagerank_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — every val below
// must stay a ONE-LINER (multi-line chains silently rebind).
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object PrMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class PrListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { PrMeter.read += m.shuffleReadMetrics.totalBytesRead; PrMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new PrListener)

for (n <- Seq(300000L, 1000000L, 3000000L)) { val nodes = spark.range(0L, n).select(col("id").as("src")); val edges = nodes.select(col("src"), explode(array(pmod(col("src") * 6364136223846793005L + 1442695040888963407L, lit(n)), pmod(col("src") * 2862933555777941757L + 3037000493L, lit(n)), lit(0L))).as("dst")).repartition(32).persist(); val ne = edges.count(); PrMeter.reset(); val t0 = System.nanoTime(); val r = graft.operators.Graphs.pageRank(edges, "src", "dst", iterations = 3); r.write.format("noop").mode("overwrite").save(); val sec = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder_nodes":$n,"edges":$ne,"sec":$sec%.2f,"shuffle_read_mb":${PrMeter.read / 1e6}%.1f,"shuffle_write_mb":${PrMeter.write / 1e6}%.1f}"""); graft.SparkUtil.releaseScopedCaches(); edges.unpersist() }

System.exit(0)
