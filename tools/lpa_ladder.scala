// Label-propagation scale ladder: ring-plus-global-hub graphs at
// 1x/3x/10x — node 0 has in-degree n (the hot key the per-node argmax
// AGGREGATE must absorb map-side). Claims proven per rung: (a) per-round
// shuffle write is linear in edges (per-edge-round bytes flat across
// rungs — decision rows are (long, long, long) triples, nothing wider
// ever crosses), (b) the hub does not bend the curve (partial
// aggregation absorbs it before the exchange). Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/lpa_ladder.scala <<< ":quit"
//
// Prints one JSON line per rung. NOTE: spark-shell -I compiles
// statement-by-statement — every val below must stay a ONE-LINER.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object LpaMeter { @volatile var write = 0L; def reset(): Unit = { write = 0L } }

class LpaListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { LpaMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new LpaListener)

// ring (i -> i+1 mod n) + global hub (every i -> 0): 2n directed edges
def plantEdges(n: Long) = spark.range(n).select(col("id").as("src"), ((col("id") + 1) % n).as("dst")).union(spark.range(n).select(col("id").as("src"), lit(0L).as("dst")))

val rounds = 2

for (mult <- Seq(1, 3, 10)) { val n = 20000L * mult; val e = plantEdges(n).repartition(32).persist(); val nE = e.count(); LpaMeter.reset(); val t0 = System.nanoTime(); val labels = graft.operators.Graphs.labelPropagation(e, "src", "dst", rounds); val nComm = labels.select("label").distinct().count(); val sec = (System.nanoTime() - t0) / 1e9; val w = LpaMeter.write; graft.SparkUtil.releaseScopedCaches(); println(f"""{"ladder":$mult,"nodes":$n,"edges":$nE,"rounds":$rounds,"communities":$nComm,"sec":$sec%.2f,"write_mb":${w / 1e6}%.1f,"per_edge_round_bytes":${w.toDouble / (nE * 2 * rounds)}%.2f}"""); e.unpersist() }

System.exit(0)
