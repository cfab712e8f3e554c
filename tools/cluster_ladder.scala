// Cluster-dedup scale ladder (round-8 verdict #2): planted cluster
// structure at 1x/3x/10x with a deliberately LARGE cluster per rung —
// one giant STAR (the mirror-page hot-label-key skew case) and one giant
// CHAIN (the worst-diameter case) on top of a bed of 5-doc chains — to
// prove connectedComponents' rounds grow O(log max-cluster) and its
// shuffles stay (id,label,score)-sized. Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/cluster_ladder.scala <<< ":quit"
//
// Prints one JSON line per rung. NOTE: spark-shell -I compiles
// statement-by-statement — every val below must stay a ONE-LINER.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object CcMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class CcListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { CcMeter.read += m.shuffleReadMetrics.totalBytesRead; CcMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new CcListener)

// per rung: nSmall ids in 5-doc chains, one star of size giant, one chain of length giant
def plantEdges(nSmall: Long, giant: Long) = { val small = spark.range(nSmall).select(col("id").as("a_id"), (col("id") + 1).as("b_id")).where(col("id") % 5 =!= 4); val hub = nSmall; val star = spark.range(hub + 1, hub + giant).select(lit(hub).as("a_id"), col("id").as("b_id")); val c0 = hub + giant; val chain = spark.range(c0, c0 + giant - 1).select(col("id").as("a_id"), (col("id") + 1).as("b_id")); small.union(star).union(chain) }

for (mult <- Seq(1, 3, 10)) { val nSmall = 4000L * mult; val giant = 500L * mult; val nDocs = nSmall + 2 * giant; val edges = plantEdges(nSmall, giant).repartition(32).persist(); val nE = edges.count(); val docs = spark.range(nDocs).select(col("id").as("doc_id"), (col("id") % 997).cast("double").as("score")).persist(); docs.count(); CcMeter.reset(); val t0 = System.nanoTime(); val labels = graft.operators.Dedup.connectedComponents(edges); val nClusters = labels.select("label").distinct().count(); val ccSec = (System.nanoTime() - t0) / 1e9; val rounds = { val f = graft.operators.Dedup.getClass.getDeclaredMethods.find(_.getName == "ccRoundsLastRun").get; f.setAccessible(true); f.invoke(graft.operators.Dedup).asInstanceOf[Int] }; val ccRead = CcMeter.read; val ccWrite = CcMeter.write; graft.SparkUtil.releaseScopedCaches(); CcMeter.reset(); val t1 = System.nanoTime(); val kept = graft.operators.Dedup.keepBestPerCluster(docs, "doc_id", edges, "score").count(); val kbSec = (System.nanoTime() - t1) / 1e9; val kbRead = CcMeter.read; graft.SparkUtil.releaseScopedCaches(); println(f"""{"ladder":$mult,"docs":$nDocs,"edges":$nE,"giant":$giant,"rounds":$rounds,"clusters":$nClusters,"cc_sec":$ccSec%.2f,"cc_read_mb":${ccRead / 1e6}%.1f,"cc_write_mb":${ccWrite / 1e6}%.1f,"perround_mb":${ccWrite / 1e6 / math.max(rounds, 1)}%.2f,"keepbest":$kept,"kb_sec":$kbSec%.2f,"kb_read_mb":${kbRead / 1e6}%.1f}"""); edges.unpersist(); docs.unpersist() }

System.exit(0)
