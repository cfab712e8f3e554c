// Kneser-Ney trigram scale ladder: the claim under test is that
// withKneserNeyTrigramLogProb's shuffle census stays occurrence-linear —
// the occurrence-level traffic is ONE equi-join of (doc, trigram) rows
// against the scored type table, and every count table (c3, h12, cc2,
// midh, cont) is TYPE-sized, growing with the distinct-trigram
// vocabulary (sub-linear under Zipf), never with occurrences. Replicas
// are LETTER-ROTATED so cross-replica trigram types are genuinely
// distinct (the hard case: the type tables grow ~linearly with mult
// here, the worst case for the type-table claim). Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/kn_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object KMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class KListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { KMeter.read += m.shuffleReadMetrics.totalBytesRead; KMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new KListener)

import org.apache.spark.sql.functions._

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))

val alpha = "abcdefghijklmnopqrstuvwxyz"

for (mult <- Seq(1, 3, 10)) { val corpus = (0 until mult).map { r => val to = alpha.drop(r * 7 % 26) + alpha.take(r * 7 % 26); base.select((col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"), translate(col("text"), alpha, to).as("text")) }.reduce(_ unionByName _).repartition(32).persist(); val n = corpus.count(); KMeter.reset(); val t0 = System.nanoTime(); val agg = graft.operators.TextAnalysis.withKneserNeyTrigramLogProb(corpus, "doc_id", "text", col("doc_id") % 2 === 0).agg(count(lit(1)).as("rows"), sum("n_trigrams").as("tg"), sum((col("avg_logscore") * 1e6).cast("long")).as("chk")).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":$mult,"docs":$n,"op":"kn_trigram","rows":${agg.getLong(0)},"trigrams":${agg.getLong(1)},"sec":$dt%.2f,"read_kb":${KMeter.read / 1e3}%.0f,"write_kb":${KMeter.write / 1e3}%.0f,"b_per_tg":${KMeter.read * 1.0 / agg.getLong(1)}%.1f}"""); corpus.unpersist(); graft.SparkUtil.releaseScopedCaches() }

System.exit(0)
