// Duplicated-ngram-coverage scale ladder: replicate sf0.1 1x/3x/10x/30x
// with letter-rotated text (replicas share no natural 10-grams) plus a
// GLOBAL 12-token boilerplate sentence appended to every doc — its three
// 10-grams are corpus-wide HOT KEYS (mult x 5,000 occurrences at the top
// rung), the skew surface of the occurrence count. Pass criteria: wall
// and decision-shuffle bytes near-linear in the ngram count; the hot
// hashes must not produce a superlinear rung (the count partial-
// aggregates map-side; the semi-join emits one row per occurrence —
// linear by construction). Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/ngram_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object NMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class NListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { NMeter.read += m.shuffleReadMetrics.totalBytesRead; NMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new NListener)

import org.apache.spark.sql.functions._

val alpha = "abcdefghijklmnopqrstuvwxyz"

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))

for (mult <- Seq(1, 3, 10, 30)) { val corpus = (0 until mult).map { r => val to = alpha.drop(r * 7 % 26) + alpha.take(r * 7 % 26); base.select((col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"), concat(translate(col("text"), alpha, to), lit(" the quick brown fox jumps over the lazy dog again today")).as("text")) }.reduce(_ unionByName _).repartition(32).persist(); val n = corpus.count(); NMeter.reset(); val t0 = System.nanoTime(); val agg = graft.operators.Dedup.duplicatedNgramStats(corpus, "doc_id", "text", 10).agg(count(lit(1)).as("rows"), sum("n_ngrams").as("g"), sum("n_dup_ngrams").as("dg"), sum("dup_tokens").as("dt")).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":$mult,"docs":$n,"op":"dup_ngram_stats","rows":${agg.getLong(0)},"ngrams":${agg.getLong(1)},"dup_ngrams":${agg.getLong(2)},"dup_tokens":${agg.getLong(3)},"sec":$dt%.2f,"read_mb":${NMeter.read / 1e6}%.1f,"write_mb":${NMeter.write / 1e6}%.1f}"""); corpus.unpersist(); graft.SparkUtil.releaseScopedCaches() }

System.exit(0)
